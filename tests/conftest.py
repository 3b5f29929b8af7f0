"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested without TPU hardware by forcing
the host platform to expose 8 virtual devices (SURVEY.md §4).
"""

import os

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests must
# run on the virtual CPU mesh, and the env var alone is not honored in
# this image — jax.config.update is.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
