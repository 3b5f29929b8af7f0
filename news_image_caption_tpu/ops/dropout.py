"""Functional dropout usable from any (setup-style) flax method.

flax's nn.Dropout is a submodule and cannot be instantiated inside
non-setup methods; this helper draws from the module's 'dropout' RNG
stream directly.

Mask bits come from the TPU's hardware generator (`rbg` impl →
XLA rng_bit_generator) rather than the default threefry hash: the
derivation of the per-site key keeps flax's fold_in semantics (each
call site still gets an independent, deterministic, seed-sensitive
stream), only the bulk bit generation changes. Measured on the
flagship train step at B=64: threefry masks cost 5.9 ms/step of
which the hash itself is 3.6 ms (BASELINE.md) — the same reasoning
as the flash kernel's in-kernel HW-PRNG dropout
(ops/pallas_flash.py). Set `dropout.use_hw_prng = False` to restore
threefry masks (bit-identical to pre-r03 behavior).

The flag is read at TRACE time: set it before jitting (functions
already compiled keep the branch they were traced with — flip the
flag and rebuild/re-jit, e.g. via jax.clear_caches(), to switch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _hw_key(key: jax.Array) -> jax.Array:
    """Re-wrap a (threefry) dropout key as an `rbg` key so bernoulli
    lowers to the TPU hardware rng_bit_generator. Deterministic in
    the input key; distinct keys give distinct streams."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    data = data.reshape(-1)
    if data.shape[0] < 4:  # rbg keys are 4x uint32
        data = jnp.concatenate([data, data])[:4]
    return jax.random.wrap_key_data(data[:4], impl="rbg")


def dropout(module: nn.Module, x: jax.Array, rate: float,
            deterministic: bool) -> jax.Array:
    if rate == 0.0 or deterministic:
        return x
    keep = 1.0 - rate
    key = module.make_rng("dropout")
    if dropout.use_hw_prng:
        key = _hw_key(key)
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


dropout.use_hw_prng = True
