"""images/sec for preprocess + ResNet-152 patch extraction on TPU.

BASELINE.md's second metric: the reference's vision path is
torchvision ResNet-152 on GPU/CPU with host-side crop+normalize
(/root/reference/misc/utils.py:114-129, final/resnet.py). Here the
whole path (uint8 -> normalize -> crop -> trunk -> patches) is one
jitted bf16 program on TPU.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from news_image_caption_tpu.models.resnet import (ResNetTrunk,
                                                  preprocess_image)


def main(batch: int = 64, depth: int = 152, iters: int = 5):
    model = ResNetTrunk(depth=depth, num_stages=4)
    imgs = np.random.default_rng(0).integers(
        0, 255, (batch, 256, 256, 3), dtype=np.uint8)

    x_init = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x_init)
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if v.dtype == jnp.float32 else v, params)

    @jax.jit
    def run(params, raw):
        x = preprocess_image(raw, crop=224).astype(jnp.bfloat16)
        return model.apply(params, x, method=ResNetTrunk.patches)

    d = jax.device_put(jnp.asarray(imgs))
    out = run(params, d)
    np.asarray(out[0, 0, :4])  # force completion (tunnel quirk)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(params, d)
        np.asarray(out[0, 0, :4])
    dt = (time.perf_counter() - t0) / iters
    print(f"resnet{depth} preprocess+trunk bf16: "
          f"{batch / dt:.1f} images/s (batch {batch}, "
          f"{dt * 1e3:.1f} ms/batch, patches {out.shape})")


if __name__ == "__main__":
    main()
