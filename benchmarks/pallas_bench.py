"""Pallas dynamic conv vs XLA shift-accumulate on real TPU.

Flagship training shape: B=16, T=512, C=1024, H=16, K=31.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from news_image_caption_tpu.ops.conv import _band_matmul, _shift_accumulate
from news_image_caption_tpu.ops.pallas_kernels import dynamic_conv_pallas


def bench(fn, x, w, iters=20):
    """Chain iterations INSIDE one jit program: the axon tunnel adds
    tens of ms of RPC overhead per dispatch, which would swamp a
    single kernel launch."""

    @jax.jit
    def chained(x, w):
        def body(i, acc):
            return acc + fn(x + acc[:1, :1, :1] * 0, w).sum()
        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((1, 1, 1), x.dtype))

    r = chained(x, w)
    np.asarray(r)
    t0 = time.perf_counter()
    r = chained(x, w)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters


def main(B=16, T=512, C=1024, H=16, K=31, dtype=jnp.bfloat16):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, T, C), dtype)
    w = jax.nn.softmax(
        jax.random.normal(kw, (B, T, H, K), jnp.float32),
        -1).astype(dtype)

    shift = jax.jit(lambda x, w: _shift_accumulate(
        x.reshape(B, T, H, C // H), w, K).reshape(B, T, C))
    band = jax.jit(lambda x, w: _band_matmul(
        x.reshape(B, T, H, C // H), w, K).reshape(B, T, C))
    pallas = jax.jit(lambda x, w: dynamic_conv_pallas(
        x, w, num_heads=H, tile=128))

    ref = np.asarray(shift(x, w), np.float32)
    got = np.asarray(pallas(x, w), np.float32)
    err = np.abs(ref - got).max()
    print(f"max |pallas - shift| = {err:.4f} (bf16 tolerance)")
    assert err < 0.1, "pallas kernel mismatch on TPU"

    t_shift = bench(lambda a, b: shift(a, b), x, w)
    t_band = bench(lambda a, b: band(a, b), x, w)
    t_pallas = bench(lambda a, b: pallas(a, b), x, w)
    bytes_moved = (x.nbytes * 2 + w.nbytes)
    print(f"XLA shift-accumulate: {t_shift*1e3:.3f} ms "
          f"({bytes_moved/t_shift/1e9:.0f} GB/s effective)")
    print(f"XLA band matmul:      {t_band*1e3:.3f} ms")
    print(f"Pallas halo kernel:   {t_pallas*1e3:.3f} ms "
          f"({bytes_moved/t_pallas/1e9:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
