"""Pallas TPU kernels for the hot ops.

dynamic_conv_pallas: causal depthwise conv with per-position predicted
kernels (the Transform-and-Tell decoder's temporal mixer,
/root/reference/ttl/tell/modules/convolutions/dynamic.py:285-336 band
form). Each (batch, time-tile) grid cell DMAs its x tile plus a K-1
halo from HBM into VMEM once, then accumulates the K tap products on
the VPU — no K-times re-read of x and no [B,H,T,T] band matrix.

Layout notes (TPU tiling): channels C = H * R stay as the 128-lane
minor dimension; per-head tap weights [T, H] are expanded to channel
lanes with `pltpu.repeat` (heads are contiguous blocks of R channels,
matching c = h * R + r).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dynconv_kernel(x_hbm, w_ref, o_ref, x_vmem, sem, *, K: int,
                    H: int, R: int, tile: int):
    """x_hbm [B, T+K-1, C] (ANY); w_ref [1, tile, K*H] (VMEM, tap-major);
    o_ref [1, tile, C]; x_vmem scratch [tile+K-1, C].

    Mosaic cannot reshape the minor (lane) dimension, so the per-head
    tap weights [tile, H] are expanded to channel lanes with a one-hot
    head->channels matmul on the MXU (E[h, c] = 1 iff h == c // R)
    instead of broadcast+reshape.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    # Halo load: DMA slices must be sublane-aligned (multiples of 8),
    # so x is left-padded by PAD = round_up(K-1, 8) and each cell
    # copies tile + PAD rows; tap k reads rows offset by
    # k + PAD - (K-1) inside the VMEM window.
    PAD = -(-(K - 1) // 8) * 8
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, tile + PAD), :], x_vmem, sem)
    cp.start()
    cp.wait()
    C = H * R
    head_of_c = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1) // R
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
    expand = (head_of_c == rows).astype(jnp.float32)   # [H, C]
    acc = jnp.zeros((tile, C), jnp.float32)
    base = PAD - (K - 1)
    for k in range(K):  # static unroll
        w_k = w_ref[0, :, k * H:(k + 1) * H].astype(jnp.float32)
        w_exp = jnp.dot(w_k, expand,
                        preferred_element_type=jnp.float32)
        acc = acc + w_exp * x_vmem[base + k:base + k + tile,
                                   :].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "tile",
                                             "interpret"))
def dynamic_conv_pallas(x: jax.Array, w: jax.Array, num_heads: int,
                        tile: int = 128,
                        interpret: bool = False) -> jax.Array:
    """Causal dynamic conv. x [B, T, C]; w [B, T, H, K] (normalized).

    out[b,t,c] = sum_k w[b,t,h(c),k] * x[b, t-K+1+k, c].
    T must be a multiple of `tile` (pad-and-mask upstream).
    """
    B, T, C = x.shape
    K = w.shape[-1]
    H = num_heads
    R = C // H
    assert T % tile == 0, f"T={T} must be a multiple of tile={tile}"
    PAD = -(-(K - 1) // 8) * 8     # sublane-aligned halo
    x_pad = jnp.pad(x, ((0, 0), (PAD, 0), (0, 0)))
    # tap-major layout so each tap's head weights are a contiguous
    # minor-dim slice in the kernel: flat index = k*H + h.
    w_flat = jnp.transpose(w, (0, 1, 3, 2)).reshape(B, T, K * H)

    grid = (B, T // tile)
    return pl.pallas_call(
        functools.partial(_dynconv_kernel, K=K, H=H, R=R, tile=tile),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec((1, tile, K * H), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # DMA src/dst dtypes must match: scratch follows x.
            pltpu.VMEM((tile + PAD, C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_pad, w_flat)
