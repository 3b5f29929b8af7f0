"""Pallas TPU kernels for the hot ops.

dynamic_conv_pallas: causal depthwise conv with per-position predicted
kernels (the Transform-and-Tell decoder's temporal mixer,
/root/reference/ttl/tell/modules/convolutions/dynamic.py:285-336 band
form). Each (batch, time-tile) grid cell DMAs its x tile plus a K-1
halo from HBM into VMEM once, then accumulates the K tap products on
the VPU — no K-times re-read of x and no [B,H,T,T] band matrix.

decode_cross_attention: fused single-step (few-query) cross-attention
for incremental decoding. Per batch item, the precomputed context K/V
([S, E]) are DMA'd into VMEM ONCE and the whole per-head
scores->softmax->weighted-sum chain runs tile-resident — the XLA
einsum path reads K and V in separate fusions at ~half roofline
(measured 0.175 ms per 67 MB read on v5e; benchmarks/beam_profile.py),
making the article K/V streams the dominant cost of beam decode.

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


def _decode_xattn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                         num_heads: int, head_dim: int):
    """One batch item: q [1, Q, E], k/v [1, S, E], bias [1, 1, S] fp32.

    Per head (static unroll): scores = q_h @ k_h^T (fp32 accumulate),
    + additive key bias, fp32 softmax over S, then probs @ v_h. Heads
    are 64-lane column bands of the 1024-lane E dimension; slicing is
    VPU lane work on VMEM-resident data — the HBM traffic is exactly
    one read of K and V.
    """
    q = q_ref[0]                 # [Q, E]
    k = k_ref[0]                 # [S, E]
    v = v_ref[0]                 # [S, E]
    bias = bias_ref[0]           # [1, S] fp32
    dh = head_dim
    outs = []
    for h in range(num_heads):
        qh = q[:, h * dh:(h + 1) * dh]
        kh = k[:, h * dh:(h + 1) * dh]
        vh = v[:, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [Q, S]
        s = s + bias                                 # [1, S] bcast
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))     # [Q, dh]
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def decode_cross_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           bias: jax.Array, num_heads: int,
                           interpret: bool = False) -> jax.Array:
    """Fused few-query attention over per-item shared K/V.

    q: [B, Q, E] (already scaled by head_dim**-0.5); k, v: [B, S, E];
    bias: [B, S] fp32 additive key mask (0 attendable / -1e9 padded).
    Returns [B, Q, E] — softmax(q_h k_h^T + bias) v_h per head, fp32
    softmax, matching MultiHeadAttention.attend_flat_beam numerics.
    """
    B, Q, E = q.shape
    S = k.shape[1]
    assert E % num_heads == 0
    grid = (B,)
    return pl.pallas_call(
        functools.partial(_decode_xattn_kernel, num_heads=num_heads,
                          head_dim=E // num_heads),
        out_shape=jax.ShapeDtypeStruct((B, Q, E), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, E), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, bias.reshape(B, 1, S).astype(jnp.float32))
