"""Fused decoder-layer step kernels for incremental decoding.

The beam decode loop's cost at width 320 is dominated by per-op
scheduling floors: ~100+ small fusions of 5-40 us each (see
benchmarks/beam_profile.py), far above the step's ~1 ms traffic
roofline. These kernels collapse whole sub-blocks of the
DynamicConvDecoderLayer step into single Pallas calls.

decode_conv_block: linear1 -> GLU -> dynamic-conv weight prediction
(softmax over taps) -> ring-buffer tap combine -> linear2 -> +residual
(~10 XLA fusions -> 1 kernel). The conv_layer_norm stays outside (one
fused op), as does the one-row ring-cache write.

Parity target: DynamicConvDecoderLayer.step with DynamicConv.step_ring
(models/decoder_flattened.py, ops/conv.py:158-191) — same bf16
rounding points (linear outputs, GLU, softmaxed tap weights) so
decoded tokens match the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_block_kernel(t_ref, x_ref, cache_ref, w1_ref, b1_ref,
                       wl_ref, w2_ref, b2_ref, y_ref, h_ref, *,
                       H: int, K: int, C: int):
    """One batch tile.

    t_ref: [1] SMEM step index; x [tn, C]; cache [Km1, tn, C]
    (RING-MAJOR: the slot dim is outermost so the per-tap dynamic
    index lands on the unconstrained major dim — Mosaic requires
    8-aligned indices on the sublane dim);
    w1 [C, 2C]+b1 (effective/normalized linear1); wl [C, H*K] (tap
    weight predictor, no bias); w2 [C, C]+b2 (linear2).
    Outputs: y [tn, C] = linear2(conv_out) + x (pre-LN);
             h [tn, C] = GLU output (the ring-cache row to store).
    """
    t = t_ref[0]
    Km1 = K - 1
    x = x_ref[...]                                     # [tn, C] bf16
    # linear1 + GLU at the XLA path's bf16 rounding points.
    pre = (jnp.dot(x, w1_ref[...],
                   preferred_element_type=jnp.float32)
           .astype(x.dtype) + b1_ref[...])             # [tn, 2C]
    a = pre[:, :C]
    b = pre[:, C:]
    # sigmoid in f32 then round — XLA computes bf16 transcendentals
    # the same way; Mosaic rejects bf16 logistic's f32 constants.
    sig = jax.nn.sigmoid(b.astype(jnp.float32)).astype(x.dtype)
    h = a * sig                                        # [tn, C] bf16
    h_ref[...] = h
    # Tap weights: [tn, H*K] (lane layout h*K + k), softmax over k
    # per head via K static [tn, H]-strided... layout is h-major so
    # tap k of head hh sits at lane hh*K + k; slice per tap requires
    # stride K. Instead predict in TAP-MAJOR layout: the caller passes
    # wl with columns pre-permuted to k*H + hh, so tap k is the
    # contiguous lane block [k*H, (k+1)*H).
    w = jnp.dot(h, wl_ref[...],
                preferred_element_type=jnp.float32)    # [tn, H*K] f32
    w = w.astype(x.dtype).astype(jnp.float32)          # parity round
    taps = [w[:, k * H:(k + 1) * H] for k in range(K)]  # K x [tn, H]
    m = taps[0]
    for k in range(1, K):
        m = jnp.maximum(m, taps[k])
    exps = [jnp.exp(tk - m) for tk in taps]
    s = exps[0]
    for k in range(1, K):
        s = s + exps[k]
    probs = [(e / s).astype(x.dtype) for e in exps]    # bf16 parity
    # Head -> channel expansion one-hot [H, C] (c // R == h).
    R = C // H
    head_of_c = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1) // R
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
    expand = (head_of_c == rows).astype(jnp.float32)
    # Ring combine: tap k (input x_{t-Km1+k}) reads slot (t+k) mod
    # Km1; the current token (tap K-1) multiplies h directly. The XLA
    # path fp32-accumulates the history einsum, rounds it to bf16,
    # THEN adds the bf16 current-tap product — mirror exactly.
    acc = jnp.zeros((x.shape[0], C), jnp.float32)
    for k in range(Km1):
        slot = jax.lax.rem(t + k, Km1)
        row = cache_ref[pl.ds(slot, 1), :, :]
        p_exp = jnp.dot(probs[k].astype(jnp.float32), expand,
                        preferred_element_type=jnp.float32)
        acc = acc + p_exp * row[0].astype(jnp.float32)
    # One-hot expansion is a 0/1 selection — exact in any accumulator;
    # Mosaic requires 32-bit matmul accumulation.
    p_last = jnp.dot(probs[K - 1].astype(jnp.float32), expand,
                     preferred_element_type=jnp.float32
                     ).astype(x.dtype)
    h_conv = acc.astype(x.dtype) + p_last * h          # [tn, C] bf16
    y = (jnp.dot(h_conv, w2_ref[...],
                 preferred_element_type=jnp.float32)
         .astype(x.dtype) + b2_ref[...])
    y_ref[...] = y + x                                 # pre-LN


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref,
                acc_ref, *, n_chunks: int):
    """One ffn-dim chunk: acc += relu(x@w1_g + b1_g) @ w2_g; final
    chunk adds bias + residual and rounds once (the XLA path rounds
    the full-width fc2 accumulator once too)."""
    g = pl.program_id(0)
    x = x_ref[...]
    h = (jnp.dot(x, w1_ref[...],
                 preferred_element_type=jnp.float32)
         .astype(x.dtype) + b1_ref[...])
    h = jnp.maximum(h, jnp.zeros((), x.dtype))
    part = jnp.dot(h, w2_ref[...],
                   preferred_element_type=jnp.float32)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = part

    @pl.when(g > 0)
    def _():
        acc_ref[...] = acc_ref[...] + part

    @pl.when(g == n_chunks - 1)
    def _():
        y_ref[...] = (acc_ref[...].astype(x.dtype)
                      + b2_ref[...] + x)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def decode_ffn_block(x: jax.Array, w1: jax.Array, b1: jax.Array,
                     w2: jax.Array, b2: jax.Array,
                     chunk: int = 1024, interpret: bool = False):
    """Fused FFN decode step: relu(x@w1 + b1)@w2 + b2 + x.

    x [N, C]; w1 [C, F]; b1 [F]; w2 [F, C]; b2 [C] (effective
    weights, weight-norm pre-applied). The final LayerNorm stays
    outside. Streams w1/w2 in `chunk`-wide slices of F so VMEM holds
    ~4*chunk*C weights at a time.
    """
    N, C = x.shape
    F = w1.shape[1]
    if F % chunk:
        # Largest divisor of F that fits the requested chunk — falling
        # back to chunk=F would abandon streaming and put BOTH full
        # weight matrices in VMEM (overflow for large ffn_dim).
        chunk = next(c for c in range(min(chunk, F), 0, -1)
                     if F % c == 0)
    n_chunks = F // chunk
    return pl.pallas_call(
        functools.partial(_ffn_kernel, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((N, C), x.dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N, C), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, chunk), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, C), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, C), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, C), jnp.float32)],
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


@functools.partial(jax.jit, static_argnames=("num_heads", "tile_n",
                                             "interpret"))
def decode_conv_block(x: jax.Array, cache: jax.Array, t,
                      w1: jax.Array, b1: jax.Array, wl_tap: jax.Array,
                      w2: jax.Array, b2: jax.Array, num_heads: int,
                      tile_n: int = 32, interpret: bool = False):
    """Fused conv-block decode step.

    x [N, C]; cache [K-1, N, C] RING-MAJOR; t scalar step index; w1/b1 effective
    linear1 [C, 2C]/[2C]; wl_tap [C, H*K] weight predictor with
    columns in TAP-MAJOR order (k*H + h); w2/b2 linear2 [C, C]/[C].
    Returns (y_pre_ln [N, C], h_glu [N, C]) — caller applies the
    conv LayerNorm and writes h_glu into ring slot t mod (K-1).
    """
    N, C = x.shape
    K = wl_tap.shape[1] // num_heads
    if N % tile_n:
        tile_n = N   # fall back to one tile
    grid = (N // tile_n,)
    t_arr = jnp.asarray(t, jnp.int32).reshape(1)
    kernel = functools.partial(_conv_block_kernel, H=num_heads, K=K,
                               C=C)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((N, C), x.dtype),
                   jax.ShapeDtypeStruct((N, C), x.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # t
            pl.BlockSpec((tile_n, C), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K - 1, tile_n, C), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * C), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * C), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, num_heads * K), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, C), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, C), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(t_arr, x, cache, w1, b1.reshape(1, -1), wl_tap, w2,
      b2.reshape(1, -1))
