"""Fused (flash-style) cross-attention for the TRAIN step.

The flagship decoder's context attention is CROSS attention: caption
queries [B, T≈63] over article keys [B, S≈514] (+ image, S≈51), with a
key-padding bias and the reference's `attention_dropout: 0.1` applied
to the attention probabilities (fairseq multi_head.py:330-340 —
F.dropout on attn_weights). The XLA path materializes the [B, H, T, S]
scores and probs (plus their gradients, plus a threefry dropout mask
of the same shape) in HBM; at B=64 that chain was ~21 ms of the ~72 ms
train step (benchmarks/train_profile.py).

Kernel design — two load-bearing decisions, both measured:

1. NATURAL LAYOUTS. The kernel consumes q [B, T, E] and k/v [B, S, E]
   exactly as the projections produce them (E = H·D merged on lanes)
   and emits out [B, T, E] ready for the output projection. A first
   head-major [B,H,T,D] variant needed jnp.transposes of the ~67 MB
   K/V (and of their gradients) around every call; the transposes ate
   the entire win (936 vs 889 samples/s — see BASELINE.md).

2. HEAD-GROUPED MASKED DOTS. Heads live side by side on the lane
   axis; lane slices must be 128-aligned, but D=64 < 128. Each 128-
   lane slice holds G = 128/D heads; a dot of the slice against the
   K slice contracts ALL G heads' lanes at once, which is wrong — so
   the query slice is lane-masked per head before the dot (the other
   heads' lanes contribute exact zeros). A D=64 dot would only use
   half the 128-wide MXU anyway, so the masked 128-wide contraction
   costs the same MXU passes as the "correct-shape" [T,64]x[64,S] dot
   — the masking is free compute, and it removes every transpose.

Dropout uses the TPU hardware PRNG (`pltpu.prng_seed` /
`prng_random_bits`), seeded per (batch, head); the backward kernel
re-seeds identically and regenerates the same mask, so the [B,H,T,S]
mask never exists in HBM and no threefry runs on the VPU. Keep
decision: uniform uint32 >= p·2³²; kept probs scale by 1/(1-p) like
F.dropout. The backward recomputes probs from the saved per-row
logsumexp.

Interpret mode (CPU tests) swaps the hardware PRNG for threefry (same
(seed, b, h) determinism, so fwd/bwd masks stay consistent per mode)
and tolerates arbitrary head dims (no lane-alignment rules).

Parity targets: fairseq multi_head_attention prob-dropout semantics
(/root/reference/ttl/tell/modules/attention/multi_head.py:330-340) and
the apex-O2 fp32-softmax-over-half-precision-scores recipe. The p=0
path equals the XLA `MultiHeadAttention.attend` chain
(tests/test_pallas_flash.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported_head_dim(head_dim: int, num_heads: int = 1) -> bool:
    """Compiled-mode support: head groups must tile 128 lanes AND the
    head count must divide into whole groups — otherwise the kernel's
    `range(E // W)` slice loop would skip the trailing heads and
    return uninitialized VMEM for their output lanes."""
    if head_dim >= 128:
        return head_dim % 128 == 0
    if 128 % head_dim != 0:
        return False
    return num_heads % (128 // head_dim) == 0


def _group_layout(E: int, H: int, interpret: bool):
    """(group_width W, heads_per_group G). Compiled: W is a multiple
    of 128 (lane-slice alignment). Interpret: one head per slice."""
    D = E // H
    if interpret or D >= 128:
        return D, 1
    G = 128 // D
    return 128, G


def _keep_mask(seed, head_index, shape, p, interpret):
    """Regenerable per-(seed, head) dropout keep mask in {0,1} fp32.

    The call-site seed is spread by a Knuth multiplicative hash
    BEFORE adding the per-(batch, head) offset: with plain
    `seed + head_index`, two attention sites whose drawn seeds differ
    by less than B*H would reuse bitwise-identical masks for the
    overlapping (b, h) slots (correlated dropout across layers). The
    hash makes distinct seeds map to well-separated stream bases; the
    fwd/bwd mask identity is unaffected (both recompute the same
    value).
    """
    mixed = (jnp.asarray(seed, jnp.uint32) * jnp.uint32(2654435761)
             + jnp.asarray(head_index, jnp.uint32)).astype(jnp.int32)
    if interpret:
        key = jax.random.fold_in(jax.random.PRNGKey(0), mixed)
        u = jax.random.uniform(key, shape)
        return (u >= p).astype(jnp.float32)
    pltpu.prng_seed(mixed)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(p * (2 ** 32)), 2 ** 32 - 1))
    return (bits >= threshold).astype(jnp.float32)


def _lane_mask(W: int, G: int, g: int, dtype):
    """[1, W] mask selecting head g's D = W/G lanes within the slice."""
    if G == 1:
        return None
    D = W // G
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    return ((lane >= g * D) & (lane < (g + 1) * D)).astype(dtype)


_NT = (((1,), (1,)), ((), ()))   # contract minor dims ("NT" matmul)
_TN = (((0,), (0,)), ((), ()))   # contract major dims


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                lse_ref, *, p: float, num_heads: int,
                interpret: bool):
    b = pl.program_id(0)
    q = q_ref[0]                                       # [T, E]
    k = k_ref[0]                                       # [S, E]
    v = v_ref[0]
    bias = bias_ref[0]                                 # [1, S]
    T, E = q.shape
    H = num_heads
    W, G = _group_layout(E, H, interpret)
    cdtype = v.dtype
    for j in range(E // W):
        q2 = q[:, j * W:(j + 1) * W]
        k2 = k[:, j * W:(j + 1) * W]
        v2 = v[:, j * W:(j + 1) * W]
        o2 = None
        for g in range(G):
            h = j * G + g
            m = _lane_mask(W, G, g, q2.dtype)
            qh = q2 if m is None else q2 * m
            s = jax.lax.dot_general(
                qh, k2, _NT, preferred_element_type=jnp.float32)
            s = s + bias
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            lse_ref[0, h, :] = (mx + jnp.log(denom))[:, 0]
            probs = e / denom                          # [T, S] fp32
            if p > 0.0:
                keep = _keep_mask(seed_ref[0, 0], b * H + h,
                                  probs.shape, p, interpret)
                probs = probs * keep * (1.0 / (1.0 - p))
            oh = jax.lax.dot(probs.astype(cdtype), v2,
                             preferred_element_type=jnp.float32)
            if m is None:
                o2 = oh
            else:
                oh = oh * m.astype(oh.dtype)
                o2 = oh if o2 is None else o2 + oh
        o_ref[0, :, j * W:(j + 1) * W] = o2.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, lse_ref,
                g_ref, dq_ref, dk_ref, dv_ref, *, p: float,
                num_heads: int, interpret: bool):
    b = pl.program_id(0)
    q = q_ref[0]                                       # [T, E]
    k = k_ref[0]                                       # [S, E]
    v = v_ref[0]
    bias = bias_ref[0]
    gout = g_ref[0]                                    # [T, E]
    T, E = q.shape
    H = num_heads
    W, G = _group_layout(E, H, interpret)
    cdtype = v.dtype
    for j in range(E // W):
        q2 = q[:, j * W:(j + 1) * W]
        k2 = k[:, j * W:(j + 1) * W]
        v2 = v[:, j * W:(j + 1) * W]
        g2 = gout[:, j * W:(j + 1) * W]
        dq2 = dk2 = dv2 = None
        for g in range(G):
            h = j * G + g
            m = _lane_mask(W, G, g, q2.dtype)
            qh = q2 if m is None else q2 * m
            gh = g2 if m is None else g2 * m.astype(g2.dtype)
            s = jax.lax.dot_general(
                qh, k2, _NT, preferred_element_type=jnp.float32)
            s = s + bias
            probs = jnp.exp(s - lse_ref[0, h, :][:, None])
            if p > 0.0:
                keep = _keep_mask(seed_ref[0, 0], b * H + h,
                                  probs.shape, p, interpret)
                scale = keep * (1.0 / (1.0 - p))
                dropped = probs * scale
            else:
                scale = None
                dropped = probs
            # dv[s, :] += dropped^T @ g (lanes outside the head are 0
            # because gh is lane-masked)
            dvh = jax.lax.dot_general(
                dropped.astype(cdtype), gh, _TN,
                preferred_element_type=jnp.float32)
            dv2 = dvh if dv2 is None else dv2 + dvh
            # d(dropped)[t, s] = sum_d g[t, d] v[s, d] over head lanes
            dp = jax.lax.dot_general(
                gh, v2, _NT, preferred_element_type=jnp.float32)
            if scale is not None:
                dp = dp * scale
            delta = jnp.sum(dp * probs, axis=-1, keepdims=True)
            ds = (probs * (dp - delta)).astype(cdtype)  # [T, S]
            # dq columns live in the head's lanes of k2's slice
            dqh = jax.lax.dot(ds, k2.astype(cdtype),
                              preferred_element_type=jnp.float32)
            dqh = dqh if m is None else dqh * m.astype(dqh.dtype)
            dq2 = dqh if dq2 is None else dq2 + dqh
            # dk[s, :] = ds^T @ q (head lanes only, qh pre-masked)
            dkh = jax.lax.dot_general(
                ds, qh.astype(cdtype), _TN,
                preferred_element_type=jnp.float32)
            dk2 = dkh if dk2 is None else dk2 + dkh
        dq_ref[0, :, j * W:(j + 1) * W] = dq2.astype(dq_ref.dtype)
        dk_ref[0, :, j * W:(j + 1) * W] = dk2.astype(dk_ref.dtype)
        dv_ref[0, :, j * W:(j + 1) * W] = dv2.astype(dv_ref.dtype)


def _specs(B, T, E, S, H):
    seed_spec = pl.BlockSpec((1, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
    q_spec = pl.BlockSpec((1, T, E), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, S, E), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, H, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    return seed_spec, q_spec, kv_spec, bias_spec, lse_spec


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "dropout_p",
                                    "interpret"))
def _flash_fwd(q, k, v, bias, seed, num_heads: int,
               dropout_p: float = 0.0, interpret: bool = False):
    B, T, E = q.shape
    S = k.shape[1]
    seed_spec, q_spec, kv_spec, bias_spec, lse_spec = _specs(
        B, T, E, S, num_heads)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, p=dropout_p,
                          num_heads=num_heads, interpret=interpret),
        grid=(B,),
        in_specs=[seed_spec, q_spec, kv_spec, kv_spec, bias_spec],
        out_specs=(q_spec, lse_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, E), q.dtype),
                   jax.ShapeDtypeStruct((B, num_heads, T),
                                        jnp.float32)),
        interpret=interpret,
    )(seed.reshape(1, 1), q, k, v, bias[:, None, :])
    return out, lse


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "dropout_p",
                                    "interpret"))
def _flash_bwd(q, k, v, bias, seed, lse, g, num_heads: int,
               dropout_p: float = 0.0, interpret: bool = False):
    B, T, E = q.shape
    S = k.shape[1]
    seed_spec, q_spec, kv_spec, bias_spec, lse_spec = _specs(
        B, T, E, S, num_heads)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, p=dropout_p,
                          num_heads=num_heads, interpret=interpret),
        grid=(B,),
        in_specs=[seed_spec, q_spec, kv_spec, kv_spec, bias_spec,
                  lse_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, E), q.dtype),
                   jax.ShapeDtypeStruct((B, S, E), k.dtype),
                   jax.ShapeDtypeStruct((B, S, E), v.dtype)),
        interpret=interpret,
    )(seed.reshape(1, 1), q, k, v, bias[:, None, :], lse, g)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_cross_attention(q, k, v, bias, seed, num_heads: int,
                          dropout_p: float = 0.0,
                          interpret: bool = False):
    """out [B, T, E] = dropout(softmax(q @ kᵀ + bias)) @ v, per head.

    q [B, T, E] pre-scaled by D^-0.5; k/v [B, S, E] (heads merged on
    the lane axis); bias [B, S] additive fp32; seed an int32 (1,)
    array (ignored when dropout_p == 0). Differentiable in q/k/v;
    bias and seed get zero cotangents.
    """
    out, _ = _flash_fwd(q, k, v, bias, seed, num_heads, dropout_p,
                        interpret)
    return out


def _fwd_rule(q, k, v, bias, seed, num_heads, dropout_p, interpret):
    out, lse = _flash_fwd(q, k, v, bias, seed, num_heads, dropout_p,
                          interpret)
    return out, (q, k, v, bias, seed, lse)


def _bwd_rule(num_heads, dropout_p, interpret, res, g):
    q, k, v, bias, seed, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, bias, seed, lse, g, num_heads,
                            dropout_p, interpret)
    return dq, dk, dv, jnp.zeros_like(bias), jnp.zeros_like(seed)


flash_cross_attention.defvjp(_fwd_rule, _bwd_rule)
