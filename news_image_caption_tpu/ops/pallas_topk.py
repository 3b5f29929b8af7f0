"""Fused band top-k + logsumexp Pallas kernel for the adaptive head.

Decode-time selection needs, per adaptive band: the top-k logits (with
lax.top_k tie semantics), their ids, and the band's logsumexp. The XLA
path materializes band logits in HBM, log_softmaxes them, and re-reads
them through the tournament top-k — measured 0.885 ms/step at beam
width 320 (benchmarks/head_bench.py), ~3.5x off roofline.

This kernel streams the band's embedding table through VMEM in
`tile`-row chunks: each grid step computes one logits tile on the MXU
and folds it into running state — flash-style (max, sumexp) for the
logsumexp, and a k-round tournament merge for the top-k — so band
logits NEVER touch HBM. Total HBM traffic = one read of the table.

Parity: logits are rounded to the input dtype (bf16 on the production
decode path) before selection, like the XLA path's matmul emit dtype —
but the XLA path (adaptive.py topk_log_prob) selects on band
*log-probs* rounded to bf16 while this kernel selects on fp32
(logit - lse): logits that tie only after bf16 rounding can resolve
differently, so ids/values are identical up to bf16-rounding ties.
Distinct-value ties break by lowest id, lax.top_k's rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float("-inf")
BIG_ID = 2 ** 30


def _merge_topk(av, ai, bv, bi, k):
    """Merge two (values, ids) top-k sets [N, k] -> best k overall.

    Descending by value; equal values break by LOWEST id (lax.top_k).
    """
    cv = jnp.concatenate([av, bv], axis=1)          # [N, 2k]
    ci = jnp.concatenate([ai, bi], axis=1)
    outv, outi = [], []
    for _ in range(k):
        mx = jnp.max(cv, axis=1, keepdims=True)     # [N, 1]
        cand = jnp.where(cv == mx, ci, BIG_ID)
        sel = jnp.min(cand, axis=1, keepdims=True)  # lowest id wins
        outv.append(mx)
        outi.append(sel)
        hit = (cv == mx) & (ci == sel)
        cv = jnp.where(hit, NEG, cv)
    return (jnp.concatenate(outv, axis=1),
            jnp.concatenate(outi, axis=1))


def _tile_topk(logits, col_ids, k):
    """Top-k of one [N, tile] tile; ids from col_ids [N, tile]."""
    outv, outi = [], []
    work = logits
    for _ in range(k):
        mx = jnp.max(work, axis=1, keepdims=True)
        cand = jnp.where(work == mx, col_ids, BIG_ID)
        sel = jnp.min(cand, axis=1, keepdims=True)
        outv.append(mx)
        outi.append(sel)
        hit = (work == mx) & (col_ids == sel)
        work = jnp.where(hit, NEG, work)
    return (jnp.concatenate(outv, axis=1),
            jnp.concatenate(outi, axis=1))


def _band_kernel(x_ref, t_ref, topv_ref, topi_ref, lse_ref,
                 m_ref, s_ref, *, k, V, sel_limit, tile, n_tiles):
    g = pl.program_id(0)
    x = x_ref[...]                                   # [N, D]
    t = t_ref[...]                                   # [tile, D]
    logits = jax.lax.dot_general(
        x, t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [N, tile] f32
    # Parity rounding point: the XLA path's matmul emits x.dtype.
    logits = logits.astype(x_ref.dtype).astype(jnp.float32)
    N = logits.shape[0]
    col = (jax.lax.broadcasted_iota(jnp.int32, (N, tile), 1)
           + g * tile)
    logits = jnp.where(col < V, logits, NEG)

    @pl.when(g == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        s_ref[...] = jnp.zeros_like(s_ref)
        topv_ref[...] = jnp.full_like(topv_ref, NEG)
        topi_ref[...] = jnp.full(topi_ref.shape, BIG_ID,
                                 topi_ref.dtype)

    # flash logsumexp update
    tmax = jnp.max(logits, axis=1, keepdims=True)    # [N, 1]
    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, tmax)
    safe = jnp.where(m_new == NEG, 0.0, m_new)
    s_ref[...] = (s_ref[...] * jnp.exp(m_old - safe)
                  + jnp.sum(jnp.exp(logits - safe), axis=1,
                            keepdims=True))
    m_ref[...] = m_new

    # online top-k over selection-eligible columns
    sel = jnp.where(col < sel_limit, logits, NEG)
    tv, ti = _tile_topk(sel, col, k)
    nv, ni = _merge_topk(topv_ref[...], topi_ref[...], tv, ti, k)
    topv_ref[...] = nv
    topi_ref[...] = ni

    @pl.when(g == n_tiles - 1)
    def _():
        m = m_ref[...]
        lse = jnp.where(m == NEG, NEG,
                        m + jnp.log(jnp.maximum(s_ref[...], 1e-38)))
        lse_ref[...] = lse


@functools.partial(jax.jit,
                   static_argnames=("k", "sel_limit", "tile",
                                    "interpret"))
def band_topk_lse(x: jax.Array, table: jax.Array, k: int,
                  sel_limit: int | None = None, tile: int = 2048,
                  interpret: bool = False):
    """Fused top-k + logsumexp of `x @ table.T` along the table rows.

    x: [N, D]; table: [V, D]. Returns (top_vals [N, k] fp32 raw
    logits, top_ids [N, k] int32, lse [N, 1] fp32). Top-k considers
    only ids < sel_limit (default V); lse covers ALL rows (the
    adaptive head band's class slots join the softmax but are never
    selectable).
    """
    N, D = x.shape
    V = table.shape[0]
    if sel_limit is None:
        sel_limit = V
    n_tiles = pl.cdiv(V, tile)
    pad = n_tiles * tile - V
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))
    kernel = functools.partial(
        _band_kernel, k=k, V=V, sel_limit=sel_limit, tile=tile,
        n_tiles=n_tiles)
    topv, topi, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, k), jnp.float32),
            jax.ShapeDtypeStruct((N, k), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((N, D), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, k), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, k), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, 1), jnp.float32),   # running max
            pltpu.VMEM((N, 1), jnp.float32),   # running sumexp
        ],
        interpret=interpret,
    )(x, table)
    return topv, topi, lse
