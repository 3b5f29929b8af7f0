"""Ring attention: exact sequence-parallel attention over a mesh axis.

The reference bounds articles to 512 BPE tokens, so its encoder never
needs sequence parallelism (SURVEY.md §2.10) — but long-article
variants do, and `parallel/sequence.py`'s sharding-constraint hook
only partitions the FLOPs, not the softmax: XLA still materializes
full [B, H, S, S] score tiles per device and all-gathers K/V.

This module implements the real thing: blockwise online-softmax
attention (the flash-attention recurrence) where each device holds a
sequence shard of Q, K and V, and the K/V blocks rotate around the
`context` axis via `lax.ppermute` (one ICI hop per step). Memory per
device drops from O(S^2) scores to O(S * S/c), communication is the
K/V stream itself, and the result is mathematically identical to
dense attention — the online rescaling is exact, not an
approximation (fp reassociation only; tests pin ~1e-6 in fp32).

Everything is plain JAX (ppermute has a transpose rule), so the same
code path is differentiable and usable in training.

Layout contract matches `models/roberta.py::RobertaLayer`:
q/k/v are [B, S, heads, head_dim], pad_mask is [B, S] with True =
attend. Masked positions get the dense path's -1e9 fill (NOT -inf),
so a fully-padded row degrades to the same uniform average the dense
softmax produces, and no NaNs can appear mid-ring.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from news_image_caption_tpu.parallel.mesh import CONTEXT_AXIS, DATA_AXIS

_MASK_FILL = -1e9   # same fill as the dense path (roberta.py:57)


def _ring_local(q, k, v, pad_mask, *, axis_name: str, scale: float):
    """Per-shard body (runs under shard_map).

    q, k, v: [B, S_loc, H, D] local sequence shards.
    pad_mask: [B, S_loc] bool, True = attend (keys side).
    Returns the local shard of the attention output, [B, S_loc, H, D].
    """
    n = jax.lax.axis_size(axis_name)
    B, S, H, D = q.shape
    in_dtype = v.dtype

    # Online-softmax carries, fp32: running max m, normalizer l,
    # unnormalized output o.
    m = jnp.full((B, H, S), -jnp.inf, dtype=jnp.float32)
    l = jnp.zeros((B, H, S), dtype=jnp.float32)
    o = jnp.zeros((B, S, H, D), dtype=jnp.float32)

    perm = [(j, (j + 1) % n) for j in range(n)]
    for step in range(n):          # n is static (mesh size); unrolled
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(pad_mask[:, None, None, :], s, _MASK_FILL)
        m_blk = jnp.max(s, axis=-1)                    # [B,H,S]
        m_new = jnp.maximum(m, m_blk)
        # exp(-inf - finite) would be nan-safe anyway (0.0), but the
        # very first block can leave m_new at -1e9 (fully masked);
        # never at -inf because _MASK_FILL is finite.
        alpha = jnp.where(jnp.isinf(m), 0.0, jnp.exp(m - m_new))
        p = jnp.exp(s - m_new[..., None])              # [B,H,t,s]
        l = l * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhts,bshd->bthd", p.astype(in_dtype), v,
                        preferred_element_type=jnp.float32)
        o = o * alpha.transpose(0, 2, 1)[..., None] + pv
        m = m_new
        if step < n - 1:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)
            pad_mask = jax.lax.ppermute(pad_mask, axis_name, perm)

    out = o / l.transpose(0, 2, 1)[..., None]
    return out.astype(in_dtype)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   pad_mask: jax.Array, mesh: Mesh, *,
                   axis_name: str = CONTEXT_AXIS,
                   batch_axis: Optional[str] = DATA_AXIS,
                   scale: Optional[float] = None) -> jax.Array:
    """Sequence-parallel multi-head attention on global arrays.

    q/k/v: [B, S, heads, head_dim]; pad_mask: [B, S] (True = attend).
    S shards over `axis_name`, B over `batch_axis` (if present); any
    other mesh axes see replicated data. Output matches
    softmax(q·k^T/sqrt(d) masked) · v exactly (up to fp32
    reassociation) and is differentiable.
    """
    if axis_name not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no axis "
                         f"{axis_name!r}")
    if q.shape[1] % mesh.shape[axis_name]:
        raise ValueError(
            f"sequence length {q.shape[1]} not divisible by "
            f"{axis_name}={mesh.shape[axis_name]}")
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b = batch_axis if batch_axis in mesh.axis_names else None
    qspec = P(b, axis_name, None, None)
    mspec = P(b, axis_name)
    f = jax.shard_map(
        partial(_ring_local, axis_name=axis_name, scale=scale),
        mesh=mesh, in_specs=(qspec, qspec, qspec, mspec),
        out_specs=qspec, check_vma=False)
    return f(q, k, v, pad_mask)


def dense_reference(q, k, v, pad_mask, scale=None):
    """The unsharded computation ring_attention must reproduce
    (identical to RobertaLayer's inline attention)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(pad_mask[:, None, None, :], s, _MASK_FILL)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, v)
