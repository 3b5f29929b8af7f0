"""Multi-head attention with separate key/value input dims.

Capability parity target: the fairseq-style MultiHeadAttention of
/root/reference/ttl/tell/modules/attention/multi_head.py:207-552
(separate kdim/vdim projections, learned bias_k/bias_v extra slot,
add_zero_attn slot, key-padding masks, static-KV caching for
encoder-decoder attention).

TPU-first design decisions:
- batch-first [B, T, E] layout (the reference's TBC layout is a GPU
  kernel artifact);
- static ("encoder-decoder") K/V are precomputed ONCE per sequence /
  generation via `precompute_kv` and reused every decode step — the
  reference recomputes the K/V projections on every step
  (multi_head.py:288-352 with incremental_state=None at the call site
  decoder_flattened.py:300-325);
- softmax in float32 regardless of compute dtype;
- everything shaped so head and feature dims map onto the MXU lanes.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from news_image_caption_tpu.ops.dropout import dropout

from news_image_caption_tpu.ops.linear import XavierLinear

Dtype = Any

NEG_INF = -1e9


class AttentionKV(NamedTuple):
    """Precomputed projected keys/values for static cross-attention.

    k, v: [B, S', H, D] where S' = S (+1 bias slot) (+1 zero slot).
    mask: [B, S'] True where the slot is attendable.
    """

    k: jax.Array
    v: jax.Array
    mask: Optional[jax.Array]


class MultiHeadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    kdim: Optional[int] = None
    vdim: Optional[int] = None
    dropout: float = 0.0
    use_bias: bool = True
    add_bias_kv: bool = True
    add_zero_attn: bool = True
    param_dtype: Dtype = jnp.float32
    dtype: Optional[Dtype] = None

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def setup(self):
        assert self.embed_dim % self.num_heads == 0
        self.q_proj = XavierLinear(self.embed_dim, use_bias=self.use_bias,
                                   param_dtype=self.param_dtype, name="q_proj")
        self.k_proj = XavierLinear(self.embed_dim, use_bias=self.use_bias,
                                   param_dtype=self.param_dtype, name="k_proj")
        self.v_proj = XavierLinear(self.embed_dim, use_bias=self.use_bias,
                                   param_dtype=self.param_dtype, name="v_proj")
        self.out_proj = XavierLinear(self.embed_dim, use_bias=self.use_bias,
                                     param_dtype=self.param_dtype,
                                     name="out_proj")
        if self.add_bias_kv:
            self.bias_k = self.param(
                "bias_k", nn.initializers.xavier_normal(),
                (1, 1, self.embed_dim), self.param_dtype)
            self.bias_v = self.param(
                "bias_v", nn.initializers.xavier_normal(),
                (1, 1, self.embed_dim), self.param_dtype)

    def precompute_kv(self, key: jax.Array, value: jax.Array,
                      key_padding_mask: Optional[jax.Array] = None
                      ) -> AttentionKV:
        """Project keys/values once; append bias and zero slots.

        key/value: [B, S, kdim]; key_padding_mask: [B, S] with True = PAD
        (reference convention). The returned mask uses True = attendable.
        """
        B, S, _ = key.shape
        k = self.k_proj(key)
        v = self.v_proj(value)
        valid = (jnp.ones((B, S), dtype=bool) if key_padding_mask is None
                 else ~key_padding_mask)
        if self.add_bias_kv:
            bk = jnp.broadcast_to(self.bias_k.astype(k.dtype),
                                  (B, 1, self.embed_dim))
            bv = jnp.broadcast_to(self.bias_v.astype(v.dtype),
                                  (B, 1, self.embed_dim))
            k = jnp.concatenate([k, bk], axis=1)
            v = jnp.concatenate([v, bv], axis=1)
            valid = jnp.concatenate(
                [valid, jnp.ones((B, 1), dtype=bool)], axis=1)
        if self.add_zero_attn:
            k = jnp.concatenate(
                [k, jnp.zeros((B, 1, self.embed_dim), k.dtype)], axis=1)
            v = jnp.concatenate(
                [v, jnp.zeros((B, 1, self.embed_dim), v.dtype)], axis=1)
            valid = jnp.concatenate(
                [valid, jnp.ones((B, 1), dtype=bool)], axis=1)
        Sp = k.shape[1]
        k = k.reshape(B, Sp, self.num_heads, self.head_dim)
        v = v.reshape(B, Sp, self.num_heads, self.head_dim)
        return AttentionKV(k=k, v=v, mask=valid)

    def attend(self, query: jax.Array, kv: AttentionKV,
               attn_mask: Optional[jax.Array] = None,
               deterministic: bool = True,
               need_weights: bool = False):
        """Attention of query [B, T, E] over precomputed kv.

        attn_mask: optional [T, S'] additive mask (-inf for disallowed),
        already sized for the bias/zero slots (use `extend_attn_mask`).
        Returns (output [B, T, E], attn_weights [B, T, S'] or None) —
        weights averaged over heads like the reference.
        """
        B, T, _ = query.shape
        q = self.q_proj(query).reshape(B, T, self.num_heads, self.head_dim)
        q = q * (self.head_dim ** -0.5)
        # [B, H, T, S']
        scores = jnp.einsum("bthd,bshd->bhts", q, kv.k,
                            preferred_element_type=jnp.float32)
        if attn_mask is not None:
            scores = scores + attn_mask[None, None, :, :]
        if kv.mask is not None:
            scores = jnp.where(kv.mask[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        probs = probs.astype(kv.v.dtype)
        if self.dropout > 0.0 and not deterministic:
            probs = dropout(self, probs, self.dropout, deterministic=False)
        out = jnp.einsum("bhts,bshd->bthd", probs, kv.v)
        out = out.reshape(B, T, self.embed_dim)
        out = self.out_proj(out)
        weights = probs.mean(axis=1) if need_weights else None
        return out, weights

    def attend_flat_beam(self, query: jax.Array, kv: AttentionKV,
                         beam: int, deterministic: bool = True
                         ) -> jax.Array:
        """Beam-folded single-step attention with SHARED K/V.

        query: [B*beam, E] (beam-major within each batch item);
        kv: precomputed for the UNtiled batch B. Avoids replicating
        the context K/V `beam` times — the dominant HBM traffic of
        beam decoding (each step re-reads all context K/V).
        Returns [B*beam, E].
        """
        BK, E = query.shape
        B = BK // beam
        H, hd = self.num_heads, self.head_dim
        q = self.q_proj(query).reshape(B, beam, H, hd)
        q = q * (hd ** -0.5)
        scores = jnp.einsum("bkhd,bshd->bhks", q, kv.k,
                            preferred_element_type=jnp.float32)
        if kv.mask is not None:
            scores = jnp.where(kv.mask[:, None, None, :], scores,
                               NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        probs = probs.astype(kv.v.dtype)
        if self.dropout > 0.0 and not deterministic:
            probs = dropout(self, probs, self.dropout,
                            deterministic=False)
        out = jnp.einsum("bhks,bshd->bkhd", probs, kv.v)
        return self.out_proj(out.reshape(BK, E))

    def __call__(self, query: jax.Array, key: jax.Array, value: jax.Array,
                 key_padding_mask: Optional[jax.Array] = None,
                 attn_mask: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 need_weights: bool = False):
        """One-shot attention (projects K/V then attends)."""
        kv = self.precompute_kv(key, value, key_padding_mask)
        return self.attend(query, kv, attn_mask=attn_mask,
                           deterministic=deterministic,
                           need_weights=need_weights)

    def extra_slots(self) -> int:
        return int(self.add_bias_kv) + int(self.add_zero_attn)


def extend_attn_mask(attn_mask: jax.Array, extra_slots: int) -> jax.Array:
    """Append zero (allowed) columns for bias/zero-attn slots."""
    if extra_slots == 0:
        return attn_mask
    T = attn_mask.shape[0]
    pad = jnp.zeros((T, extra_slots), attn_mask.dtype)
    return jnp.concatenate([attn_mask, pad], axis=1)


def causal_mask(T: int, dtype=jnp.float32) -> jax.Array:
    """[T, T] additive causal mask (0 allowed, -inf future)."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    return jnp.where(j <= i, 0.0, NEG_INF).astype(dtype)
