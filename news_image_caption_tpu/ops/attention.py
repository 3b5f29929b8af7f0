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


class DecodeKV(NamedTuple):
    """Decode-layout K/V: head-major, matmul-ready.

    kT: [B, H, D, S'], vT: [B, H, S', D], mask: [B, S'].
    The per-step score/out einsums over this layout are clean batched
    matmuls with no transposing contractions — the [B, S', H, D]
    layout's score fusion streams K at ~half HBM roofline on v5e
    (0.175 ms per 67 MB; benchmarks/beam_profile.py). Convert ONCE per
    generation with `to_decode_kv` (outside the decode scan), never
    per step.
    """

    kT: jax.Array
    vT: jax.Array
    mask: Optional[jax.Array]


class QuantDecodeKV(NamedTuple):
    """int8-quantized decode K/V (per-key-vector symmetric scales).

    Decode is bound by the context K/V streams (~590 MB/step at batch
    64; this chip's measured HBM bandwidth is ~390 GB/s — see
    BASELINE.md). int8 storage halves that stream; the scales factor
    OUT of both contractions (scale_k multiplies the scores, scale_v
    multiplies the probs), so dequantization adds only two small
    row-wise multiplies and the int8->bf16 convert fuses into the dot
    operands. Accuracy: ~0.5% RMS on K/V rows — captions can differ
    from exact bf16 decoding; opt-in (`GenerationConfig.quantize_kv`).

    kT_q [B, H, D, S'] int8, k_scale [B, H, 1, S'];
    vT_q [B, H, S', D] int8, v_scale [B, H, S', 1]; mask [B, S'].
    """

    kT_q: jax.Array
    k_scale: jax.Array
    vT_q: jax.Array
    v_scale: jax.Array
    mask: Optional[jax.Array]


def _quantize_rows(x: jax.Array, axis: int):
    """Symmetric int8 quantization along `axis` (the head_dim)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis,
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(x.dtype)


def to_decode_kv(kv: AttentionKV, quantize: bool = False):
    """One-time layout conversion for the incremental-decode path."""
    kT = jnp.transpose(kv.k, (0, 2, 3, 1))
    vT = jnp.transpose(kv.v, (0, 2, 1, 3))
    if not quantize:
        return DecodeKV(kT=kT, vT=vT, mask=kv.mask)
    kq, ks = _quantize_rows(kT, axis=2)
    vq, vs = _quantize_rows(vT, axis=3)
    return QuantDecodeKV(kT_q=kq, k_scale=ks, vT_q=vq, v_scale=vs,
                         mask=kv.mask)


def decode_kv_tree(kvs, quantize: bool = False):
    """`to_decode_kv` over any nesting of AttentionKV leaves."""
    return jax.tree.map(lambda kv: to_decode_kv(kv, quantize), kvs,
                        is_leaf=lambda x: isinstance(x, AttentionKV))


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
    # Compute dtype follows the ACTIVATIONS (the decoder casts its
    # stream once); there is deliberately no per-module dtype knob.
    # Fused flash-style kernel for the FULL-SEQUENCE (train /
    # teacher-forced) path: the softmax(qk+bias)->dropout->v chain
    # runs tile-resident per (batch, head) with in-kernel PRNG
    # dropout, so no [B,H,T,S] scores/probs/mask ever hit HBM
    # (ops/pallas_flash.py). Single-chip TPU only (wrap in shard_map
    # to use under a mesh); falls back to the XLA chain on other
    # backends, when attention weights are requested, or when an
    # additive attn_mask is passed. flash_interpret runs the kernel
    # in interpreter mode (CPU tests).
    use_flash: bool = False
    flash_interpret: bool = False

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
        if (self.use_flash and not need_weights and attn_mask is None
                and isinstance(kv, AttentionKV) and T > 1
                and (self.flash_interpret
                     or jax.default_backend() == "tpu")):
            from news_image_caption_tpu.ops.pallas_flash import (
                flash_cross_attention, supported_head_dim)
            if self.flash_interpret or supported_head_dim(
                    self.head_dim, self.num_heads):
                # Flat [B, T, E] / [B, S, E] layouts straight from
                # the projections — no transposes (see
                # ops/pallas_flash.py design notes).
                S = kv.k.shape[1]
                k_flat = kv.k.reshape(B, S, self.embed_dim)
                v_flat = kv.v.reshape(B, S, self.embed_dim)
                q_flat = q.reshape(B, T, self.embed_dim)
                if q_flat.dtype == jnp.float16:
                    # Mosaic has no f16 type; f16 is a disk/wire
                    # format that must never reach TPU kernels
                    # (datasets promote at delivery — this guards
                    # ad-hoc ingestion paths).
                    q_flat = q_flat.astype(jnp.bfloat16)
                    k_flat = k_flat.astype(jnp.bfloat16)
                    v_flat = v_flat.astype(jnp.bfloat16)
                if kv.mask is None:
                    bias = jnp.zeros((B, S), jnp.float32)
                else:
                    bias = jnp.where(kv.mask, 0.0, NEG_INF).astype(
                        jnp.float32)
                if self.dropout > 0.0 and not deterministic:
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (1,), 0,
                        2 ** 31 - 1, dtype=jnp.int32)
                    p = self.dropout
                else:
                    seed = jnp.zeros((1,), jnp.int32)
                    p = 0.0
                out = flash_cross_attention(
                    q_flat, k_flat, v_flat, bias, seed,
                    self.num_heads, p, self.flash_interpret)
                return self.out_proj(out), None
        # NOTE (v5e, 2026-08-17): a head-major pre-transposed
        # formulation of these einsums measured IDENTICAL train
        # throughput — XLA canonicalizes both to the same HLO; the
        # per-op profile attributes K/V DMA waits to these dots, not
        # compute inefficiency (benchmarks/train_profile.py).
        # Scores materialize in the COMPUTE dtype (fp32 accumulation
        # inside the dot either way; softmax upcasts below): under
        # bf16 this halves the [B,H,T,S] intermediate traffic and
        # matches the reference's AMP semantics exactly — fairseq
        # materializes fp16 attention scores and softmaxes them in
        # fp32 (ttl/tell/utils/functional.py fp32 softmax).
        scores = jnp.einsum("bthd,bshd->bhts", q, kv.k)
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
        if isinstance(kv, QuantDecodeKV):
            # int8 K/V: converts fuse into the dot operands; the
            # per-key scales factor out of the contractions. Scores
            # materialize in the compute dtype like the exact path.
            kT = kv.kT_q.astype(q.dtype)
            scores = jnp.einsum("bkhd,bhds->bhks", q, kT)
            scores = scores * kv.k_scale.astype(scores.dtype).reshape(
                B, H, 1, -1)
            if kv.mask is not None:
                scores = jnp.where(kv.mask[:, None, None, :], scores,
                                   NEG_INF)
            S = scores.shape[-1]
            flat = scores.astype(jnp.float32).reshape(B, H * beam, S)
            probs = jax.nn.softmax(flat, axis=-1)
            probs = probs.reshape(B, H, beam, S).astype(q.dtype)
            if self.dropout > 0.0 and not deterministic:
                probs = dropout(self, probs, self.dropout,
                                deterministic=False)
            probs = probs * kv.v_scale.astype(q.dtype).reshape(
                B, H, 1, S)
            out = jnp.einsum("bhks,bhsd->bkhd", probs,
                             kv.vT_q.astype(q.dtype))
            return self.out_proj(out.reshape(BK, E))
        if isinstance(kv, DecodeKV):
            # Head-major layout: both einsums are straight batched
            # matmuls (contraction on the minor dims), no transposing
            # reductions in the per-step fusions. Scores materialize
            # in the compute dtype (fp32 accumulation inside the dot;
            # softmax upcasts below) — the reference's AMP decode
            # materializes fp16 scores the same way.
            scores = jnp.einsum("bkhd,bhds->bhks", q, kv.kT)
            if kv.mask is not None:
                scores = jnp.where(kv.mask[:, None, None, :], scores,
                                   NEG_INF)
            S = scores.shape[-1]
            # Softmax over a MERGED (head, beam) dim: [B, H, K, S] ->
            # [B, H*K, S] is a free bitcast of adjacent dims, and it
            # removes the sublane padding waste of K=5 rows (padded
            # to 8) that made these softmax fusions the single
            # biggest per-step cost (0.18 ms each at width 320 -- see
            # BASELINE.md decode anatomy).
            flat = scores.astype(jnp.float32).reshape(B, H * beam, S)
            probs = jax.nn.softmax(flat, axis=-1)
            probs = probs.reshape(B, H, beam, S).astype(kv.vT.dtype)
            if self.dropout > 0.0 and not deterministic:
                probs = dropout(self, probs, self.dropout,
                                deterministic=False)
            out = jnp.einsum("bhks,bhsd->bkhd", probs, kv.vT)
            return self.out_proj(out.reshape(BK, E))
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
        # kdim/vdim are shape CONTRACTS here, not projection sizes:
        # XavierLinear infers the K/V input width at call time (the
        # fairseq separate-kdim projection falls out for free), so
        # when a config states them we only verify they match.
        if self.kdim is not None:
            assert key.shape[-1] == self.kdim, (
                f"key dim {key.shape[-1]} != configured kdim "
                f"{self.kdim}")
        if self.vdim is not None:
            assert value.shape[-1] == self.vdim, (
                f"value dim {value.shape[-1]} != configured vdim "
                f"{self.vdim}")
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


class GatedLinear(nn.Module):
    """Weight-normalized linear stack with interspersed GLU units.

    Parity: GatedLinear at
    /root/reference/ttl/tell/modules/attention/downsampled_single_head.py:236-244
    (GehringLinear(in, 4*out) -> GLU -> GehringLinear(2*out, 2*out) ->
    GLU -> GehringLinear(out, out)).
    """

    features: int
    use_bias: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from news_image_caption_tpu.ops.linear import GehringLinear
        x = GehringLinear(self.features * 4, use_bias=self.use_bias,
                          dropout=self.dropout, name="fc1")(x)
        x = nn.glu(x, axis=-1)
        x = GehringLinear(self.features * 2, use_bias=self.use_bias,
                          dropout=self.dropout, name="fc2")(x)
        x = nn.glu(x, axis=-1)
        return GehringLinear(self.features, use_bias=self.use_bias,
                             dropout=self.dropout, name="fc3")(x)


class DownsampledMultiHeadAttention(nn.Module):
    """Strided-downsampled / gated multi-head self-attention.

    Parity: DownsampledMultiHeadAttention + SingleHeadAttention
    (/root/reference/ttl/tell/modules/attention/downsampled_multi_head.py:9-85,
    downsampled_single_head.py:12-222), the fairseq fconv-style
    self-attention kept registered by the reference. Semantics:

    - head i (downsample=True) attends only to source positions
      s ≡ 0 (mod i+1). The reference physically slices k/v per head
      (``x[::i+1]``, ragged lengths); here every head sees the full
      static-shape sequence and strided validity is applied as an
      additive score mask — identical softmax support, TPU-friendly
      fixed shapes and one batched einsum across heads.
    - strict causal masking: position t may attend to s < t only
      (the diagonal is excluded, unlike standard decoder attention).
    - use_scalar_bias prepends an "attend to nothing" slot with score
      0 and value 0 (scalar_bias.py:10-31).
    - gated=True swaps the q/k/v projections for GLU stacks
      (GatedLinear); project_input=False skips input projections.

    Inputs are batch-first [B, T, E]; returns ([B, T, out_channels],
    attention weights of head 0 [B, T, S(+1)]).
    """

    out_channels: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_bias: bool = True
    project_input: bool = True
    gated: bool = False
    downsample: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def setup(self):
        from news_image_caption_tpu.ops.linear import GehringLinear
        assert self.head_dim * self.num_heads == self.embed_dim
        proj_cls = GatedLinear if self.gated else GehringLinear
        if self.downsample:
            # Per-head projections embed_dim -> head_dim (batched as a
            # list of small modules; fused into one einsum at call).
            if self.project_input:
                self.q_projs = [proj_cls(self.head_dim, name=f"q{i}")
                                for i in range(self.num_heads)]
                self.k_projs = [proj_cls(self.head_dim, name=f"k{i}")
                                for i in range(self.num_heads)]
                self.v_projs = [proj_cls(self.head_dim, name=f"v{i}")
                                for i in range(self.num_heads)]
            self.head_out = [GehringLinear(self.head_dim, name=f"o{i}")
                             for i in range(self.num_heads)]
            self.out_proj = GehringLinear(self.out_channels,
                                          name="out_proj")
        else:
            if self.project_input:
                self.q_proj = proj_cls(self.embed_dim, name="q")
                self.k_proj = proj_cls(self.embed_dim, name="k")
                self.v_proj = proj_cls(self.embed_dim, name="v")
            self.single_out = GehringLinear(self.out_channels,
                                            name="out_proj")

    def __call__(self, query: jax.Array, key: jax.Array,
                 value: jax.Array,
                 mask_future_timesteps: bool = False,
                 key_padding_mask: Optional[jax.Array] = None,
                 use_scalar_bias: bool = False,
                 deterministic: bool = True):
        B, T, E = query.shape
        S = key.shape[1]
        H, hd = self.num_heads, self.head_dim
        scaling = hd ** -0.5

        if self.downsample:
            if self.project_input:
                q = jnp.stack([p(query) for p in self.q_projs], axis=2)
                k = jnp.stack([p(key) for p in self.k_projs], axis=2)
                v = jnp.stack([p(value) for p in self.v_projs], axis=2)
            else:
                # Unprojected inputs replicated per head at head_dim
                # slices (reference requires project_input when
                # downsampling; mirror by slicing bands).
                q = query.reshape(B, T, H, hd)
                k = key.reshape(B, S, H, hd)
                v = value.reshape(B, S, H, hd)
        else:
            if self.project_input:
                q = self.q_proj(query).reshape(B, T, H, hd)
                k = self.k_proj(key).reshape(B, S, H, hd)
                v = self.v_proj(value).reshape(B, S, H, hd)
            else:
                q = query.reshape(B, T, H, hd)
                k = key.reshape(B, S, H, hd)
                v = value.reshape(B, S, H, hd)
        q = q * scaling

        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        s_pos = jnp.arange(S)
        if self.downsample:
            # Head i sees only source positions s % (i+1) == 0.
            stride = jnp.arange(1, H + 1)[:, None]          # [H, 1]
            valid = (s_pos[None, :] % stride) == 0          # [H, S]
            scores = jnp.where(valid[None, :, None, :], scores, NEG_INF)
        if mask_future_timesteps:
            # Strict causal: attend to s < t only. In incremental
            # mode (T < S) the query rows are the LAST T positions.
            t_pos = jnp.arange(T) + (S - T)
            strict = s_pos[None, :] < t_pos[:, None]        # [T, S]
            scores = jnp.where(strict[None, None, :, :], scores, NEG_INF)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :],
                               NEG_INF, scores)
        if use_scalar_bias:
            zero_col = jnp.zeros((B, H, T, 1), scores.dtype)
            scores = jnp.concatenate([zero_col, scores], axis=-1)
            v = jnp.concatenate(
                [jnp.zeros((B, 1, H, hd), v.dtype), v], axis=1)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        # Rows with NO valid source (e.g. t=0 under strict causal
        # masking without the scalar-bias column) would softmax the
        # uniform NEG_INF scores into UNIFORM attention — a silent
        # causality/padding leak. Attend to nothing instead (the
        # reference produces NaN here; zeros are the loud-failure-free
        # equivalent).
        no_valid = jnp.all(scores <= NEG_INF / 2, axis=-1,
                           keepdims=True)
        probs = jnp.where(no_valid, 0.0, probs)
        probs = probs.astype(v.dtype)
        if self.dropout > 0.0 and not deterministic:
            from news_image_caption_tpu.ops.dropout import dropout
            probs = dropout(self, probs, self.dropout,
                            deterministic=False)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v)      # [B,T,H,hd]
        if self.downsample:
            heads = [self.head_out[i](attn[:, :, i, :])
                     for i in range(H)]
            out = self.out_proj(jnp.concatenate(heads, axis=-1))
            # Reference's downsampled branch reports head-0 weights
            # (downsampled_multi_head.py, downsample=True forward).
            attn_weights = probs[:, 0]
        else:
            out = self.single_out(attn.reshape(B, T, E))
            # Non-downsampled reference averages the per-head weights.
            attn_weights = probs.mean(axis=1)
        return out, attn_weights
