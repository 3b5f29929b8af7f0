"""Adaptive input embeddings and adaptive softmax, TPU-dense style.

Capability parity targets:
- AdaptiveEmbedding (Baevski & Auli adaptive inputs):
  /root/reference/ttl/tell/modules/token_embedders/adaptive.py:11-80
- AdaptiveSoftmax (Grave et al.) + TiedHeadModule/TiedLinear tying:
  /root/reference/ttl/tell/modules/softmax.py:11-222
- adaptive_loss criterion:
  /root/reference/ttl/tell/modules/criteria/adaptive_loss.py:10-91

TPU-first design: the reference selects tail-cluster positions with
data-dependent `index_select` (softmax.py:184-190) — shape-dynamic and
hostile to XLA. Here every cluster's logits are computed *densely* for
all positions with masked cross-entropy; cutoffs like [5000, 20000]
keep the head tiny, and the band matmuls are large static matmuls that
tile perfectly onto the MXU. Loss values match the reference bitwise-
close (same log-softmax decomposition, same masking quirks — including
ignoring in-band target == padding_idx, a faithful reproduction of the
reference's per-cluster `ignore_index` behavior).

Weight tying (`tie_adaptive_weights`) shares each band's embedding
table between the input embedder and the softmax output layer; pass
the embedder's variables to `AdaptiveSoftmax` via module sharing (the
decoder constructs both and feeds `embed_tables` explicitly).
"""

from __future__ import annotations

import math
from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from news_image_caption_tpu.ops.dropout import dropout

Dtype = Any


class QuantTable(NamedTuple):
    """int8-quantized word table for the DECODE head (opt-in).

    Decode is bandwidth-bound and the adaptive head streams the three
    band tables (~100 MB bf16 at the flagship sizes) every step. The
    proven quantize-the-stream recipe from the int8 KV cache
    (ops/attention.py QuantDecodeKV) applied to the tables: int8
    storage halves the stream; the per-ROW (per vocab word) scale
    factors out of the logits matmul — logits[n, v] =
    scale[v] · (x @ q[v]ᵀ) — so dequantization is a fused epilogue
    multiply and the int8→bf16 convert fuses into the dot operand.
    Accuracy: ~0.4% RMS on each word row; selection can differ near
    ties, so this is opt-in (GenerationConfig.quantize_head), NOT the
    exact path. Reference analog: the fp16 tables the reference
    streams under apex O2 (softmax.py:193-222 + apex cast).

    q [band_v, d] int8; scale [band_v] (compute dtype).
    """

    q: jax.Array
    scale: jax.Array


def quantize_embed_tables(embed_tables):
    """[(table, proj)] -> [(QuantTable, proj)] (per-row symmetric)."""
    out = []
    for table, proj in embed_tables:
        t32 = table.astype(jnp.float32)
        amax = jnp.max(jnp.abs(t32), axis=1, keepdims=True)
        # Quantize with the SAME scale dequantization will multiply by
        # (rounded to the table dtype first) — a fp32-quant/bf16-dequant
        # mismatch would roughly double the RMS logit error.
        scale = ((jnp.maximum(amax, 1e-8) / 127.0)
                 .astype(table.dtype).astype(jnp.float32))
        q = jnp.clip(jnp.round(t32 / scale), -127, 127).astype(jnp.int8)
        out.append((QuantTable(q=q, scale=scale[:, 0].astype(
            table.dtype)), proj))
    return out


def _word_logits(x, table, dtype):
    """x [N, d] @ tableᵀ [d, band_v] with optional int8 dequant."""
    if isinstance(table, QuantTable):
        raw = jnp.dot(x, table.q.T.astype(x.dtype),
                      preferred_element_type=dtype)
        return raw * table.scale[None, :].astype(raw.dtype)
    return jnp.dot(x, table.T.astype(x.dtype),
                   preferred_element_type=dtype)


def band_ranges(cutoff: Sequence[int]) -> List[Tuple[int, int]]:
    """[(lo, hi)] for each band. cutoff includes the final vocab size."""
    out = []
    prev = 0
    for c in cutoff:
        out.append((prev, c))
        prev = c
    return out


class AdaptiveEmbedding(nn.Module):
    """Variable-capacity input embedding over vocab frequency bands."""

    cutoff: Sequence[int]          # ends with vocab_size, e.g. (5000, 20000, 50265)
    initial_dim: int
    output_dim: int
    factor: float = 1.0
    padding_idx: int = 0
    scale_embeds: bool = False
    param_dtype: Dtype = jnp.float32
    dtype: Dtype = jnp.float32

    def band_dim(self, i: int) -> int:
        return int(self.initial_dim // (self.factor ** i))

    def setup(self):
        tables = []
        projs = []
        for i, (lo, hi) in enumerate(band_ranges(self.cutoff)):
            band_v = hi - lo
            d = self.band_dim(i)

            def emb_init(key, shape, dtype, _d=d):
                std = math.sqrt(1.0 / _d)
                w = jax.random.normal(key, shape, dtype) * std
                return w.at[self.padding_idx].set(0.0)

            tables.append(self.param(f"embed_{i}", emb_init,
                                     (band_v, d), self.param_dtype))
            projs.append(self.param(f"proj_{i}",
                                    nn.initializers.xavier_uniform(),
                                    (d, self.output_dim), self.param_dtype))
        self.tables = tables
        self.projs = projs

    def __call__(self, token_ids: jax.Array) -> jax.Array:
        """token_ids [...] -> embeddings [..., output_dim] (dense-masked)."""
        out = jnp.zeros(token_ids.shape + (self.output_dim,), self.dtype)
        for i, (lo, hi) in enumerate(band_ranges(self.cutoff)):
            in_band = (token_ids >= lo) & (token_ids < hi)
            idx = jnp.clip(token_ids - lo, 0, hi - lo - 1)
            e = jnp.take(self.tables[i], idx, axis=0).astype(self.dtype)
            e = jnp.dot(e, self.projs[i].astype(self.dtype),
                        preferred_element_type=self.dtype)
            out = out + jnp.where(in_band[..., None], e, 0.0)
        if self.scale_embeds:
            out = out * math.sqrt(self.output_dim)
        return out

    def weights_for_band(self, i: int):
        return self.tables[i], self.projs[i]


class AdaptiveSoftmax(nn.Module):
    """Hierarchical softmax head with optional weight tying.

    When `embed_tables` is passed at call time (a list of per-band
    (table, proj) tuples from a tied AdaptiveEmbedding), the word
    projections reuse those tables (TiedLinear, transpose=False) and
    only the class head + tail down-projections are owned here.
    """

    vocab_size: int
    input_dim: int
    cutoff: Sequence[int]          # ends with vocab_size
    factor: float = 1.0
    dropout: float = 0.0
    tied: bool = True              # expect embed_tables at call time
    tie_proj: bool = False
    param_dtype: Dtype = jnp.float32
    dtype: Dtype = jnp.float32
    # Opt-in Pallas band-streaming decode head (see topk_log_prob).
    use_pallas_head: bool = False

    @property
    def n_tails(self) -> int:
        return len(self.cutoff) - 1

    def setup(self):
        assert self.cutoff[-1] == self.vocab_size
        if self.tie_proj and not self.tied:
            raise ValueError("tie_proj requires tied embeddings "
                             "(embed_tables at call time)")
        self.class_proj = self.param(
            "class_proj", nn.initializers.xavier_uniform(),
            (self.input_dim, self.n_tails), self.param_dtype)
        # Tail down-projections input_dim -> band output dim; with tied
        # embeddings the target dim is the embed table's dim. With
        # tie_proj the projections are the embedder's band projections
        # TRANSPOSED (reference TiedLinear(tied_proj, transpose=True),
        # softmax.py:119-120) — no parameters owned here.
        if self.tie_proj:
            self.tail_projs = []
        else:
            tail_projs = []
            for i in range(1, len(self.cutoff)):
                d = int(self.input_dim // (self.factor ** i))
                tail_projs.append(self.param(
                    f"tail_proj_{i}", nn.initializers.xavier_uniform(),
                    (self.input_dim, d), self.param_dtype))
            self.tail_projs = tail_projs
        # Untied word tables (only when weights are not tied to the
        # input embedder — avoids allocating a dead full-vocab table).
        if not self.tied:
            self.untied_head = self.param(
                "untied_head", nn.initializers.xavier_uniform(),
                (self.input_dim, self.cutoff[0]), self.param_dtype)
            untied_tails = []
            for i in range(1, len(self.cutoff)):
                d = int(self.input_dim // (self.factor ** i))
                untied_tails.append(self.param(
                    f"untied_tail_{i}", nn.initializers.xavier_uniform(),
                    (d, self.cutoff[i] - self.cutoff[i - 1]),
                    self.param_dtype))
            self.untied_tails = untied_tails

    def head_logits(self, x: jax.Array, embed_tables=None,
                    out_dtype=None) -> jax.Array:
        """x [N, D] -> [N, cutoff0 + n_tails]."""
        dtype = out_dtype or self.dtype
        if embed_tables is not None:
            table0, _ = embed_tables[0]   # [c0, D]
            word = _word_logits(x, table0, dtype)
        else:
            word = jnp.dot(x, self.untied_head.astype(x.dtype),
                           preferred_element_type=dtype)
        cls = jnp.dot(x, self.class_proj.astype(x.dtype),
                      preferred_element_type=dtype)
        return jnp.concatenate([word, cls], axis=-1)

    def tail_hidden(self, x: jax.Array, i: int,
                    deterministic: bool = True,
                    embed_tables=None) -> jax.Array:
        """Factor-shrunk projection of x for tail band i (1-based) —
        the single definition both the XLA and Pallas paths use.
        With tie_proj, the projection is the embedder's band-i
        projection transposed (shape [d_i, D] -> apply as x @ projᵀ,
        matching the reference's TiedLinear(tied_proj, transpose=True))."""
        if self.tie_proj:
            if embed_tables is None:
                raise ValueError("tie_proj needs embed_tables")
            proj = embed_tables[i][1]            # [d_i, D]
            h = jnp.dot(x, proj.T.astype(x.dtype),
                        preferred_element_type=self.dtype)
        else:
            h = jnp.dot(x, self.tail_projs[i - 1].astype(x.dtype),
                        preferred_element_type=self.dtype)
        if self.dropout > 0.0 and not deterministic:
            h = dropout(self, h, self.dropout, deterministic=False)
        return h

    def tail_logits(self, x: jax.Array, i: int, embed_tables=None,
                    deterministic: bool = True,
                    out_dtype=None) -> jax.Array:
        """x [N, D] -> logits over band i's words. i is 1-based tail index."""
        dtype = out_dtype or self.dtype
        h = self.tail_hidden(x, i, deterministic=deterministic,
                             embed_tables=embed_tables)
        if embed_tables is not None:
            table_i, _ = embed_tables[i]  # [band_v, d]
            return _word_logits(h, table_i, dtype)
        return jnp.dot(h, self.untied_tails[i - 1].astype(h.dtype),
                       preferred_element_type=dtype)

    def loss_sum(self, x: jax.Array, target: jax.Array,
                 padding_idx: int = 1, embed_tables=None,
                 deterministic: bool = True):
        """Summed adaptive CE loss + token count.

        x: [N, D] decoder outputs (already flattened over batch*time);
        target: [N] token ids. Returns (loss_sum_f32, ntokens_i32).

        Matches the reference decomposition: head CE with tail targets
        remapped to class slots c0+i, plus per-tail in-band CE, each
        with `ignore_index=padding_idx` (including the in-band quirk).
        """
        c0 = self.cutoff[0]
        ranges = band_ranges(self.cutoff)

        def band_nll(logits, tgt):
            # NLL via logsumexp - gather instead of log_softmax +
            # gather: mathematically identical (same max-shift), but
            # the [N, band_v] tensor is consumed ONLY by reductions
            # and a one-column gather — no band-wide elementwise
            # output ever materializes, so XLA fuses the softmax
            # passes into the logits matmul's consumers instead of
            # round-tripping ~856 MB of fp32 log-probs per step
            # through HBM (B=64 flagship; the r03 profile's
            # "adaptive head ~60% MXU" remainder).
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            picked = jnp.take_along_axis(
                logits, tgt[:, None], axis=1)[:, 0]
            return lse - picked

        # Head: remap tail targets to class slots.
        head_target = target
        for i, (lo, hi) in enumerate(ranges[1:]):
            in_band = (target >= lo) & (target < hi)
            head_target = jnp.where(in_band, c0 + i, head_target)
        head_nll = band_nll(
            self.head_logits(x, embed_tables).astype(jnp.float32),
            head_target)
        head_valid = head_target != padding_idx
        loss = jnp.sum(jnp.where(head_valid, head_nll, 0.0))
        # Tails: dense logits, masked CE per band.
        for i, (lo, hi) in enumerate(ranges[1:], start=1):
            in_band = (target >= lo) & (target < hi)
            tgt_in = jnp.clip(target - lo, 0, hi - lo - 1)
            nll = band_nll(
                self.tail_logits(x, i, embed_tables,
                                 deterministic).astype(jnp.float32),
                tgt_in)
            valid = in_band & (tgt_in != padding_idx)  # faithful quirk
            loss = loss + jnp.sum(jnp.where(valid, nll, 0.0))
        ntokens = jnp.sum((target != padding_idx).astype(jnp.int32))
        return loss, ntokens

    def topk_log_prob(self, x: jax.Array, k: int, embed_tables=None
                      ) -> Tuple[jax.Array, jax.Array]:
        """EXACT top-k full-vocab log-probs without materializing [N, V].

        Decode-time selection (greedy/top-k sampling/beam) only needs
        the k best tokens per row. The adaptive factorization makes
        that cheap: the global top-k is contained in the union of the
        per-band top-k (head words; each tail shifted by its class
        prior), so one top_k per band (≤30k wide) plus a k·n_bands-wide
        merge replaces the [N, V] concat + V-wide top_k — measured
        ~1.4 ms/step for the flat top_k at beam width 320 on v5e
        (benchmarks/topk_bench.py).

        Returns (log_probs [N, k], token_ids [N, k]) sorted best-first.
        """
        # NOTE (v5e, 2026-08-16): a "raw logits + per-band logsumexp"
        # variant (normalize only the k winners, skip the band-wide
        # log_softmax) measured SLOWER end-to-end than this form
        # (148.6 vs 159.7 captions/s at beam width 320): the fp32
        # matmul outputs double the logits write traffic and XLA fuses
        # the band log_softmax into the matmul epilogue anyway. Kept
        # the fused-log_softmax form as the XLA path. The fused
        # band-streaming Pallas kernel wins in ISOLATION (0.764 vs
        # 0.885 ms/step, benchmarks/head_bench.py) but regresses the
        # full decode loop (pallas_call is a fusion barrier — the
        # neighboring XLA fusions fragment), so it is opt-in.
        if (self.use_pallas_head and jax.default_backend() == "tpu"
                and embed_tables is not None
                and not any(isinstance(t, QuantTable)
                            for t, _ in embed_tables)):
            # int8 tables (quantize_head) take the XLA dequant path —
            # the Pallas kernel streams raw fp/bf16 tables only.
            return self._topk_log_prob_pallas(x, k, embed_tables)
        from news_image_caption_tpu.ops.topk import exact_topk
        c0 = self.cutoff[0]
        # Band log-probs materialize in the compute dtype (softmax
        # itself in fp32): halves the ~50k-wide fp32 copies the
        # tournament re-reads, and matches the reference's AMP
        # get_log_prob (fairseq emits fp16 log-probs under apex O2).
        # Selection order is unchanged (monotone cast); the k winners'
        # values re-enter beam scoring in fp32.
        out_dt = x.dtype
        hlog = jax.nn.log_softmax(
            self.head_logits(x, embed_tables).astype(jnp.float32),
            axis=-1).astype(out_dt)
        hv, hi = exact_topk(hlog[:, :c0], k)
        vals = [hv.astype(jnp.float32)]
        ids = [hi.astype(jnp.int32)]
        for i in range(1, len(self.cutoff)):
            prior = hlog[:, c0 + i - 1][:, None].astype(jnp.float32)
            tlog = jax.nn.log_softmax(
                self.tail_logits(x, i, embed_tables).astype(jnp.float32),
                axis=-1).astype(out_dt)
            tv, ti = exact_topk(tlog, k)
            # Round the prior-shifted value to the compute dtype like
            # log_prob's materialized `tlog + prior` (bf16 add) — the
            # "exact top-k of the materialized [N, V] log-probs"
            # contract then holds bit-true for bf16 models too (a
            # fp32 sum here could order cross-band near-ties
            # differently than the rounded matrix).
            shifted = (tv.astype(jnp.float32) + prior).astype(
                out_dt).astype(jnp.float32)
            vals.append(shifted)
            ids.append(ti.astype(jnp.int32) + self.cutoff[i - 1])
        allv = jnp.concatenate(vals, axis=-1)          # [N, bands*k]
        alli = jnp.concatenate(ids, axis=-1)
        v, j = jax.lax.top_k(allv, k)
        return v, jnp.take_along_axis(alli, j, axis=-1)

    def _topk_log_prob_pallas(self, x: jax.Array, k: int,
                              embed_tables):
        """TPU path: fused band-streaming topk+lse kernel per band
        (ops/pallas_topk.py). Band logits stay in VMEM; HBM traffic is
        one read of each band's table."""
        from news_image_caption_tpu.ops.pallas_topk import band_topk_lse
        c0 = self.cutoff[0]
        table0, _ = embed_tables[0]
        t0 = table0.astype(x.dtype)
        clsw = self.class_proj.astype(x.dtype)         # [D, n_tails]
        head_tab = jnp.concatenate([t0, clsw.T], axis=0)
        hv, hi, lse_h = band_topk_lse(x, head_tab, k, sel_limit=c0)
        # Class-slot logits for the tail priors (same bf16 rounding
        # point as the kernel's in-band rows).
        cls_l = jnp.dot(x, clsw).astype(jnp.float32)   # [N, n_tails]
        vals, ids = [hv - lse_h], [hi]
        for i in range(1, len(self.cutoff)):
            h = self.tail_hidden(x, i, embed_tables=embed_tables)
            table_i, _ = embed_tables[i]
            tv, ti, lse_t = band_topk_lse(h, table_i.astype(h.dtype),
                                          k)
            prior = cls_l[:, i - 1][:, None] - lse_h
            vals.append(tv - lse_t + prior)
            ids.append(ti + self.cutoff[i - 1])
        allv = jnp.concatenate(vals, axis=-1)
        alli = jnp.concatenate(ids, axis=-1)
        v, j = jax.lax.top_k(allv, k)
        return v, jnp.take_along_axis(alli, j, axis=-1)

    def log_prob(self, x: jax.Array, embed_tables=None) -> jax.Array:
        """Full-vocab log-probs for generation. x [N, D] -> [N, V].

        Softmax math in fp32; the [N, V] result materializes in the
        COMPUTE dtype (AMP-faithful: fairseq's get_log_prob emits fp16
        under apex O2) — halves the full-vocab traffic of the
        pointer/shift decode paths for bf16 models; fp32 unchanged.
        """
        c0 = self.cutoff[0]
        out_dt = x.dtype
        hlog = jax.nn.log_softmax(
            self.head_logits(x, embed_tables).astype(jnp.float32),
            axis=-1).astype(out_dt)
        parts = [hlog[:, :c0]]
        for i in range(1, len(self.cutoff)):
            prior = hlog[:, c0 + i - 1][:, None]
            tlog = jax.nn.log_softmax(
                self.tail_logits(x, i, embed_tables).astype(jnp.float32),
                axis=-1).astype(out_dt)
            parts.append(tlog + prior)
        return jnp.concatenate(parts, axis=-1)
