"""Dynamic-convolution caption decoder (Transform-and-Tell style).

Capability parity target: the `dynamic_conv_decoder_flattened` decoder
of /root/reference/ttl/tell/models/decoder_flattened.py:22-359 —
stack of layers, each: GLU-gated dynamic conv (causal), multi-head
attention over image patches and article hiddens, context fusion
linear, FFN; adaptive input embeddings tied to an adaptive softmax.

TPU-first design:
- batch-first [B, T, C]; no TBC transposes;
- the decode path is a pure `step` function over a typed, fixed-shape
  cache pytree (per-layer conv history) + per-layer PRECOMPUTED cross
  attention K/V (the reference re-projects context K/V every generated
  token, decoder_flattened.py:300-325 + multi_head.py:288-352);
- no data-dependent shapes anywhere: finished sequences are masked,
  not compacted.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from news_image_caption_tpu.ops.dropout import dropout

from news_image_caption_tpu.ops.adaptive import (AdaptiveEmbedding,
                                                 AdaptiveSoftmax)
from news_image_caption_tpu.ops.attention import AttentionKV, MultiHeadAttention
from news_image_caption_tpu.ops.conv import DynamicConv, LightweightConv
from news_image_caption_tpu.ops.linear import GehringLinear
from news_image_caption_tpu.ops.positional import SinusoidalPositionalEmbedding
from news_image_caption_tpu.utils.registry import DECODERS

Dtype = Any


# Per-layer precomputed cross-attention K/V, keyed by context name
# (e.g. {"image": AttentionKV, "article": ..., "faces": ..., "obj": ...}).
LayerKV = Dict[str, AttentionKV]


class SumEmbedder(nn.Module):
    """Adaptive word embedding + sinusoidal positions, summed.

    Parity: the `sum` TextFieldEmbedder with `adaptive` + `position`
    token embedders (config expt/goodnews/5_transformer_roberta/
    config.yaml:27-49).
    """

    vocab_size: int
    embed_dim: int
    cutoff: Sequence[int]
    padding_idx: int = 0          # embedder pad (reference config)
    pos_padding_idx: int = 1      # positional pad (roberta pad)
    factor: float = 1.0
    scale_embeds: bool = True
    max_positions: int = 512
    param_dtype: Dtype = jnp.float32
    dtype: Dtype = jnp.float32

    def setup(self):
        self.adaptive = AdaptiveEmbedding(
            cutoff=tuple(self.cutoff), initial_dim=self.embed_dim,
            output_dim=self.embed_dim, factor=self.factor,
            padding_idx=self.padding_idx, scale_embeds=self.scale_embeds,
            param_dtype=self.param_dtype, dtype=self.dtype, name="adaptive")
        self.position = SinusoidalPositionalEmbedding(
            embedding_dim=self.embed_dim, padding_idx=self.pos_padding_idx,
            init_size=self.max_positions, dtype=self.dtype, name="position")

    def __call__(self, token_ids: jax.Array,
                 start_pos: jax.Array | int = 0) -> jax.Array:
        return self.adaptive(token_ids) + self.position(token_ids, start_pos)

    def embed_tables(self):
        return [self.adaptive.weights_for_band(i)
                for i in range(len(self.cutoff))]


class DynamicConvDecoderLayer(nn.Module):
    """One decoder layer: conv block + 2 context attentions + FFN."""

    embed_dim: int
    conv_dim: int
    kernel_size: int
    num_heads: int
    ffn_dim: int
    # (name, kv_dim) per attended context; fusion concat follows this
    # order (parity: decoder_flattened.py:249-263 for 2 contexts,
    # decoder_faces_objects.py:252-276 for 4).
    context_specs: Tuple[Tuple[str, int], ...] = (("image", 2048),
                                                  ("article", 1024))
    conv_type: str = "dynamic"          # or 'lightweight'
    decoder_glu: bool = True
    weight_softmax: bool = True
    normalize_before: bool = False
    dropout: float = 0.1
    weight_dropout: float = 0.1
    relu_dropout: float = 0.0
    input_dropout: float = 0.1
    attention_dropout: float = 0.1
    param_dtype: Dtype = jnp.float32
    # Compute dtype for the layer norms: with dtype=None flax promotes
    # bf16 activations back to fp32 via the fp32 LN params, silently
    # re-widening the whole decode path whenever params are fp32.
    dtype: Optional[Dtype] = None
    # Opt-in fused Pallas step kernels (see
    # DynamicConvDecoder.fused_decode_ok for the measured tradeoff).
    use_fused_decode: bool = False
    # Fused flash-style context attention for the full-sequence
    # (train) path, with in-kernel PRNG dropout (ops/pallas_flash.py).
    use_flash_train: bool = False
    flash_interpret: bool = False

    def setup(self):
        out_mult = 2 if self.decoder_glu else 1
        self.linear1 = GehringLinear(out_mult * self.conv_dim,
                                     param_dtype=self.param_dtype,
                                     name="linear1")
        conv_cls = DynamicConv if self.conv_type == "dynamic" else \
            LightweightConv
        self.conv = conv_cls(
            input_size=self.conv_dim, kernel_size=self.kernel_size,
            num_heads=self.num_heads, weight_softmax=self.weight_softmax,
            weight_dropout=self.weight_dropout,
            param_dtype=self.param_dtype, name="conv")
        self.linear2 = GehringLinear(self.embed_dim,
                                     param_dtype=self.param_dtype,
                                     name="linear2")
        self.conv_layer_norm = nn.LayerNorm(dtype=self.dtype,
                                    name="conv_layer_norm")
        attns, lns = {}, {}
        for cname, cdim in self.context_specs:
            attns[cname] = MultiHeadAttention(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                kdim=cdim, vdim=cdim,
                dropout=self.attention_dropout,
                use_flash=self.use_flash_train,
                flash_interpret=self.flash_interpret,
                param_dtype=self.param_dtype, name=f"{cname}_attn")
            lns[cname] = nn.LayerNorm(dtype=self.dtype,
                          name=f"{cname}_attn_ln")
        self.context_attns = attns
        self.context_attn_lns = lns
        self.context_fc = GehringLinear(self.embed_dim,
                                        param_dtype=self.param_dtype,
                                        name="context_fc")
        self.fc1 = GehringLinear(self.ffn_dim, param_dtype=self.param_dtype,
                                 name="fc1")
        self.fc2 = GehringLinear(self.embed_dim, param_dtype=self.param_dtype,
                                 name="fc2")
        self.final_layer_norm = nn.LayerNorm(dtype=self.dtype,
                                     name="final_layer_norm")

    def _maybe_ln(self, ln, x, *, before: bool):
        if before == self.normalize_before:
            return ln(x)
        return x

    def precompute_kv(self, contexts: Dict[str, jax.Array]) -> LayerKV:
        """Project each context's K/V once per sequence/decode."""
        return {
            cname: self.context_attns[cname].precompute_kv(
                contexts[cname], contexts[cname],
                contexts.get(f"{cname}_mask"))
            for cname, _ in self.context_specs
        }

    def _drop(self, x, rate, deterministic):
        if rate > 0.0 and not deterministic:
            return dropout(self, x, rate, deterministic=False)
        return x

    def _conv_block_pre(self, x, deterministic):
        x = self._maybe_ln(self.conv_layer_norm, x, before=True)
        x = self._drop(x, self.input_dropout, deterministic)
        x = self.linear1(x)
        if self.decoder_glu:
            x = nn.glu(x, axis=-1)
        return x

    def _conv_block_post(self, x, residual, deterministic):
        x = self.linear2(x)
        x = self._drop(x, self.dropout, deterministic)
        x = residual + x
        return self._maybe_ln(self.conv_layer_norm, x, before=False)

    def _contexts_block(self, x, kv: LayerKV, deterministic,
                        need_attn: bool = False):
        residual = x
        parts, attns = [], {}
        for cname, _ in self.context_specs:
            ln = self.context_attn_lns[cname]
            xc = self._maybe_ln(ln, x, before=True)
            xc, attn = self.context_attns[cname].attend(
                xc, kv[cname], deterministic=deterministic,
                need_weights=need_attn)
            xc = self._drop(xc, self.dropout, deterministic)
            xc = residual + xc
            xc = self._maybe_ln(ln, xc, before=False)
            parts.append(xc)
            attns[cname] = attn
        x = self.context_fc(jnp.concatenate(parts, axis=-1))
        return x, attns

    def _ffn_block(self, x, deterministic):
        if (self.use_fused_decode and deterministic
                and not self.normalize_before
                and x.ndim == 3 and x.shape[1] == 1
                and x.dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"):
            # Fused single-token FFN (ops/pallas_decode.py); the
            # weight-norm folds are loop-invariant and hoisted.
            from news_image_caption_tpu.ops.pallas_decode import \
                decode_ffn_block
            from news_image_caption_tpu.ops.linear import \
                fold_weight_norm
            p1 = self.fc1.variables["params"]
            p2 = self.fc2.variables["params"]

            def eff(p):
                return fold_weight_norm(p["kernel"], p["scale"],
                                        x.dtype)

            y = decode_ffn_block(
                x[:, 0, :], eff(p1), p1["bias"].astype(x.dtype),
                eff(p2), p2["bias"].astype(x.dtype))[:, None, :]
            return self.final_layer_norm(y)
        residual = x
        x = self._maybe_ln(self.final_layer_norm, x, before=True)
        x = nn.relu(self.fc1(x))
        x = self._drop(x, self.relu_dropout, deterministic)
        x = self.fc2(x)
        x = self._drop(x, self.dropout, deterministic)
        x = residual + x
        return self._maybe_ln(self.final_layer_norm, x, before=False)

    def __call__(self, x: jax.Array, kv: LayerKV,
                 deterministic: bool = True, need_attn: bool = False):
        """Full-sequence forward. x: [B, T, D]."""
        residual = x
        h = self._conv_block_pre(x, deterministic)
        h = self.conv(h, deterministic=deterministic)
        x = self._conv_block_post(h, residual, deterministic)
        x, attns = self._contexts_block(x, kv, deterministic, need_attn)
        x = self._ffn_block(x, deterministic)
        return x, attns

    def init_cache(self, batch_size: int, dtype=jnp.float32) -> jax.Array:
        return self.conv.init_cache(batch_size, dtype)

    def _fused_conv_block(self, x_t, conv_cache, step_idx):
        """Fused linear1+GLU+dynamic-conv+linear2 step
        (ops/pallas_decode.py) — one kernel instead of ~10 fusions.
        The weight-norm folds and the tap-major relayout below are
        loop-invariant: XLA hoists them out of the decode scan."""
        from news_image_caption_tpu.ops.pallas_decode import \
            decode_conv_block
        from news_image_caption_tpu.ops.linear import fold_weight_norm
        p1 = self.linear1.variables["params"]
        p2 = self.linear2.variables["params"]
        pw = self.conv.variables["params"]["weight_linear"]

        def eff(p):
            return fold_weight_norm(p["kernel"], p["scale"],
                                    x_t.dtype)

        H, K = self.num_heads, self.kernel_size
        wl = pw["kernel"].astype(x_t.dtype)            # [C, H*K]
        wl_tap = (wl.reshape(-1, H, K).transpose(0, 2, 1)
                  .reshape(-1, H * K))
        y_pre, h_glu = decode_conv_block(
            x_t, conv_cache, step_idx, eff(p1),
            p1["bias"].astype(x_t.dtype), wl_tap, eff(p2),
            p2["bias"].astype(x_t.dtype), num_heads=H)
        x = self.conv_layer_norm(y_pre)
        new_cache = jax.lax.dynamic_update_slice(
            conv_cache, h_glu[None, :, :],
            (jnp.mod(jnp.asarray(step_idx, jnp.int32), K - 1), 0, 0))
        return x, new_cache

    def step(self, x_t: jax.Array, kv: LayerKV, conv_cache: jax.Array,
             deterministic: bool = True, beam: int = 1,
             step_idx=None, ring_major: bool = False):
        """Single-token decode. x_t: [B, D] (or [B*beam, D] with
        beam > 1 and kv precomputed for the UNtiled batch — context
        K/V are then shared across beams instead of replicated).
        With step_idx, the conv history uses the O(1)-write ring
        buffer instead of a shifted copy. ring_major=True means the
        cache is [K-1, B, C] and the fused Pallas conv-block kernel
        runs (caller guarantees eligibility via fused_decode_ok)."""
        if ring_major:
            x, new_cache = self._fused_conv_block(x_t, conv_cache,
                                                  step_idx)
        else:
            residual = x_t[:, None, :]
            h = self._conv_block_pre(x_t[:, None, :], deterministic)
            if step_idx is not None:
                h_t, new_cache = self.conv.step_ring(
                    h[:, 0, :], conv_cache, step_idx,
                    deterministic=deterministic)
            else:
                h_t, new_cache = self.conv.step(
                    h[:, 0, :], conv_cache, deterministic=deterministic)
            x = self._conv_block_post(h_t[:, None, :], residual,
                                      deterministic)[:, 0, :]
        # Single-token context attention always goes through the
        # flat-beam path (beam=1 degenerates to per-row KV). The fused
        # decode_cross_attention Pallas kernel (ops/pallas_decode.py)
        # is benchmark/ablation-only — measured slower end-to-end
        # because pallas_call is a fusion barrier (BASELINE.md).
        x = self._contexts_block_beam(x, kv, beam,
                                      deterministic)[:, None, :]
        x = self._ffn_block(x, deterministic)
        return x[:, 0, :], new_cache

    def chunk(self, x: jax.Array, kv: LayerKV, conv_cache: jax.Array,
              deterministic: bool = True):
        """Multi-token decode over [B, k, D] with conv history.

        Identical math to k sequential `step` calls (the conv is the
        only temporal mixing in the layer; context attention and FFN
        are per-position). Returns (y [B, k, D], h [B, k, Cv]) where
        h are the conv-INPUT activations — speculative decoding
        commits a verified prefix of them into the history
        (generation/speculative.py::commit_conv_caches).
        """
        residual = x
        h = self._conv_block_pre(x, deterministic)
        out = self.conv.chunk(h, conv_cache, deterministic=deterministic)
        x = self._conv_block_post(out, residual, deterministic)
        # Context attention: a k-chunk is exactly a "beam" of k
        # positions sharing each row's K/V, so the beam-folded path
        # applies unchanged (and handles DecodeKV/QuantDecodeKV).
        B, k, D = x.shape
        x = self._contexts_block_beam(x.reshape(B * k, D), kv, k,
                                      deterministic).reshape(B, k, D)
        x = self._ffn_block(x, deterministic)
        return x, h

    def step_lazy_beam(self, x_t: jax.Array, kv: LayerKV,
                       conv_cache: jax.Array, slot_map: jax.Array,
                       step_idx, beam: int,
                       deterministic: bool = True):
        """Beam decode step with lazily-permuted conv cache (see
        DynamicConv.step_ring_lazy) and shared context K/V."""
        residual = x_t[:, None, :]
        h = self._conv_block_pre(x_t[:, None, :], deterministic)
        h_t, new_cache, new_map = self.conv.step_ring_lazy(
            h[:, 0, :], conv_cache, slot_map, step_idx,
            deterministic=deterministic)
        x = self._conv_block_post(h_t[:, None, :], residual,
                                  deterministic)
        x = self._contexts_block_beam(x[:, 0, :], kv, beam,
                                      deterministic)[:, None, :]
        x = self._ffn_block(x, deterministic)
        return x[:, 0, :], new_cache, new_map

    def _contexts_block_beam(self, x: jax.Array, kv: LayerKV,
                             beam: int, deterministic):
        """[B*beam, D] single-step context fusion with shared K/V."""
        residual = x
        parts = []
        for cname, _ in self.context_specs:
            ln = self.context_attn_lns[cname]
            xc = self._maybe_ln(ln, x, before=True)
            xc = self.context_attns[cname].attend_flat_beam(
                xc, kv[cname], beam, deterministic=deterministic)
            xc = self._drop(xc, self.dropout, deterministic)
            xc = residual + xc
            xc = self._maybe_ln(ln, xc, before=False)
            parts.append(xc)
        return self.context_fc(jnp.concatenate(parts, axis=-1))


@DECODERS.register("dynamic_conv_decoder_flattened")
class DynamicConvDecoder(nn.Module):
    """Decoder stack + tied adaptive softmax.

    `contexts` dict (batch-first):
      image [B, P, image_dim], image_mask [B, P] (True = pad),
      article [B, S, article_dim], article_mask [B, S] (True = pad).
    """

    vocab_size: int = 50265
    embed_dim: int = 1024
    ffn_dim: int = 4096
    num_heads: int = 16
    num_layers: int = 4
    kernel_sizes: Sequence[int] = (3, 7, 15, 31)
    cutoff: Sequence[int] = (5000, 20000, 50265)
    conv_dim: Optional[int] = None
    image_dim: int = 2048
    article_dim: int = 1024
    # Additional attended contexts, e.g. (("faces", 512), ("obj", 1024))
    # for the faces/objects variants (decoder_faces_objects.py:252-276).
    extra_contexts: Tuple[Tuple[str, int], ...] = ()
    # False = article-only attention (parity:
    # decoder_flattened_no_image.py:22, expt 4_no_image).
    include_image: bool = True
    conv_type: str = "dynamic"
    decoder_glu: bool = True
    weight_softmax: bool = True
    normalize_before: bool = False
    final_norm: bool = False
    dropout: float = 0.1
    weight_dropout: float = 0.1
    relu_dropout: float = 0.0
    input_dropout: float = 0.1
    attention_dropout: float = 0.1
    adaptive_softmax_dropout: float = 0.0
    padding_idx: int = 0
    target_padding_idx: int = 1   # criterion padding (roberta pad)
    # Tie the adaptive-softmax tail down-projections to the embedder's
    # band projections (reference `tie_adaptive_proj`,
    # decoder_flattened.py:32 + softmax.py:119-120; every shipped
    # config sets it false).
    tie_adaptive_proj: bool = False
    max_positions: int = 512
    param_dtype: Dtype = jnp.float32
    dtype: Dtype = jnp.float32
    # Opt-in fused Pallas decode-step kernels (see fused_decode_ok).
    use_fused_decode: bool = False
    # Flash-style fused context attention on the full-sequence (train)
    # path, in-kernel PRNG dropout (ops/pallas_flash.py).
    use_flash_train: bool = False
    flash_interpret: bool = False
    # Rematerialize each decoder layer on the backward pass
    # (jax.checkpoint via nn.remat): trades ~1 extra layer forward of
    # FLOPs for not storing the layer activations — the standard TPU
    # memory-for-FLOPs lever for bigger batches/longer sequences.
    # Bit-identical fwd+grad (tested incl. dropout rng streams);
    # decode-path methods (step/chunk/beam) are untouched.
    remat: bool = False

    def setup(self):
        assert len(self.kernel_sizes) == self.num_layers
        assert tuple(self.cutoff)[-1] == self.vocab_size
        self.embedder = SumEmbedder(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            cutoff=tuple(self.cutoff), padding_idx=self.padding_idx,
            pos_padding_idx=self.target_padding_idx,
            max_positions=self.max_positions,
            param_dtype=self.param_dtype, dtype=self.dtype, name="embedder")
        cdim = self.conv_dim or self.embed_dim
        base = ((("image", self.image_dim),) if self.include_image
                else ())
        specs = base + (("article", self.article_dim),) \
            + tuple(self.extra_contexts)
        # static_argnums: (3, 4) = (deterministic, need_attn) in the
        # lifted __call__ (positionally; verified fwd+grad identical).
        layer_cls = (nn.remat(DynamicConvDecoderLayer,
                              static_argnums=(3, 4))
                     if self.remat else DynamicConvDecoderLayer)
        self.layers = [
            layer_cls(
                embed_dim=self.embed_dim, conv_dim=cdim,
                kernel_size=self.kernel_sizes[i], num_heads=self.num_heads,
                ffn_dim=self.ffn_dim, context_specs=specs,
                conv_type=self.conv_type,
                decoder_glu=self.decoder_glu,
                weight_softmax=self.weight_softmax,
                normalize_before=self.normalize_before,
                dropout=self.dropout, weight_dropout=self.weight_dropout,
                relu_dropout=self.relu_dropout,
                input_dropout=self.input_dropout,
                attention_dropout=self.attention_dropout,
                param_dtype=self.param_dtype,
                dtype=(None if self.dtype == jnp.float32
                       else self.dtype),
                use_fused_decode=self.use_fused_decode,
                use_flash_train=self.use_flash_train,
                flash_interpret=self.flash_interpret,
                name=f"layers_{i}")
            for i in range(self.num_layers)
        ]
        self.adaptive_softmax = AdaptiveSoftmax(
            vocab_size=self.vocab_size, input_dim=self.embed_dim,
            cutoff=tuple(self.cutoff), dropout=self.adaptive_softmax_dropout,
            tied=True, tie_proj=self.tie_adaptive_proj,
            param_dtype=self.param_dtype, dtype=self.dtype,
            name="adaptive_softmax")
        if self.normalize_before and self.final_norm:
            self.layer_norm = nn.LayerNorm(
    dtype=(None if self.dtype == jnp.float32 else self.dtype),
    name="layer_norm")

    # ------------------------------------------------------------------
    # context K/V
    # ------------------------------------------------------------------
    def precompute_kv(self, contexts: Dict[str, jax.Array]) -> List[LayerKV]:
        # Cast float contexts to the decoder compute dtype at the
        # boundary: with dtype=bf16, fp32 pipeline arrays would leave
        # K/V fp32 and silently re-promote the whole decode path
        # (caught as a cache-dtype crash in the flagship eval CLI).
        contexts = self._cast_contexts(contexts)
        return [layer.precompute_kv(contexts) for layer in self.layers]

    def _cast_contexts(self, contexts):
        if self.dtype == jnp.float32:
            return contexts
        return {k: (v.astype(self.dtype)
                    if v is not None
                    and jnp.issubdtype(v.dtype, jnp.floating)
                    else v)
                for k, v in contexts.items()}

    # ------------------------------------------------------------------
    # training / full-sequence path
    # ------------------------------------------------------------------
    def hidden(self, token_ids: jax.Array, contexts: Dict[str, jax.Array],
               deterministic: bool = True) -> jax.Array:
        """Teacher-forced hidden states [B, T, D]."""
        kvs = self.precompute_kv(contexts)
        x = self.embedder(token_ids)
        x = self._drop_embed(x, deterministic)
        for layer, kv in zip(self.layers, kvs):
            # positional args: nn.remat's static_argnums only covers
            # positional parameters
            x, _ = layer(x, kv, deterministic, False)
        if self.normalize_before and self.final_norm:
            x = self.layer_norm(x)
        return x

    def _drop_embed(self, x, deterministic):
        if self.dropout > 0.0 and not deterministic:
            return dropout(self, x, self.dropout, deterministic=False)
        return x

    def loss(self, token_ids: jax.Array, contexts: Dict[str, jax.Array],
             target_ids: jax.Array, deterministic: bool = True):
        """Adaptive-softmax CE (sum) + ntokens, like `adaptive_loss`.

        Parity: /root/reference/ttl/tell/modules/criteria/adaptive_loss.py:27-73.
        """
        x = self.hidden(token_ids, contexts, deterministic)
        flat = x.reshape(-1, x.shape[-1])
        tables = self.embedder.embed_tables()
        return self.adaptive_softmax.loss_sum(
            flat, target_ids.reshape(-1),
            padding_idx=self.target_padding_idx, embed_tables=tables,
            deterministic=deterministic)

    def log_prob(self, token_ids: jax.Array,
                 contexts: Dict[str, jax.Array]) -> jax.Array:
        """Full-vocab log-probs [B, T, V] (teacher-forced)."""
        x = self.hidden(token_ids, contexts)
        B, T, D = x.shape
        tables = self.embedder.embed_tables()
        lp = self.adaptive_softmax.log_prob(x.reshape(-1, D), tables)
        return lp.reshape(B, T, self.vocab_size)

    # ------------------------------------------------------------------
    # incremental decode path
    # ------------------------------------------------------------------
    def init_cache(self, batch_size: int,
                   ring_major: bool = False) -> List[jax.Array]:
        # Pure config-derived shapes: usable outside init/apply.
        # ring_major=True: [K-1, B, C] leaves for the fused Pallas
        # conv-block step (slot dim outermost).
        cdim = self.conv_dim or self.embed_dim
        if ring_major:
            return [jnp.zeros((k - 1, batch_size, cdim), self.dtype)
                    for k in self.kernel_sizes]
        return [jnp.zeros((batch_size, k - 1, cdim), self.dtype)
                for k in self.kernel_sizes]

    def fused_decode_ok(self) -> bool:
        """Whether the fused Pallas conv-block step applies (TPU,
        bf16 activations, flagship structure, opted in).

        Default OFF: on v5e the fused kernels win in isolation
        (benchmarks/head_bench.py) but LOSE end-to-end (152.4 vs
        159.7 captions/s at beam 5) — every pallas_call is a fusion
        barrier, so the surrounding XLA fusions fragment and the
        op-count saving is offset. Kept as an opt-in for hardware /
        compiler versions where the tradeoff flips."""
        return (self.use_fused_decode
                and jax.default_backend() == "tpu"
                and self.dtype == jnp.bfloat16
                and self.conv_type == "dynamic" and self.decoder_glu
                and self.weight_softmax and not self.normalize_before
                # pointwise (K=1) layers have no ring cache: the XLA
                # step handles them; the fused kernel's zero-size
                # cache BlockSpec / mod-(K-1) math cannot
                and min(self.kernel_sizes) > 1)

    def quantized_embed_tables(self):
        """int8 head tables for the opt-in quantized decode head
        (GenerationConfig.quantize_head). Compute ONCE outside the
        decode scan and pass to step/step_topk via `tables=`."""
        from news_image_caption_tpu.ops.adaptive import \
            quantize_embed_tables
        return quantize_embed_tables(self.embedder.embed_tables())

    def step(self, token_t: jax.Array, step_idx: jax.Array | int,
             kvs: List[LayerKV], caches: List[jax.Array],
             beam: int = 1):
        """One decode step.

        token_t: [B] current input token; step_idx: number of tokens
        already consumed (0 for the seed). Returns
        (log_probs [B, V], new_caches).
        """
        lp, _, new_caches = self.step_with_hidden(token_t, step_idx,
                                                  kvs, caches, beam)
        return lp, new_caches

    def step_shift(self, token_t, step_idx, kvs, caches, beam: int = 1):
        """step() with shifted-copy caches (beam-search path)."""
        lp, _, new_caches = self.step_with_hidden(
            token_t, step_idx, kvs, caches, beam, use_ring=False)
        return lp, new_caches

    def init_slot_maps(self, batch_size: int) -> List[jax.Array]:
        """Identity slot->physical-row maps for lazy beam caches."""
        return [jnp.tile(jnp.arange(batch_size, dtype=jnp.int32),
                         (k - 1, 1))
                for k in self.kernel_sizes]

    def step_beam_lazy(self, token_t: jax.Array, step_idx,
                       kvs: List[LayerKV], caches: List[jax.Array],
                       slot_maps: List[jax.Array], beam: int):
        """One beam decode step over physically-stationary conv caches.

        The generator composes `slot_maps` with the beam-ancestry
        permutation instead of gathering every cache leaf
        (the reference gathers its whole incremental state per step,
        decoder_flattened.py:205-207 filter_incremental_state).
        Returns (log_probs, new_caches, new_slot_maps).
        """
        x = self.embedder(token_t[:, None], start_pos=step_idx)[:, 0, :]
        new_caches, new_maps = [], []
        for layer, kv, cache, smap in zip(self.layers, kvs, caches,
                                          slot_maps):
            x, nc, nm = layer.step_lazy_beam(x, kv, cache, smap,
                                             step_idx, beam)
            new_caches.append(nc)
            new_maps.append(nm)
        if self.normalize_before and self.final_norm:
            x = self.layer_norm(x)
        tables = self.embedder.embed_tables()
        lp = self.adaptive_softmax.log_prob(x, tables)
        return lp, new_caches, new_maps

    def step_topk(self, token_t: jax.Array, step_idx: jax.Array | int,
                  kvs: List[LayerKV], caches: List[jax.Array],
                  k: int, beam: int = 1, ring_major: bool = False,
                  tables=None):
        """One decode step returning only the top-k candidates.

        Like `step` but the head computes an EXACT banded top-k
        (AdaptiveSoftmax.topk_log_prob) instead of materializing the
        [B, V] log-prob matrix — the selection cost dominates wide
        beam decode. Ring conv caches (O(1) writes); ring_major=True
        uses the [K-1, B, C] layout + fused Pallas conv block.

        Returns (cand_log_probs [B, k], cand_ids [B, k], new_caches).
        """
        x = self.embedder(token_t[:, None], start_pos=step_idx)[:, 0, :]
        new_caches = []
        for layer, kv, cache in zip(self.layers, kvs, caches):
            x, nc = layer.step(x, kv, cache, beam=beam,
                               step_idx=step_idx,
                               ring_major=ring_major)
            new_caches.append(nc)
        if self.normalize_before and self.final_norm:
            x = self.layer_norm(x)
        if tables is None:
            tables = self.embedder.embed_tables()
        v, ids = self.adaptive_softmax.topk_log_prob(x, k, tables)
        return v, ids, new_caches

    def step_topk_pos(self, token_t: jax.Array, pos_row: jax.Array,
                      kvs: List[LayerKV], caches: List[jax.Array],
                      k: int, beam: int = 1, tables=None):
        """`step_topk` with PER-ROW positions over shifted-copy
        caches (continuous beam batching: slots sit at different
        decode depths inside one flat batch). Positions only enter
        via the embedder; the conv history is the shifted cache
        content and the context attention reads precomputed KV, so
        per-row depth needs no ring indexing. Token-exact vs
        `step_topk` at uniform positions (ring and shifted layouts
        hold identical histories — test_beam_impls_match_shifted_
        copy_beam).

        token_t [B]; pos_row [B] int32 tokens consumed per row;
        caches: `init_cache(B)` layout. Returns (cand_log_probs
        [B, k], cand_ids [B, k], new_caches).
        """
        pos = jnp.asarray(pos_row, jnp.int32)
        x = self.embedder(token_t[:, None],
                          start_pos=pos[:, None])[:, 0, :]
        new_caches = []
        for layer, kv, cache in zip(self.layers, kvs, caches):
            x, nc = layer.step(x, kv, cache, beam=beam,
                               step_idx=None)   # shifted-copy path
            new_caches.append(nc)
        if self.normalize_before and self.final_norm:
            x = self.layer_norm(x)
        if tables is None:
            tables = self.embedder.embed_tables()
        v, ids = self.adaptive_softmax.topk_log_prob(x, k, tables)
        return v, ids, new_caches

    def step_chunk(self, tokens: jax.Array, pos: jax.Array | int,
                   kvs: List[LayerKV], caches: List[jax.Array],
                   tables=None):
        """Chunked greedy decode step (speculative verification).

        tokens: [B, k] — the last committed token followed by k-1
        draft tokens; pos: [B] (or scalar) per-row count of tokens
        already consumed; caches: shifted-copy conv histories
        ([B, K-1, C], oldest first — `init_cache(B)` layout).

        Returns (log_probs [B, k], argmax_ids [B, k], h_list) where
        position t's output is the greedy next token given inputs
        0..t (identical to t+1 sequential `step_topk(k=1)` calls),
        and h_list[l] = [B, k, C] conv-input activations for
        `commit_conv_caches`. The conv caches are NOT advanced here —
        the caller commits the verified prefix.
        """
        v, ids, _, hs = self.step_chunk_with_hidden(tokens, pos, kvs,
                                                    caches, tables)
        return v, ids, hs

    def step_chunk_with_hidden(self, tokens: jax.Array,
                               pos: jax.Array | int,
                               kvs: List[LayerKV],
                               caches: List[jax.Array], tables=None):
        """`step_chunk` + the chunk hidden states [B, k, D] (the
        pointer family's entity/copy heads consume decoder hiddens,
        transformer_pointer.py:427-640)."""
        pos = jnp.asarray(pos, jnp.int32)
        start = pos[:, None] if pos.ndim == 1 else pos
        x = self.embedder(tokens, start_pos=start)
        hs = []
        for layer, kv, cache in zip(self.layers, kvs, caches):
            x, h = layer.chunk(x, kv, cache)
            hs.append(h)
        if self.normalize_before and self.final_norm:
            x = self.layer_norm(x)
        B, k, D = x.shape
        if tables is None:
            tables = self.embedder.embed_tables()
        v, ids = self.adaptive_softmax.topk_log_prob(
            x.reshape(B * k, D), 1, tables)
        return v.reshape(B, k), ids.reshape(B, k), x, hs

    def step_with_hidden(self, token_t: jax.Array,
                         step_idx: jax.Array | int,
                         kvs: List[LayerKV], caches: List[jax.Array],
                         beam: int = 1, use_ring: bool = True,
                         tables=None):
        """Like `step` but also returns the hidden state [B, D]
        (needed by the pointer family's entity/copy heads). With
        beam > 1, kvs must be for the untiled batch (shared K/V).
        use_ring=False keeps the shifted-copy conv caches (beam search
        reorders caches every step, which already rewrites them — the
        ring's O(1) writes buy nothing there)."""
        x = self.embedder(token_t[:, None], start_pos=step_idx)[:, 0, :]
        new_caches = []
        for layer, kv, cache in zip(self.layers, kvs, caches):
            x, nc = layer.step(x, kv, cache, beam=beam,
                               step_idx=step_idx if use_ring else None)
            new_caches.append(nc)
        if self.normalize_before and self.final_norm:
            x = self.layer_norm(x)
        if tables is None:
            tables = self.embedder.embed_tables()
        lp = self.adaptive_softmax.log_prob(x, tables)
        return lp, x, new_caches

    def attention_maps(self, token_ids: jax.Array,
                       contexts: Dict[str, jax.Array]):
        """Per-layer, per-context attention maps for a token sequence.

        Returns [num_layers] list of {context: [B, T, S']} arrays
        (head-averaged, S' includes the bias/zero slots). Decoding is
        deterministic given tokens, so a teacher-forced pass over
        generated ids reproduces the attention the serving reference
        collects step-by-step (transformer_faces_objects.py:142-190).
        """
        kvs = self.precompute_kv(contexts)
        x = self.embedder(token_ids)
        maps = []
        for layer, kv in zip(self.layers, kvs):
            x, attns = layer(x, kv, True, True)  # positional for remat
            maps.append(attns)
        return maps

    def loss_from_hidden(self, x: jax.Array, target_ids: jax.Array,
                         deterministic: bool = True):
        """Adaptive CE on precomputed hidden states [B, T, D]."""
        flat = x.reshape(-1, x.shape[-1])
        tables = self.embedder.embed_tables()
        return self.adaptive_softmax.loss_sum(
            flat, target_ids.reshape(-1),
            padding_idx=self.target_padding_idx, embed_tables=tables,
            deterministic=deterministic)
