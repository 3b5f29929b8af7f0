"""Gen-2 `final*` transformer captioner (Annotated-Transformer style).

Capability parity target: /root/reference/final/transformer_v2.py:10-419
and its drivers (final/custom_v3.py, final_roberta/custom_v4.py):
- OnlyDecoder: token embed (*sqrt d) + interleaved sinusoidal positions
  -> N DecoderLayers -> final LayerNorm -> Generator (proj+log_softmax)
- DecoderLayer: pre-norm SublayerConnections; self-attn, then image and
  article attention both reading the *same* self-attn output, concat ->
  GehringLinear(2d->d, no weight norm) fuse -> FFN sublayer
- LayerNorm quirk: torch.std (Bessel-corrected) with eps OUTSIDE the
  sqrt — reproduced exactly (`Gen2LayerNorm`)
- MultiHeadedAttention quirk: K/V projected from d_key to d_model and
  split into d_model//h heads (transformer_v2.py:224-266)
- LabelSmoothing + SimpleLossCompute loss normalized by ntokens
  (final/custom_v3.py:180-204, 384-399)

Variant deltas (SURVEY.md §2.2) are configs of this one module:
  final/          word vocab, sent_dim=300 (spaCy GloVe), d=512
  final_bpe/      BERT wordpiece captions
  final_roberta/  sent_dim=1024 RoBERTa features + article mask
  final_roberta2/ RoBERTa BPE captions, d=1024 (custom_v4)

TPU-first: batch-first, static shapes; greedy decode runs as lax.scan
with a bounded self-attention KV cache — the reference re-decodes the
whole prefix every step (final/custom_v3.py:566-581).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.ops.dropout import dropout
from news_image_caption_tpu.ops.linear import GehringLinear, XavierLinear
from news_image_caption_tpu.ops.positional import interleaved_sinusoidal_table
from news_image_caption_tpu.utils.registry import MODELS

Dtype = Any
NEG = -1e9


class Gen2LayerNorm(nn.Module):
    """a*(x-mean)/(std+eps)+b with Bessel-corrected std, eps outside."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        a = self.param("a_2", nn.initializers.ones, (d,))
        b = self.param("b_2", nn.initializers.zeros, (d,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / (d - 1)
        std = jnp.sqrt(var)
        return a * (x - mean) / (std + self.eps) + b


class Gen2MHA(nn.Module):
    """Annotated-Transformer MHA with separate kv-dim projections."""

    d_model: int
    num_heads: int
    d_key: Optional[int] = None   # kv input dim (defaults d_model)
    dropout_rate: float = 0.1

    def setup(self):
        self.q_lin = XavierLinear(self.d_model, name="q_lin",
                                  kernel_init=nn.initializers.xavier_uniform())
        self.out_lin = XavierLinear(self.d_model, name="out_lin")
        self.k_lin = XavierLinear(self.d_model, name="k_lin")
        self.v_lin = XavierLinear(self.d_model, name="v_lin")

    def project_kv(self, key: jax.Array, value: jax.Array):
        """[B,S,d_key] -> ([B,S,H,hd], [B,S,H,hd])."""
        B, S, _ = key.shape
        h = self.num_heads
        hd = self.d_model // h
        k = self.k_lin(key).reshape(B, S, h, hd)
        v = self.v_lin(value).reshape(B, S, h, hd)
        return k, v

    def attend(self, query: jax.Array, k: jax.Array, v: jax.Array,
               mask: Optional[jax.Array] = None,
               deterministic: bool = True) -> jax.Array:
        """query [B,T,d_model]; mask broadcastable [B,1|T,S], True=keep."""
        B, T, _ = query.shape
        h = self.num_heads
        hd = self.d_model // h
        q = self.q_lin(query).reshape(B, T, h, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(hd)
        if mask is not None:
            scores = jnp.where(mask[:, None], scores, NEG)
        p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        p = dropout(self, p, self.dropout_rate, deterministic)
        out = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, self.d_model)
        return self.out_lin(out)

    def __call__(self, query, key, value, mask=None, deterministic=True):
        k, v = self.project_kv(key, value)
        return self.attend(query, k, v, mask, deterministic)


class Gen2FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = XavierLinear(self.d_ff, name="w_1")(x)
        h = dropout(self, nn.relu(h), self.dropout_rate, deterministic)
        return XavierLinear(self.d_model, name="w_2")(h)


class Gen2DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    img_dim: int
    sent_dim: int
    dropout_rate: float = 0.1

    def setup(self):
        self.self_attn = Gen2MHA(self.d_model, self.num_heads,
                                 dropout_rate=self.dropout_rate,
                                 name="self_attn")
        self.img_attn = Gen2MHA(self.d_model, self.num_heads,
                                d_key=self.img_dim,
                                dropout_rate=self.dropout_rate,
                                name="img_attn")
        self.article_attn = Gen2MHA(self.d_model, self.num_heads,
                                    d_key=self.sent_dim,
                                    dropout_rate=self.dropout_rate,
                                    name="article_attn")
        self.ff = Gen2FeedForward(self.d_model, self.d_ff,
                                  self.dropout_rate, name="ff")
        self.norms = [Gen2LayerNorm(name=f"norm_{i}") for i in range(4)]
        self.context_fc = GehringLinear(self.d_model, weight_norm=False,
                                        name="context_fc")

    def _sub(self, i, x, fn, deterministic):
        return x + dropout(self, fn(self.norms[i](x)),
                           self.dropout_rate, deterministic)

    def __call__(self, x, memory: Dict[str, jax.Array],
                 tgt_mask: Optional[jax.Array],
                 src_masks: Dict[str, Optional[jax.Array]] = None,
                 deterministic: bool = True):
        src_masks = src_masks or {}
        x = self._sub(0, x, lambda q: self.self_attn(
            q, q, q, tgt_mask, deterministic), deterministic)
        x_img = self._sub(1, x, lambda q: self.img_attn(
            q, memory["image"], memory["image"],
            src_masks.get("image"), deterministic), deterministic)
        x_art = self._sub(2, x, lambda q: self.article_attn(
            q, memory["article"], memory["article"],
            src_masks.get("article"), deterministic), deterministic)
        x = self.context_fc(jnp.concatenate([x_img, x_art], axis=-1))
        return self._sub(3, x, lambda h: self.ff(h, deterministic),
                         deterministic)

    # -- incremental decode --------------------------------------------
    def step(self, x_t, pos, self_kv, kvs, src_masks, deterministic=True):
        """x_t [B,1,d]; self_kv ([B,L,H,hd]x2) bounded cache; pos scalar.

        kvs: dict with precomputed image/article (k, v).
        Returns (out [B,1,d], updated self_kv).
        """
        k_cache, v_cache = self_kv
        B, L, H, hd = k_cache.shape

        def sub(i, x, fn):
            return x + fn(self.norms[i](x))

        # self-attention with cache write at `pos`
        xn = self.norms[0](x_t)
        k_new, v_new = self.self_attn.project_kv(xn, xn)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new, (0, pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new, (0, pos, 0, 0))
        valid = (jnp.arange(L) <= pos)[None, None, :]
        x = x_t + self.self_attn.attend(xn, k_cache, v_cache, valid,
                                        deterministic)
        x_img = sub(1, x, lambda q: self.img_attn.attend(
            q, *kvs["image"], src_masks.get("image"), deterministic))
        x_art = sub(2, x, lambda q: self.article_attn.attend(
            q, *kvs["article"], src_masks.get("article"), deterministic))
        x = self.context_fc(jnp.concatenate([x_img, x_art], axis=-1))
        x = sub(3, x, lambda h: self.ff(h, deterministic))
        return x, (k_cache, v_cache)


    def chunk(self, x, pos, self_kv, kvs, src_masks,
              deterministic=True):
        """Multi-token decode: x [B, k, d], pos [B] per-row count of
        tokens already consumed. Identical math to k sequential `step`
        calls. Cache entries are written at pos..pos+k-1 per row;
        REWIND is free — entries past a row's committed length are
        never attended (the valid mask is keyed on pos), so the next
        chunk simply overwrites them (speculative decoding,
        generation/speculative.py).
        Returns (out [B, k, d], updated self_kv)."""
        k_cache, v_cache = self_kv
        B, L, H, hd = k_cache.shape
        kq = x.shape[1]

        def sub(i, q, fn):
            return q + fn(self.norms[i](q))

        xn = self.norms[0](x)
        k_new, v_new = self.self_attn.project_kv(xn, xn)

        def wrow(c, n, p):
            return jax.lax.dynamic_update_slice(c, n, (p, 0, 0))

        k_cache = jax.vmap(wrow)(k_cache, k_new, pos)
        v_cache = jax.vmap(wrow)(v_cache, v_new, pos)
        # Query chunk-position t attends cache slots <= pos + t
        # (committed prefix + the chunk's own causal prefix).
        slot = jnp.arange(L, dtype=jnp.int32)
        valid = (slot[None, None, :]
                 <= (pos[:, None] + jnp.arange(kq, dtype=jnp.int32)
                     [None, :])[:, :, None])        # [B, kq, L]
        x = x + self.self_attn.attend(xn, k_cache, v_cache, valid,
                                      deterministic)
        x_img = sub(1, x, lambda q: self.img_attn.attend(
            q, *kvs["image"], src_masks.get("image"), deterministic))
        x_art = sub(2, x, lambda q: self.article_attn.attend(
            q, *kvs["article"], src_masks.get("article"),
            deterministic))
        x = self.context_fc(jnp.concatenate([x_img, x_art], axis=-1))
        x = sub(3, x, lambda h: self.ff(h, deterministic))
        return x, (k_cache, v_cache)


class Gen2Transformer(nn.Module):
    """OnlyDecoder captioner over image+article memory."""

    vocab_size: int
    d_model: int = 512
    d_ff: int = 2048
    num_heads: int = 8
    num_layers: int = 3
    img_dim: int = 1024
    sent_dim: int = 300
    dropout_rate: float = 0.1
    max_len: int = 512
    pad_id: int = 0
    # Per-layer rematerialization on the teacher-forced path (same
    # knob as DynamicConvDecoder.remat: memory-for-FLOPs, identical
    # numerics; decode-path methods step/step_chunk are untouched).
    remat: bool = False

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model,
                              embedding_init=nn.initializers.xavier_uniform(),
                              name="embed")
        self.pe = jnp.asarray(
            interleaved_sinusoidal_table(self.max_len + 8, self.d_model))
        # static_argnums: 5 = deterministic in the lifted __call__
        # (self=0, x=1, memory=2, tgt_mask=3, src_masks=4).
        layer_cls = (nn.remat(Gen2DecoderLayer, static_argnums=(5,))
                     if self.remat else Gen2DecoderLayer)
        self.layers = [
            layer_cls(self.d_model, self.num_heads, self.d_ff,
                      self.img_dim, self.sent_dim,
                      self.dropout_rate, name=f"layers_{i}")
            for i in range(self.num_layers)]
        self.final_norm = Gen2LayerNorm(name="final_norm")
        self.proj = XavierLinear(self.vocab_size, name="generator")

    def _embed(self, tgt, start: int | jax.Array = 0,
               deterministic: bool = True):
        x = self.embed(tgt) * math.sqrt(self.d_model)
        T = tgt.shape[1]
        start = jnp.asarray(start, jnp.int32)
        if start.ndim == 1:      # per-row offsets (chunk decode)
            idx = start[:, None] + jnp.arange(T, dtype=jnp.int32)
            x = x + jnp.take(self.pe, idx, axis=0)
        else:
            pe = jax.lax.dynamic_slice(
                self.pe, (start, jnp.asarray(0)), (T, self.d_model))
            x = x + pe[None]
        return dropout(self, x, self.dropout_rate, deterministic)

    def decode(self, memory: Dict[str, jax.Array], tgt: jax.Array,
               tgt_mask: Optional[jax.Array] = None,
               src_masks: Optional[Dict] = None,
               deterministic: bool = True) -> jax.Array:
        """Teacher-forced hidden states [B, T, d_model]."""
        if tgt_mask is None:
            T = tgt.shape[1]
            pad_ok = (tgt != self.pad_id)[:, None, :]
            causal = jnp.tril(jnp.ones((T, T), bool))[None]
            tgt_mask = pad_ok & causal
        x = self._embed(tgt, 0, deterministic)
        for layer in self.layers:
            x = layer(x, memory, tgt_mask, src_masks, deterministic)
        return self.final_norm(x)

    def log_probs(self, memory, tgt, tgt_mask=None, src_masks=None,
                  deterministic: bool = True) -> jax.Array:
        """Generator output: log-softmax over vocab [B, T, V]."""
        x = self.decode(memory, tgt, tgt_mask, src_masks, deterministic)
        return jax.nn.log_softmax(self.proj(x), axis=-1)

    def logits(self, memory, tgt, tgt_mask=None, src_masks=None,
               deterministic: bool = True) -> jax.Array:
        """Generator output BEFORE log-softmax [B, T, V] — the train
        loss consumes these with reductions only (see
        label_smoothing_loss_from_logits), so the [B, T, V] log-prob
        tensor never materializes."""
        x = self.decode(memory, tgt, tgt_mask, src_masks, deterministic)
        return self.proj(x)

    # -- incremental ----------------------------------------------------
    def precompute_kv(self, memory: Dict[str, jax.Array]):
        return [{"image": layer.img_attn.project_kv(
                    memory["image"], memory["image"]),
                 "article": layer.article_attn.project_kv(
                    memory["article"], memory["article"])}
                for layer in self.layers]

    def init_cache(self, batch_size: int, max_len: int):
        # Config-derived shapes only: usable outside init/apply.
        hd = self.d_model // self.num_heads
        shape = (batch_size, max_len, self.num_heads, hd)
        return [(jnp.zeros(shape), jnp.zeros(shape))
                for _ in range(self.num_layers)]

    def step(self, token_t: jax.Array, pos, kvs, caches,
             src_masks: Optional[Dict] = None):
        """token_t [B] -> (log-probs [B, V], new caches)."""
        src_masks = src_masks or {}
        x = self._embed(token_t[:, None], jnp.asarray(pos, jnp.int32))
        new_caches = []
        for layer, layer_kv, cache in zip(self.layers, kvs, caches):
            x, nc = layer.step(x, pos, cache, layer_kv, src_masks)
            new_caches.append(nc)
        x = self.final_norm(x)
        lp = jax.nn.log_softmax(self.proj(x[:, 0, :]), axis=-1)
        return lp, new_caches


    def step_chunk(self, tokens: jax.Array, pos, kvs, caches,
                   src_masks: Optional[Dict] = None):
        """Chunked greedy decode step (speculative verification).

        tokens [B, k] (last committed token + drafts), pos [B].
        Caches must be sized init_cache(B, max_len + k). Returns
        (log_probs [B, k], argmax_ids [B, k], new_caches) — position
        t's output is the greedy next token given inputs 0..t; the
        updated caches ARE the commit (stale rows are masked by pos,
        so commit_fn just adopts them).
        """
        src_masks = src_masks or {}
        pos = jnp.asarray(pos, jnp.int32)
        x = self._embed(tokens, pos)
        new_caches = []
        for layer, layer_kv, cache in zip(self.layers, kvs, caches):
            x, nc = layer.chunk(x, pos, cache, layer_kv, src_masks)
            new_caches.append(nc)
        x = self.final_norm(x)
        lp = jax.nn.log_softmax(self.proj(x), axis=-1)   # [B, k, V]
        v, ids = jax.lax.top_k(lp, 1)
        return v[..., 0], ids[..., 0].astype(jnp.int32), new_caches


def label_smoothing_loss(log_probs: jax.Array, targets: jax.Array,
                         pad_id: int = 0, smoothing: float = 0.0
                         ) -> Tuple[jax.Array, jax.Array]:
    """Summed label-smoothed NLL over non-pad targets + ntokens.

    Parity: LabelSmoothing + SimpleLossCompute
    (/root/reference/final/custom_v3.py:180-204, 384-399) — KLDiv
    against the smoothed distribution equals smoothed CE up to the
    (gradient-free) entropy constant. The reference's true_dist puts
    smoothing/(V-2) on every class EXCEPT the target column (which
    it overwrites with the confidence) and the pad column (which it
    zeroes), so those two log-probs are excluded from the smoothing
    sum; with smoothing=0 (the shipped config) it's exact CE.
    """
    V = log_probs.shape[-1]
    lp = log_probs.reshape(-1, V)
    tgt = targets.reshape(-1)
    confidence = 1.0 - smoothing
    nll = -jnp.take_along_axis(lp, tgt[:, None], axis=1)[:, 0]
    if smoothing > 0.0:
        smooth_sum = lp.sum(axis=-1) - (-nll) - lp[:, pad_id]
        loss_tok = confidence * nll - smooth_sum * (smoothing / (V - 2))
    else:
        loss_tok = nll
    mask = tgt != pad_id
    loss = jnp.sum(jnp.where(mask, loss_tok, 0.0))
    return loss, jnp.sum(mask.astype(jnp.int32))


def label_smoothing_loss_from_logits(logits: jax.Array,
                                     targets: jax.Array,
                                     pad_id: int = 0,
                                     smoothing: float = 0.0
                                     ) -> Tuple[jax.Array, jax.Array]:
    """`label_smoothing_loss` computed from LOGITS with reductions only.

    Same math (log_softmax(x) = x - logsumexp(x), identical max-shift)
    but the [N, V] log-prob tensor is consumed by reductions and
    per-row gathers instead of materializing elementwise, so XLA fuses
    the softmax passes into the generator matmul's consumers — the
    same dataflow rework measured 1.67x on the flagship's adaptive
    loss (ops/adaptive.py::loss_sum, BASELINE.md r4). Equal to the
    log-prob form to fp tolerance (same max-shifted math; the
    subtractions associate differently, and with smoothing>0 the
    smoothing sum reassociates as sum(x) - V*lse). Under bf16 compute
    this form additionally accumulates the loss in fp32 (the flagship
    loss_sum convention) where the log-prob form summed in bf16.
    """
    V = logits.shape[-1]
    lg = logits.reshape(-1, V).astype(jnp.float32)
    tgt = targets.reshape(-1)
    lse = jax.scipy.special.logsumexp(lg, axis=-1)
    picked = jnp.take_along_axis(lg, tgt[:, None], axis=1)[:, 0]
    nll = lse - picked
    if smoothing > 0.0:
        confidence = 1.0 - smoothing
        # lp.sum() - lp[tgt] - lp[pad] with lp = lg - lse[:, None]:
        lp_sum = lg.sum(axis=-1) - V * lse
        smooth_sum = lp_sum - (picked - lse) - (lg[:, pad_id] - lse)
        loss_tok = confidence * nll - smooth_sum * (smoothing / (V - 2))
    else:
        loss_tok = nll
    mask = tgt != pad_id
    loss = jnp.sum(jnp.where(mask, loss_tok, 0.0))
    return loss, jnp.sum(mask.astype(jnp.int32))


@MODELS.register("gen2_transformer")
def gen2_transformer(smoothing: float = 0.0, **kw) -> "Gen2Captioner":
    """Registry factory: config dict -> trainable Gen-2 captioner."""
    return Gen2Captioner(Gen2Transformer(**kw), smoothing=smoothing)


class Gen2Captioner:
    """Functional wrapper: loss + greedy generation (Gen-2 drivers)."""

    def __init__(self, module: Optional[Gen2Transformer] = None,
                 smoothing: float = 0.0, **kwargs):
        self.module = module or Gen2Transformer(**kwargs)
        self.smoothing = smoothing

    def init(self, rng, batch):
        memory = {"image": batch["image"], "article": batch["article"]}
        return self.module.init(rng, memory, batch["caption_ids"][:, :-1],
                                method=Gen2Transformer.logits)

    def _memory(self, batch):
        return {"image": batch["image"], "article": batch["article"]}

    def _src_masks(self, batch):
        out = {}
        if batch.get("article_mask") is not None:
            # reference convention True=pad; attention wants True=keep
            out["article"] = (~batch["article_mask"])[:, None, :]
        return out

    def loss_fn(self, params, batch, dropout_rng=None):
        tgt_in = batch["caption_ids"][:, :-1]
        tgt_y = batch["caption_ids"][:, 1:]
        deterministic = dropout_rng is None
        rngs = {} if deterministic else {"dropout": dropout_rng}
        lg = self.module.apply(
            params, self._memory(batch), tgt_in,
            src_masks=self._src_masks(batch),
            deterministic=deterministic, rngs=rngs,
            method=Gen2Transformer.logits)
        loss, ntokens = label_smoothing_loss_from_logits(
            lg, tgt_y, pad_id=self.module.pad_id,
            smoothing=self.smoothing)
        sample = jnp.maximum(ntokens, 1)
        return loss / sample, {"loss_sum": loss, "sample_size": ntokens}

    def generate(self, params, batch,
                 config: GenerationConfig = GenerationConfig(
                     max_len=50, bos_id=1, eos_id=2, pad_id=0),
                 rng=None):
        """Greedy/top-k decode with bounded KV cache (lax.scan)."""
        from news_image_caption_tpu.generation.generator import generate

        memory = self._memory(batch)
        src_masks = self._src_masks(batch)
        B = memory["image"].shape[0]
        kvs = self.module.apply(params, memory,
                                method=Gen2Transformer.precompute_kv)
        caches = self.module.init_cache(B, config.max_len + 1)

        def step_fn(tok, i, caches):
            return self.module.apply(params, tok, i, kvs, caches,
                                     src_masks,
                                     method=Gen2Transformer.step)

        seed = jnp.full((B,), config.bos_id, jnp.int32)
        return generate(step_fn, caches, seed, config, rng)

    def generate_speculative(self, params, batch,
                             config: GenerationConfig = GenerationConfig(
                                 max_len=50, bos_id=1, eos_id=2,
                                 pad_id=0),
                             spec_k: int = 8,
                             draft_source: Optional[jax.Array] = None,
                             ngram_n: int = 2):
        """Greedy decode via prompt-lookup speculative decoding —
        token-identical to `generate` with sampling_topk=1 (see
        generation/speculative.py). draft_source: [B, S] token ids to
        draft from (defaults to batch['article_ids'])."""
        from news_image_caption_tpu.generation.speculative import (
            ngram_drafts, speculative_greedy)
        if config.sampling_topk != 1:
            raise ValueError("speculative decoding is greedy-only")
        memory = self._memory(batch)
        src_masks = self._src_masks(batch)
        B = memory["image"].shape[0]
        kvs = self.module.apply(params, memory,
                                method=Gen2Transformer.precompute_kv)
        # +spec_k slots: a chunk at pos = max_len-1 writes through
        # pos + spec_k - 1 (the tail past each row's commit is masked).
        caches = self.module.init_cache(B, config.max_len + spec_k)
        source = (draft_source if draft_source is not None
                  else batch["article_ids"])

        def chunk_fn(toks, pos, caches):
            return self.module.apply(params, toks, pos, kvs, caches,
                                     src_masks,
                                     method=Gen2Transformer.step_chunk)

        def commit_fn(caches, aux, m):
            return aux   # stale rows are masked by pos; see step_chunk

        def draft_fn(tokens, pos, finished):
            return ngram_drafts(source, tokens, pos, spec_k - 1,
                                n=ngram_n, pad_id=config.pad_id)

        seed = jnp.full((B,), config.bos_id, jnp.int32)
        return speculative_greedy(chunk_fn, commit_fn, caches, seed,
                                  config, spec_k, draft_fn)
