"""Template-guided news captioner (TGNC) + entity-context variants.

Capability parity targets:
- TGNCModel + ClassificationHead (/root/reference/ttl/tell/models/tgnc.py:19-120):
  a 5-way template classifier over the RoBERTa <s> hidden state
  concatenated with mean-pooled image features, alongside the caption
  decoder; caption loss in bits; template loss (BCE) available but
  disabled in the shipped code.
- transformer_entity / transformer_entity_pointer
  (/root/reference/ttl/tell/models/transformer_entity.py:23,
   transformer_entity_pointer.py:29): NaN-masked entity embeddings as
  an additional attended decoder context.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from news_image_caption_tpu.models.captioner import (LN2,
                                                     TransformerFlattened,
                                                     shift_caption)
from news_image_caption_tpu.models.decoder_flattened import (
    DynamicConvDecoder, DynamicConvDecoderLayer, SumEmbedder)
from news_image_caption_tpu.models.pointer import TransformerPointer
from news_image_caption_tpu.ops.adaptive import AdaptiveSoftmax
from news_image_caption_tpu.ops.dropout import dropout
from news_image_caption_tpu.utils.registry import DECODERS, MODELS


class ClassificationHead(nn.Module):
    """<s> text hidden + mean image feats -> n_templates logits."""

    hidden: int = 1024
    image_dim: int = 2048
    n_classes: int = 5
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, text_hidden: jax.Array, image_feats: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """text_hidden [B, S, H] (uses position 0 = <s>);
        image_feats [B, P, C]."""
        h = text_hidden[:, 0, :]
        h = dropout(self, h, self.dropout_rate, deterministic)
        img = image_feats.mean(axis=1)
        img = dropout(self, img, self.dropout_rate, deterministic)
        x = jnp.concatenate([h, img], axis=-1)
        x = nn.Dense(self.hidden, name="dense")(x)
        x = jnp.tanh(x)
        x = dropout(self, x, self.dropout_rate, deterministic)
        return nn.Dense(self.n_classes, name="out_proj")(x)


@DECODERS.register("decoder_tgnc")
class TemplateGuidedDecoder(nn.Module):
    """Trunk layers + one extra decoder layer per template; outputs
    mixed by sigmoid(template_logits).

    Capability parity target: DecoderTGNC
    (/root/reference/ttl/tell/models/decoder_tgnc.py:20-244): N shared
    DynamicConv layers, then 5 per-template head layers (kernel 31);
    the 5 head outputs are stacked, weighted elementwise by
    sigmoid(template_logits) and mean-reduced before the adaptive
    softmax.

    TPU-first: heads run as a batched vmap-free loop of identical
    layers (XLA fuses the stack/mix); the decode path threads trunk
    AND head conv caches through one fixed-shape pytree.
    """

    vocab_size: int = 50265
    embed_dim: int = 1024
    ffn_dim: int = 4096
    num_heads: int = 16
    num_layers: int = 4
    kernel_sizes: tuple = (3, 7, 15, 31)
    cutoff: tuple = (5000, 20000, 50265)
    tie_adaptive_proj: bool = False
    image_dim: int = 2048
    article_dim: int = 1024
    n_templates: int = 5
    head_kernel: int = 31            # decoder_tgnc.py:62-107
    dropout: float = 0.1
    padding_idx: int = 0
    target_padding_idx: int = 1
    max_positions: int = 512
    # Per-layer rematerialization on the teacher-forced path (same
    # knob as DynamicConvDecoder.remat; bit-identical fwd+grad).
    remat: bool = False

    def setup(self):
        self.embedder = SumEmbedder(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            cutoff=tuple(self.cutoff), padding_idx=self.padding_idx,
            pos_padding_idx=self.target_padding_idx,
            max_positions=self.max_positions, name="embedder")
        specs = (("image", self.image_dim),
                 ("article", self.article_dim))

        layer_cls = (nn.remat(DynamicConvDecoderLayer,
                              static_argnums=(3, 4))
                     if self.remat else DynamicConvDecoderLayer)

        def layer(kernel, name):
            return layer_cls(
                embed_dim=self.embed_dim, conv_dim=self.embed_dim,
                kernel_size=kernel, num_heads=self.num_heads,
                ffn_dim=self.ffn_dim, context_specs=specs,
                dropout=self.dropout, name=name)

        self.layers = [layer(self.kernel_sizes[i], f"layers_{i}")
                       for i in range(self.num_layers)]
        self.heads = [layer(self.head_kernel, f"head_{i}")
                      for i in range(self.n_templates)]
        self.adaptive_softmax = AdaptiveSoftmax(
            vocab_size=self.vocab_size, input_dim=self.embed_dim,
            cutoff=tuple(self.cutoff), tied=True,
            tie_proj=self.tie_adaptive_proj,
            name="adaptive_softmax")

    def precompute_kv(self, contexts):
        return ([layer.precompute_kv(contexts) for layer in self.layers]
                + [head.precompute_kv(contexts) for head in self.heads])

    def _mix(self, head_outs, template_logits):
        """Stack head outputs and weight by sigmoid(logits)
        (decoder_tgnc.py:239-243: X * prob -> mean over heads)."""
        X = jnp.stack(head_outs, axis=2)          # [B, T, n, D]
        prob = jax.nn.sigmoid(
            template_logits.astype(X.dtype))      # [B, n]
        return (X * prob[:, None, :, None]).mean(axis=2)

    def hidden(self, token_ids, contexts, template_logits,
               deterministic: bool = True):
        kvs = self.precompute_kv(contexts)
        x = self.embedder(token_ids)
        # Post-embedding input dropout (decoder_tgnc.py applies
        # F.dropout right after the embedder, like the flattened
        # decoder's _drop_embed).
        x = dropout(self, x, self.dropout, deterministic)
        for layer, kv in zip(self.layers, kvs[:self.num_layers]):
            x, _ = layer(x, kv, deterministic, False)  # positional: remat
        outs = [head(x, kv, deterministic, False)[0]
                for head, kv in zip(self.heads,
                                    kvs[self.num_layers:])]
        return self._mix(outs, template_logits)

    def loss(self, token_ids, contexts, template_logits, target_ids,
             deterministic: bool = True):
        x = self.hidden(token_ids, contexts, template_logits,
                        deterministic)
        tables = self.embedder.embed_tables()
        return self.adaptive_softmax.loss_sum(
            x.reshape(-1, x.shape[-1]), target_ids.reshape(-1),
            padding_idx=self.target_padding_idx, embed_tables=tables,
            deterministic=deterministic)

    # -- incremental decode -------------------------------------------
    def init_cache(self, batch_size: int):
        trunk = [jnp.zeros((batch_size, k - 1, self.embed_dim))
                 for k in self.kernel_sizes]
        heads = [jnp.zeros((batch_size, self.head_kernel - 1,
                            self.embed_dim))
                 for _ in range(self.n_templates)]
        return trunk + heads

    def step(self, token_t, step_idx, kvs, caches, template_logits):
        x = self.embedder(token_t[:, None], start_pos=step_idx)[:, 0, :]
        new_caches = []
        for layer, kv, cache in zip(self.layers, kvs[:self.num_layers],
                                    caches[:self.num_layers]):
            x, nc = layer.step(x, kv, cache, step_idx=step_idx)
            new_caches.append(nc)
        outs = []
        for head, kv, cache in zip(self.heads, kvs[self.num_layers:],
                                   caches[self.num_layers:]):
            h, nc = head.step(x, kv, cache, step_idx=step_idx)
            outs.append(h[:, None, :])
            new_caches.append(nc)
        mixed = self._mix(outs, template_logits)[:, 0, :]
        tables = self.embedder.embed_tables()
        lp = self.adaptive_softmax.log_prob(mixed, tables)
        return lp, new_caches

    def step_chunk(self, tokens, pos, kvs, caches, template_logits):
        """Chunked greedy decode step (speculative verification).

        Same contract as DynamicConvDecoder.step_chunk: position t's
        output is the greedy next token given chunk inputs 0..t
        (identical to t+1 sequential `step` calls), through the
        template-mixed heads. Returns (log_probs [B, k], argmax_ids
        [B, k], h_list) where h_list matches the `init_cache` layout
        (trunk conv inputs then, per head, the SAME trunk output —
        each head consumes x, decoder_tgnc.py:228-236) for
        `commit_conv_caches`.
        """
        pos = jnp.asarray(pos, jnp.int32)
        start = pos[:, None] if pos.ndim == 1 else pos
        x = self.embedder(tokens, start_pos=start)
        hs = []
        for layer, kv in zip(self.layers, kvs[:self.num_layers]):
            x, h = layer.chunk(x, kv,
                               caches[len(hs)])
            hs.append(h)
        outs = []
        for i, (head, kv) in enumerate(zip(self.heads,
                                           kvs[self.num_layers:])):
            o, h = head.chunk(x, kv, caches[self.num_layers + i])
            outs.append(o)
            hs.append(h)
        mixed = self._mix(outs, template_logits)      # [B, k, D]
        B, k, D = mixed.shape
        tables = self.embedder.embed_tables()
        v, ids = self.adaptive_softmax.topk_log_prob(
            mixed.reshape(B * k, D), 1, tables)
        return v.reshape(B, k), ids.reshape(B, k), hs


@MODELS.register("tgnc")
class TGNC:
    """Caption decoder + template classifier."""

    def __init__(self, captioner: Optional[TransformerFlattened] = None,
                 n_templates: int = 5, image_dim: int = 2048,
                 article_dim: int = 1024, template_loss_weight: float = 0.0,
                 use_template_decoder: bool = False,
                 **decoder_kwargs):
        decoder_kwargs.setdefault("image_dim", image_dim)
        decoder_kwargs.setdefault("article_dim", article_dim)
        self.use_template_decoder = use_template_decoder
        if use_template_decoder:
            self.tg_decoder = TemplateGuidedDecoder(
                n_templates=n_templates, **decoder_kwargs)
            self.captioner = None
            embed_dim = self.tg_decoder.embed_dim
            img_dim = self.tg_decoder.image_dim
        else:
            self.tg_decoder = None
            self.captioner = captioner or TransformerFlattened(
                **decoder_kwargs)
            d = self.captioner.decoder
            embed_dim, img_dim = d.embed_dim, d.image_dim
        self.classifier = ClassificationHead(
            hidden=embed_dim, image_dim=img_dim, n_classes=n_templates)
        self.template_loss_weight = template_loss_weight

    @staticmethod
    def _contexts(batch):
        return {"image": batch["image"],
                "image_mask": batch.get("image_mask"),
                "article": batch["article"],
                "article_mask": batch.get("article_mask")}

    def init(self, rng, batch):
        r1, r2 = jax.random.split(rng)
        out = {"classifier": self.classifier.init(
            r2, batch["article"], batch["image"])}
        if self.use_template_decoder:
            inp, tgt = shift_caption(batch["caption_ids"])
            B = inp.shape[0]
            logits0 = jnp.zeros((B, self.tg_decoder.n_templates))
            out["decoder"] = self.tg_decoder.init(
                r1, inp, self._contexts(batch), logits0, tgt,
                method=TemplateGuidedDecoder.loss)
        else:
            out["captioner"] = self.captioner.init(r1, batch)
        return out

    def template_probs(self, variables, batch,
                       deterministic: bool = True) -> jax.Array:
        logits = self.classifier.apply(
            variables["classifier"], batch["article"], batch["image"],
            deterministic=deterministic)
        return jax.nn.softmax(logits, axis=-1)

    def loss_fn(self, variables, batch, dropout_rng=None):
        """Caption loss (bits/token) + optional BCE template loss.

        Optional batch key `template_label` [B, n_templates] (multi-hot).
        With use_template_decoder, the caption loss flows through the
        sigmoid(template_logits)-mixed heads so the classifier trains
        from the caption objective alone (decoder_tgnc.py:239-243).
        """
        deterministic0 = dropout_rng is None
        template_logits = None
        want_bce = (self.template_loss_weight > 0.0
                    and "template_label" in batch)
        if self.use_template_decoder or want_bce:
            # ONE classifier forward per step: the BCE must supervise
            # the same logits that mixed the decoder heads (and the
            # reference computes them once, tgnc.py:70-120).
            crngs = {} if deterministic0 else {
                "dropout": jax.random.fold_in(dropout_rng, 2)}
            template_logits = self.classifier.apply(
                variables["classifier"], batch["article"],
                batch["image"], deterministic=deterministic0,
                rngs=crngs)
        if self.use_template_decoder:
            inp, tgt = shift_caption(batch["caption_ids"])
            drngs = {} if deterministic0 else {
                "dropout": jax.random.fold_in(dropout_rng, 3)}
            loss_sum, ntokens = self.tg_decoder.apply(
                variables["decoder"], inp, self._contexts(batch),
                template_logits, tgt, deterministic=deterministic0,
                rngs=drngs, method=TemplateGuidedDecoder.loss)
            sample = jnp.maximum(ntokens, 1)
            cap_loss = (loss_sum / LN2) / sample
            aux = {"loss_sum": loss_sum / LN2, "sample_size": ntokens}
        else:
            cap_loss, aux = self.captioner.loss_fn(
                variables["captioner"], batch, dropout_rng)
        loss = cap_loss
        if want_bce:
            probs = jax.nn.sigmoid(template_logits.astype(jnp.float32))
            y = batch["template_label"].astype(jnp.float32)
            bce = -(y * jnp.log(jnp.maximum(probs, 1e-7))
                    + (1 - y) * jnp.log(jnp.maximum(1 - probs, 1e-7)))
            t_loss = bce.mean()
            aux["template_loss"] = t_loss
            loss = loss + self.template_loss_weight * t_loss
        aux["caption_loss"] = cap_loss
        return loss, aux

    def generate(self, variables, batch, config=None, rng=None):
        from news_image_caption_tpu.generation.generator import (
            GenerationConfig, generate)
        config = config or GenerationConfig()
        if not self.use_template_decoder:
            return self.captioner.generate(
                variables["captioner"], batch, config, rng)
        contexts = self._contexts(batch)
        B = contexts["image"].shape[0]
        template_logits = self.classifier.apply(
            variables["classifier"], batch["article"], batch["image"])
        kvs = self.tg_decoder.apply(
            variables["decoder"], contexts,
            method=TemplateGuidedDecoder.precompute_kv)
        from news_image_caption_tpu.ops.attention import decode_kv_tree
        kvs = decode_kv_tree(kvs)   # one-time head-major relayout
        caches = self.tg_decoder.init_cache(B)

        def step(tok, i, c):
            return self.tg_decoder.apply(
                variables["decoder"], tok, i, kvs, c, template_logits,
                method=TemplateGuidedDecoder.step)

        seed = jnp.full((B,), config.bos_id, jnp.int32)
        return generate(step, caches, seed, config, rng)

    def generate_speculative(self, variables, batch,
                             config=None, spec_k: int = 8,
                             draft_source=None, ngram_n: int = 2):
        """Exact speculative greedy decode through the template-mixed
        heads (token-identical to `generate` with sampling_topk=1;
        draft-and-verify — generation/speculative.py). Trunk AND
        per-template-head conv caches rewind via the shared
        shifted-copy commit. Returns (tokens, log_probs, n_chunks).
        """
        from news_image_caption_tpu.generation.generator import \
            GenerationConfig
        from news_image_caption_tpu.generation.speculative import (
            commit_conv_caches, ngram_drafts, speculative_greedy)
        config = config or GenerationConfig()
        if config.sampling_topk != 1:
            raise ValueError("speculative decoding is greedy-only "
                             "(sampling_topk must be 1)")
        if not self.use_template_decoder:
            return self.captioner.generate_speculative(
                variables["captioner"], batch, config, spec_k=spec_k,
                draft_source=draft_source, ngram_n=ngram_n)
        contexts = self._contexts(batch)
        B = contexts["image"].shape[0]
        template_logits = self.classifier.apply(
            variables["classifier"], batch["article"], batch["image"])
        kvs = self.tg_decoder.apply(
            variables["decoder"], contexts,
            method=TemplateGuidedDecoder.precompute_kv)
        from news_image_caption_tpu.ops.attention import decode_kv_tree
        kvs = decode_kv_tree(kvs)
        caches = self.tg_decoder.init_cache(B)
        source = (draft_source if draft_source is not None
                  else batch["article_ids"])

        def chunk_fn(toks, pos, c):
            return self.tg_decoder.apply(
                variables["decoder"], toks, pos, kvs, c,
                template_logits,
                method=TemplateGuidedDecoder.step_chunk)

        def draft_fn(tokens, pos, finished):
            return ngram_drafts(source, tokens, pos, spec_k - 1,
                                n=ngram_n, pad_id=config.pad_id)

        seed = jnp.full((B,), config.bos_id, jnp.int32)
        return speculative_greedy(chunk_fn, commit_conv_caches, caches,
                                  seed, config, spec_k, draft_fn)


@MODELS.register("transformer_entity")
def transformer_entity(entity_dim: int = 1024, **kw
                       ) -> TransformerFlattened:
    extra = tuple(kw.pop("extra_contexts", ())) + (
        ("entity", entity_dim),)
    return TransformerFlattened(
        decoder=DynamicConvDecoder(extra_contexts=extra, **kw))


@MODELS.register("transformer_entity_pointer")
def transformer_entity_pointer(entity_dim: int = 1024,
                               decoder_kwargs: Optional[Dict] = None,
                               **kw) -> TransformerPointer:
    dk = dict(decoder_kwargs or {})
    extra = tuple(dk.pop("extra_contexts", ())) + (
        ("entity", entity_dim),)
    cap = TransformerFlattened(
        decoder=DynamicConvDecoder(extra_contexts=extra, **dk))
    return TransformerPointer(captioner=cap, **kw)
