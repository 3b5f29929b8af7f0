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

from news_image_caption_tpu.models.captioner import TransformerFlattened
from news_image_caption_tpu.models.decoder_flattened import \
    DynamicConvDecoder
from news_image_caption_tpu.models.pointer import TransformerPointer
from news_image_caption_tpu.ops.dropout import dropout
from news_image_caption_tpu.utils.registry import MODELS


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


@MODELS.register("tgnc")
class TGNC:
    """Caption decoder + template classifier."""

    def __init__(self, captioner: Optional[TransformerFlattened] = None,
                 n_templates: int = 5, image_dim: int = 2048,
                 article_dim: int = 1024, template_loss_weight: float = 0.0,
                 **decoder_kwargs):
        decoder_kwargs.setdefault("image_dim", image_dim)
        decoder_kwargs.setdefault("article_dim", article_dim)
        self.captioner = captioner or TransformerFlattened(
            **decoder_kwargs)
        d = self.captioner.decoder
        self.classifier = ClassificationHead(
            hidden=d.embed_dim, image_dim=d.image_dim,
            n_classes=n_templates)
        self.template_loss_weight = template_loss_weight

    def init(self, rng, batch):
        r1, r2 = jax.random.split(rng)
        return {
            "captioner": self.captioner.init(r1, batch),
            "classifier": self.classifier.init(
                r2, batch["article"], batch["image"]),
        }

    def template_probs(self, variables, batch,
                       deterministic: bool = True) -> jax.Array:
        logits = self.classifier.apply(
            variables["classifier"], batch["article"], batch["image"],
            deterministic=deterministic)
        return jax.nn.softmax(logits, axis=-1)

    def loss_fn(self, variables, batch, dropout_rng=None):
        """Caption loss (bits/token) + optional BCE template loss.

        Optional batch key `template_label` [B, n_templates] (multi-hot).
        """
        cap_loss, aux = self.captioner.loss_fn(
            variables["captioner"], batch, dropout_rng)
        loss = cap_loss
        if (self.template_loss_weight > 0.0
                and "template_label" in batch):
            deterministic = dropout_rng is None
            rngs = {} if deterministic else {
                "dropout": jax.random.fold_in(dropout_rng, 1)}
            logits = self.classifier.apply(
                variables["classifier"], batch["article"],
                batch["image"], deterministic=deterministic, rngs=rngs)
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            y = batch["template_label"].astype(jnp.float32)
            bce = -(y * jnp.log(jnp.maximum(probs, 1e-7))
                    + (1 - y) * jnp.log(jnp.maximum(1 - probs, 1e-7)))
            t_loss = bce.mean()
            aux["template_loss"] = t_loss
            loss = loss + self.template_loss_weight * t_loss
        aux["caption_loss"] = cap_loss
        return loss, aux

    def generate(self, variables, batch, config=None, rng=None):
        from news_image_caption_tpu.generation.generator import \
            GenerationConfig
        return self.captioner.generate(
            variables["captioner"], batch,
            config or GenerationConfig(), rng)


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
