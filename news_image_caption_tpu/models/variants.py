"""Registered Gen-3 model variants as configs over shared modules.

Parity map (register name -> reference file):
- transformer_faces          ttl/tell/models/transformer_faces.py:21
  (adds 512-d FaceNet face embeddings as a third attended context)
- transformer_faces_objects  ttl/tell/models/transformer_faces_objects.py:22
  (adds 2048-d YOLOv3-region object features as a fourth context,
   NaN rows masked, decoder_faces_objects.py:252-276)
- transformer_glove          ttl/tell/models/transformer_glove.py:21
  (300-d spaCy GloVe article features instead of RoBERTa)
- transformer_only_pointer   transformer_only_pointer.py:29
- transformer_pointer_2      transformer_pointer_2.py:27 (joint loss)
- transformer_faces_pointer / transformer_objects_pointer
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from news_image_caption_tpu.models.captioner import TransformerFlattened
from news_image_caption_tpu.models.decoder_flattened import \
    DynamicConvDecoder
from news_image_caption_tpu.models.pointer import TransformerPointer
from news_image_caption_tpu.utils.registry import MODELS

FACE_DIM = 512
OBJ_DIM = 2048
GLOVE_DIM = 300


def nan_to_mask(feats: jnp.ndarray):
    """NaN-padded feature rows -> (zeroed feats, True=pad mask).

    Parity: transformer_faces_objects.py:373-379 and
    transformer_pointer.py:408-410.
    """
    mask = jnp.isnan(feats).any(axis=-1)
    return jnp.where(mask[..., None], 0.0, feats), mask


def _decoder(extra: Tuple[Tuple[str, int], ...] = (),
             article_dim: int = 1024, **kw) -> DynamicConvDecoder:
    kw.setdefault("extra_contexts", extra)
    kw.setdefault("article_dim", article_dim)
    return DynamicConvDecoder(**kw)


@MODELS.register("transformer_faces")
def transformer_faces(**kw) -> TransformerFlattened:
    face_dim = kw.pop("face_dim", FACE_DIM)
    return TransformerFlattened(
        decoder=_decoder((("faces", face_dim),), **kw))


@MODELS.register("transformer_faces_objects")
def transformer_faces_objects(**kw) -> TransformerFlattened:
    face_dim = kw.pop("face_dim", FACE_DIM)
    obj_dim = kw.pop("obj_dim", OBJ_DIM)
    return TransformerFlattened(
        decoder=_decoder((("faces", face_dim), ("obj", obj_dim)), **kw))


@MODELS.register("transformer_glove")
def transformer_glove(**kw) -> TransformerFlattened:
    kw.setdefault("article_dim", GLOVE_DIM)
    return TransformerFlattened(decoder=_decoder(**kw))


@MODELS.register("transformer_no_image")
def transformer_no_image(**kw) -> TransformerFlattened:
    """Article-only ablation (ref decoder_flattened_no_image.py:22,
    expt {goodnews,nytimes}/4_no_image)."""
    kw.setdefault("include_image", False)
    return TransformerFlattened(decoder=_decoder(**kw))


@MODELS.register("transformer_only_pointer")
def transformer_only_pointer(**kw) -> TransformerPointer:
    kw.setdefault("use_entity_head", False)
    return TransformerPointer(**kw)


@MODELS.register("transformer_pointer_2")
def transformer_pointer_2(**kw) -> TransformerPointer:
    kw.setdefault("loss_weights", (1.0, 1.0, 1.0))
    return TransformerPointer(**kw)


@MODELS.register("transformer_context_pointer")
def transformer_context_pointer(**kw) -> TransformerPointer:
    """Pointer copying from the FULL context: callers pass
    context_proper_masks = (article_ids != pad) so every non-pad
    article token is copyable (parity:
    transformer_context_pointer.py:29)."""
    return TransformerPointer(**kw)


_DECODER_KEYS = ("vocab_size", "embed_dim", "ffn_dim", "num_heads",
                 "num_layers", "kernel_sizes", "cutoff", "image_dim",
                 "article_dim", "max_positions")
# shared between TransformerPointer's own heads and the decoder
_SHARED_KEYS = ("embed_dim", "num_heads", "article_dim")


def _split_pointer_kwargs(kw):
    """Route decoder dims given at the top level into the decoder
    config (pointer params like loss_weights stay in kw)."""
    dec_kw = dict(kw.pop("decoder_kwargs", {}))
    for k in _DECODER_KEYS:
        if k in kw:
            v = kw[k] if k in _SHARED_KEYS else kw.pop(k)
            dec_kw.setdefault(k, v)
    return kw, dec_kw


@MODELS.register("transformer_faces_pointer")
def transformer_faces_pointer(**kw) -> TransformerPointer:
    face_dim = kw.pop("face_dim", FACE_DIM)
    kw, dec_kw = _split_pointer_kwargs(kw)
    cap = TransformerFlattened(
        decoder=_decoder((("faces", face_dim),), **dec_kw))
    return TransformerPointer(captioner=cap, **kw)


@MODELS.register("transformer_objects_pointer")
def transformer_objects_pointer(**kw) -> TransformerPointer:
    obj_dim = kw.pop("obj_dim", OBJ_DIM)
    kw, dec_kw = _split_pointer_kwargs(kw)
    cap = TransformerFlattened(
        decoder=_decoder((("obj", obj_dim),), **dec_kw))
    return TransformerPointer(captioner=cap, **kw)
