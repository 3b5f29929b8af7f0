"""Flagship captioning model: contexts -> dynamic-conv decoder -> caption.

Capability parity target: TransformerFlattenedModel
(/root/reference/ttl/tell/models/transformer_flattened.py:23-443):
ResNet-152 image patches + RoBERTa article hiddens feed a registered
decoder; adaptive loss in bits (loss/log 2); eval-mode top-k sampled
generation.

TPU-first: the model wrapper is a thin *functional* layer — a Flax
decoder module plus pure jittable functions (loss_fn / generate_fn /
beam_fn) that close over nothing mutable. Encoders (ResNet/RoBERTa)
are frozen feature extractors in all reference training paths
(config `no_grad: ^resnet ^roberta`), so the train step takes
precomputed `contexts`; the vision/text encoder modules live in
`models/resnet.py` / `models/roberta.py` and are composed in the
data pipeline or the serving path.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from news_image_caption_tpu.generation.generator import (
    GenerationConfig, beam_search, beam_search_candidates,
    generate_candidates)
from news_image_caption_tpu.models.decoder_flattened import DynamicConvDecoder
from news_image_caption_tpu.utils.registry import MODELS

LN2 = math.log(2.0)


def shift_caption(caption_ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(input_ids, target_ids), both [B, L-1].

    Parity: transformer_flattened.py:166-183 — input drops the last
    token, target is the caption shifted left by one.
    """
    return caption_ids[:, :-1], caption_ids[:, 1:]


@MODELS.register("transformer_flattened")
class TransformerFlattened:
    """Functional wrapper tying decoder + loss + generation."""

    def __init__(self, decoder: Optional[DynamicConvDecoder] = None,
                 **decoder_kwargs):
        self.decoder = decoder or DynamicConvDecoder(**decoder_kwargs)

    # -- init ----------------------------------------------------------
    def init(self, rng: jax.Array, sample_batch: Dict[str, jax.Array]):
        caption = sample_batch["caption_ids"]
        contexts = self._contexts(sample_batch)
        inp, tgt = shift_caption(caption)
        return self.decoder.init(rng, inp, contexts, tgt,
                                 method=DynamicConvDecoder.loss)

    @staticmethod
    def _contexts(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        ctx = {
            "image": batch["image"],
            "image_mask": batch.get("image_mask"),
            "article": batch["article"],
            "article_mask": batch.get("article_mask"),
        }
        # Extra contexts for the faces/objects/entity variants
        # (transformer_faces.py:21, transformer_faces_objects.py:22).
        for extra in ("faces", "obj", "entity"):
            if extra in batch:
                ctx[extra] = batch[extra]
                ctx[f"{extra}_mask"] = batch.get(f"{extra}_mask")
        return ctx

    # -- training ------------------------------------------------------
    def loss_fn(self, params, batch: Dict[str, jax.Array],
                dropout_rng: Optional[jax.Array] = None):
        """Per-token loss in bits (reference: loss/log(2)/sample_size).

        Returns (mean_loss, aux dict with loss_sum/sample_size).
        """
        contexts = self._contexts(batch)
        inp, tgt = shift_caption(batch["caption_ids"])
        deterministic = dropout_rng is None
        rngs = {} if deterministic else {"dropout": dropout_rng}
        loss_sum, ntokens = self.decoder.apply(
            params, inp, contexts, tgt, deterministic=deterministic,
            rngs=rngs, method=DynamicConvDecoder.loss)
        loss_bits = loss_sum / LN2
        sample_size = jnp.maximum(ntokens, 1)
        mean_loss = loss_bits / sample_size
        return mean_loss, {"loss_sum": loss_bits, "sample_size": ntokens}

    # -- generation ----------------------------------------------------
    def _decode_setup(self, params, contexts: Dict[str, jax.Array],
                      quantize_kv: bool = False):
        from news_image_caption_tpu.ops.attention import decode_kv_tree
        kvs = self.decoder.apply(
            params, contexts, method=DynamicConvDecoder.precompute_kv)
        # One-time head-major relayout (outside the decode scan): the
        # per-step attention einsums become clean batched matmuls.
        # quantize_kv additionally stores K/V as int8 (+row scales).
        # Callers build their own caches (ring_major / B*K sizing).
        return decode_kv_tree(kvs, quantize=quantize_kv)

    def _check_max_len(self, config: GenerationConfig) -> None:
        """Positions past the sinusoidal table would silently CLAMP
        (jnp.take clips out-of-bounds under jit) — every token after
        max_positions would reuse the last positional row. Fail
        loudly at trace time instead."""
        mp = getattr(self.decoder, "max_positions", None)
        if mp is not None and config.max_len > mp:
            raise ValueError(
                f"max_len {config.max_len} exceeds the decoder's "
                f"max_positions {mp}; positions would clamp")

    def _head_tables(self, params, config):
        """Opt-in int8 head tables, quantized ONCE per generation
        (outside the decode scan), like the KV relayout."""
        if not getattr(config, "quantize_head", False):
            return None
        return self.decoder.apply(
            params, method=DynamicConvDecoder.quantized_embed_tables)

    def generate(self, params, batch: Dict[str, jax.Array],
                 config: GenerationConfig = GenerationConfig(),
                 rng: Optional[jax.Array] = None):
        """Top-k / greedy sampled captions [B, max_len+1].

        The step produces exact top-k candidates straight from the
        adaptive-softmax bands (no [B, V] log-prob materialization).
        """
        contexts = self._contexts(batch)
        B = contexts["image"].shape[0]
        self._check_max_len(config)
        ring_major = self.decoder.fused_decode_ok()
        kvs = self._decode_setup(params, contexts,
                                 quantize_kv=config.quantize_kv)
        caches = self.decoder.init_cache(B, ring_major=ring_major)
        seed = jnp.full((B,), config.bos_id, jnp.int32)
        tables = self._head_tables(params, config)

        def step(tok, i, caches):
            return self.decoder.apply(
                params, tok, i, kvs, caches, config.sampling_topk,
                ring_major=ring_major, tables=tables,
                method=DynamicConvDecoder.step_topk)

        return generate_candidates(step, caches, seed, config, rng)

    def generate_speculative(self, params, batch: Dict[str, jax.Array],
                             config: GenerationConfig = GenerationConfig(),
                             spec_k: int = 8,
                             draft_source: Optional[jax.Array] = None,
                             ngram_n: int = 2):
        """Greedy captions via prompt-lookup speculative decoding.

        Token-for-token identical to `generate` with sampling_topk=1
        (draft-and-verify — see generation/speculative.py), but each
        verification forward scores `spec_k` positions at once, so
        wall-clock shrinks by the tokens-committed-per-chunk factor.
        Drafts continue the caption's trailing `ngram_n`-gram from its
        first occurrence in `draft_source` (default:
        batch["article_ids"], the article's BPE ids — news captions
        copy entity spans from their articles, so acceptance is high
        on trained models).

        Returns (tokens [B, max_len+1], log_probs [B, max_len],
        n_chunks) — n_chunks counts verification forwards (the
        wall-clock unit).
        """
        from news_image_caption_tpu.generation.speculative import (
            commit_conv_caches, ngram_drafts, speculative_greedy)
        if config.sampling_topk != 1:
            raise ValueError("speculative decoding is greedy-only "
                             "(sampling_topk must be 1)")
        contexts = self._contexts(batch)
        B = contexts["image"].shape[0]
        self._check_max_len(config)
        kvs = self._decode_setup(params, contexts,
                                 quantize_kv=config.quantize_kv)
        caches = self.decoder.init_cache(B)   # shifted-copy layout
        seed = jnp.full((B,), config.bos_id, jnp.int32)
        tables = self._head_tables(params, config)
        source = (draft_source if draft_source is not None
                  else batch["article_ids"])

        def chunk_fn(toks, pos, caches):
            return self.decoder.apply(
                params, toks, pos, kvs, caches, tables=tables,
                method=DynamicConvDecoder.step_chunk)

        def draft_fn(tokens, pos, finished):
            return ngram_drafts(source, tokens, pos, spec_k - 1,
                                n=ngram_n, pad_id=config.pad_id)

        return speculative_greedy(chunk_fn, commit_conv_caches, caches,
                                  seed, config, spec_k, draft_fn)

    def attention_maps(self, params, batch: Dict[str, jax.Array],
                       token_ids: jax.Array):
        """[L] list of {context: [B, T, S']} head-averaged attention
        maps over `token_ids` (typically generated captions)."""
        contexts = self._contexts(batch)
        return self.decoder.apply(
            params, token_ids, contexts,
            method=DynamicConvDecoder.attention_maps)

    def generate_beam(self, params, batch: Dict[str, jax.Array],
                      config: GenerationConfig = GenerationConfig(),
                      impl: str = "topk"):
        """Beam-searched captions [B, beam, max_len+1] + scores.

        Beam-specific traffic optimizations (v5e measurements in
        BASELINE.md):
        - context K/V stay UNtiled and are shared across beams inside
          the attention (attend_flat_beam);
        - impl="topk" (production): the step emits exact per-row top-K
          candidates from the adaptive-softmax bands — no [B*K, V]
          log-prob materialization, K*K-wide combine instead of the
          K*V-wide top_k — and ancestry reorders run as one-hot
          matmuls (permute_rows) over ring conv caches;
        - impl="lazy": slot-map-composed cache permutations (kept for
          ablation; the per-layer gather-through-map read regressed
          vs shifted caches on v5e);
        - impl="shift": shifted-copy caches + full-vocab flat top_k
          (the r01 baseline path).
        """
        contexts = self._contexts(batch)
        B = contexts["image"].shape[0]
        K = config.beam_size
        self._check_max_len(config)
        kvs = self._decode_setup(params, contexts,
                                 quantize_kv=config.quantize_kv)
        seed = jnp.full((B,), config.bos_id, jnp.int32)

        if impl == "topk":
            ring_major = self.decoder.fused_decode_ok()
            caches = self.decoder.init_cache(B * K,
                                             ring_major=ring_major)

            tables = self._head_tables(params, config)

            def step(tok, i, caches):
                return self.decoder.apply(
                    params, tok, i, kvs, caches, K, beam=K,
                    ring_major=ring_major, tables=tables,
                    method=DynamicConvDecoder.step_topk)

            reorder = None
            if ring_major:
                from news_image_caption_tpu.generation.generator import \
                    permute_ring_rows

                def reorder(caches, flat_src):
                    return [permute_ring_rows(c, flat_src)
                            for c in caches]

            return beam_search_candidates(step, caches, seed, config,
                                          reorder_fn=reorder)
        caches = self.decoder.init_cache(B * K)

        if impl == "lazy":
            slot_maps = self.decoder.init_slot_maps(B * K)

            def step(tok, i, state):
                conv_caches, maps = state
                lp, nc, nm = self.decoder.apply(
                    params, tok, i, kvs, conv_caches, maps, beam=K,
                    method=DynamicConvDecoder.step_beam_lazy)
                return lp, (nc, nm)

            def reorder(state, flat_src):
                conv_caches, maps = state
                return conv_caches, [m[:, flat_src] for m in maps]

            return beam_search(step, (caches, slot_maps), seed, config,
                               reorder_fn=reorder)

        if impl == "shift":
            def step(tok, i, caches):
                return self.decoder.apply(
                    params, tok, i, kvs, caches, beam=K,
                    method=DynamicConvDecoder.step_shift)
            return beam_search(step, caches, seed, config)

        raise ValueError(f"unknown beam impl: {impl!r}")
