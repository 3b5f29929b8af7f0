"""Pointer/entity captioner family (copy mechanism over the article).

Capability parity targets:
- TransformerPointerModel (/root/reference/ttl/tell/models/transformer_pointer.py:27-722):
  entity head = gated SelfAttention over decoder outputs -> 2-way
  classifier; copy head = multi-head attention *scores* between
  decoder outputs and RoBERTa article hiddens, masked to proper-noun
  positions, aggregated per token id; reduced-vocab scatter-add copy
  loss; generation mixes copy vs generate by the entity gate.
- SelfAttention / DownsampledMultiHeadAttention / scalar_bias
  (/root/reference/ttl/tell/modules/attention/self_attention.py:10,
   downsampled_single_head.py:12, scalar_bias.py:10-31)
- variants: transformer_only_pointer (no entity head),
  transformer_pointer_2 (loss mix), transformer_faces_pointer /
  transformer_objects_pointer (extra contexts),
  transformer_pretrained_entity_pointer (warm start via
  LoadStateDictWithPrefix -> here: plain param-dict merge).

TPU-first re-design of the copy loss: the reference builds a reduced
vocabulary with `unique()` + scatter_add (shape-dynamic,
transformer_pointer.py:265-298). The copy probability of the target
token is just sum_s attn[b,l,s] * [ctx_ids[b,s] == target[b,l]] over
relevant positions — an O(L*S) masked sum with static shapes and NO
vocab-sized materialization at all. For generation, the full copy
distribution is one segment-sum scatter into [B, V] per step.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.models.captioner import (TransformerFlattened,
                                                     shift_caption)
from news_image_caption_tpu.models.decoder_flattened import \
    DynamicConvDecoder
from news_image_caption_tpu.ops.dropout import dropout
from news_image_caption_tpu.ops.linear import GehringLinear
from news_image_caption_tpu.utils.registry import MODELS

LN2 = math.log(2.0)
NEG = -1e9


class EntitySelfAttention(nn.Module):
    """Gated self-attention + scalar-bias slot + residual LayerNorm.

    Parity: SelfAttention(out_channels=1024, embed_dim=1024,
    num_heads=16, gated=True) at transformer_pointer.py:91-92. With
    project_input=False the inner gated projections are dead params;
    the live path is q/k/v GehringLinears, causal single-softmax
    attention with a zero "attend to nothing" slot, out GehringLinear,
    then LayerNorm(x + residual).
    """

    embed_dim: int = 1024
    num_heads: int = 16

    def setup(self):
        self.in_proj_q = GehringLinear(self.embed_dim, name="in_proj_q")
        self.in_proj_k = GehringLinear(self.embed_dim, name="in_proj_k")
        self.in_proj_v = GehringLinear(self.embed_dim, name="in_proj_v")
        self.out_proj = GehringLinear(self.embed_dim, name="out_proj")
        self.ln = nn.LayerNorm(name="ln")

    def _attend(self, q, k, v):
        """q [B,T,H,hd]; k,v [B,S,H,hd] -> [B,T,E] with causal+bias."""
        B, T, H, hd = q.shape
        S = k.shape[1]
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        i = jnp.arange(T)[:, None]
        j = jnp.arange(S)[None, :]
        # STRICT causal: the reference masks the diagonal too ("we
        # don't attend to ourself", downsampled_single_head.py
        # _mask_future_full: tril(ones, diagonal=-1)); position 0
        # attends only to the scalar-bias slot.
        causal = jnp.where(j < i + (S - T), 0.0, NEG)
        scores = scores + causal[None, None]
        # scalar bias: a zero-score, zero-value slot at position 0
        zeros = jnp.zeros((B, H, T, 1), scores.dtype)
        scores = jnp.concatenate([zeros, scores], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        v_pad = jnp.concatenate(
            [jnp.zeros((B, 1, H, hd), v.dtype), v], axis=1)
        out = jnp.einsum("bhts,bshd->bthd", probs, v_pad)
        return out.reshape(B, T, H * hd)

    def __call__(self, x: jax.Array) -> jax.Array:
        """x [B, T, E] -> [B, T, E] (full sequence, causal)."""
        B, T, E = x.shape
        H, hd = self.num_heads, self.embed_dim // self.num_heads
        scale = hd ** -0.5
        q = (self.in_proj_q(x) * scale).reshape(B, T, H, hd)
        k = self.in_proj_k(x).reshape(B, T, H, hd)
        v = self.in_proj_v(x).reshape(B, T, H, hd)
        out = self.out_proj(self._attend(q, k, v))
        return self.ln(out + x)

    def init_cache(self, batch_size: int, max_len: int,
                   dtype=jnp.float32):
        """dtype must match the model's compute dtype (a bf16 model
        writes bf16 K/V — dynamic_update_slice requires it)."""
        hd = self.embed_dim // self.num_heads
        shape = (batch_size, max_len, self.num_heads, hd)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def step(self, x_t: jax.Array, pos, cache):
        """x_t [B, E]; bounded KV cache; returns ([B,E], cache)."""
        B, E = x_t.shape
        H, hd = self.num_heads, E // self.num_heads
        scale = hd ** -0.5
        k_c, v_c = cache
        q = (self.in_proj_q(x_t) * scale).reshape(B, 1, H, hd)
        k_new = self.in_proj_k(x_t).reshape(B, 1, H, hd)
        v_new = self.in_proj_v(x_t).reshape(B, 1, H, hd)
        k_c = jax.lax.dynamic_update_slice(
            k_c, k_new.astype(k_c.dtype), (0, pos, 0, 0))
        v_c = jax.lax.dynamic_update_slice(
            v_c, v_new.astype(v_c.dtype), (0, pos, 0, 0))
        S = k_c.shape[1]
        scores = jnp.einsum("bthd,bshd->bhts", q, k_c,
                            preferred_element_type=jnp.float32)
        # Strict causal in incremental mode too: the current token's
        # K/V is cached but not attended this step
        # (_mask_future_partial masks the last column).
        valid = (jnp.arange(S) < pos)[None, None, None, :]
        scores = jnp.where(valid, scores, NEG)
        zeros = jnp.zeros((B, H, 1, 1), scores.dtype)
        scores = jnp.concatenate([zeros, scores], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1).astype(v_c.dtype)
        v_pad = jnp.concatenate(
            [jnp.zeros((B, 1, H, hd), v_c.dtype), v_c], axis=1)
        out = jnp.einsum("bhts,bshd->bthd", probs, v_pad)
        out = self.out_proj(out.reshape(B, 1, E))[:, 0]
        return self.ln(out + x_t), (k_c, v_c)

    def chunk(self, x_c: jax.Array, pos: jax.Array, cache):
        """k-position chunk step (speculative verification).

        x_c [B, k, E]; pos [B] absolute index of x_c[:, 0]; bounded
        KV cache. Writes the k new K/V rows at pos..pos+k-1 per row
        and returns ([B, k, E], cache) where chunk position j's
        output equals j+1 sequential `step` calls (strict causal:
        absolute position pos+j attends rows < pos+j, which includes
        the chunk's own earlier rows). Rewind after a partial commit
        is free: rows past the committed frontier are never attended
        (the causal mask bounds at the frontier) and the next chunk
        overwrites them. The cache must hold max_len + k rows so the
        trailing chunk writes never clamp.
        """
        B, k, E = x_c.shape
        H, hd = self.num_heads, E // self.num_heads
        scale = hd ** -0.5
        k_c, v_c = cache
        q = (self.in_proj_q(x_c) * scale).reshape(B, k, H, hd)
        k_new = self.in_proj_k(x_c).reshape(B, k, H, hd)
        v_new = self.in_proj_v(x_c).reshape(B, k, H, hd)
        upd = lambda c, u, p: jax.lax.dynamic_update_slice(
            c, u, (p, 0, 0))
        k_c = jax.vmap(upd)(k_c, k_new.astype(k_c.dtype), pos)
        v_c = jax.vmap(upd)(v_c, v_new.astype(v_c.dtype), pos)
        S = k_c.shape[1]
        scores = jnp.einsum("bthd,bshd->bhts", q, k_c,
                            preferred_element_type=jnp.float32)
        limit = (pos[:, None, None, None]
                 + jnp.arange(k)[None, None, :, None])
        valid = jnp.arange(S)[None, None, None, :] < limit
        scores = jnp.where(valid, scores, NEG)
        zeros = jnp.zeros((B, H, k, 1), scores.dtype)
        scores = jnp.concatenate([zeros, scores], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1).astype(v_c.dtype)
        v_pad = jnp.concatenate(
            [jnp.zeros((B, 1, H, hd), v_c.dtype), v_c], axis=1)
        out = jnp.einsum("bhts,bshd->bthd", probs, v_pad)
        out = self.out_proj(out.reshape(B, k, E))
        return self.ln(out + x_c), (k_c, v_c)


class CopyAttentionScores(nn.Module):
    """Head-averaged attention probabilities decoder -> article.

    Parity: multi_head_attention_score_forward with a fused (q, k)
    in-projection, learned bias_k slot and add_zero_attn
    (multi_head.py:14-205; call site transformer_pointer.py:232-239).
    Returns [B, L, S] (the two extra slots already dropped).
    """

    embed_dim: int = 1024
    num_heads: int = 16
    kdim: Optional[int] = None   # key input dim (reference: == embed_dim)
    dropout_rate: float = 0.1

    def setup(self):
        kdim = self.kdim or self.embed_dim
        # The reference fuses (q, k) into one 2E x E in_proj_weight
        # (multi_head.py:520-526); stored split here so kdim may
        # differ — porting splits the fused tensor.
        self.q_proj_w = self.param(
            "q_proj_weight", nn.initializers.xavier_uniform(),
            (self.embed_dim, self.embed_dim))
        self.k_proj_w = self.param(
            "k_proj_weight", nn.initializers.xavier_uniform(),
            (kdim, self.embed_dim))
        self.in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (2 * self.embed_dim,))
        self.bias_k = self.param(
            "bias_k", nn.initializers.xavier_normal(),
            (1, 1, self.embed_dim))
        # out_proj exists in the reference state dict but the score
        # path never uses it; kept for checkpoint-port parity.
        self.out_proj = GehringLinear(self.embed_dim, name="out_proj")

    def __call__(self, query: jax.Array, key: jax.Array,
                 key_padding_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """query [B,L,E]; key [B,S,E]; mask True=pad -> probs [B,L,S]."""
        B, L, E = query.shape
        S = key.shape[1]
        H, hd = self.num_heads, E // self.num_heads
        q = query @ self.q_proj_w + self.in_proj_bias[:E]
        k = key @ self.k_proj_w + self.in_proj_bias[E:]
        q = q * (hd ** -0.5)
        k = jnp.concatenate(
            [k, jnp.broadcast_to(self.bias_k, (B, 1, E))], axis=1)
        k = jnp.concatenate([k, jnp.zeros((B, 1, E), k.dtype)], axis=1)
        valid = (jnp.ones((B, S), bool) if key_padding_mask is None
                 else ~key_padding_mask)
        valid = jnp.concatenate(
            [valid, jnp.ones((B, 2), bool)], axis=1)
        q = q.reshape(B, L, H, hd)
        kh = k.reshape(B, S + 2, H, hd)
        scores = jnp.einsum("blhd,bshd->bhls", q, kh,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(valid[:, None, None, :], scores, NEG)
        probs = jax.nn.softmax(scores, axis=-1)
        if self.dropout_rate > 0.0 and not deterministic:
            probs = dropout(self, probs, self.dropout_rate,
                            deterministic=False)
        probs = probs.mean(axis=1)          # head average -> [B, L, S+2]
        return probs[:, :, :S]


def copy_target_prob(copy_attn: jax.Array, context_ids: jax.Array,
                     target_ids: jax.Array) -> jax.Array:
    """p_copy(target) [B, L] = sum_s attn[b,l,s]*[ctx[b,s]==tgt[b,l]].

    Static-shape equivalent of the reference's reduced-vocab
    scatter_add + gather (transformer_pointer.py:265-298).
    """
    match = (context_ids[:, None, :] == target_ids[:, :, None])
    return jnp.sum(copy_attn * match, axis=-1)


def copy_distribution(copy_attn: jax.Array, context_ids: jax.Array,
                      vocab_size: int) -> jax.Array:
    """Full copy distribution [B, V] via scatter-add (generation)."""
    B, S = context_ids.shape
    zeros = jnp.zeros((B, vocab_size), copy_attn.dtype)
    return zeros.at[jnp.arange(B)[:, None], context_ids].add(copy_attn)


@MODELS.register("transformer_pointer")
class TransformerPointer:
    """Flagship captioner + entity gate + copy head.

    loss_weights (gen, entity, copy): the reference's
    `transformer_pointer` trains ONLY entity+copy (a fine-tuning
    stage over a pretrained base, transformer_pointer.py:120-127);
    `transformer_pointer_2`-style joint training uses (1, 1, 1).
    `use_entity_head=False` gives `transformer_only_pointer`.
    """

    def __init__(self,
                 captioner: Optional[TransformerFlattened] = None,
                 embed_dim: int = 1024,
                 num_heads: int = 16,
                 article_dim: Optional[int] = None,
                 loss_weights: Tuple[float, float, float] = (0., 1., 1.),
                 use_entity_head: bool = True,
                 max_entities: Optional[int] = None,
                 **decoder_kwargs):
        if captioner is None:
            # forward the shared dims into the decoder config
            decoder_kwargs.setdefault("embed_dim", embed_dim)
            decoder_kwargs.setdefault("num_heads", num_heads)
            if article_dim is not None:
                decoder_kwargs.setdefault("article_dim", article_dim)
            captioner = TransformerFlattened(**decoder_kwargs)
        self.captioner = captioner
        d = self.captioner.decoder
        # entity/copy heads operate on the decoder's hidden size
        embed_dim = d.embed_dim
        self.vocab_size = d.vocab_size
        self.pad_id = d.target_padding_idx
        self.embed_dim = embed_dim
        self.article_dim = article_dim or d.article_dim
        self.entity_attn = EntitySelfAttention(embed_dim, num_heads)
        self.entity_fc_mod = GehringLinear(2)
        self.copy_attn = CopyAttentionScores(embed_dim, num_heads,
                                             kdim=self.article_dim)
        self.loss_weights = loss_weights
        self.use_entity_head = use_entity_head
        # Accepted for config back-compat; the copy loss is segment-
        # vectorized over ALL entity indices, so no cap applies.
        del max_entities

    # -- init -----------------------------------------------------------
    def init(self, rng, batch):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        variables = {"captioner": self.captioner.init(r1, batch)}
        inp, _ = shift_caption(batch["caption_ids"])
        B, L = inp.shape
        x = jnp.zeros((B, L, self.embed_dim))
        art = jnp.zeros((B, batch["article_ids"].shape[1],
                         self.article_dim))
        variables["entity_attn"] = self.entity_attn.init(r2, x)
        variables["entity_fc"] = self.entity_fc_mod.init(
            r3, x[:, 0, :])
        variables["copy_attn"] = self.copy_attn.init(r4, x, art)
        return variables

    def load_pretrained_captioner(self, variables, captioner_params):
        """Warm start (LoadStateDictWithPrefix equivalent)."""
        return {**variables, "captioner": captioner_params}

    # -- losses ---------------------------------------------------------
    def _decoder_hidden(self, params, batch, deterministic, rngs):
        ctx = self.captioner._contexts(batch)
        inp, tgt = shift_caption(batch["caption_ids"])
        x = self.captioner.decoder.apply(
            params, inp, ctx, deterministic=deterministic, rngs=rngs,
            method=DynamicConvDecoder.hidden)
        return x, inp, tgt, ctx

    def loss_fn(self, variables, batch, dropout_rng=None):
        """Returns (loss, aux) with gen/entity/copy components.

        Extra batch keys:
          caption_copy_masks [B, Lc]: per-token entity index (0 = not
            an entity, i>=1 = i-th entity, -1 = ignore), full caption
            length (shifted internally like the caption).
          context_proper_masks [B, S]: >=1 marks proper-noun tokens.
          article_ids [B, S], article (RoBERTa features) [B, S, De].
        """
        deterministic = dropout_rng is None
        # Distinct key per top-level apply: flax derives site keys
        # from the apply's ROOT key by module path, so two applies fed
        # the same rng produce element-identical masks at same-path
        # sites (verified: decoder embed dropout vs copy-attn dropout
        # shared their bit-stream).
        def _rngs(salt):
            if deterministic:
                return {}
            return {"dropout": jax.random.fold_in(dropout_rng, salt)}

        rngs = _rngs(0)
        params = variables["captioner"]
        x, inp, tgt, ctx = self._decoder_hidden(
            params, batch, deterministic, rngs)
        B, L, D = x.shape

        # generation loss (adaptive softmax) on the same hidden states
        loss_sum, ntokens = self.captioner.decoder.apply(
            params, x, tgt, deterministic=deterministic,
            rngs=_rngs(1), method=DynamicConvDecoder.loss_from_hidden)
        gen_loss = loss_sum / LN2 / jnp.maximum(ntokens, 1)

        # entity loss
        copy_masks = batch["caption_copy_masks"][:, 1:]  # align targets
        copy_masks = copy_masks[:, :L]
        if self.use_entity_head:
            x_entity = self.entity_attn.apply(
                variables["entity_attn"], x)
            entity_logits = self.entity_fc_mod.apply(
                variables["entity_fc"], x_entity)
            ent_tgt = jnp.clip(copy_masks, -1, 1)
            lse = jax.nn.log_softmax(
                entity_logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(
                lse, jnp.maximum(ent_tgt, 0)[..., None], axis=-1)[..., 0]
            valid = ent_tgt >= 0
            entity_loss = (jnp.sum(jnp.where(valid, nll, 0.0))
                           / jnp.maximum(jnp.sum(valid), 1)) / LN2
        else:
            entity_loss = jnp.float32(0.0)

        if self.use_entity_head:
            # copy loss
            copy_attn = self.copy_attn.apply(
                variables["copy_attn"], x, batch["article"],
                batch.get("article_mask"),
                deterministic=deterministic, rngs=_rngs(2))
            relevant = batch["context_proper_masks"] >= 1    # [B, S]
            copy_attn = copy_attn * relevant[:, None, :]
            p_tgt = copy_target_prob(copy_attn, batch["article_ids"],
                                     tgt)
            # Reference quirk (transformer_pointer.py:297-299):
            # log-probs are only filled where copy mass is positive,
            # so a target with zero copy probability contributes 0
            # loss, not -log(eps).
            log_p = jnp.where(p_tgt > 0,
                              jnp.log(jnp.maximum(p_tgt, 1e-12)), 0.0)
            # Per-entity mean of -log_p, summed over the entity
            # indices present — segment ops instead of a capped
            # Python loop, so ANY number of entity spans is
            # supervised (the reference loops to the batch's dynamic
            # max index, transformer_pointer.py:414).
            ids = jnp.maximum(copy_masks, 0).reshape(-1)
            on = (copy_masks >= 1).reshape(-1)
            num = batch["caption_copy_masks"].shape[1] + 1
            sums = jax.ops.segment_sum(
                jnp.where(on, (-log_p).reshape(-1), 0.0), ids,
                num_segments=num)
            cnts = jax.ops.segment_sum(
                on.astype(jnp.float32), ids, num_segments=num)
            per_entity = jnp.where(cnts > 0,
                                   sums / jnp.maximum(cnts, 1.0), 0.0)
            copy_loss = jnp.sum(per_entity[1:]) / LN2
            # Reference early return (transformer_pointer.py:189-190):
            # a batch with no entity tokens contributes NEITHER
            # entity nor copy loss (no gradient on the gate), not an
            # all-class-0 entity gradient.
            has_entities = jnp.any(copy_masks >= 1)
            entity_loss = jnp.where(has_entities, entity_loss, 0.0)
            copy_loss = jnp.where(has_entities, copy_loss, 0.0)
        else:
            # transformer_only_pointer: the reference's copy/entity
            # machinery is entirely commented out (transformer_only_
            # pointer.py:81-162) — it trains on the generation loss
            # alone.
            copy_loss = jnp.float32(0.0)

        wg, we, wc = self.loss_weights
        loss = wg * gen_loss + we * entity_loss + wc * copy_loss
        return loss, {"gen_loss": gen_loss, "entity_loss": entity_loss,
                      "copy_loss": copy_loss, "sample_size": ntokens}

    # -- generation -----------------------------------------------------
    def _decode_setup(self, variables, batch, e_cache_len: int):
        """Decode-time setup shared by generate/generate_speculative:
        head-major context KV, conv caches, entity KV cache of the
        requested length, and the proper-noun relevance mask."""
        from news_image_caption_tpu.ops.attention import decode_kv_tree
        params = variables["captioner"]
        dec = self.captioner.decoder
        ctx = self.captioner._contexts(batch)
        B = ctx["image"].shape[0]
        kvs = decode_kv_tree(dec.apply(
            params, ctx, method=DynamicConvDecoder.precompute_kv))
        conv_caches = dec.init_cache(B)
        e_cache = self.entity_attn.init_cache(
            B, e_cache_len,
            dtype=getattr(dec, "dtype", None) or jnp.float32)
        relevant = (batch["context_proper_masks"] >= 1).astype(
            jnp.float32)
        return dec, B, kvs, conv_caches, e_cache, relevant

    def generate(self, variables, batch,
                 config: GenerationConfig = GenerationConfig(),
                 rng=None):
        """Top-k generation with copy-vs-generate mixing.

        Parity: transformer_pointer.py:427-640 — per step: entity gate
        from self-attended decoder outputs, copy candidate from the
        aggregated copy distribution (suppressed if prob < 1e-6 or the
        token was already copied), else the generated token.
        Returns (tokens [B, max_len+1], copied_flags [B, max_len]).
        """
        params = variables["captioner"]
        if not self.use_entity_head:
            # transformer_only_pointer: the reference generates from
            # the decoder distribution alone — its copy gate is
            # commented out (transformer_only_pointer.py:176,
            # :536-640) — so there is no discrete copy path here
            # (previously this hard-set should_copy=True and emitted
            # strings of article entities).
            tokens, _ = self.captioner.generate(params, batch, config,
                                                rng)
            return tokens, jnp.zeros(
                (tokens.shape[0], config.max_len), bool)
        dec, B, kvs, caches, e_cache, relevant = self._decode_setup(
            variables, batch, config.max_len + 1)
        context_ids = batch["article_ids"]
        article = batch["article"]
        article_mask = batch.get("article_mask")
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def body(carry, i):
            cur, finished, caches, e_cache, copied, key = carry
            lp, h, caches = dec.apply(
                params, cur, i, kvs, caches,
                method=DynamicConvDecoder.step_with_hidden)
            # entity gate on the self-attended decode history
            h_ent, e_cache = self.entity_attn.apply(
                variables["entity_attn"], h, i, e_cache,
                method=EntitySelfAttention.step)
            ent_logits = self.entity_fc_mod.apply(
                variables["entity_fc"], h_ent)
            should_copy = jnp.argmax(ent_logits, axis=-1) == 1
            # copy distribution over the vocab
            attn = self.copy_attn.apply(
                variables["copy_attn"], h[:, None, :], article,
                article_mask)[:, 0, :]
            attn = attn * relevant
            dist = copy_distribution(attn, context_ids, self.vocab_size)
            key, k1, k2 = jax.random.split(key, 3)
            topc_p, topc_idx = jax.lax.top_k(dist, config.sampling_topk)
            if config.sampling_topk == 1:
                choice_c = jnp.zeros((B,), jnp.int32)
            else:
                choice_c = jax.random.categorical(
                    k1, jnp.log(jnp.maximum(topc_p, 1e-9)), axis=-1)
            copy_tok = jnp.take_along_axis(
                topc_idx, choice_c[:, None], axis=1)[:, 0]
            # Reference semantics (transformer_pointer.py:585-625): the
            # candidate is selected on the UNMASKED distribution; if
            # ANY of the top-k copy probs is (near-)zero — not just the
            # sampled one: `should_copy &= ~empty_copy.max(dim=1)` —
            # or the token was already copied, copying is suppressed
            # for this step (fall back to generation) rather than
            # re-ranked to the next-best candidate.
            has_copied = copied[jnp.arange(B), copy_tok]
            all_topk_nonzero = jnp.all(topc_p >= 1e-6, axis=-1)
            should_copy = should_copy & all_topk_nonzero & ~has_copied
            # generated token
            topg_lp, topg_idx = jax.lax.top_k(lp, config.sampling_topk)
            topg_lp = topg_lp / config.sampling_temp
            if config.sampling_topk == 1:
                choice_g = jnp.zeros((B,), jnp.int32)
            else:
                choice_g = jax.random.categorical(k2, topg_lp, axis=-1)
            gen_tok = jnp.take_along_axis(
                topg_idx, choice_g[:, None], axis=1)[:, 0]
            tok = jnp.where(should_copy, copy_tok, gen_tok)
            tok = jnp.where(finished, config.pad_id, tok)
            copied = copied.at[jnp.arange(B), copy_tok].set(
                copied[jnp.arange(B), copy_tok] | should_copy)
            finished = finished | (tok == config.eos_id)
            return ((tok, finished, caches, e_cache, copied, key),
                    (tok, should_copy & ~finished))

        seed = jnp.full((B,), config.bos_id, jnp.int32)
        copied0 = jnp.zeros((B, self.vocab_size), bool)
        finished0 = jnp.zeros((B,), bool)
        carry = (seed, finished0, caches, e_cache, copied0, rng)
        _, (toks, copied_flags) = jax.lax.scan(
            body, carry, jnp.arange(config.max_len))
        tokens = jnp.concatenate([seed[:, None], toks.T], axis=1)
        return tokens, copied_flags.T

    def pointer_chunk(self, variables, toks, pos, tree, caches,
                      eos_id: int):
        """One chunked pointer decode step — the single implementation
        shared by `generate_speculative` and the continuous engine
        (generation/continuous.py::ContinuousBatcher.for_pointer).

        tree: per-call context {kvs, article, article_mask,
        context_ids, relevant}; caches: (conv, entity_kv, copied).
        Returns (lp [B, k], ids [B, k], aux, copied_flags [B, k]).
        """
        dec = self.captioner.decoder
        conv, e_c, copied = caches
        B, k = toks.shape
        rows = jnp.arange(B)
        lp, gen_ids, h, hs = dec.apply(
            variables["captioner"], toks, pos, tree["kvs"], conv,
            method=DynamicConvDecoder.step_chunk_with_hidden)
        h_ent, e_c = self.entity_attn.apply(
            variables["entity_attn"], h, pos, e_c,
            method=EntitySelfAttention.chunk)
        ent_logits = self.entity_fc_mod.apply(
            variables["entity_fc"], h_ent)               # [B, k, 2]
        want_copy = jnp.argmax(ent_logits, axis=-1) == 1
        attn = self.copy_attn.apply(
            variables["copy_attn"], h, tree["article"],
            tree["article_mask"])
        attn = attn * tree["relevant"][:, None, :]       # [B, k, S]
        dist = copy_distribution(
            attn.reshape(B * k, -1),
            jnp.repeat(tree["context_ids"], k, axis=0),
            self.vocab_size)
        copy_p, copy_idx = jax.lax.top_k(dist, 1)
        copy_tok = copy_idx[:, 0].reshape(B, k)
        copy_p = copy_p[:, 0].reshape(B, k)
        # Greedy specialization of the reference gate: top-1 copy
        # candidate, suppressed on (near-)zero prob or a previous
        # copy of the same token (transformer_pointer.py:585-625).
        # The within-chunk replay is O(k^2) [B]-vector compares:
        # "already copied" = committed `copied` gather OR an
        # ACCEPTED copy of the same token earlier in this chunk —
        # no [B, V] state materializes per position.
        gate_pre = want_copy & (copy_p >= 1e-6)
        committed_hit = copied[rows[:, None], copy_tok]  # [B, k]
        ids, gates = [], []
        for j in range(k):
            cj = copy_tok[:, j]
            dup = committed_hit[:, j]
            for i in range(j):
                dup = dup | (gates[i] & (copy_tok[:, i] == cj))
            gj = gate_pre[:, j] & ~dup
            ids.append(jnp.where(gj, cj, gen_ids[:, j]))
            gates.append(gj)
        ids = jnp.stack(ids, axis=1)
        gates = jnp.stack(gates, axis=1)
        # generate() drops the flag when the copied token is eos
        # (finished flips before the flag is emitted).
        flags = gates & (ids != eos_id)
        return lp, ids, (hs, e_c, copy_tok, gates), flags

    @staticmethod
    def pointer_commit(caches, aux, m):
        """Advance (conv, entity_kv, copied) by each row's verified
        prefix (companion of `pointer_chunk`)."""
        from news_image_caption_tpu.generation.speculative import \
            commit_conv_caches
        conv, _, copied = caches
        hs, e_c, copy_tok, gates = aux
        conv = commit_conv_caches(conv, hs, m)
        live = (jnp.arange(copy_tok.shape[1])[None, :]
                < m[:, None])
        rows = jnp.arange(copy_tok.shape[0])
        copied = copied.at[rows[:, None], copy_tok].max(gates & live)
        return conv, e_c, copied

    def generate_speculative(self, variables, batch,
                             config: GenerationConfig = GenerationConfig(),
                             spec_k: int = 8,
                             draft_source=None, ngram_n: int = 2):
        """Exact speculative greedy decode for the pointer family.

        Token-for-token identical to `generate` with sampling_topk=1
        (draft-and-verify, generation/speculative.py): one chunked
        decoder forward verifies spec_k positions, the entity gate +
        copy head run on the chunk hiddens, and the sequential parts
        of the copy gate — the already-copied suppression
        (transformer_pointer.py:585-625) and the entity self-attention
        over generated hiddens — are handled by a cheap within-chunk
        scan and a causally-masked KV cache whose rewind is free
        (stale rows are never attended and get overwritten).

        Returns (tokens [B, max_len+1], copied_flags [B, max_len],
        n_chunks). The default draft source is batch["article_ids"]
        (news captions copy entity spans — the very property this
        model family exists for).
        """
        from news_image_caption_tpu.generation.speculative import (
            commit_conv_caches, ngram_drafts, speculative_greedy)
        if config.sampling_topk != 1:
            raise ValueError("speculative decoding is greedy-only "
                             "(sampling_topk must be 1)")
        params = variables["captioner"]
        if not self.use_entity_head:
            # transformer_only_pointer: decoder distribution alone
            # (see `generate`); delegate to the flagship engine.
            tokens, _, n_chunks = self.captioner.generate_speculative(
                params, batch, config, spec_k=spec_k,
                draft_source=draft_source, ngram_n=ngram_n)
            return tokens, jnp.zeros(
                (tokens.shape[0], config.max_len), bool), n_chunks
        # max_len + spec_k entity-KV rows: chunk writes at pos <=
        # max_len - 1 must never clamp (EntitySelfAttention.chunk).
        dec, B, kvs, conv_caches, e_cache, relevant = \
            self._decode_setup(variables, batch,
                               config.max_len + spec_k)
        tree = {"kvs": kvs, "article": batch["article"],
                "article_mask": batch.get("article_mask"),
                "context_ids": batch["article_ids"],
                "relevant": relevant}
        source = (draft_source if draft_source is not None
                  else batch["article_ids"])
        copied0 = jnp.zeros((B, self.vocab_size), bool)

        def chunk_fn(toks, pos, caches):
            return self.pointer_chunk(variables, toks, pos, tree,
                                      caches, config.eos_id)

        commit_fn = self.pointer_commit

        def draft_fn(tokens, pos, finished):
            return ngram_drafts(source, tokens, pos, spec_k - 1,
                                n=ngram_n, pad_id=config.pad_id)

        seed = jnp.full((B,), config.bos_id, jnp.int32)
        tokens, _, flags, n_chunks = speculative_greedy(
            chunk_fn, commit_fn, (conv_caches, e_cache, copied0),
            seed, config, spec_k, draft_fn, collect_flags=True)
        return tokens, flags, n_chunks
