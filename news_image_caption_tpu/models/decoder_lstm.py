"""Input-feeding LSTM decoder over image/article contexts.

Capability parity target: `lstm_decoder_flattened` + AttentionLayer
(/root/reference/ttl/tell/models/decoder_flattened_lstm.py:14-230)
and the `baseline_glove` model pairing it with GloVe article features
(/root/reference/ttl/tell/models/baseline_glove.py:22). Luong-style
input feeding: each step consumes [token embed, previous attention
output]; stacked LSTM cells with LEARNED initial states; dot-product
attention over image and article sources; tanh-projected mix; tied
adaptive softmax head (reused from ops/adaptive.py).

TPU-first: the per-step Python loop becomes a `jax.lax.scan` over the
pure step function in the functional wrapper (flax forbids bound
submodule calls inside jax control flow), exactly like the Gen-1
family.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from news_image_caption_tpu.generation.generator import (GenerationConfig,
                                                         generate)
from news_image_caption_tpu.models.decoder_flattened import SumEmbedder
from news_image_caption_tpu.ops.adaptive import AdaptiveSoftmax
from news_image_caption_tpu.ops.dropout import dropout
from news_image_caption_tpu.ops.linear import GehringLinear
from news_image_caption_tpu.utils.registry import DECODERS, MODELS

LN2 = math.log(2.0)


class AttentionLayer(nn.Module):
    """Dot attention: score = source . proj(query); tanh mix-proj.

    Parity: decoder_flattened_lstm.py:14-64.
    """

    source_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, query: jax.Array, source: jax.Array,
                 source_mask: Optional[jax.Array] = None):
        """query [B, H]; source [B, S, D]; mask True = pad."""
        x = GehringLinear(self.source_dim, name="input_proj")(query)
        scores = jnp.einsum("bsd,bd->bs", source, x)
        if source_mask is not None:
            scores = jnp.where(source_mask, -1e9, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        mix = jnp.einsum("bs,bsd->bd", attn, source)
        out = jnp.tanh(GehringLinear(self.output_dim, name="output_proj")(
            jnp.concatenate([mix, query], axis=-1)))
        return out, attn


class TorchLSTMCellWithBias(nn.Module):
    """torch.nn.LSTMCell semantics (gate order i,f,g,o; both biases)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x, state):
        h, c = state
        gates = (nn.Dense(4 * self.hidden_size, name="ih")(x)
                 + nn.Dense(4 * self.hidden_size, name="hh")(h))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h = nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)


class LSTMState(NamedTuple):
    h: Tuple[jax.Array, ...]       # per layer [B, H]
    c: Tuple[jax.Array, ...]
    input_feed: jax.Array          # [B, H]


@DECODERS.register("lstm_decoder_flattened")
class LSTMDecoder(nn.Module):
    """Embedder + stacked input-feeding cells + context attention."""

    vocab_size: int = 50265
    embed_dim: int = 1024
    hidden_size: int = 1024
    num_layers: int = 2
    cutoff: Sequence[int] = (5000, 20000, 50265)
    tie_adaptive_proj: bool = False
    image_dim: int = 2048
    article_dim: int = 1024
    dropout_rate: float = 0.1
    padding_idx: int = 0
    target_padding_idx: int = 1
    max_positions: int = 512

    def setup(self):
        self.embedder = SumEmbedder(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            cutoff=tuple(self.cutoff), padding_idx=self.padding_idx,
            pos_padding_idx=self.target_padding_idx,
            max_positions=self.max_positions, name="embedder")
        self.cells = [TorchLSTMCellWithBias(self.hidden_size,
                                            name=f"cells_{i}")
                      for i in range(self.num_layers)]
        self.h0 = [self.param(f"h0_{i}", nn.initializers.zeros,
                              (1, self.hidden_size))
                   for i in range(self.num_layers)]
        self.c0 = [self.param(f"c0_{i}", nn.initializers.zeros,
                              (1, self.hidden_size))
                   for i in range(self.num_layers)]
        self.image_attention = AttentionLayer(
            self.image_dim, self.hidden_size, name="image_attention")
        self.article_attention = AttentionLayer(
            self.article_dim, self.hidden_size,
            name="article_attention")
        self.attn_proj = GehringLinear(self.hidden_size,
                                       name="attn_proj")
        self.adaptive_softmax = AdaptiveSoftmax(
            vocab_size=self.vocab_size, input_dim=self.embed_dim,
            cutoff=tuple(self.cutoff), tied=True,
            tie_proj=self.tie_adaptive_proj,
            name="adaptive_softmax")

    def init_state(self, batch_size: int) -> LSTMState:
        h = tuple(jnp.broadcast_to(p, (batch_size, self.hidden_size))
                  for p in self.h0)
        c = tuple(jnp.broadcast_to(p, (batch_size, self.hidden_size))
                  for p in self.c0)
        return LSTMState(h, c,
                         jnp.zeros((batch_size, self.hidden_size)))

    def embed(self, token_t: jax.Array, step_idx,
              deterministic: bool = True) -> jax.Array:
        x = self.embedder(token_t[:, None], start_pos=step_idx)[:, 0, :]
        return dropout(self, x, self.dropout_rate, deterministic)

    def step(self, x_t: jax.Array, state: LSTMState,
             contexts: Dict[str, jax.Array],
             deterministic: bool = True):
        """x_t [B, E] (already embedded) -> (hidden_out [B,H], state)."""
        rnn_input = jnp.concatenate([x_t, state.input_feed], axis=-1)
        hs, cs = [], []
        for i, cell in enumerate(self.cells):
            hidden, (h, c) = cell(rnn_input, (state.h[i], state.c[i]))
            rnn_input = dropout(self, hidden, self.dropout_rate,
                                deterministic)
            hs.append(h)
            cs.append(c)
        img_out, _ = self.image_attention(
            hidden, contexts["image"], contexts.get("image_mask"))
        art_out, _ = self.article_attention(
            hidden, contexts["article"], contexts.get("article_mask"))
        out = jnp.concatenate([img_out, art_out], axis=-1)
        out = dropout(self, out, self.dropout_rate, deterministic)
        out = self.attn_proj(out)
        return out, LSTMState(tuple(hs), tuple(cs), out)

    def log_prob_from_hidden(self, x: jax.Array) -> jax.Array:
        tables = self.embedder.embed_tables()
        return self.adaptive_softmax.log_prob(x, tables)

    def loss_from_hidden(self, x: jax.Array, target_ids: jax.Array,
                         deterministic: bool = True):
        flat = x.reshape(-1, x.shape[-1])
        tables = self.embedder.embed_tables()
        return self.adaptive_softmax.loss_sum(
            flat, target_ids.reshape(-1),
            padding_idx=self.target_padding_idx, embed_tables=tables,
            deterministic=deterministic)


@MODELS.register("baseline_glove")
@MODELS.register("lstm_flattened")
class LSTMFlattenedModel:
    """Functional wrapper (teacher-forced scan + generation)."""

    def __init__(self, decoder: Optional[LSTMDecoder] = None, **kwargs):
        self.decoder = decoder or LSTMDecoder(**kwargs)

    @staticmethod
    def _contexts(batch):
        j = lambda v: None if v is None else jnp.asarray(v)
        return {"image": j(batch["image"]),
                "image_mask": j(batch.get("image_mask")),
                "article": j(batch["article"]),
                "article_mask": j(batch.get("article_mask"))}

    def init(self, rng, batch):
        def init_all(mdl, tokens, contexts, tgt):
            state = mdl.init_state(tokens.shape[0])
            x = mdl.embed(tokens[:, 0], 0)
            out, state = mdl.step(x, state, contexts)
            return mdl.loss_from_hidden(out[:, None, :], tgt[:, :1])

        inp = batch["caption_ids"][:, :-1]
        tgt = batch["caption_ids"][:, 1:]
        return nn.init(init_all, self.decoder)(
            rng, inp, self._contexts(batch), tgt)

    def _hidden(self, params, batch, dropout_rng=None):
        inp = jnp.asarray(batch["caption_ids"])[:, :-1]
        contexts = self._contexts(batch)
        B, T = inp.shape
        deterministic = dropout_rng is None
        state = self.decoder.apply(params, B,
                                   method=LSTMDecoder.init_state)

        def body(carry, t):
            state, key = carry
            # Distinct keys for the two applies: flax rng counters
            # reset per apply, so sharing one key would give the
            # embed dropout and the first inter-layer dropout
            # bit-identical masks (both [B, 1024]).
            kt = jax.random.fold_in(key, t)
            rngs_e = ({} if deterministic
                      else {"dropout": jax.random.fold_in(kt, 0)})
            rngs_s = ({} if deterministic
                      else {"dropout": jax.random.fold_in(kt, 1)})
            x = self.decoder.apply(
                params, inp[:, t], t, deterministic, rngs=rngs_e,
                method=LSTMDecoder.embed)
            out, state = self.decoder.apply(
                params, x, state, contexts, deterministic, rngs=rngs_s,
                method=LSTMDecoder.step)
            return (state, key), out

        key = dropout_rng if dropout_rng is not None else \
            jax.random.PRNGKey(0)
        _, outs = jax.lax.scan(body, (state, key), jnp.arange(T))
        return jnp.transpose(outs, (1, 0, 2))    # [B, T, H]

    def loss_fn(self, params, batch, dropout_rng=None):
        tgt = jnp.asarray(batch["caption_ids"])[:, 1:]
        x = self._hidden(params, batch, dropout_rng)
        deterministic = dropout_rng is None
        rngs = {} if deterministic else {"dropout": dropout_rng}
        loss_sum, ntokens = self.decoder.apply(
            params, x, tgt, deterministic, rngs=rngs,
            method=LSTMDecoder.loss_from_hidden)
        loss_bits = loss_sum / LN2
        sample = jnp.maximum(ntokens, 1)
        return loss_bits / sample, {"loss_sum": loss_bits,
                                    "sample_size": ntokens}

    def generate(self, params, batch,
                 config: GenerationConfig = GenerationConfig(),
                 rng=None):
        """Full-context LSTM generation (parity: _generate_full,
        transformer_flattened.py:330-420 pairs the LSTM decoder with
        the non-incremental path; here the step IS incremental)."""
        contexts = self._contexts(batch)
        B = contexts["image"].shape[0]
        state0 = self.decoder.apply(params, B,
                                    method=LSTMDecoder.init_state)

        def step_fn(tok, i, state):
            x = self.decoder.apply(params, tok, i,
                                   method=LSTMDecoder.embed)
            out, state = self.decoder.apply(
                params, x, state, contexts,
                method=LSTMDecoder.step)
            lp = self.decoder.apply(
                params, out, method=LSTMDecoder.log_prob_from_hidden)
            return lp, state

        seed = jnp.full((B,), config.bos_id, jnp.int32)
        return generate(step_fn, state0, seed, config, rng)
