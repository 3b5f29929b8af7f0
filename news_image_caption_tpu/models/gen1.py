"""Gen-1 LSTM/attention captioners, lax.scan-based.

Capability parity targets (/root/reference/models/):
- ShowTellModel.py:13-168  — img-embed seeds a (bias-free) LSTM
- FCModel.py:13-201        — maxout LSTMCore over fc feats
- Att2inModel.py:20-241    — additive attention into the cell input
- AttModel.py:27-493       — AdaAtt (visual sentinel), AdaAttMO,
                             Att2in2, TopDown + shared Attention
- OldModel.py:20-435       — ShowAttendTell with article sentence-
                             embedding attention variants (fc, fc_max,
                             plain concat) and AllImg

TPU-first: every model is a `(step, state)` pair; teacher forcing is
one `lax.scan` over time (the reference runs a Python loop per token,
train.py:151-182), generation reuses the shared scan/beam engine with
the whole beam batched (the reference beam is a per-image CPU loop,
CaptionModel.py:23-122). Scheduled sampling is a per-step bernoulli
mix inside the scan. Early "break when all sequences ended" is
replaced by masking — identical losses, static shapes.

Vocabulary convention (reference): token 0 is both <bos> as input and
<eos>/pad in outputs; vocab_size+1 logits.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from news_image_caption_tpu.generation.generator import (GenerationConfig,
                                                         beam_search,
                                                         generate)
from news_image_caption_tpu.ops.dropout import dropout
from news_image_caption_tpu.utils.registry import MODELS

Dtype = Any


def uniform_init(scale: float = 0.1):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", self.kernel_init,
                       (x.shape[-1], self.features))
        y = x @ k
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


class TorchLSTM(nn.Module):
    """Multi-layer LSTM cell stack matching torch.nn.LSTM semantics
    (gate order i,f,g,o; optional bias; inter-layer dropout)."""

    hidden_size: int
    num_layers: int = 1
    use_bias: bool = False
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, state, deterministic: bool = True):
        """x [B, in]; state (h [L,B,H], c [L,B,H])."""
        h_prev, c_prev = state
        hs, cs = [], []
        inp = x
        for L in range(self.num_layers):
            wi = Dense(4 * self.hidden_size, use_bias=self.use_bias,
                       name=f"ih_{L}")
            wh = Dense(4 * self.hidden_size, use_bias=self.use_bias,
                       name=f"hh_{L}")
            gates = wi(inp) + wh(h_prev[L])
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = nn.sigmoid(f) * c_prev[L] + nn.sigmoid(i) * jnp.tanh(g)
            h = nn.sigmoid(o) * jnp.tanh(c)
            hs.append(h)
            cs.append(c)
            inp = h
            if L < self.num_layers - 1:
                inp = dropout(self, inp, self.dropout_rate, deterministic)
        return inp, (jnp.stack(hs), jnp.stack(cs))


class MaxoutLSTMCore(nn.Module):
    """FCModel's LSTMCore: 5-chunk gates with maxout input transform
    (+ optional attention term into the input transform, for Att2in)."""

    rnn_size: int
    drop_prob: float = 0.5

    @nn.compact
    def __call__(self, xt, state, att_term: Optional[jax.Array] = None,
                 deterministic: bool = True):
        h_prev, c_prev = state
        R = self.rnn_size
        s = Dense(5 * R, name="i2h")(xt) + Dense(5 * R, name="h2h")(
            h_prev[-1])
        i = nn.sigmoid(s[:, :R])
        f = nn.sigmoid(s[:, R:2 * R])
        o = nn.sigmoid(s[:, 2 * R:3 * R])
        in_tr = s[:, 3 * R:5 * R]
        if att_term is not None:
            in_tr = in_tr + att_term
        in_tr = jnp.maximum(in_tr[:, :R], in_tr[:, R:])
        c = f * c_prev[-1] + i * in_tr
        h = o * jnp.tanh(c)
        out = dropout(self, h, self.drop_prob, deterministic)
        return out, (h[None], c[None])


class AdditiveAttention(nn.Module):
    """tanh(p_att + h2att(h)) -> alpha -> weighted sum of values."""

    att_hid_size: int

    @nn.compact
    def __call__(self, h, values, p_att):
        """h [B,R]; values [B,P,D]; p_att [B,P,att_hid]."""
        att_h = Dense(self.att_hid_size, name="h2att")(h)
        dot = jnp.tanh(p_att + att_h[:, None, :])
        alpha = Dense(1, name="alpha_net")(dot)[:, :, 0]
        w = jax.nn.softmax(alpha, axis=-1)
        return jnp.einsum("bp,bpd->bd", w, values), w


class Gen1State(NamedTuple):
    h: jax.Array
    c: jax.Array


# ----------------------------------------------------------------------
# Cores (flax modules). Each exposes:
#   prepare(fc_feats, att_feats, sen_embed) -> feats dict (per-seq const)
#   step(xt, feats, state, deterministic) -> (output [B,R], state)
# ----------------------------------------------------------------------


class ShowTellCore(nn.Module):
    rnn_size: int
    num_layers: int = 1
    drop_prob: float = 0.5

    def setup(self):
        self.rnn = TorchLSTM(self.rnn_size, self.num_layers,
                             dropout_rate=self.drop_prob, name="rnn")

    def prepare(self, fc_feats, att_feats, sen_embed=None):
        return {}

    def step(self, xt, feats, state, deterministic=True):
        out, (h, c) = self.rnn(xt, (state.h, state.c), deterministic)
        return out, Gen1State(h, c)


class FCCore(nn.Module):
    rnn_size: int
    drop_prob: float = 0.5

    def setup(self):
        self.core = MaxoutLSTMCore(self.rnn_size, self.drop_prob,
                                   name="core")

    def prepare(self, fc_feats, att_feats, sen_embed=None):
        return {}

    def step(self, xt, feats, state, deterministic=True):
        out, (h, c) = self.core(xt, (state.h, state.c),
                                deterministic=deterministic)
        return out, Gen1State(h, c)


class Att2inCore(nn.Module):
    """Attention result added to the cell input transform (a2c)."""

    rnn_size: int
    att_hid_size: int
    drop_prob: float = 0.5

    def setup(self):
        self.attention = AdditiveAttention(self.att_hid_size,
                                           name="attention")
        self.a2c = Dense(2 * self.rnn_size, name="a2c")
        self.core = MaxoutLSTMCore(self.rnn_size, self.drop_prob,
                                   name="core")

    def prepare(self, fc_feats, att_feats, sen_embed=None):
        # ctx2att projection happens in the wrapper (p_att_feats)
        return {"att": att_feats}

    def step(self, xt, feats, state, deterministic=True):
        att_res, _ = self.attention(state.h[-1], feats["att"],
                                    feats["p_att"])
        out, (h, c) = self.core(xt, (state.h, state.c),
                                att_term=self.a2c(att_res),
                                deterministic=deterministic)
        return out, Gen1State(h, c)


class TopDownCore(nn.Module):
    """2-layer top-down attention LSTM (Anderson et al.)."""

    rnn_size: int
    att_hid_size: int
    drop_prob: float = 0.5

    def setup(self):
        self.att_lstm = TorchLSTM(self.rnn_size, 1, use_bias=True,
                                  name="att_lstm")
        self.lang_lstm = TorchLSTM(self.rnn_size, 1, use_bias=True,
                                   name="lang_lstm")
        self.attention = AdditiveAttention(self.att_hid_size,
                                           name="attention")

    def prepare(self, fc_feats, att_feats, sen_embed=None):
        return {"fc": fc_feats, "att": att_feats}

    def step(self, xt, feats, state, deterministic=True):
        prev_h_lang = state.h[1]
        att_in = jnp.concatenate([prev_h_lang, feats["fc"], xt], axis=-1)
        h_att, (h0, c0) = self.att_lstm(
            att_in, (state.h[0:1], state.c[0:1]), deterministic)
        att_res, _ = self.attention(h_att, feats["att"], feats["p_att"])
        lang_in = jnp.concatenate([att_res, h_att], axis=-1)
        h_lang, (h1, c1) = self.lang_lstm(
            lang_in, (state.h[1:2], state.c[1:2]), deterministic)
        out = dropout(self, h_lang, self.drop_prob, deterministic)
        return out, Gen1State(jnp.concatenate([h0, h1]),
                              jnp.concatenate([c0, c1]))


class AdaAttCore(nn.Module):
    """Adaptive attention with visual sentinel ('fake region')."""

    rnn_size: int
    input_encoding_size: int
    att_hid_size: int
    use_maxout: bool = False
    drop_prob: float = 0.5

    def setup(self):
        # The reference's AdaAtt_attention concatenates the sentinel
        # (input_encoding_size) with region feats (rnn_size) and their
        # att_hid projections (AttModel.py:344-345) — it only works
        # when all three sizes agree (512 in every shipped config).
        assert (self.rnn_size == self.input_encoding_size
                == self.att_hid_size), \
            "AdaAtt requires rnn_size == input_encoding_size == att_hid_size"
        n = 5 if self.use_maxout else 4
        self.w2h = Dense(n * self.rnn_size, name="w2h")
        self.v2h = Dense(n * self.rnn_size, name="v2h")
        self.h2h = Dense(n * self.rnn_size, name="h2h")
        self.r_w2h = Dense(self.rnn_size, name="r_w2h")
        self.r_v2h = Dense(self.rnn_size, name="r_v2h")
        self.r_h2h = Dense(self.rnn_size, name="r_h2h")
        # attention block
        self.fr_linear = Dense(self.input_encoding_size, name="fr_linear")
        self.fr_embed = Dense(self.att_hid_size, name="fr_embed")
        self.ho_linear = Dense(self.input_encoding_size, name="ho_linear")
        self.ho_embed = Dense(self.att_hid_size, name="ho_embed")
        self.alpha_net = Dense(1, name="alpha_net")
        self.att2h = Dense(self.rnn_size, name="att2h")

    def prepare(self, fc_feats, att_feats, sen_embed=None):
        return {"fc": fc_feats, "att": att_feats}

    def step(self, xt, feats, state, deterministic=True):
        R = self.rnn_size
        prev_h, prev_c = state.h[-1], state.c[-1]
        s = self.w2h(xt) + self.v2h(feats["fc"]) + self.h2h(prev_h)
        i = nn.sigmoid(s[:, :R])
        f = nn.sigmoid(s[:, R:2 * R])
        o = nn.sigmoid(s[:, 2 * R:3 * R])
        if self.use_maxout:
            in_tr = jnp.maximum(s[:, 3 * R:4 * R], s[:, 4 * R:5 * R])
        else:
            in_tr = jnp.tanh(s[:, 3 * R:4 * R])
        c = f * prev_c + i * in_tr
        tanh_c = jnp.tanh(c)
        h = o * tanh_c
        n5 = self.r_w2h(xt) + self.r_v2h(feats["fc"]) + self.r_h2h(prev_h)
        fake_region = nn.sigmoid(n5) * tanh_c

        top_h = dropout(self, h, self.drop_prob, deterministic)
        fake_region = dropout(self, fake_region, self.drop_prob,
                              deterministic)
        # adaptive attention over [sentinel; regions]
        fr = nn.relu(self.fr_linear(fake_region))
        fr = dropout(self, fr, self.drop_prob, deterministic)
        fr_embed = self.fr_embed(fr)
        ho = jnp.tanh(self.ho_linear(top_h))
        ho = dropout(self, ho, self.drop_prob, deterministic)
        ho_embed = self.ho_embed(ho)
        img_all = jnp.concatenate([fr[:, None, :], feats["att"]], axis=1)
        embed_all = jnp.concatenate([fr_embed[:, None, :], feats["p_att"]],
                                    axis=1)
        hA = jnp.tanh(embed_all + ho_embed[:, None, :])
        hA = dropout(self, hA, self.drop_prob, deterministic)
        alpha = jax.nn.softmax(self.alpha_net(hA)[:, :, 0], axis=-1)
        vis = jnp.einsum("bp,bpd->bd", alpha, img_all)
        atten_out = vis + ho
        out = jnp.tanh(self.att2h(atten_out))
        out = dropout(self, out, self.drop_prob, deterministic)
        return out, Gen1State(h[None], c[None])


class _INSResBlock(nn.Module):
    """Instance-norm residual block over [B, L, C]
    (misc/utils.py:74-92: Conv2d[1,5] + InstanceNorm + ReLU +
    Conv2d[1,5] + InstanceNorm, residual — the [1,5] kernels give
    each block a 5-token temporal receptive field)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (5,), padding=2, name="conv1")(x)
        y = nn.GroupNorm(num_groups=None, group_size=1,
                         use_bias=False, use_scale=False,
                         name="in1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (5,), padding=2, name="conv2")(y)
        y = nn.GroupNorm(num_groups=None, group_size=1,
                         use_bias=False, use_scale=False,
                         name="in2")(y)
        return x + y


class ShowAttendTellCore(nn.Module):
    """OldModel core: LSTM over [xt, att_res (, sentence extras)].

    sentence_embed_method: '' | 'concat' | 'fc' | 'fc_max'
    ('concat' = sentence_embed without attention, OldModel.py:399-400).
    """

    rnn_size: int
    att_hid_size: int
    num_layers: int = 1
    drop_prob: float = 0.5
    sentence_embed_method: str = ""
    # Dims the 'conv'/'conv_deep' variants need at declaration time
    # (reference: opt.sentence_embed_size / opt.sentence_length,
    # OldModel.py:237-238). None falls back to inferring from the
    # hidden-state projections' output sizes below.
    sentence_embed_size: Optional[int] = None
    sentence_length: Optional[int] = None

    def setup(self):
        self.rnn = TorchLSTM(self.rnn_size, self.num_layers,
                             dropout_rate=self.drop_prob, name="rnn")
        self.ctx2att = Dense(self.att_hid_size, name="ctx2att")
        self.h2att = Dense(self.att_hid_size, name="h2att")
        self.alpha_net = Dense(1, name="alpha_net")
        m = self.sentence_embed_method
        if m in ("fc", "fc_max"):
            self.sentence_att = Dense(self.att_hid_size,
                                      name="sentence_att")
            self.h2att_sen = Dense(self.att_hid_size, name="h2att_sen")
        elif m == "conv":
            # LeakyReLUConv2d(1, 32, [E, 5]) over [B, 1, E, L]
            # (misc/utils.py:60-70; OldModel.py:242-251): the (E, 5)
            # kernel factors into an E->C projection + a (5,) temporal
            # conv (rank-C approximation of the joint kernel).
            self.sen_conv = nn.Conv(32, (1, 5), padding=((0, 0), (2, 2)),
                                    name="sen_conv")
            self.sen_embed_proj = Dense(32, use_bias=False,
                                        name="sen_embed_proj")
            # h is added to the SENTENCE EMBEDDINGS before the conv
            # (OldModel.py:370-372: sen = sen_embed + h2att_sen(h)),
            # so the projection targets the embed size E.
            if self.sentence_embed_size is None:
                raise ValueError(
                    "sentence_embed_method='conv' needs "
                    "sentence_embed_size (reference "
                    "opt.sentence_embed_size)")
            self.h2att_sen = Dense(self.sentence_embed_size,
                                   name="h2att_sen")
            self.ch_embed = Dense(1, name="ch_embed")
        elif m == "conv_deep":
            self.sen_conv = nn.Conv(128, (1, 5),
                                    padding=((0, 0), (2, 2)),
                                    name="sen_conv")
            self.sen_embed_proj = Dense(128, use_bias=False,
                                        name="sen_embed_proj")
            self.res1 = _INSResBlock(128, name="res1")
            self.res2 = _INSResBlock(128, name="res2")
            # Per-POSITION additive term: Linear(rnn -> L)
            # (OldModel.py:268-269 h2att_sen = Linear(rnn_size,
            # sentence_length)); a Dense(1) scalar would cancel in
            # the softmax, decoupling the weights from the decoder
            # state.
            if self.sentence_length is None:
                raise ValueError(
                    "sentence_embed_method='conv_deep' needs "
                    "sentence_length (reference opt.sentence_length)")
            self.h2att_sen = Dense(self.sentence_length,
                                   name="h2att_sen")
            self.ch_embed = Dense(1, name="ch_embed")
        elif m == "bnews":
            self.sen_conv = nn.Conv(256, (1, 5), padding="VALID",
                                    name="sen_conv")
            self.sen_embed_proj = Dense(256, use_bias=False,
                                        name="sen_embed_proj")
            self.sen_lin = Dense(64, name="sen_lin")

    def prepare(self, fc_feats, att_feats, sen_embed=None):
        feats = {"att": att_feats, "p_att": self.ctx2att(att_feats)}
        if sen_embed is not None:
            feats["sen"] = sen_embed
            if self.sentence_embed_method in ("fc", "fc_max"):
                feats["p_sen"] = self.sentence_att(sen_embed)
        return feats

    def step(self, xt, feats, state, deterministic=True,
             need_attention: bool = False):
        """One LSTM step. need_attention additionally returns
        (visual alpha [B, P], sentence alpha [B, L] — zeros when the
        variant has no sentence attention), the reference's
        return_attention path (OldModel.py:321,405-407)."""
        h_last = state.h[-1]
        att_h = self.h2att(h_last)
        dot = jnp.tanh(feats["p_att"] + att_h[:, None, :])
        alpha = jax.nn.softmax(self.alpha_net(dot)[:, :, 0], axis=-1)
        att_res = jnp.einsum("bp,bpd->bd", alpha, feats["att"])

        parts = [xt]
        m = self.sentence_embed_method
        if m in ("conv", "conv_deep", "bnews"):
            # Treat the sentence sequence [B, L, E] as a 1-wide image:
            # project E -> channels then a (1,5) temporal conv — a
            # rank-C factorization of the reference's joint Conv2d
            # (E, 5) kernel.
            sen = feats["sen"]                        # [B, L, E]
            if m == "conv":
                # OldModel.py:370-379: h projects to E and adds to
                # the embeddings BEFORE the LeakyReLU conv; the
                # attention result pools the ORIGINAL embeddings.
                att_h_sen = self.h2att_sen(h_last)    # [B, E]
                sen_in = sen + att_h_sen[:, None, :]
                proj = self.sen_embed_proj(sen_in)
                conv = self.sen_conv(proj[:, None])[:, 0]
                conv = jax.nn.leaky_relu(conv, 0.01)  # LeakyReLUConv2d
                conv = dropout(self, conv, self.drop_prob,
                               deterministic)
                dot = jnp.tanh(conv)
                logits = self.ch_embed(dot)[:, :, 0]  # ch_embed =
                logits = dropout(self, logits, self.drop_prob,
                                 deterministic)       # Linear+Dropout
                w_sen = jax.nn.softmax(logits, axis=-1)
                sen_res = jnp.einsum("bl,ble->be", w_sen, sen)
                parts += [att_res, sen_res]
            elif m == "conv_deep":
                # OldModel.py:381-394: conv stack over the raw
                # embeddings; h adds a PER-POSITION [B, L] term.
                proj = self.sen_embed_proj(sen)
                conv = self.sen_conv(proj[:, None])[:, 0]
                conv = jax.nn.leaky_relu(conv, 0.01)
                conv = self.res2(self.res1(conv))
                conv = dropout(self, conv, self.drop_prob,
                               deterministic)
                att_h_sen = self.h2att_sen(h_last)    # [B, L]
                combined = conv + att_h_sen[:, :, None]
                logits = self.ch_embed(combined)[:, :, 0]
                logits = dropout(self, logits, self.drop_prob,
                                 deterministic)  # ch_embed=Lin+Drop
                dot = jnp.tanh(logits)
                w_sen = jax.nn.softmax(dot, axis=-1)
                sen_res = jnp.einsum("bl,blc->bc", w_sen, conv)
                parts += [att_res, sen_res]           # 128-d context
            else:  # bnews: conv + global max pool + MLP, no attention
                proj = self.sen_embed_proj(sen)
                conv = self.sen_conv(proj[:, None])[:, 0]
                pooled = jnp.max(jax.nn.leaky_relu(conv, 0.01), axis=1)
                final = nn.relu(self.sen_lin(pooled))
                parts += [final, att_res]
            out, (h, c) = self.rnn(
                jnp.concatenate(parts, axis=-1),
                (state.h, state.c), deterministic)
            if need_attention:
                if m == "bnews":   # pooled — no positional weights
                    w_sen = jnp.zeros(
                        (xt.shape[0], sen.shape[1]), alpha.dtype)
                return out, Gen1State(h, c), (alpha, w_sen)
            return out, Gen1State(h, c)
        w_sen = None
        if m in ("fc", "fc_max"):
            att_h_sen = self.h2att_sen(h_last)
            dot_s = jnp.tanh(feats["p_sen"] + att_h_sen[:, None, :])
            # quirk: the reference reuses alpha_net for sentences
            w_sen = jax.nn.softmax(self.alpha_net(dot_s)[:, :, 0], -1)
            if self.sentence_embed_method == "fc":
                sen_res = jnp.einsum("bs,bsd->bd", w_sen, feats["sen"])
            else:  # fc_max: hard argmax pick
                idx = jnp.argmax(w_sen, axis=-1)
                sen_res = jnp.take_along_axis(
                    feats["sen"], idx[:, None, None], axis=1)[:, 0]
            parts += [att_res, sen_res]
        elif self.sentence_embed_method == "concat":
            # plain concat of the (single-vector) sentence embedding
            parts += [feats["sen"].reshape(xt.shape[0], -1), att_res]
        else:
            parts += [att_res]
        out, (h, c) = self.rnn(jnp.concatenate(parts, axis=-1),
                               (state.h, state.c), deterministic)
        if need_attention:
            if w_sen is None:
                w_sen = jnp.zeros((xt.shape[0], 1), alpha.dtype)
            return out, Gen1State(h, c), (alpha, w_sen)
        return out, Gen1State(h, c)


class AllImgCore(nn.Module):
    rnn_size: int
    num_layers: int = 1
    drop_prob: float = 0.5

    def setup(self):
        self.rnn = TorchLSTM(self.rnn_size, self.num_layers,
                             dropout_rate=self.drop_prob, name="rnn")

    def prepare(self, fc_feats, att_feats, sen_embed=None):
        return {"fc": fc_feats}

    def step(self, xt, feats, state, deterministic=True):
        x = jnp.concatenate([xt, feats["fc"]], axis=-1)
        out, (h, c) = self.rnn(x, (state.h, state.c), deterministic)
        return out, Gen1State(h, c)


# ----------------------------------------------------------------------
# Full captioner module
# ----------------------------------------------------------------------


class Gen1Captioner(nn.Module):
    """Shared wrapper: embed + feature prep + scan + logit head.

    model_type selects the core; the feature pre-embedding convention
    follows the reference family split:
    - 'show_tell' / 'fc': img_embed(fc) seeds the sequence at t=0
    - 'att2in': raw att feats + ctx2att projection
    - 'att2in2'/'adaatt'/'adaatt_mo'/'topdown': fc/att embedded to
      rnn_size first (AttModel.py:44-59)
    - 'show_attend_tell'/'all_img': raw feats, hidden seeded from
      linear(fc) (OldModel.py:45,58-63)
    """

    model_type: str
    vocab_size: int
    input_encoding_size: int = 512
    rnn_size: int = 512
    num_layers: int = 1
    att_hid_size: int = 512
    fc_feat_size: int = 2048
    att_feat_size: int = 2048
    drop_prob: float = 0.5
    seq_length: int = 16
    sentence_embed_method: str = ""
    # Needed by the 'conv'/'conv_deep' sentence-attention variants
    # (reference opt.sentence_embed_size / opt.sentence_length).
    sentence_embed_size: Optional[int] = None
    sentence_length: Optional[int] = None

    def setup(self):
        V = self.vocab_size + 1
        if self.num_layers > 1 and self.model_type not in (
                "show_tell", "show_attend_tell", "all_img"):
            # The fc/att2in/adaatt core states are single-layer by
            # construction; fail loudly instead of a lax.scan carry
            # structure mismatch at trace time.
            raise ValueError(
                f"model_type {self.model_type!r} supports "
                f"num_layers=1 only (got {self.num_layers})")
        if self.model_type in ("show_tell", "fc", "show_attend_tell",
                               "all_img", "att2in"):
            emb_init = uniform_init(0.1)
        else:
            emb_init = nn.initializers.lecun_normal()
        self.embed = nn.Embed(V, self.input_encoding_size,
                              embedding_init=emb_init, name="embed")
        self.logit = Dense(V, kernel_init=uniform_init(0.1), name="logit")

        mt = self.model_type
        if mt in ("show_tell", "fc"):
            self.img_embed = Dense(self.input_encoding_size,
                                   name="img_embed")
        if mt in ("att2in2", "adaatt", "adaatt_mo", "topdown"):
            self.fc_embed = Dense(self.rnn_size, name="fc_embed")
            self.att_embed = Dense(self.rnn_size, name="att_embed")
            self.ctx2att = Dense(self.att_hid_size, name="ctx2att")
        if mt == "att2in":
            self.ctx2att = Dense(self.att_hid_size, name="ctx2att")
        if mt in ("show_attend_tell", "all_img"):
            self.init_linear = Dense(self.num_layers * self.rnn_size,
                                     name="init_linear")

        if mt == "show_tell":
            self.core = ShowTellCore(self.rnn_size, self.num_layers,
                                     self.drop_prob, name="core")
        elif mt == "fc":
            self.core = FCCore(self.rnn_size, self.drop_prob, name="core")
        elif mt in ("att2in", "att2in2"):
            self.core = Att2inCore(self.rnn_size, self.att_hid_size,
                                   self.drop_prob, name="core")
        elif mt in ("adaatt", "adaatt_mo"):
            self.core = AdaAttCore(self.rnn_size,
                                   self.input_encoding_size,
                                   self.att_hid_size,
                                   use_maxout=(mt == "adaatt_mo"),
                                   drop_prob=self.drop_prob, name="core")
        elif mt == "topdown":
            self.core = TopDownCore(self.rnn_size, self.att_hid_size,
                                    self.drop_prob, name="core")
        elif mt == "show_attend_tell":
            self.core = ShowAttendTellCore(
                self.rnn_size, self.att_hid_size, self.num_layers,
                self.drop_prob, self.sentence_embed_method,
                sentence_embed_size=self.sentence_embed_size,
                sentence_length=self.sentence_length, name="core")
        elif mt == "all_img":
            self.core = AllImgCore(self.rnn_size, self.num_layers,
                                   self.drop_prob, name="core")
        else:
            raise ValueError(f"unknown model_type {mt!r}")

    @property
    def state_layers(self) -> int:
        return 2 if self.model_type == "topdown" else self.num_layers

    def _embed_feats(self, fc_feats, att_feats, deterministic=True):
        mt = self.model_type
        if mt in ("att2in2", "adaatt", "adaatt_mo", "topdown"):
            fc = dropout(self, nn.relu(self.fc_embed(fc_feats)),
                         self.drop_prob, deterministic)
            att = dropout(self, nn.relu(self.att_embed(att_feats)),
                          self.drop_prob, deterministic)
            if mt == "att2in2":
                fc = fc_feats  # Att2in2Model: fc_embed = identity
        else:
            fc, att = fc_feats, att_feats
        return fc, att

    def _token_embed(self, it, deterministic=True):
        x = self.embed(it)
        if self.model_type in ("att2in2", "adaatt", "adaatt_mo",
                               "topdown"):
            x = dropout(self, nn.relu(x), self.drop_prob, deterministic)
        return x

    def init_state(self, batch_size, fc_feats=None) -> Gen1State:
        L = self.state_layers
        if (self.model_type in ("show_attend_tell", "all_img")
                and fc_feats is not None):
            m = self.init_linear(fc_feats).reshape(
                -1, self.num_layers, self.rnn_size).transpose(1, 0, 2)
            return Gen1State(m, m)
        z = jnp.zeros((L, batch_size, self.rnn_size))
        return Gen1State(z, z)

    def prepare(self, fc_feats, att_feats, sen_embed=None,
                deterministic: bool = True):
        fc, att = self._embed_feats(fc_feats, att_feats, deterministic)
        feats = dict(self.core.prepare(fc, att, sen_embed))
        mt = self.model_type
        if mt in ("att2in", "att2in2", "adaatt", "adaatt_mo", "topdown"):
            feats["p_att"] = self.ctx2att(att)
            feats.setdefault("att", att)
            feats.setdefault("fc", fc)
        return feats

    def _logits(self, output, deterministic=True):
        if self.model_type in ("show_tell", "show_attend_tell",
                               "all_img"):
            output = dropout(self, output, self.drop_prob, deterministic)
        return jax.nn.log_softmax(self.logit(output), axis=-1)

    # -- single step (scan body lives OUTSIDE flax, in Gen1Model) ------
    def decode_step(self, token_t, feats, state, deterministic=True):
        xt = self._token_embed(token_t, deterministic)
        out, state = self.core.step(xt, feats, state, deterministic)
        return self._logits(out, deterministic), state

    def decode_step_attn(self, token_t, feats, state,
                         deterministic=True):
        """decode_step + (visual alpha, sentence alpha) — only the
        show_attend_tell core supports attention return (reference
        return_attention, OldModel.py:321)."""
        xt = self._token_embed(token_t, deterministic)
        out, state, atts = self.core.step(xt, feats, state,
                                          deterministic,
                                          need_attention=True)
        return self._logits(out, deterministic), state, atts

    def seed_image_step(self, fc_feats, feats, state,
                        deterministic=True):
        """ShowTell/FC t=0: feed img_embed(fc) before <bos>."""
        xt = self.img_embed(fc_feats)
        _, state = self.core.step(xt, feats, state, deterministic)
        return state


def masked_nll_loss(log_probs: jax.Array, targets: jax.Array,
                    mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """LanguageModelCriterion (misc/utils.py:160-174): mean over mask."""
    T = min(log_probs.shape[1], targets.shape[1])
    lp = log_probs[:, :T]
    tgt = targets[:, :T]
    m = mask[:, :T].astype(lp.dtype)
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * m)
    return total / jnp.maximum(jnp.sum(m), 1.0), jnp.sum(m)


@MODELS.register("gen1")
def gen1_factory(**kw) -> "Gen1Model":
    """Registry factory: config dict -> Gen-1 model wrapper."""
    return Gen1Model(Gen1Captioner(**kw))


class Gen1Model:
    """Functional wrapper with the Gen-1 train/sample API.

    The teacher-forced loop is a jax.lax.scan over pure `apply` calls
    (flax forbids bound submodule calls inside jax control flow).
    """

    def __init__(self, module: Optional[Gen1Captioner] = None, **kwargs):
        self.module = module or Gen1Captioner(**kwargs)

    @staticmethod
    def adapt_batch(batch):
        """Accept news-style batches (caption_ids/image/article) by
        mapping them onto the Gen-1 contract (seq/mask/fc/att/sen)."""
        if "seq" in batch:
            return {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                    for k, v in batch.items()}
        seq = jnp.asarray(batch["caption_ids"])
        image = jnp.asarray(batch["image"])
        out = {
            "seq": seq,
            "mask": (seq != 1).astype(jnp.float32),
            "fc_feats": image.mean(axis=1),
            "att_feats": image,
        }
        if "article" in batch:
            out["sen_embed"] = jnp.asarray(batch["article"])
        return out

    def init(self, rng, batch):
        batch = self.adapt_batch(batch)
        B = batch["fc_feats"].shape[0]
        p_rng, _ = jax.random.split(rng)
        # Initialize every submodule by tracing prepare + one step
        # (+ the image seed for seeded models).
        def init_all(mdl, fc, att, sen, seq):
            feats = mdl.prepare(fc, att, sen)
            state = mdl.init_state(fc.shape[0], fc)
            if mdl.model_type in ("show_tell", "fc"):
                state = mdl.seed_image_step(fc, feats, state)
            lp, state = mdl.decode_step(seq[:, 0], feats, state)
            return lp

        return nn.init(init_all, self.module)(
            p_rng, batch["fc_feats"], batch["att_feats"],
            batch.get("sen_embed"), batch["seq"])

    def _prepare(self, params, batch, dropout_rng=None):
        deterministic = dropout_rng is None
        rngs = ({} if deterministic
                else {"dropout": jax.random.fold_in(dropout_rng, 0)})
        fc = batch["fc_feats"]
        feats = self.module.apply(
            params, fc, batch["att_feats"], batch.get("sen_embed"),
            deterministic=deterministic, rngs=rngs,
            method=Gen1Captioner.prepare)
        state = self.module.apply(
            params, fc.shape[0], fc, method=Gen1Captioner.init_state)
        if self.module.model_type in ("show_tell", "fc"):
            state = self.module.apply(
                params, fc, feats, state, deterministic=deterministic,
                rngs=rngs, method=Gen1Captioner.seed_image_step)
        return feats, state

    def forward(self, params, batch, dropout_rng=None, ss_prob=0.0):
        """Teacher-forced log-probs [B, T-1, V+1]."""
        batch = self.adapt_batch(batch)
        seq = batch["seq"]
        B, T = seq.shape
        deterministic = dropout_rng is None
        feats, state = self._prepare(params, batch, dropout_rng)
        base_rng = (dropout_rng if dropout_rng is not None
                    else jax.random.PRNGKey(0))

        def body(carry, t):
            state, prev_lp, key = carry
            it = seq[:, t]
            if ss_prob > 0.0:
                key, k1, k2 = jax.random.split(key, 3)
                use_sample = (jax.random.uniform(k1, (B,)) < ss_prob) \
                    & (t >= 1)
                sampled = jax.random.categorical(k2, prev_lp, axis=-1)
                it = jnp.where(use_sample, sampled, it)
            # t+1: salt 0 belongs to _prepare/seed_image_step — reusing
            # it at t=0 would repeat those applies' dropout masks at
            # same-path sites (flax derives site keys per apply root).
            rngs = ({} if deterministic
                    else {"dropout": jax.random.fold_in(key, t + 1)})
            lp, state = self.module.apply(
                params, it, feats, state, deterministic=deterministic,
                rngs=rngs, method=Gen1Captioner.decode_step)
            return (state, lp, key), lp

        init_lp = jnp.zeros((B, self.module.vocab_size + 1))
        _, lps = jax.lax.scan(body, (state, init_lp, base_rng),
                              jnp.arange(T - 1))
        return jnp.transpose(lps, (1, 0, 2))

    def loss_fn(self, params, batch, dropout_rng=None, ss_prob=0.0):
        batch = self.adapt_batch(batch)
        lps = self.forward(params, batch, dropout_rng, ss_prob)
        loss, ntokens = masked_nll_loss(
            lps, batch["seq"][:, 1:], batch["mask"][:, 1:])
        return loss, {"loss_sum": loss * ntokens, "sample_size": ntokens}

    def forward_with_attention(self, params, batch, dropout_rng=None,
                               ss_prob=0.0):
        """Teacher-forced log-probs + sentence-attention coverage loss.

        Parity: OldModel.forward(..., return_attention=True)
        (/root/reference/models/OldModel.py:65-106). Per executed step
        t>=1 the running coverage (sum of the previous steps'
        SENTENCE-attention rows, `:96-97`) is penalized by
        sum(min(att_t, coverage_{t-1})); steps from the first all-pad
        column of `seq` onward don't execute (the reference's
        all-ended break, `:88-89`) and contribute nothing. Returns
        (log_probs [B, T-1, V+1], cov_loss scalar =
        sum_t sum_b cov_t,b / B). show_attend_tell core only (the
        reference's other cores don't accept return_attention).

        Note the reference truncates the returned outputs at the
        break; here log-probs past it are computed but meaningless —
        mask them downstream exactly as `loss_fn` does.
        """
        if self.module.model_type != "show_attend_tell":
            raise ValueError(
                "forward_with_attention supports model_type="
                "'show_attend_tell' (the reference's "
                "return_attention path)")
        batch = self.adapt_batch(batch)
        seq = batch["seq"]
        B, T = seq.shape
        L = batch["sen_embed"].shape[1] if "sen_embed" in batch else 1
        deterministic = dropout_rng is None
        feats, state = self._prepare(params, batch, dropout_rng)
        base_rng = (dropout_rng if dropout_rng is not None
                    else jax.random.PRNGKey(0))
        # Reference break: step i >= 1 with seq[:, i].sum() == 0 stops
        # the loop BEFORE computing step i (OldModel.py:88-89; pad id
        # is 0 in the Gen-1 convention, so an all-pad column sums 0).
        col_ended = (jnp.sum(seq[:, :T - 1], axis=0) == 0) \
            & (jnp.arange(T - 1) >= 1)
        step_active = jnp.cumprod(
            1 - col_ended.astype(jnp.float32))            # [T-1]

        def body(carry, t):
            state, prev_lp, key, coverage, cov_loss = carry
            it = seq[:, t]
            if ss_prob > 0.0:
                key, k1, k2 = jax.random.split(key, 3)
                use_sample = (jax.random.uniform(k1, (B,)) < ss_prob) \
                    & (t >= 1)
                sampled = jax.random.categorical(k2, prev_lp, axis=-1)
                it = jnp.where(use_sample, sampled, it)
            rngs = ({} if deterministic
                    else {"dropout": jax.random.fold_in(key, t + 1)})
            lp, state, (_, w_sen) = self.module.apply(
                params, it, feats, state, deterministic=deterministic,
                rngs=rngs, method=Gen1Captioner.decode_step_attn)
            active = step_active[t]
            # t=0 contributes 0 automatically (coverage starts at 0
            # and attention weights are >= 0), matching the
            # reference's first-step coverage seeding.
            cov_loss = cov_loss + active * jnp.sum(
                jnp.minimum(w_sen, coverage))
            coverage = coverage + active * w_sen
            return (state, lp, key, coverage, cov_loss), lp

        init_lp = jnp.zeros((B, self.module.vocab_size + 1))
        coverage0 = jnp.zeros((B, L))
        (_, _, _, _, cov_loss), lps = jax.lax.scan(
            body, (state, init_lp, base_rng, coverage0,
                   jnp.zeros(())),
            jnp.arange(T - 1))
        return jnp.transpose(lps, (1, 0, 2)), cov_loss / B

    def _setup_decode(self, params, batch, beam: int = 1):
        batch = self.adapt_batch(batch)
        fc = batch["fc_feats"]
        B = fc.shape[0]
        if beam > 1:
            tile = lambda x: (jnp.repeat(x, beam, axis=0)
                              if x is not None else None)
            batch = {k: tile(v) for k, v in batch.items()
                     if k in ("fc_feats", "att_feats", "sen_embed")}
        feats, state = self._prepare(params, batch)

        def step_fn(tok, i, state):
            lp, state = self.module.apply(
                params, tok, feats, state,
                method=Gen1Captioner.decode_step)
            return lp, state

        return step_fn, state, B

    def generate(self, params, batch,
                 config: Optional[GenerationConfig] = None, rng=None):
        """Config-respecting decode — the evaluate-CLI contract every
        model exposes. sample()/sample_beam() keep the classic Gen-1
        convention (token 0 = bos AND eos); this honors the caller's
        bos/eos/pad ids so news-convention batches (pad=1, eos=2)
        actually terminate at their eos. Returns (tokens incl. seed,
        per-step log-probs)."""
        import dataclasses
        config = config or GenerationConfig()
        # Gen-1 configs may use bos == eos; never mark the seed done.
        config = dataclasses.replace(config, init_finished=False)
        step_fn, state, B = self._setup_decode(params, batch)
        seed = jnp.full((B,), config.bos_id, jnp.int32)
        return generate(step_fn, state, seed, config, rng)

    def sample(self, params, batch, max_len: Optional[int] = None,
               sample_max: bool = True, temperature: float = 1.0,
               rng=None):
        """Greedy / temperature sampling (Gen-1 `sample`)."""
        max_len = max_len or self.module.seq_length
        step_fn, state, B = self._setup_decode(params, batch)
        cfg = GenerationConfig(
            max_len=max_len, bos_id=0, eos_id=0, pad_id=0,
            sampling_topk=1 if sample_max else self.module.vocab_size + 1,
            sampling_temp=temperature, init_finished=False)
        seed = jnp.zeros((B,), jnp.int32)
        tokens, lps = generate(step_fn, state, seed, cfg, rng)
        return tokens[:, 1:], lps

    def sample_with_attention(self, params, batch,
                              max_len: Optional[int] = None):
        """Greedy decode returning per-step attention maps.

        Parity: the reference's return_attention sampling used by
        eval_split_visual_news (eval_utils.py:115-245; OldModel.py
        forward(..., return_attention=True) returns [visual weights,
        sentence weights]). Returns (tokens [B, T], log_probs [B, T],
        (vis_att [T, B, P], sen_att [T, B, L])) — only for the
        show_attend_tell core.
        """
        if self.module.model_type != "show_attend_tell":
            raise ValueError(
                "sample_with_attention supports model_type="
                "'show_attend_tell' (the reference's "
                "return_attention path)")
        max_len = max_len or self.module.seq_length
        nbatch = self.adapt_batch(batch)
        feats, state = self._prepare(params, nbatch)
        B = nbatch["fc_feats"].shape[0]

        def body(carry, _):
            tok, state, finished = carry
            lp, state, (vis, sen) = self.module.apply(
                params, tok, feats, state,
                method=Gen1Captioner.decode_step_attn)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            sel = jnp.take_along_axis(lp, nxt[:, None], 1)[:, 0]
            nxt = jnp.where(finished, 0, nxt)
            sel = jnp.where(finished, 0.0, sel)
            finished = finished | (nxt == 0)
            return (nxt, state, finished), (nxt, sel, vis, sen)

        seed = jnp.zeros((B,), jnp.int32)
        finished0 = jnp.zeros((B,), bool)
        _, (toks, lps, vis, sen) = jax.lax.scan(
            body, (seed, state, finished0), None, length=max_len)
        return toks.T, lps.T, (vis, sen)

    def sample_beam(self, params, batch, beam_size: int = 5,
                    max_len: Optional[int] = None):
        max_len = max_len or self.module.seq_length
        step_fn, state, B = self._setup_decode(params, batch,
                                               beam=beam_size)
        # Reference semantics (models/CaptionModel.py:82-93): a beam
        # that emits eos is harvested into a done list (its slot's
        # score drops to -1000 and the slot is recycled), still-live
        # beams join at the final step, and done beams rank by RAW
        # summed log-prob (length_penalty=0.0 — no normalization).
        cfg = GenerationConfig(max_len=max_len, bos_id=0, eos_id=0,
                               pad_id=0, beam_size=beam_size,
                               init_finished=False,
                               harvest_finished=True,
                               length_penalty=0.0)
        seed = jnp.zeros((B,), jnp.int32)
        # Gen1State leaves are [layers, B, H]: batch lives on axis 1.
        tokens, scores = beam_search(step_fn, state, seed, cfg,
                                     cache_batch_axis=1)
        return tokens[:, 0, 1:], scores[:, 0]
