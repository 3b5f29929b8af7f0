"""RoBERTa article encoder in Flax with HF weight porting.

Capability parity target: the frozen fairseq `roberta.large` feature
extractor used by Gen-3 models
(/root/reference/ttl/tell/models/transformer_flattened.py:205-221 —
`extract_features(..., return_all_hiddens=True)` with the optional
25-layer softmax-weighted sum `weigh_bert`) and the Gen-2 RoBERTa
feature cache (/root/reference/final_roberta/encoder.py:48-116).

The encoder is frozen in every reference training path
(`no_grad: ^roberta`), so it runs in eval mode (no dropout) and its
params can be kept in bf16. `port_hf_roberta` converts a HuggingFace
`RobertaModel` state dict to weight-exact params.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def position_ids_from_tokens(ids: jax.Array, padding_idx: int = 1
                             ) -> jax.Array:
    """HF/fairseq convention: pad-aware positions starting at pad+1."""
    mask = (ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


class RobertaLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    # Sequence-parallel attention: when a mesh with a `context` axis
    # is supplied, attention runs as ring attention (K/V blocks
    # rotating over ICI, parallel/ring.py) instead of materializing
    # the full [B,H,S,S] score tile per device.
    ring_mesh: Any = None

    @nn.compact
    def __call__(self, x, pad_mask):
        """x [B,S,H]; pad_mask [B,S] True = keep."""
        B, S, H = x.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, name="q", dtype=self.dtype)(x)
        k = nn.Dense(self.hidden, name="k", dtype=self.dtype)(x)
        v = nn.Dense(self.hidden, name="v", dtype=self.dtype)(x)
        q = q.reshape(B, S, self.heads, hd)
        k = k.reshape(B, S, self.heads, hd)
        v = v.reshape(B, S, self.heads, hd)
        if self.ring_mesh is not None:
            from news_image_caption_tpu.parallel.ring import \
                ring_attention
            ctx = ring_attention(q, k, v, pad_mask,
                                 self.ring_mesh).reshape(B, S, H)
        else:
            scores = jnp.einsum("bthd,bshd->bhts", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(hd)
            scores = jnp.where(pad_mask[:, None, None, :], scores,
                               -1e9)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            ctx = jnp.einsum("bhts,bshd->bthd", probs,
                             v).reshape(B, S, H)
        attn_out = nn.Dense(self.hidden, name="attn_out",
                            dtype=self.dtype)(ctx)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="attn_ln")(x + attn_out)
        h = nn.Dense(self.intermediate, name="inter",
                     dtype=self.dtype)(x)
        h = jax.nn.gelu(h, approximate=False)
        out = nn.Dense(self.hidden, name="out", dtype=self.dtype)(h)
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                            name="out_ln")(x + out)


class RobertaEncoder(nn.Module):
    """Returns (last_hidden, all_hiddens [L+1]) like extract_features."""

    vocab_size: int = 50265
    hidden: int = 1024
    num_layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    max_positions: int = 514
    padding_idx: int = 1
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    ring_mesh: Any = None   # see RobertaLayer.ring_mesh

    @nn.compact
    def __call__(self, ids: jax.Array
                 ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        pad_mask = ids != self.padding_idx
        word = nn.Embed(self.vocab_size, self.hidden,
                        name="word_embeddings")(ids)
        pos_ids = position_ids_from_tokens(ids, self.padding_idx)
        pos = nn.Embed(self.max_positions, self.hidden,
                       name="position_embeddings")(pos_ids)
        tok_type = self.param("token_type_embedding",
                              nn.initializers.zeros, (self.hidden,))
        x = word + pos + tok_type
        # dtype on every LN: an fp32-param LN would re-promote the
        # bf16 residual stream at all 48 sublayers (same footgun the
        # flattened decoder guards, decoder_flattened.py:106-109).
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="embed_ln")(x)
        hiddens = [x]
        for i in range(self.num_layers):
            x = RobertaLayer(self.hidden, self.heads, self.intermediate,
                             self.eps, self.dtype,
                             ring_mesh=self.ring_mesh,
                             name=f"layer_{i}")(x, pad_mask)
            hiddens.append(x)
        return x, tuple(hiddens)

    def encode_pipelined(self, variables, ids: jax.Array, mesh,
                         n_micro: int = None) -> jax.Array:
        """Last-layer features via the GPipe schedule (parallel/pipe.py).

        The layer stack's params are stacked along a layer dim and
        sharded over the mesh's `pipe` axis, so each device holds only
        L/P of the 24 layers — the encoder (355M params at roberta.large
        dims) scales past one chip's HBM. Values are identical to
        `apply(variables, ids)[0]` (pinned by tests/test_pipe.py): the
        embedding stage reuses the exact Flax submodules on the same
        param subtrees, and pipeline_apply is numerically the
        sequential layer loop. Only the last hidden is produced — the
        25-hidden tuple (weigh_bert) would have to travel the whole
        pipeline; use the dense path for weighted-sum configs.
        Beyond-reference (the reference has no PP — SURVEY.md §2.10).
        """
        from news_image_caption_tpu.parallel.mesh import DATA_AXIS
        from news_image_caption_tpu.parallel.pipe import (pipeline_apply,
                                                          stack_layers)
        if n_micro is None:
            # Max microbatches that still shard over the data axis
            # (microbatch size = data-axis size): smallest bubble
            # fraction (P-1)/(M+P-1) the batch permits.
            n_micro = max(1, ids.shape[0]
                          // dict(mesh.shape).get(DATA_AXIS, 1))
        p = variables["params"]
        pad_mask = ids != self.padding_idx
        # parent=None: standalone submodule applies on the param
        # subtrees (this method runs on the unbound module; flax would
        # otherwise try to register these as children of self).
        word = nn.Embed(self.vocab_size, self.hidden,
                        parent=None).apply(
            {"params": p["word_embeddings"]}, ids)
        pos_ids = position_ids_from_tokens(ids, self.padding_idx)
        pos = nn.Embed(self.max_positions, self.hidden,
                       parent=None).apply(
            {"params": p["position_embeddings"]}, pos_ids)
        x = word + pos + p["token_type_embedding"]
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         parent=None).apply(
            {"params": p["embed_ln"]}, x)
        stacked = stack_layers(
            [p[f"layer_{i}"] for i in range(self.num_layers)])
        layer = RobertaLayer(self.hidden, self.heads, self.intermediate,
                             self.eps, self.dtype, parent=None)

        def stage_fn(layer_params, carry):
            # The pad mask rides the carry so every stage masks its
            # attention; bubble lanes see all-False masks, which the
            # -1e9 fill degrades to a uniform average (no NaNs) and the
            # commit mask discards.
            h = layer.apply({"params": layer_params},
                            carry["x"], carry["mask"])
            return {"x": h, "mask": carry["mask"]}

        out = pipeline_apply(stage_fn, stacked,
                             {"x": x, "mask": pad_mask},
                             mesh=mesh, n_micro=n_micro)
        return out["x"]


class WeightedSumFeatures(nn.Module):
    """Softmax-weighted sum over all hidden layers (weigh_bert)."""

    num_layers: int = 25

    @nn.compact
    def __call__(self, hiddens) -> jax.Array:
        w = self.param("bert_weight",
                       nn.initializers.uniform(scale=1.0),
                       (self.num_layers,))
        weights = jax.nn.softmax(w)
        stacked = jnp.stack(hiddens, axis=0)   # [L, B, S, H]
        return jnp.einsum("l,lbsh->bsh", weights, stacked)


# ----------------------------------------------------------------------
# HF weight porting
# ----------------------------------------------------------------------

def _lin(sd, prefix):
    return {"kernel": np.asarray(sd[f"{prefix}.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def port_hf_roberta(state_dict: Dict[str, Any],
                    num_layers: int = 24) -> Dict:
    """HF RobertaModel state_dict -> RobertaEncoder params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # Tolerate either 'roberta.'-prefixed or bare key layouts.
    prefix = ("roberta."
              if any(k.startswith("roberta.") for k in sd) else "")

    def key(k):
        return prefix + k

    p: Dict[str, Any] = {
        "word_embeddings": {"embedding": sd[key(
            "embeddings.word_embeddings.weight")]},
        "position_embeddings": {"embedding": sd[key(
            "embeddings.position_embeddings.weight")]},
        "token_type_embedding": sd[key(
            "embeddings.token_type_embeddings.weight")][0],
        "embed_ln": _ln(sd, key("embeddings.LayerNorm")),
    }
    for i in range(num_layers):
        base = key(f"encoder.layer.{i}")
        p[f"layer_{i}"] = {
            "q": _lin(sd, f"{base}.attention.self.query"),
            "k": _lin(sd, f"{base}.attention.self.key"),
            "v": _lin(sd, f"{base}.attention.self.value"),
            "attn_out": _lin(sd, f"{base}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{base}.attention.output.LayerNorm"),
            "inter": _lin(sd, f"{base}.intermediate.dense"),
            "out": _lin(sd, f"{base}.output.dense"),
            "out_ln": _ln(sd, f"{base}.output.LayerNorm"),
        }
    return {"params": jax.tree.map(jnp.asarray, p)}
