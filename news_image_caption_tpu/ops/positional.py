"""Positional embeddings (sinusoidal + learned), pad-aware.

Capability parity targets:
- fairseq-style sinusoidal/learned positional embedders with
  pad-aware positions and incremental offsets:
  /root/reference/ttl/tell/modules/token_embedders/positional.py:84-268
- Annotated-Transformer interleaved sinusoid (Gen-2):
  /root/reference/final/transformer_v2.py:289-309

TPU notes: positions are computed with a cumulative sum over the
non-pad mask — static shapes, no masked_scatter. Incremental decoding
passes an explicit integer `start_pos` (part of the decode-state
pytree) instead of mutating a module-keyed dict.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def make_positions(token_ids: jax.Array, padding_idx: int,
                   start_pos: jax.Array | int = 0) -> jax.Array:
    """Replace non-pad tokens with position numbers starting at padding_idx+1.

    Pad positions get `padding_idx`. `start_pos` offsets non-pad positions
    (used during incremental decoding). Right-padding assumed (left_pad is
    never used by the reference configs).

    Index-based like the vendored fairseq make_positions
    (/root/reference/ttl/tell/modules/token_embedders/positional.py:255-268):
    non-pad position = padding_idx + 1 + column index, NOT a cumsum over
    the non-pad mask — the two differ only for interior pads, which no
    live path produces, but index-based matches the reference bit-exactly.
    """
    mask = token_ids != padding_idx
    T = token_ids.shape[1]
    positions = (jnp.arange(T, dtype=jnp.int32)[None, :] + padding_idx + 1
                 + jnp.asarray(start_pos, jnp.int32))
    return jnp.where(mask, positions, padding_idx)


def sinusoidal_table(n_embeds: int, embed_dim: int,
                     padding_idx: Optional[int] = None) -> np.ndarray:
    """tensor2tensor-style table: [sin(t/ts) || cos(t/ts)] concatenated.

    Note: this is the *concatenated* layout (all sins then all cos),
    not the interleaved layout of the original paper.
    """
    max_ts, min_ts = 10000.0, 1.0
    n_timescales = embed_dim // 2
    # max(.., 1): embed_dim < 4 gives a single timescale (t2t guard).
    increment = math.log(max_ts / min_ts) / max(n_timescales - 1, 1)
    inv_timescales = min_ts * np.exp(np.arange(n_timescales) * -increment)
    scaled_time = np.arange(n_embeds)[:, None] * inv_timescales[None, :]
    signal = np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1)
    if embed_dim % 2 == 1:
        signal = np.concatenate([signal, np.zeros((n_embeds, 1))], axis=1)
    if padding_idx is not None:
        signal[padding_idx, :] = 0
    return signal.astype(np.float32)


def interleaved_sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """Annotated-Transformer layout: pe[:, 0::2]=sin, pe[:, 1::2]=cos.

    Used by the Gen-2 `final*` family (positions start at 0, no
    pad-awareness).
    """
    pe = np.zeros((max_len, d_model))
    position = np.arange(max_len)[:, None].astype(np.float64)
    div_term = np.exp(np.arange(0, d_model, 2) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class SinusoidalPositionalEmbedding(nn.Module):
    """Pad-aware sinusoidal positional embedding (non-learned).

    The table is a fixed constant baked into the jaxpr (size
    `init_size + 1` rows to account for the padding row), matching the
    fairseq behavior of reserving index `padding_idx` as all-zeros.
    """

    embedding_dim: int
    padding_idx: int = 1
    init_size: int = 512
    dtype: Dtype = jnp.float32

    def setup(self):
        # +1 for the padding row, + headroom so position padding_idx+1+T fits.
        n = self.init_size + self.padding_idx + 2
        self.table = jnp.asarray(
            sinusoidal_table(n, self.embedding_dim, self.padding_idx))

    def __call__(self, token_ids: jax.Array,
                 start_pos: jax.Array | int = 0) -> jax.Array:
        positions = make_positions(token_ids, self.padding_idx, start_pos)
        return jnp.take(self.table, positions, axis=0).astype(self.dtype)


class LearnedPositionalEmbedding(nn.Module):
    """Pad-aware learned positional embedding.

    Parity target: /root/reference/ttl/tell/modules/token_embedders/positional.py:12-81
    (normal(0, 0.1) init, zero padding row).
    """

    max_positions: int
    embedding_dim: int
    # Default matches the repo-wide RoBERTa convention (pad=1, bos=0)
    # like the sinusoidal sibling — padding_idx=0 would zero every
    # BOS position while giving real positions to actual pads.
    padding_idx: int = 1
    param_dtype: Dtype = jnp.float32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jax.Array,
                 start_pos: jax.Array | int = 0) -> jax.Array:
        def init(key, shape, dtype):
            w = jax.random.normal(key, shape, dtype) * 0.1
            return w.at[self.padding_idx].set(0.0)

        table = self.param(
            "embedding", init,
            (self.max_positions + self.padding_idx + 2, self.embedding_dim),
            self.param_dtype)
        positions = make_positions(token_ids, self.padding_idx, start_pos)
        return jnp.take(table, positions, axis=0).astype(self.dtype)
