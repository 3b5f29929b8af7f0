"""Positional embeddings: pad-awareness and incremental offsets."""

import jax
import jax.numpy as jnp
import numpy as np

from news_image_caption_tpu.ops.positional import (
    LearnedPositionalEmbedding, SinusoidalPositionalEmbedding,
    make_positions, sinusoidal_table)


def test_make_positions_right_pad():
    ids = jnp.array([[5, 6, 7, 1, 1], [5, 1, 1, 1, 1]])
    pos = make_positions(ids, padding_idx=1)
    np.testing.assert_array_equal(
        np.asarray(pos), [[2, 3, 4, 1, 1], [2, 1, 1, 1, 1]])


def test_make_positions_offset():
    ids = jnp.array([[9]])
    pos = make_positions(ids, padding_idx=1, start_pos=4)
    # reference: padding_idx + cumsum(=1) then += start_pos -> 1+1+4
    np.testing.assert_array_equal(np.asarray(pos), [[6]])


def test_sinusoidal_table_shape_and_pad_row():
    t = sinusoidal_table(10, 8, padding_idx=1)
    assert t.shape == (10, 8)
    np.testing.assert_allclose(t[1], 0.0)
    # first half sin(0)=0, second half cos(0)=1 at position 0
    np.testing.assert_allclose(t[0, :4], 0.0)
    np.testing.assert_allclose(t[0, 4:], 1.0)


def test_sinusoidal_incremental_matches_full():
    emb = SinusoidalPositionalEmbedding(embedding_dim=8, padding_idx=1,
                                        init_size=16)
    ids = jnp.array([[10, 11, 12, 13]])
    params = emb.init(jax.random.PRNGKey(0), ids)
    full = emb.apply(params, ids)
    # Step-by-step with explicit offsets (as in incremental decoding).
    steps = [emb.apply(params, ids[:, t:t + 1], start_pos=t)
             for t in range(4)]
    inc = jnp.concatenate(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=1e-6)


def test_learned_positional_pad_row_zero():
    emb = LearnedPositionalEmbedding(max_positions=16, embedding_dim=8,
                                     padding_idx=0)
    ids = jnp.array([[3, 4, 0, 0]])
    params = emb.init(jax.random.PRNGKey(0), ids)
    out = emb.apply(params, ids)
    np.testing.assert_allclose(np.asarray(out[0, 2:]), 0.0, atol=1e-7)
