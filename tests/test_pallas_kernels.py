"""Pallas dynamic conv kernel vs the jnp shift-accumulate reference.

Runs in interpreter mode on CPU (real-TPU execution is exercised by
benchmarks/pallas_bench.py on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.ops.conv import _shift_accumulate
from news_image_caption_tpu.ops.pallas_kernels import dynamic_conv_pallas


@pytest.mark.parametrize("B,T,C,H,K,tile", [
    (2, 16, 32, 4, 3, 8),
    (1, 32, 64, 8, 7, 16),
    (2, 16, 16, 2, 15, 16),   # K ~ tile
])
def test_pallas_matches_shift(B, T, C, H, K, tile):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, T, C))
    w = jax.nn.softmax(
        jax.random.normal(kw, (B, T, H, K)), axis=-1)
    expected = _shift_accumulate(
        x.reshape(B, T, H, C // H), w, K).reshape(B, T, C)
    got = dynamic_conv_pallas(x, w, num_heads=H, tile=tile,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_pallas_causal():
    B, T, C, H, K = 1, 16, 16, 4, 5
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    w = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(2), (B, T, H, K)), -1)
    out1 = dynamic_conv_pallas(x, w, H, tile=8, interpret=True)
    x2 = x.at[:, 10:].set(99.0)
    out2 = dynamic_conv_pallas(x2, w, H, tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out1[:, :10]),
                               np.asarray(out2[:, :10]), atol=1e-5)


def _xattn_reference(q, k, v, mask):
    B, Q, E = q.shape
    S = k.shape[1]
    H = 4
    dh = E // H
    sc = jnp.einsum("bqhd,bshd->bhqs", q.reshape(B, Q, H, dh),
                    k.reshape(B, S, H, dh),
                    preferred_element_type=jnp.float32)
    sc = jnp.where(mask[:, None, None, :], sc, -1e9)
    p = jax.nn.softmax(sc.astype(jnp.float32), -1).astype(v.dtype)
    return jnp.einsum("bhqs,bshd->bqhd", p,
                      v.reshape(B, S, H, dh)).reshape(B, Q, E)


@pytest.mark.parametrize("B,Q,S,E", [(2, 5, 18, 64), (1, 1, 34, 128)])
def test_decode_cross_attention_matches_einsum(B, Q, S, E):
    from news_image_caption_tpu.ops.pallas_kernels import \
        decode_cross_attention
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, Q, E))
    k = jax.random.normal(kk, (B, S, E))
    v = jax.random.normal(kv, (B, S, E))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (B, S))
    bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
    got = decode_cross_attention(q, k, v, bias, num_heads=4,
                                 interpret=True)
    ref = _xattn_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_decode_cross_attention_all_masked_row_uniform():
    # A fully-masked key set degenerates to a uniform distribution
    # (exp(-1e9 - -1e9) = 1 everywhere) — same convention as the
    # einsum path; must not produce NaNs.
    from news_image_caption_tpu.ops.pallas_kernels import \
        decode_cross_attention
    B, Q, S, E = 1, 2, 10, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, Q, E))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, E))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, E))
    bias = jnp.full((B, S), -1e9, jnp.float32)
    got = decode_cross_attention(q, k, v, bias, num_heads=4,
                                 interpret=True)
    assert not np.isnan(np.asarray(got)).any()
