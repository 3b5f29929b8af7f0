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
