"""Dynamic/lightweight conv: naive-reference parity + incremental parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.ops.conv import DynamicConv, LightweightConv


def naive_dynamic_conv(x, w, K):
    """Reference semantics, pure numpy. x [B,T,H,R], w [B,T,H,K]."""
    B, T, H, R = x.shape
    out = np.zeros_like(x)
    for t in range(T):
        for k in range(K):
            src = t - (K - 1) + k
            if 0 <= src < T:
                out[:, t] += w[:, t, :, k:k + 1] * x[:, src]
    return out


@pytest.mark.parametrize("method", ["shift", "band"])
def test_dynamic_conv_matches_naive(method):
    B, T, C, H, K = 2, 12, 16, 4, 5
    conv = DynamicConv(input_size=C, kernel_size=K, num_heads=H,
                       weight_softmax=True, method=method)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    params = conv.init(rng, x)
    out = conv.apply(params, x)

    # Recompute with explicit weights + naive loop.
    wlin = params["params"]["weight_linear"]["kernel"]
    w = np.asarray(x) @ np.asarray(wlin)
    w = w.reshape(B, T, H, K)
    w = np.exp(w - w.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    expected = naive_dynamic_conv(
        np.asarray(x).reshape(B, T, H, C // H), w, K).reshape(B, T, C)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_dynamic_conv_causal():
    """Changing future inputs must not affect past outputs."""
    B, T, C, H, K = 1, 10, 8, 2, 3
    conv = DynamicConv(input_size=C, kernel_size=K, num_heads=H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    params = conv.init(jax.random.PRNGKey(0), x)
    out1 = conv.apply(params, x)
    x2 = x.at[:, 5:].set(99.0)
    out2 = conv.apply(params, x2)
    np.testing.assert_allclose(np.asarray(out1[:, :5]),
                               np.asarray(out2[:, :5]), atol=1e-5)


def test_dynamic_conv_incremental_matches_full():
    B, T, C, H, K = 3, 9, 16, 4, 5
    conv = DynamicConv(input_size=C, kernel_size=K, num_heads=H)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, C))
    params = conv.init(jax.random.PRNGKey(0), x)
    full = conv.apply(params, x)

    cache = conv.apply(params, B, method=DynamicConv.init_cache)
    steps = []
    for t in range(T):
        out_t, cache = conv.apply(params, x[:, t], cache,
                                  method=DynamicConv.step)
        steps.append(out_t)
    inc = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=1e-5)


def test_lightweight_conv_incremental_matches_full():
    B, T, C, H, K = 2, 7, 8, 2, 3
    conv = LightweightConv(input_size=C, kernel_size=K, num_heads=H)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, C))
    params = conv.init(jax.random.PRNGKey(0), x)
    full = conv.apply(params, x)
    cache = conv.apply(params, B, method=LightweightConv.init_cache)
    steps = []
    for t in range(T):
        out_t, cache = conv.apply(params, x[:, t], cache,
                                  method=LightweightConv.step)
        steps.append(out_t)
    inc = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=1e-5)
