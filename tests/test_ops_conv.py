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


def test_conv_preserves_activation_dtype():
    """bf16 activations must come back bf16 from BOTH conv types —
    fp32 tap weights silently re-widened LightweightConv's output
    (and everything downstream of the decoder residual chain)."""
    B, T, C, H, K = 2, 5, 8, 2, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C),
                          jnp.bfloat16)
    for conv in (DynamicConv(input_size=C, kernel_size=K, num_heads=H),
                 LightweightConv(input_size=C, kernel_size=K,
                                 num_heads=H)):
        params = conv.init(jax.random.PRNGKey(1), x)
        assert conv.apply(params, x).dtype == jnp.bfloat16, type(conv)
        cache = conv.apply(params, B, jnp.bfloat16,
                           method=type(conv).init_cache)
        out_t, _ = conv.apply(params, x[:, 0], cache,
                              method=type(conv).step)
        assert out_t.dtype == jnp.bfloat16, type(conv)


def test_ring_step_kernel_size_one():
    """K=1 (pointwise) must work on the ring paths the decode scan
    always uses — mod-by-zero / zero-row updates previously crashed
    at trace time."""
    B, C, H = 2, 8, 2
    x_t = jax.random.normal(jax.random.PRNGKey(0), (B, C))
    for conv in (DynamicConv(input_size=C, kernel_size=1, num_heads=H),
                 LightweightConv(input_size=C, kernel_size=1,
                                 num_heads=H)):
        params = conv.init(jax.random.PRNGKey(1), x_t[:, None, :])
        ref = conv.apply(params, x_t[:, None, :])[:, 0]
        cache = conv.apply(params, B, method=type(conv).init_cache)
        out, _ = conv.apply(params, x_t, cache, 0,
                            method=type(conv).step_ring)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)
    # lazy-slot-map variant (DynamicConv only)
    dc = DynamicConv(input_size=C, kernel_size=1, num_heads=H)
    params = dc.init(jax.random.PRNGKey(1), x_t[:, None, :])
    ref = dc.apply(params, x_t[:, None, :])[:, 0]
    cache = dc.apply(params, B, method=DynamicConv.init_cache)
    slot_map = jnp.zeros((0, B), jnp.int32)
    out, _, _ = dc.apply(params, x_t, cache, slot_map, 0,
                         method=DynamicConv.step_ring_lazy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)


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
