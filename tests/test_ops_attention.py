"""MHA: masking, bias/zero slots, precomputed-KV equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from news_image_caption_tpu.ops.attention import (
    MultiHeadAttention, causal_mask, extend_attn_mask)


def make_mha(**kw):
    return MultiHeadAttention(embed_dim=16, num_heads=4, kdim=10, vdim=10,
                              **kw)


def test_precomputed_kv_equals_oneshot():
    mha = make_mha()
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    kvs = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 10))
    mask = jnp.zeros((2, 7), dtype=bool).at[:, 5:].set(True)  # True = pad
    params = mha.init(jax.random.PRNGKey(2), q, kvs, kvs,
                      key_padding_mask=mask)
    out1, _ = mha.apply(params, q, kvs, kvs, key_padding_mask=mask)
    kv = mha.apply(params, kvs, kvs, mask,
                   method=MultiHeadAttention.precompute_kv)
    out2, _ = mha.apply(params, q, kv, method=MultiHeadAttention.attend)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_padding_is_ignored():
    mha = make_mha()
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16))
    kvs = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 10))
    mask = jnp.zeros((1, 6), dtype=bool).at[:, 4:].set(True)
    params = mha.init(jax.random.PRNGKey(2), q, kvs, kvs,
                      key_padding_mask=mask)
    out1, _ = mha.apply(params, q, kvs, kvs, key_padding_mask=mask)
    kvs2 = kvs.at[:, 4:].set(777.0)  # perturb only padded keys
    out2, _ = mha.apply(params, q, kvs2, kvs2, key_padding_mask=mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_bias_and_zero_slots_extend_length():
    mha = make_mha()
    kvs = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 10))
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    params = mha.init(jax.random.PRNGKey(2), q, kvs, kvs)
    kv = mha.apply(params, kvs, kvs, None,
                   method=MultiHeadAttention.precompute_kv)
    assert kv.k.shape == (2, 9, 4, 4)  # 7 + bias + zero slots


def test_attention_weights_shape_and_sum():
    mha = make_mha()
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    kvs = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 10))
    params = mha.init(jax.random.PRNGKey(2), q, kvs, kvs)
    _, w = mha.apply(params, q, kvs, kvs, need_weights=True)
    assert w.shape == (2, 5, 9)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_causal_self_attention():
    mha = MultiHeadAttention(embed_dim=16, num_heads=4,
                             add_bias_kv=False, add_zero_attn=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 16))
    am = causal_mask(6)
    params = mha.init(jax.random.PRNGKey(1), x, x, x, attn_mask=am)
    out1, _ = mha.apply(params, x, x, x, attn_mask=am)
    x2 = x.at[:, 4:].set(55.0)
    out2, _ = mha.apply(params, x2, x2, x2, attn_mask=am)
    np.testing.assert_allclose(np.asarray(out1[:, :4]),
                               np.asarray(out2[:, :4]), atol=1e-5)


def test_extend_attn_mask():
    am = causal_mask(4)
    ext = extend_attn_mask(am, 2)
    assert ext.shape == (4, 6)
    np.testing.assert_allclose(np.asarray(ext[:, 4:]), 0.0)


def test_downsampled_mha_matches_strided_slicing_reference():
    """The static-shape masked formulation must equal the reference's
    physical per-head slicing (k/v[::head+1], strict causal on the
    strided columns, downsampled_single_head.py:88-140)."""
    from news_image_caption_tpu.ops.attention import \
        DownsampledMultiHeadAttention

    B, T, E, H = 2, 7, 8, 4
    hd = E // H
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, E))
    m = DownsampledMultiHeadAttention(out_channels=E, embed_dim=E,
                                      num_heads=H, downsample=True)
    p = m.init(jax.random.PRNGKey(1), x, x, x,
               mask_future_timesteps=True, use_scalar_bias=True)
    out, _ = m.apply(p, x, x, x, mask_future_timesteps=True,
                     use_scalar_bias=True)

    # Naive reference: slice per head, project, strict causal.
    def gehring(params, y):
        v = params["kernel"]
        g = params["scale"]
        w = v * (g[None, :] / np.linalg.norm(v, axis=0, keepdims=True))
        return y @ w + params["bias"]

    pp = p["params"]
    heads = []
    xn = np.asarray(x)
    for i in range(H):
        stride = i + 1
        src = np.arange(0, T, stride)                     # positions
        q = gehring(pp[f"q{i}"], xn) * (hd ** -0.5)       # [B,T,hd]
        k = gehring(pp[f"k{i}"], xn[:, src])              # [B,S',hd]
        v = gehring(pp[f"v{i}"], xn[:, src])
        scores = q @ k.transpose(0, 2, 1)                 # [B,T,S']
        allowed = src[None, :] < np.arange(T)[:, None]    # strict
        scores = np.where(allowed[None], scores, -1e9)
        # Scalar-bias slot: score-0 column with value-0 row, so t=0
        # (which attends to no real source) is well-defined
        # (scalar_bias.py:10-31).
        scores = np.concatenate(
            [np.zeros_like(scores[:, :, :1]), scores], axis=-1)
        v = np.concatenate([np.zeros_like(v[:, :1]), v], axis=1)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        attn = probs @ v                                  # [B,T,hd]
        heads.append(gehring(pp[f"o{i}"], attn))
    cat = np.concatenate(heads, axis=-1)
    expected = gehring(pp["out_proj"], cat)
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=1e-4, atol=1e-5)


def test_quantized_decode_kv_close_to_exact():
    """QuantDecodeKV (int8 K/V + factored scales) must track the exact
    DecodeKV attention closely and normalize correctly."""
    from news_image_caption_tpu.ops.attention import (
        MultiHeadAttention, to_decode_kv)
    B, S, E, H, beam = 2, 18, 64, 4, 3
    mha = MultiHeadAttention(embed_dim=E, num_heads=H, kdim=24, vdim=24)
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B * beam, E))
    key = jax.random.normal(kk, (B, S, 24))
    val = jax.random.normal(kv_, (B, S, 24))
    pad = jax.random.bernoulli(jax.random.PRNGKey(3), 0.2, (B, S))

    def run(quant):
        def f(mod):
            kv = mod.precompute_kv(key, val, key_padding_mask=pad)
            return mod.attend_flat_beam(
                q, to_decode_kv(kv, quantize=quant), beam)
        return f

    variables = mha.init(jax.random.PRNGKey(1),
                         q.reshape(B, beam, E), key, val)
    exact = mha.apply(variables, method=run(False))
    quant = mha.apply(variables, method=run(True))
    err = np.abs(np.asarray(exact) - np.asarray(quant))
    scale = np.abs(np.asarray(exact)).max()
    assert err.max() < 0.05 * scale, (err.max(), scale)


def test_downsampled_mha_fully_masked_row_attends_to_nothing():
    """Strict causal without the scalar-bias column leaves row t=0
    with NO valid source; it must output zeros (attend to nothing),
    not the uniform mean of all values (a future/pad leak). The
    reference NaNs here; zeros are the loud-failure-free equivalent."""
    from news_image_caption_tpu.ops.attention import \
        DownsampledMultiHeadAttention

    B, T, E, H = 2, 5, 8, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, E))
    m = DownsampledMultiHeadAttention(out_channels=E, embed_dim=E,
                                      num_heads=H, downsample=False,
                                      project_input=False)
    p = m.init(jax.random.PRNGKey(1), x, x, x,
               mask_future_timesteps=True, use_scalar_bias=False)
    out, w = m.apply(p, x, x, x, mask_future_timesteps=True,
                     use_scalar_bias=False)
    # Row 0's attention weights are zero and its output is the
    # out-proj bias alone — identical across batch items by
    # construction (it no longer depends on any value vector).
    np.testing.assert_allclose(np.asarray(w)[:, 0, :], 0.0)
    np.testing.assert_allclose(np.asarray(out)[0, 0],
                               np.asarray(out)[1, 0], atol=1e-6)
    # rows t>0 are proper distributions over s<t
    sums = np.asarray(w)[:, 1:, :].sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_downsampled_mha_nondownsampled_weights_are_head_mean():
    """downsample=False returns head-AVERAGED attention weights
    (reference downsampled_multi_head.py forward, downsample=False
    branch); head-0-only is the downsample=True behavior."""
    from news_image_caption_tpu.ops.attention import \
        DownsampledMultiHeadAttention
    B, T, E, H = 2, 5, 8, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, E))
    m = DownsampledMultiHeadAttention(out_channels=E, embed_dim=E,
                                      num_heads=H, downsample=False)
    p = m.init(jax.random.PRNGKey(1), x, x, x)
    _, w = m.apply(p, x, x, x)
    assert w.shape == (B, T, T)
    # Row-stochastic (mean of H softmaxes is still a distribution).
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
    # Must differ from head 0 alone for random projections.
    out2, w2 = m.apply(p, x, x, x)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2))
