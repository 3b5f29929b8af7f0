"""Flash cross-attention kernel: parity + dropout semantics.

Interpreter-mode checks of ops/pallas_flash.py (the compiled TPU path
swaps threefry for the hardware PRNG and head-grouped masked dots for
per-head slices; forward/backward mask consistency holds identically
because both kernels regenerate the mask from the same (seed, head)).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from news_image_caption_tpu.ops.attention import MultiHeadAttention
from news_image_caption_tpu.ops.pallas_flash import flash_cross_attention

B, H, T, D, S = 2, 4, 10, 16, 24
E = H * D


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, T, E).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, E).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, E).astype(np.float32))
    bias = jnp.zeros((B, S), jnp.float32).at[1, -7:].set(-1e9)
    return q, k, v, bias


def _xla_ref(q, k, v, bias):
    qh = q.reshape(B, T, H, D)
    kh = k.reshape(B, S, H, D)
    vh = v.reshape(B, S, H, D)
    s = jnp.einsum("bthd,bshd->bhts", qh, kh) + bias[:, None, None, :]
    o = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, axis=-1), vh)
    return o.reshape(B, T, E)


def test_forward_matches_xla(data):
    q, k, v, bias = data
    seed = jnp.zeros((1,), jnp.int32)
    out = flash_cross_attention(q, k, v, bias, seed, H, 0.0, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_xla_ref(q, k, v, bias)),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla(data):
    q, k, v, bias = data
    seed = jnp.zeros((1,), jnp.int32)

    def loss_k(q, k, v):
        return jnp.sum(jnp.sin(
            flash_cross_attention(q, k, v, bias, seed, H, 0.0, True)))

    def loss_r(q, k, v):
        return jnp.sum(jnp.sin(_xla_ref(q, k, v, bias)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dropout_deterministic_and_seed_sensitive(data):
    q, k, v, bias = data
    s0 = jnp.zeros((1,), jnp.int32)
    s7 = jnp.full((1,), 7, jnp.int32)
    o1 = flash_cross_attention(q, k, v, bias, s0, H, 0.3, True)
    o2 = flash_cross_attention(q, k, v, bias, s0, H, 0.3, True)
    o3 = flash_cross_attention(q, k, v, bias, s7, H, 0.3, True)
    assert bool(jnp.all(o1 == o2))
    assert bool(jnp.any(o1 != o3))


def test_dropout_values_and_grads_match_extracted_mask():
    """With a single head and v = I the kernel output IS the dropped
    prob matrix; the extracted mask reconstructs the exact function,
    so both values and custom-VJP grads can be checked against an XLA
    reference."""
    rng = np.random.RandomState(1)
    Bs, Hs, Ts = 2, 1, 8
    Es = 32
    Ss = Es
    q = jnp.asarray(rng.randn(Bs, Ts, Es).astype(np.float32))
    k = jnp.asarray(rng.randn(Bs, Ss, Es).astype(np.float32))
    eye = jnp.broadcast_to(jnp.eye(Ss, Es, dtype=jnp.float32),
                           (Bs, Ss, Es))
    bias = jnp.zeros((Bs, Ss), jnp.float32)
    seed = jnp.full((1,), 3, jnp.int32)
    p = 0.25
    dropped = flash_cross_attention(q, k, eye, bias, seed, Hs, p, True)
    probs = jax.nn.softmax(jnp.einsum("bte,bse->bts", q, k), axis=-1)
    mask = (np.asarray(dropped) > 0).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(dropped), np.asarray(probs) * mask / (1 - p),
        rtol=1e-5, atol=1e-6)
    frac = mask.mean()
    assert abs(frac - (1 - p)) < 0.07

    v = jnp.asarray(rng.randn(Bs, Ss, Es).astype(np.float32))
    mask_j = jnp.asarray(mask)

    def loss_k(q, k, v):
        return jnp.sum(jnp.tanh(
            flash_cross_attention(q, k, v, bias, seed, Hs, p, True)))

    def loss_r(q, k, v):
        pr = jax.nn.softmax(jnp.einsum("bte,bse->bts", q, k), axis=-1)
        pd = pr * mask_j / (1 - p)
        return jnp.sum(jnp.tanh(jnp.einsum("bts,bse->bte", pd, v)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_mha_flash_path_matches_xla_path():
    """MultiHeadAttention.attend with use_flash (interpret) equals the
    XLA chain on the deterministic full-sequence path, including the
    bias_kv/zero-attn slots and key padding."""
    rng = np.random.RandomState(2)
    Em, nH, kd = 48, 4, 32
    Bq, Tq, Sq = 2, 6, 11
    query = jnp.asarray(rng.randn(Bq, Tq, Em).astype(np.float32))
    key = jnp.asarray(rng.randn(Bq, Sq, kd).astype(np.float32))
    mask = np.zeros((Bq, Sq), bool)
    mask[0, -3:] = True
    mask = jnp.asarray(mask)

    kwargs = dict(embed_dim=Em, num_heads=nH, kdim=kd, vdim=kd)
    mha_x = MultiHeadAttention(**kwargs)
    mha_f = MultiHeadAttention(use_flash=True, flash_interpret=True,
                               **kwargs)
    params = mha_x.init(jax.random.PRNGKey(0), query, key, key,
                        key_padding_mask=mask)
    out_x, _ = mha_x.apply(params, query, key, key,
                           key_padding_mask=mask)
    out_f, _ = mha_f.apply(params, query, key, key,
                           key_padding_mask=mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


def test_decoder_flash_train_loss_and_grads_match():
    """Full decoder: use_flash_train (interpret, deterministic) equals
    the XLA path for loss value and parameter gradients."""
    from news_image_caption_tpu.models.captioner import \
        TransformerFlattened

    kw = dict(vocab_size=60, cutoff=(20, 40, 60), embed_dim=32,
              ffn_dim=48, num_heads=2, num_layers=2,
              kernel_sizes=(3, 5), image_dim=24, article_dim=16,
              max_positions=32)
    m_x = TransformerFlattened(**kw)
    m_f = TransformerFlattened(use_flash_train=True,
                               flash_interpret=True, **kw)
    rng = np.random.RandomState(3)
    Bc = 2
    batch = {
        "caption_ids": jnp.asarray(
            rng.randint(2, 60, size=(Bc, 9)).astype(np.int32)),
        "image": jnp.asarray(rng.randn(Bc, 4, 24).astype(np.float32)),
        "article": jnp.asarray(
            rng.randn(Bc, 7, 16).astype(np.float32)),
        "article_mask": jnp.asarray(
            np.eye(8, 7, k=-6, dtype=bool)[:Bc]),
    }
    params = m_x.init(jax.random.PRNGKey(0), batch)

    def loss_x(p):
        return m_x.loss_fn(p, batch, None)[0]

    def loss_f(p):
        return m_f.loss_fn(p, batch, None)[0]

    lx, gx = jax.value_and_grad(loss_x)(params)
    lf, gf = jax.value_and_grad(loss_f)(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-6)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for k, vx in flat_x:
        np.testing.assert_allclose(
            np.asarray(flat_f[jax.tree_util.keystr(k)]),
            np.asarray(vx), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(k))


def test_head_grouping_math_matches_per_head():
    """The compiled path's head-grouped masked-dot scheme must equal
    per-head slicing. Emulated in numpy (the grouping itself is a
    static Python branch on `interpret`)."""
    rng = np.random.RandomState(4)
    Ts, Ss, Ds, Hs = 5, 7, 4, 4   # W=128 not needed for the algebra
    Es = Ds * Hs
    W, G = Es, Hs                 # one slice holding all heads
    q = rng.randn(Ts, Es)
    k = rng.randn(Ss, Es)
    v = rng.randn(Ss, Es)
    out_group = np.zeros((Ts, Es))
    for g in range(G):
        lane = np.arange(Es)
        m = ((lane >= g * Ds) & (lane < (g + 1) * Ds)).astype(float)
        s = (q * m) @ k.T          # masked full-width contraction
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out_group += (p @ v) * m
    out_ref = np.zeros((Ts, Es))
    for h in range(Hs):
        sl = slice(h * Ds, (h + 1) * Ds)
        s = q[:, sl] @ k[:, sl].T
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out_ref[:, sl] = p @ v[:, sl]
    np.testing.assert_allclose(out_group, out_ref, rtol=1e-10)


def test_mha_flash_path_promotes_f16_inputs():
    """f16 inputs must never reach the Pallas kernel (Mosaic has no
    f16): attend casts them to bf16 at the call site. Interpret mode
    exercises the same gate the TPU path takes."""
    rng = np.random.RandomState(5)
    Em, nH = 32, 4
    Bq, Tq, Sq = 2, 5, 9
    query = rng.randn(Bq, Tq, Em).astype(np.float16)
    key = rng.randn(Bq, Sq, Em).astype(np.float16)
    mha_f = MultiHeadAttention(embed_dim=Em, num_heads=nH,
                               use_flash=True, flash_interpret=True)
    mha_x = MultiHeadAttention(embed_dim=Em, num_heads=nH)
    params = mha_x.init(jax.random.PRNGKey(0),
                        jnp.asarray(query, jnp.float32),
                        jnp.asarray(key, jnp.float32),
                        jnp.asarray(key, jnp.float32))
    out_f, _ = mha_f.apply(params, jnp.asarray(query),
                           jnp.asarray(key), jnp.asarray(key))
    out_x, _ = mha_x.apply(params, jnp.asarray(query, jnp.float32),
                           jnp.asarray(key, jnp.float32),
                           jnp.asarray(key, jnp.float32))
    assert out_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_x), rtol=0.06, atol=0.06)
