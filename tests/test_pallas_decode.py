"""Fused conv-block decode step kernel vs the XLA step_ring path.

Interpret mode on CPU. Values may differ by ~1 bf16 ulp where the two
paths round transcendentals differently (interpret-mode bf16 sigmoid
vs the kernel's upcast-compute-round, which is what XLA:TPU itself
does); real-TPU token-level parity is exercised by
benchmarks/beam_profile.py and the bench harness.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from news_image_caption_tpu.ops.pallas_decode import \
    decode_conv_block  # noqa: E402


def _xla_reference(x, cache_nm, w1, b1, wl, w2, b2, H, K, t):
    """The step_ring semantics with effective (pre-normalized)
    weights, at the production rounding points."""
    N, C = x.shape
    dt = x.dtype
    Km1 = K - 1
    pre = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
           .astype(dt) + b1)
    a, b = pre[:, :C], pre[:, C:]
    h = a * jax.nn.sigmoid(b)
    w = (jnp.dot(h, wl, preferred_element_type=jnp.float32)
         .astype(dt)).reshape(N, H, K)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(dt)
    slots = jnp.arange(Km1)
    k_for_slot = jnp.mod(slots - t, Km1)
    w_hist = jnp.take(w, k_for_slot, axis=-1)
    hh = cache_nm.reshape(N, Km1, H, C // H)
    out = jnp.einsum("bhk,bkhr->bhr", w_hist, hh).reshape(N, C)
    out = out + w[:, :, K - 1:K].repeat(C // H, axis=-1).reshape(N, C) * h
    y = (jnp.dot(out.astype(dt), w2,
                 preferred_element_type=jnp.float32).astype(dt) + b2)
    return y + x, h


def _tap_major(wl, H, K):
    perm = np.array([[hh * K + k for hh in range(H)]
                     for k in range(K)]).reshape(-1)
    return wl[:, perm]


@pytest.mark.parametrize("N,C,H,K,t", [
    (8, 64, 4, 7, 11),
    (4, 128, 8, 3, 0),
    (8, 64, 4, 31, 99),
])
def test_conv_block_matches_step_ring(N, C, H, K, t):
    ks = jax.random.split(jax.random.PRNGKey(K), 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (N, C), dt)
    cache = jax.random.normal(ks[1], (K - 1, N, C), dt)  # ring-major
    w1 = (jax.random.normal(ks[2], (C, 2 * C)) * 0.05).astype(dt)
    b1 = (jax.random.normal(ks[3], (2 * C,)) * 0.05).astype(dt)
    wl = (jax.random.normal(ks[4], (C, H * K)) * 0.05).astype(dt)
    w2 = (jax.random.normal(ks[5], (C, C)) * 0.05).astype(dt)
    b2 = (jax.random.normal(ks[6], (C,)) * 0.05).astype(dt)

    y_ref, h_ref = _xla_reference(
        x, jnp.transpose(cache, (1, 0, 2)), w1, b1, wl, w2, b2, H, K, t)
    y, h = decode_conv_block(x, cache, t, w1, b1, _tap_major(wl, H, K),
                             w2, b2, num_heads=H, tile_n=4,
                             interpret=True)
    np.testing.assert_allclose(
        np.asarray(h, np.float32), np.asarray(h_ref, np.float32),
        atol=0.02, rtol=0.02)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=0.05, rtol=0.05)


def test_conv_block_ring_slot_semantics():
    """Writing the GLU output at slot t mod (K-1) then stepping t+1
    must reproduce a 2-step shifted-window conv exactly."""
    N, C, H, K = 4, 64, 4, 5
    Km1 = K - 1
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x1 = jax.random.normal(ks[0], (N, C), dt)
    x2 = jax.random.normal(ks[1], (N, C), dt)
    w1 = (jax.random.normal(ks[2], (C, 2 * C)) * 0.05).astype(dt)
    b1 = jnp.zeros((2 * C,), dt)
    wl = (jax.random.normal(ks[3], (C, H * K)) * 0.05).astype(dt)
    w2 = (jax.random.normal(ks[4], (C, C)) * 0.05).astype(dt)
    b2 = jnp.zeros((C,), dt)
    wl_tap = _tap_major(wl, H, K)
    cache = jnp.zeros((Km1, N, C), dt)
    t = 0
    y1, h1 = decode_conv_block(x1, cache, t, w1, b1, wl_tap, w2, b2,
                               num_heads=H, tile_n=4, interpret=True)
    cache = jax.lax.dynamic_update_slice(
        cache, h1[None], (t % Km1, 0, 0))
    y2, h2 = decode_conv_block(x2, cache, t + 1, w1, b1, wl_tap, w2,
                               b2, num_heads=H, tile_n=4,
                               interpret=True)
    # Reference step 2 via the XLA path with the same history.
    cache_nm = jnp.transpose(cache, (1, 0, 2))
    y2_ref, _ = _xla_reference(x2, cache_nm, w1, b1, wl, w2, b2,
                               H, K, t + 1)
    np.testing.assert_allclose(
        np.asarray(y2, np.float32), np.asarray(y2_ref, np.float32),
        atol=0.05, rtol=0.05)


@pytest.mark.parametrize("N,C,F,chunk", [(8, 64, 256, 64),
                                         (4, 128, 128, 128)])
def test_ffn_block_matches_xla(N, C, F, chunk):
    from news_image_caption_tpu.ops.pallas_decode import decode_ffn_block
    ks = jax.random.split(jax.random.PRNGKey(F), 6)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (N, C), dt)
    w1 = (jax.random.normal(ks[1], (C, F)) * 0.05).astype(dt)
    b1 = (jax.random.normal(ks[2], (F,)) * 0.05).astype(dt)
    w2 = (jax.random.normal(ks[3], (F, C)) * 0.05).astype(dt)
    b2 = (jax.random.normal(ks[4], (C,)) * 0.05).astype(dt)
    h = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
         .astype(dt) + b1)
    h = jnp.maximum(h, 0)
    y_ref = (jnp.dot(h, w2, preferred_element_type=jnp.float32)
             .astype(dt) + b2) + x
    y = decode_ffn_block(x, w1, b1, w2, b2, chunk=chunk,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               atol=0.02, rtol=0.02)


def test_early_exit_beam_matches_fixed_scan():
    """early_exit (while_loop) must produce identical tokens/scores
    to the fixed-length scan (beam path; the greedy path shares
    step_once and is covered by the slow variant below)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    model = g._flagship(tiny=True)
    batch = g._batch(B=3, T=16, P=8, S=12, image_dim=16,
                     article_dim=24, vocab=64)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    cfg = GenerationConfig(max_len=8, beam_size=3)
    cfge = GenerationConfig(max_len=8, beam_size=3, early_exit=True)
    ta, sa = jax.jit(lambda p, b: model.generate_beam(p, b, cfg))(
        params, batch)
    tb, sb = jax.jit(lambda p, b: model.generate_beam(p, b, cfge))(
        params, batch)
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                               atol=1e-6)


def _toy_step_fn(vocab=11, eos=2, seed=0):
    """Full-vocab step_fn: fixed random transition log-probs with an
    eos-absorbing bias so sequences finish early. caches = step count
    (exercises cache threading/reordering)."""
    trans = np.asarray(jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(seed), (vocab, vocab))
        + 3.0 * jax.nn.one_hot(jnp.full((vocab,), eos), vocab)))
    trans_j = jnp.asarray(trans)

    def step_fn(cur, i, caches):
        return trans_j[cur], caches + 1

    return step_fn


def test_full_vocab_generate_early_exit_matches_fixed_scan():
    """The full-vocab generate() path (gen1/gen2/tgnc/LSTM models)
    honors early_exit with identical outputs to the fixed scan."""
    from news_image_caption_tpu.generation.generator import (
        GenerationConfig, generate)
    step_fn = _toy_step_fn()
    seed_tok = jnp.array([0, 3, 5], jnp.int32)
    caches0 = jnp.zeros((3,), jnp.int32)
    cfg = GenerationConfig(max_len=12, eos_id=2, pad_id=1)
    cfge = GenerationConfig(max_len=12, eos_id=2, pad_id=1,
                            early_exit=True)
    ta, la = jax.jit(lambda: generate(step_fn, caches0, seed_tok,
                                      cfg))()
    tb, lb = jax.jit(lambda: generate(step_fn, caches0, seed_tok,
                                      cfge))()
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb))
    # the eos bias makes every toy sequence actually finish
    assert (np.asarray(ta) == 2).any(axis=1).all()


def test_full_vocab_beam_search_early_exit_matches_fixed_scan():
    from news_image_caption_tpu.generation.generator import (
        GenerationConfig, beam_search)
    step_fn = _toy_step_fn(seed=7)
    B, K = 3, 3
    seed_tok = jnp.array([0, 3, 5], jnp.int32)
    caches0 = jnp.zeros((B * K,), jnp.int32)
    cfg = GenerationConfig(max_len=12, eos_id=2, pad_id=1,
                           beam_size=K)
    cfge = GenerationConfig(max_len=12, eos_id=2, pad_id=1,
                            beam_size=K, early_exit=True)
    reorder = lambda caches, src: caches  # step count is beam-invariant
    ta, sa = jax.jit(lambda: beam_search(step_fn, caches0, seed_tok,
                                         cfg, reorder_fn=reorder))()
    tb, sb = jax.jit(lambda: beam_search(step_fn, caches0, seed_tok,
                                         cfge, reorder_fn=reorder))()
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                               atol=1e-6)


@pytest.mark.slow
def test_early_exit_greedy_matches_fixed_scan():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    model = g._flagship(tiny=True)
    batch = g._batch(B=3, T=16, P=8, S=12, image_dim=16,
                     article_dim=24, vocab=64)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    a, la = jax.jit(lambda p, b: model.generate(
        p, b, GenerationConfig(max_len=10)))(params, batch)
    b2, lb = jax.jit(lambda p, b: model.generate(
        p, b, GenerationConfig(max_len=10, early_exit=True)))(
            params, batch)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb))
