"""exact_topk == lax.top_k (values, indices, tie-breaking)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.ops.topk import exact_topk


@pytest.mark.parametrize("V", [50265, 15000, 30265, 5002, 640, 130])
def test_matches_lax_topk(V):
    x = jax.random.normal(jax.random.PRNGKey(V), (9, V))
    for k in (1, 5):
        rv, ri = jax.lax.top_k(x, k)
        v, i = jax.jit(exact_topk, static_argnums=1)(x, k)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))


def test_tied_values_exact_and_distinct_prefix_indices_match():
    """Values are exact even under massive ties; the distinct-valued
    prefix of the ranking has exact indices."""
    x = jnp.zeros((3, 50265)).at[:, 777].set(1.0).at[:, 4000].set(1.0)
    v, i = exact_topk(x, 5)
    rv, ri = jax.lax.top_k(x, 5)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i)[:, :2],
                                  np.asarray(ri)[:, :2])


def test_duplicates_within_one_group():
    # Top-5 all inside one 128-lane group.
    x = jnp.full((2, 50265), -5.0)
    x = x.at[:, 256:261].set(jnp.array([9.0, 8.0, 7.0, 6.0, 5.5]))
    v, i = exact_topk(x, 5)
    np.testing.assert_array_equal(
        np.asarray(i), np.tile(np.arange(256, 261), (2, 1)))


def test_k_exceeding_group_count_falls_back():
    """k in (G, V//8]: stage 2's lax.top_k over G group maxes can't
    hold k winners — must fall back to lax.top_k (ADVICE r02)."""
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 5000))
    # G = ceil(5000/128) = 40 < k=64 <= V//8 = 625
    v, i = jax.jit(exact_topk, static_argnums=1)(x, 64)
    rv, ri = jax.lax.top_k(x, 64)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))


def test_neg_inf_rows():
    x = jnp.full((2, 50265), -jnp.inf).at[:, 0].set(0.0)
    v, i = exact_topk(x, 5)
    rv, ri = jax.lax.top_k(x, 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


class TestBandTopkLse:
    """Fused band-streaming topk+lse kernel (ops/pallas_topk.py),
    interpret mode (real-TPU execution exercised by
    benchmarks/head_bench.py)."""

    def _ref(self, x, t):
        logits = jnp.dot(x, t.T).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1,
                                          keepdims=True)
        return logits, lse

    def test_matches_lax_topk_and_lse(self):
        from news_image_caption_tpu.ops.pallas_topk import band_topk_lse
        kx, kt = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (6, 32), jnp.bfloat16)
        t = jax.random.normal(kt, (300, 32), jnp.bfloat16) * 0.2
        tv, ti, lse = band_topk_lse(x, t, 5, tile=128, interpret=True)
        logits, rlse = self._ref(x, t)
        rv, ri = jax.lax.top_k(logits, 5)
        np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))
        np.testing.assert_allclose(np.asarray(tv), np.asarray(rv),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse),
                                   rtol=1e-5)

    def test_sel_limit_excludes_class_slots_from_topk_not_lse(self):
        from news_image_caption_tpu.ops.pallas_topk import band_topk_lse
        kx, kt = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(kx, (4, 32), jnp.bfloat16)
        t = jax.random.normal(kt, (260, 32), jnp.bfloat16) * 0.2
        tv, ti, lse = band_topk_lse(x, t, 4, sel_limit=200, tile=128,
                                    interpret=True)
        logits, rlse = self._ref(x, t)
        rv, ri = jax.lax.top_k(logits[:, :200], 4)
        np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))
        np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse),
                                   rtol=1e-5)

    def test_tie_break_lowest_id(self):
        from news_image_caption_tpu.ops.pallas_topk import band_topk_lse
        kx, kt = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(kx, (5, 32), jnp.bfloat16)
        t = jax.random.normal(kt, (300, 32), jnp.bfloat16) * 0.2
        # exact duplicate rows across tiles force cross-tile ties
        t = t.at[40].set(t[10]).at[270].set(t[10])
        logits, _ = self._ref(x, t)
        rv, ri = jax.lax.top_k(logits, 5)
        tv, ti, _ = band_topk_lse(x, t, 5, tile=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))
