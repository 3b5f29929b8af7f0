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


def test_neg_inf_rows():
    x = jnp.full((2, 50265), -jnp.inf).at[:, 0].set(0.0)
    v, i = exact_topk(x, 5)
    rv, ri = jax.lax.top_k(x, 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
