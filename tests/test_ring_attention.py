"""Ring attention (parallel/ring.py) must reproduce dense attention.

Sequence parallelism is beyond-reference (the reference bounds
articles to 512 tokens — SURVEY.md §2.10); correctness is defined
against the module's own dense computation, which is identical to
RobertaLayer's inline attention (models/roberta.py:54-59).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.parallel.mesh import MeshConfig, make_mesh
from news_image_caption_tpu.parallel.ring import (dense_reference,
                                                  ring_attention)


def _qkvm(key=0, B=2, S=16, H=4, D=8):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
    mask = np.ones((B, S), bool)
    # row 0: the whole second half padded -> on a context=4 mesh two
    # devices hold FULLY masked K/V blocks (exercises the alpha
    # rescale against an empty block); row 1: scattered pads.
    mask[0, S // 2:] = False
    mask[1, ::3] = False
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("mesh_cfg", [
    MeshConfig(data=2, model=1, context=4),
    MeshConfig(data=1, model=1, context=8),
])
def test_ring_matches_dense(mesh_cfg):
    q, k, v, mask = _qkvm()
    want = dense_reference(q, k, v, mask)
    mesh = make_mesh(mesh_cfg)
    got = jax.jit(lambda *a: ring_attention(*a, mesh))(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ring_fully_padded_row_matches_dense():
    """All-pad rows degrade to the dense path's uniform average (the
    -1e9 fill, not -inf) — no NaNs anywhere in the ring."""
    q, k, v, mask = _qkvm()
    mask = mask.at[0].set(False)
    want = dense_reference(q, k, v, mask)
    mesh = make_mesh(MeshConfig(data=2, model=1, context=4))
    got = ring_attention(q, k, v, mask, mesh)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ring_grads_match_dense():
    """ppermute is differentiable: the ring path trains."""
    q, k, v, mask = _qkvm(key=3)
    mesh = make_mesh(MeshConfig(data=2, model=1, context=4))
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mask, mesh) * w)

    def loss_dense(q, k, v):
        return jnp.sum(dense_reference(q, k, v, mask) * w)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_dense = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for gr, gd in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gd),
                                   atol=1e-4, rtol=1e-4)


def test_ring_rejects_indivisible_sequence():
    q, k, v, mask = _qkvm(S=18)
    mesh = make_mesh(MeshConfig(data=2, model=1, context=4))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, mask, mesh)


def test_ring_rejects_missing_axis():
    q, k, v, mask = _qkvm()
    mesh = make_mesh(MeshConfig(data=4, model=2))
    with pytest.raises(ValueError, match="no axis"):
        ring_attention(q, k, v, mask, mesh)


def test_roberta_encoder_ring_matches_dense():
    """The full encoder with ring_mesh set produces the dense
    encoder's features from the SAME params (ring changes placement
    and schedule, never values)."""
    from news_image_caption_tpu.models.roberta import RobertaEncoder

    kw = dict(vocab_size=64, hidden=32, num_layers=2, heads=4,
              intermediate=64, max_positions=40)
    ids = np.full((4, 16), 1, np.int32)   # pad=1
    rng = np.random.RandomState(0)
    for b, ln in enumerate([16, 11, 16, 5]):   # ragged pads
        ids[b, :ln] = rng.randint(4, 64, ln)
    ids = jnp.asarray(ids)

    dense_enc = RobertaEncoder(**kw)
    params = dense_enc.init(jax.random.PRNGKey(0), ids)
    want, want_all = jax.jit(dense_enc.apply)(params, ids)

    mesh = make_mesh(MeshConfig(data=2, model=1, context=4))
    ring_enc = RobertaEncoder(**kw, ring_mesh=mesh)
    got, got_all = jax.jit(ring_enc.apply)(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    assert len(got_all) == len(want_all)


def test_pipeline_yaml_ring_config_matches_dense():
    """`roberta: {ring: {data: 2, context: 4}}` in a model config
    builds the encoder with ring attention; encoded article features
    equal the dense pipeline's from the same params."""
    from news_image_caption_tpu.models.pipeline import Gen3Pipeline

    rob = dict(vocab_size=40, hidden=16, num_layers=1, heads=4,
               intermediate=32, max_positions=24)
    dec = dict(vocab_size=40, cutoff=(12, 24, 40), embed_dim=16,
               ffn_dim=32, num_heads=4, num_layers=1,
               kernel_sizes=(3,), image_dim=64, article_dim=16,
               max_positions=64)
    from news_image_caption_tpu.models.resnet import ResNetTrunk
    resnet = ResNetTrunk(depth=18, num_stages=3)

    dense = Gen3Pipeline(resnet=resnet, roberta=dict(rob), **dec)
    ring = Gen3Pipeline(
        resnet=resnet,
        roberta={**rob, "ring": {"data": 2, "context": 4}}, **dec)
    assert ring.roberta.ring_mesh is not None

    rng = np.random.RandomState(1)
    batch = {
        "image": jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
        "article_ids": jnp.asarray(
            np.where(np.arange(8)[None] < [[8], [5]],
                     rng.randint(4, 40, (2, 8)), 1).astype(np.int32)),
        "caption_ids": jnp.asarray(
            rng.randint(4, 40, (2, 7)).astype(np.int32)),
    }
    variables = dense.init(jax.random.PRNGKey(0), batch)
    ctx_d = dense.encode(variables, batch)
    ctx_r = ring.encode(variables, batch)
    np.testing.assert_allclose(np.asarray(ctx_r["article"]),
                               np.asarray(ctx_d["article"]),
                               atol=2e-5, rtol=2e-5)


def test_ring_with_sharded_inputs():
    """Pre-sharded activations (the production placement) flow
    through without resharding errors and still match dense."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v, mask = _qkvm(key=5)
    want = dense_reference(q, k, v, mask)
    mesh = make_mesh(MeshConfig(data=2, model=1, context=4))
    sh = NamedSharding(mesh, P("data", "context"))
    qs, ks, vs = (jax.device_put(x, NamedSharding(
        mesh, P("data", "context", None, None))) for x in (q, k, v))
    ms = jax.device_put(mask, sh)
    got = jax.jit(lambda *a: ring_attention(*a, mesh))(qs, ks, vs, ms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
