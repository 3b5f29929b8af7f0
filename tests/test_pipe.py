"""Pipeline parallelism (parallel/pipe.py) must equal the sequential
layer loop — values AND grads.

PP is beyond-reference (the reference's only parallelism is single-node
DataParallel — SURVEY.md §2.10); correctness is defined against running
the stacked layers sequentially on one device, which the GPipe
fill-drain schedule must reproduce exactly (bubble lanes masked out of
outputs and, through AD, out of every parameter gradient).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.parallel.mesh import MeshConfig, make_mesh
from news_image_caption_tpu.parallel.pipe import (pipeline_apply,
                                                  stack_layers)


def _layers(n_layers, dim, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), n_layers)
    return [{"w": jax.random.normal(k, (dim, dim)) / np.sqrt(dim),
             "b": jax.random.normal(jax.random.fold_in(k, 1), (dim,))}
            for k in ks]


def _stage_fn(lp, carry):
    # A nonlinear layer with a mask side-input riding the carry, like
    # RobertaLayer: masked positions must stay masked through every
    # stage (exercises bool leaves in the pipeline state).
    x = jnp.tanh(carry["x"] @ lp["w"] + lp["b"])
    x = jnp.where(carry["mask"][..., None], x, 0.0)
    return {"x": x, "mask": carry["mask"]}


def _sequential(layers, carry):
    for lp in layers:
        carry = _stage_fn(lp, carry)
    return carry["x"]


def _carry(B=8, T=6, D=16, key=7):
    x = jax.random.normal(jax.random.PRNGKey(key), (B, T, D))
    mask = np.ones((B, T), bool)
    mask[0, T // 2:] = False
    mask[1, ::2] = False
    return {"x": x, "mask": jnp.asarray(mask)}


@pytest.mark.parametrize("mesh_cfg,n_micro", [
    (MeshConfig(data=1, model=1, pipe=8), 4),
    (MeshConfig(data=1, model=2, pipe=4), 8),   # multiple layers/stage
    (MeshConfig(data=2, model=1, pipe=4), 4),   # composed DP x PP
    (MeshConfig(data=2, model=2, pipe=2), 2),   # DP x TP x PP mesh
])
def test_pipeline_matches_sequential(mesh_cfg, n_micro):
    layers = _layers(8, 16)
    carry = _carry()
    want = _sequential(layers, carry)
    mesh = make_mesh(mesh_cfg)
    got = jax.jit(lambda s, c: pipeline_apply(
        _stage_fn, s, c, mesh=mesh, n_micro=n_micro))(
            stack_layers(layers), carry)
    np.testing.assert_allclose(np.asarray(got["x"]), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_grads_match_sequential():
    """ppermute has a transpose rule: jax.grad runs the backward
    pipeline, and bubble lanes contribute exactly zero to every
    parameter gradient."""
    layers = _layers(4, 16, key=3)
    carry = _carry(key=11)
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    w = jax.random.normal(jax.random.PRNGKey(5), carry["x"].shape)

    def loss_pipe(stacked, x):
        out = pipeline_apply(_stage_fn, stacked,
                             {"x": x, "mask": carry["mask"]},
                             mesh=mesh, n_micro=4)
        return jnp.sum(out["x"] * w)

    def loss_seq(stacked, x):
        lp = [jax.tree.map(lambda a: a[i], stacked) for i in range(4)]
        return jnp.sum(_sequential(lp, {"x": x, "mask": carry["mask"]})
                       * w)

    stacked = stack_layers(layers)
    gp = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked,
                                                      carry["x"])
    gs = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(stacked,
                                                     carry["x"])
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_rejects_indivisible_layers():
    layers = _layers(6, 8)
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_stage_fn, stack_layers(layers),
                       _carry(D=8), mesh=mesh, n_micro=4)


def test_pipeline_rejects_indivisible_batch():
    layers = _layers(4, 8)
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_stage_fn, stack_layers(layers),
                       _carry(B=6, D=8), mesh=mesh, n_micro=4)


def test_pipeline_rejects_microbatch_not_covering_data_axis():
    layers = _layers(4, 8)
    mesh = make_mesh(MeshConfig(data=4, model=1, pipe=2))
    # B=8, n_micro=8 -> microbatch 1, not shardable over data=4.
    with pytest.raises(ValueError, match="microbatch"):
        pipeline_apply(_stage_fn, stack_layers(layers),
                       _carry(B=8, D=8), mesh=mesh, n_micro=8)


def test_pipeline_rejects_missing_axis():
    layers = _layers(4, 8)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    with pytest.raises(ValueError, match="no axis"):
        pipeline_apply(_stage_fn, stack_layers(layers),
                       _carry(D=8), mesh=mesh, n_micro=4)


def test_roberta_encode_pipelined_matches_dense():
    """The production integration: RobertaEncoder.encode_pipelined
    returns the dense apply()'s last hidden from the SAME params."""
    from news_image_caption_tpu.models.roberta import RobertaEncoder

    enc = RobertaEncoder(vocab_size=64, hidden=32, num_layers=4,
                         heads=4, intermediate=64, max_positions=40)
    ids = np.full((4, 12), 1, np.int32)   # pad=1
    rng = np.random.RandomState(0)
    for b, ln in enumerate([12, 7, 12, 3]):   # ragged pads
        ids[b, :ln] = rng.randint(4, 64, ln)
    ids = jnp.asarray(ids)
    params = enc.init(jax.random.PRNGKey(0), ids)
    want, _ = jax.jit(enc.apply)(params, ids)

    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    got = jax.jit(lambda v, i: enc.encode_pipelined(v, i, mesh,
                                                    n_micro=2))(
        params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # default n_micro (= stage count) path
    got2 = enc.encode_pipelined(params, ids, mesh)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gen3_pipeline_yaml_pipe_config_matches_dense():
    """`roberta: {pipe: {data: 2, pipe: 2, n_micro: 2}}` in a model
    config routes encode() through the GPipe path; encoded article
    features equal the dense pipeline's from the same params."""
    from news_image_caption_tpu.models.pipeline import Gen3Pipeline
    from news_image_caption_tpu.models.resnet import ResNetTrunk

    rob = dict(vocab_size=40, hidden=16, num_layers=2, heads=4,
               intermediate=32, max_positions=24)
    dec = dict(vocab_size=40, cutoff=(12, 24, 40), embed_dim=16,
               ffn_dim=32, num_heads=4, num_layers=1,
               kernel_sizes=(3,), image_dim=64, article_dim=16,
               max_positions=64)
    resnet = ResNetTrunk(depth=18, num_stages=3)

    dense = Gen3Pipeline(resnet=resnet, roberta=dict(rob), **dec)
    piped = Gen3Pipeline(
        resnet=resnet,
        roberta={**rob, "pipe": {"data": 2, "model": 2, "pipe": 2,
                                 "n_micro": 2}}, **dec)
    assert piped.roberta_pipe is not None

    rng = np.random.RandomState(1)
    batch = {
        "image": jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32),
        "article_ids": jnp.asarray(
            np.where(np.arange(8)[None] < [[8], [5], [8], [2]],
                     rng.randint(4, 40, (4, 8)), 1).astype(np.int32)),
        "caption_ids": jnp.asarray(
            rng.randint(4, 40, (4, 7)).astype(np.int32)),
    }
    variables = dense.init(jax.random.PRNGKey(0), batch)
    ctx_d = dense.encode(variables, batch)
    ctx_p = piped.encode(variables, batch)
    np.testing.assert_allclose(np.asarray(ctx_p["article"]),
                               np.asarray(ctx_d["article"]),
                               atol=1e-5, rtol=1e-5)
    # loss through the pipelined encoder agrees with the dense loss
    l_d, _ = dense.loss_fn(variables, batch)
    l_p, _ = piped.loss_fn(variables, batch)
    np.testing.assert_allclose(float(l_p), float(l_d), atol=1e-5,
                               rtol=1e-5)


def test_gen3_pipeline_pipe_rejects_weigh_bert():
    from news_image_caption_tpu.models.pipeline import Gen3Pipeline

    with pytest.raises(ValueError, match="weigh_bert"):
        Gen3Pipeline(
            roberta={"vocab_size": 40, "hidden": 16, "num_layers": 2,
                     "heads": 4, "intermediate": 32,
                     "max_positions": 24,
                     "pipe": {"data": 2, "pipe": 2}},
            weigh_bert=True, vocab_size=40, cutoff=(12, 24, 40),
            embed_dim=16, ffn_dim=32, num_heads=4, num_layers=1,
            kernel_sizes=(3,), image_dim=64, article_dim=16,
            max_positions=64)
