"""Frozen-encoder optimizer semantics for the online-encoder pipeline.

Reference contract (`no_grad: ^resnet ^roberta`, expt config.yaml:
149-151 + CallbackApexTrainer): frozen params are EXCLUDED from the
optimizer — no weight decay, no moments — while `bert_weight` (the
25-layer softmax weights, transformer_flattened.py:208-218) is a
trainable model param. stop_gradient alone reproduces neither:
zero-grad params still receive `add_decayed_weights`' decoupled decay
every step, and a stop_gradient placed after the weighted sum (the
pre-r5 bug) silently froze bert_weight too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.models.pipeline import Gen3Pipeline
from news_image_caption_tpu.models.resnet import ResNetTrunk


def _tiny_pipeline(weigh_bert=True):
    return Gen3Pipeline(
        resnet=ResNetTrunk(depth=18, num_stages=3),
        roberta=dict(vocab_size=40, hidden=16, num_layers=2, heads=4,
                     intermediate=32, max_positions=24),
        weigh_bert=weigh_bert,
        vocab_size=40, cutoff=(12, 24, 40), embed_dim=16, ffn_dim=32,
        num_heads=4, num_layers=1, kernel_sizes=(3,), image_dim=64,
        article_dim=16, max_positions=64)


def _tiny_batch(B=2):
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.rand(B, 64, 64, 3), jnp.float32),
        "article_ids": jnp.asarray(
            np.where(np.arange(8)[None] < [[8], [5]][:B],
                     rng.randint(4, 40, (B, 8)), 1).astype(np.int32)),
        "caption_ids": jnp.asarray(
            rng.randint(4, 40, (B, 7)).astype(np.int32)),
    }


def test_bert_weight_trains_and_encoders_are_frozen():
    """Gradients reach bert_weight through the weighted sum; the
    frozen encoder collections get exactly zero gradient."""
    model = _tiny_pipeline(weigh_bert=True)
    batch = _tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)

    def loss(v):
        return model.loss_fn(v, batch)[0]

    grads = jax.grad(loss)(variables)
    bw = grads["weighted_sum"]["params"]["bert_weight"]
    assert float(jnp.abs(bw).max()) > 0.0, \
        "bert_weight is trainable in the reference"
    for col in model.frozen_collections:
        leaves = jax.tree.leaves(grads[col])
        assert all(float(jnp.abs(g).max()) == 0.0 for g in leaves), \
            f"frozen collection {col} received gradient"
    # the decoder trains
    assert any(float(jnp.abs(g).max()) > 0
               for g in jax.tree.leaves(grads["captioner"]))


def test_mask_frozen_excludes_frozen_from_decay_and_moments():
    """One bert_adam step: without masking, weight decay shrinks the
    zero-grad frozen encoders; with mask_frozen they are bit-identical
    and hold no optimizer moments."""
    import optax

    from news_image_caption_tpu.training.optim import (make_bert_adam,
                                                       mask_frozen)

    model = _tiny_pipeline(weigh_bert=True)
    batch = _tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    grads = jax.grad(lambda v: model.loss_fn(v, batch)[0])(variables)

    raw = make_bert_adam(lr=1e-2, t_total=100, warmup=0.0,
                         weight_decay=1e-2)

    # Unmasked: decoupled decay moves frozen params despite zero grads
    # (the bug mask_frozen exists to prevent).
    opt = raw.init(variables)
    upd, _ = raw.update(grads, opt, variables)
    moved = optax.apply_updates(variables, upd)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(moved["resnet"]),
                        jax.tree.leaves(variables["resnet"])))

    tx = mask_frozen(raw, model.frozen_collections)
    opt = tx.init(variables)
    upd, _ = tx.update(grads, opt, variables)
    new = optax.apply_updates(variables, upd)
    for col in model.frozen_collections:
        for a, b in zip(jax.tree.leaves(new[col]),
                        jax.tree.leaves(variables[col])):
            np.testing.assert_array_equal(np.asarray(a),
                                          np.asarray(b))
    # trainable leaves moved (bert_weight included)
    assert not np.array_equal(
        np.asarray(new["weighted_sum"]["params"]["bert_weight"]),
        np.asarray(variables["weighted_sum"]["params"]["bert_weight"]))
    # no moments allocated for frozen leaves: masked inner state only
    # covers trainable params
    n_all = len(jax.tree.leaves(variables))
    n_trainable = n_all - sum(
        len(jax.tree.leaves(variables[c]))
        for c in model.frozen_collections)
    mu_leaves = [x for x in jax.tree.leaves(opt)
                 if hasattr(x, "shape")]
    # chain state: clip (empty) + adam (mu, nu) + decay + lr(count)
    # -> 2 * n_trainable moment arrays + scalar counts
    n_moments = sum(1 for x in mu_leaves if x.ndim > 0 or x.size > 1
                    ) + sum(1 for x in mu_leaves
                            if x.ndim == 0 and x.size == 1)
    assert len([x for x in mu_leaves if x.ndim > 0]) <= \
        2 * n_trainable + 2


def test_build_optimizer_masks_gen3_pipeline_and_step_runs():
    """The config path wires the masking: build_optimizer(cfg, model)
    on a gen3_pipeline model yields a tx whose train step leaves the
    frozen encoders untouched and trains bert_weight."""
    from news_image_caption_tpu.config import build_optimizer
    from news_image_caption_tpu.training.train_step import (
        create_train_state, make_train_step)

    model = _tiny_pipeline(weigh_bert=True)
    batch = _tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = {"trainer": {"optimizer": {
        "type": "bert_adam", "lr": 1e-2, "t_total": 100,
        "warmup": 0.0, "weight_decay": 1e-2}}}
    tx = build_optimizer(cfg, model)
    state = create_train_state(jax.tree.map(jnp.copy, variables), tx)
    step = make_train_step(model.loss_fn, tx)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    for col in model.frozen_collections:
        for a, b in zip(jax.tree.leaves(state.params[col]),
                        jax.tree.leaves(variables[col])):
            np.testing.assert_array_equal(np.asarray(a),
                                          np.asarray(b))
    assert not np.array_equal(
        np.asarray(state.params["weighted_sum"]["params"]
                   ["bert_weight"]),
        np.asarray(variables["weighted_sum"]["params"]["bert_weight"]))


def test_frozen_masked_checkpoint_roundtrip(tmp_path):
    """The masked opt_state schema round-trips through the msgpack
    store (train -> save -> restore with a freshly built template)."""
    from news_image_caption_tpu.config import build_optimizer
    from news_image_caption_tpu.training.checkpoint import \
        CheckpointStore
    from news_image_caption_tpu.training.train_step import (
        create_train_state, make_train_step)

    model = _tiny_pipeline(weigh_bert=True)
    batch = _tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = {"trainer": {"optimizer": {
        "type": "bert_adam", "lr": 1e-3, "t_total": 100,
        "warmup": 0.0}}}
    tx = build_optimizer(cfg, model)
    state = create_train_state(variables, tx)
    step = make_train_step(model.loss_fn, tx)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save(state, step=1, metrics={"loss": 1.0})

    tmpl = create_train_state(
        model.init(jax.random.PRNGKey(7), batch),
        build_optimizer(cfg, model))
    restored = store.load(tmpl, "latest")
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mask_frozen_noop_for_unfrozen_models():
    """build_optimizer without a model (or with one that declares no
    frozen collections) is unchanged — the flagship state schema is
    not disturbed."""
    from news_image_caption_tpu.config import build_optimizer

    cfg = {"trainer": {"optimizer": {"type": "bert_adam"}}}
    tx_plain = build_optimizer(cfg)
    tx_model = build_optimizer(cfg, object())
    p = {"params": {"w": jnp.ones((3,))}}
    s1 = jax.tree.structure(tx_plain.init(p))
    s2 = jax.tree.structure(tx_model.init(p))
    assert s1 == s2
