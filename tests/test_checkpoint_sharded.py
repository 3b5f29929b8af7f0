"""Sharded (orbax/OCDBT) checkpoint store: per-shard writes on a
device mesh, resharding-aware restore, latest/best/keep-N semantics,
trainer integration. Runs on the virtual 8-device CPU mesh
(conftest.py)."""

import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from news_image_caption_tpu.training.checkpoint_sharded import \
    ShardedCheckpointStore


def _mesh(shape, names=("data", "model")):
    return Mesh(np.array(jax.devices()).reshape(shape), names)


def _sharded_state(mesh, val=1.0):
    w = jax.device_put(jnp.full((8, 4), val),
                       NamedSharding(mesh, P("model", None)))
    b = jax.device_put(jnp.arange(8.0) * val,
                       NamedSharding(mesh, P("data")))
    return {"w": w, "b": b, "step": jnp.asarray(3, jnp.int32)}


def test_sharded_save_restore_onto_different_mesh_layout(tmp_path):
    """Train on data=4 x model=2, resume on data=2 x model=4: each
    leaf lands with the TARGET's sharding and identical values."""
    store = ShardedCheckpointStore(str(tmp_path), keep=3)
    mesh_a = _mesh((4, 2))
    state = _sharded_state(mesh_a, val=2.5)
    store.save(state, 10, {"loss": 1.0})

    mesh_b = _mesh((2, 4))
    target = {
        "w": jax.ShapeDtypeStruct((8, 4), jnp.float32,
                                  sharding=NamedSharding(mesh_b,
                                                         P(None,
                                                           "model"))),
        "b": jax.ShapeDtypeStruct((8,), jnp.float32,
                                  sharding=NamedSharding(mesh_b,
                                                         P("data"))),
        "step": jax.ShapeDtypeStruct((), jnp.int32),
    }
    got = store.load(target, "latest")
    np.testing.assert_array_equal(np.asarray(got["w"]),
                                  np.asarray(state["w"]))
    np.testing.assert_array_equal(np.asarray(got["b"]),
                                  np.asarray(state["b"]))
    assert int(got["step"]) == 3
    assert got["w"].sharding.spec == P(None, "model")
    assert got["w"].sharding.mesh.shape["model"] == 4
    # Concrete arrays as target work too (sharding taken from them).
    got2 = store.load(_sharded_state(mesh_b, val=0.0), 10)
    np.testing.assert_array_equal(np.asarray(got2["w"]),
                                  np.asarray(state["w"]))


def test_sharded_ocdbt_layout_on_disk(tmp_path):
    """The on-disk format is per-process OCDBT — the property that
    makes multi-host saves parallel — not a gathered single blob."""
    store = ShardedCheckpointStore(str(tmp_path), keep=3)
    store.save(_sharded_state(_mesh((4, 2))), 1)
    entries = os.listdir(os.path.join(str(tmp_path), "ckpt_1"))
    assert "ocdbt.process_0" in entries
    assert "manifest.ocdbt" in entries


def test_sharded_best_pinned_through_retention(tmp_path):
    store = ShardedCheckpointStore(str(tmp_path), keep=2,
                                   best_metric="loss")
    mesh = _mesh((4, 2))
    for step, loss in [(1, 5.0), (2, 1.0), (3, 4.0), (4, 3.0)]:
        store.save(_sharded_state(mesh, val=float(step)), step,
                   {"loss": loss})
    # keep=2 -> steps 3,4 retained, step 1 deleted, step 2 PINNED
    # (it is the best).
    assert store.latest_step() == 4
    assert not os.path.exists(os.path.join(str(tmp_path), "ckpt_1"))
    assert os.path.exists(os.path.join(str(tmp_path), "ckpt_2"))
    assert store.best_value() == 1.0
    best = store.load(_sharded_state(mesh, val=0.0), "best")
    np.testing.assert_array_equal(np.asarray(best["w"]), 2.0)
    # Meta survives a fresh store (meta.json on disk).
    store2 = ShardedCheckpointStore(str(tmp_path), keep=2,
                                    best_metric="loss")
    assert store2.best_value() == 1.0
    assert store2.latest_step() == 4


def test_sharded_async_save_and_fallback(tmp_path):
    store = ShardedCheckpointStore(str(tmp_path), keep=4)
    mesh = _mesh((8, 1))
    store.save(_sharded_state(mesh, val=1.0), 1, blocking=False)
    store.save(_sharded_state(mesh, val=2.0), 2, blocking=False)
    assert store.latest_step() == 2       # drains pending writes
    # Corrupt the newest checkpoint; fallback restores step 1.
    shutil.rmtree(os.path.join(str(tmp_path), "ckpt_2"))
    got, step = store.load_with_fallback(
        _sharded_state(mesh, val=0.0))
    assert step == 1
    np.testing.assert_array_equal(np.asarray(got["w"]), 1.0)


@pytest.mark.slow
def test_trainer_sharded_end_to_end_with_recover(tmp_path):
    from news_image_caption_tpu.config import (build_dataset,
                                               build_model,
                                               build_optimizer,
                                               load_config)
    from news_image_caption_tpu.data.loader import DeviceLoader
    from news_image_caption_tpu.training.train_step import \
        create_train_state
    from news_image_caption_tpu.training.trainer import (Trainer,
                                                         TrainerConfig)

    TINY = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "tiny_test.yaml")
    cfg = load_config(TINY)
    model = build_model(cfg)
    train_ds = build_dataset(cfg, "train")
    tx = build_optimizer(cfg)
    batch = next(train_ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(params, tx)

    tconf = TrainerConfig(num_epochs=2, serialization_dir=str(tmp_path),
                          log_every=4, checkpoint_format="sharded")
    trainer = Trainer(model.loss_fn, tx, tconf)
    state = trainer.train(
        state, lambda e: DeviceLoader(train_ds.batches(4, seed=e)))
    assert int(state.step) == 2 * (32 // 4)
    meta = json.load(open(os.path.join(str(tmp_path), "checkpoints",
                                       "meta.json")))
    assert [c["step"] for c in meta["checkpoints"]] == [8, 16]

    # Recover restores the sharded checkpoint and continues.
    state2 = create_train_state(params, tx)
    trainer2 = Trainer(model.loss_fn, tx, tconf)
    state2 = trainer2.train(
        state2, lambda e: DeviceLoader(train_ds.batches(4, seed=e)),
        recover=True)
    assert int(state2.step) == int(state.step)
