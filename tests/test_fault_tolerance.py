"""Failure detection / recovery (SURVEY.md §5 aux subsystems)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from news_image_caption_tpu.training.checkpoint import CheckpointStore
from news_image_caption_tpu.training.train_step import (TrainState,
                                                        create_train_state,
                                                        make_train_step)


def test_nan_batch_does_not_pollute_params():
    """A NaN loss must leave params + optimizer state untouched
    (reference: NaN-loss skip BEFORE optimizer.step())."""

    def loss_fn(params, batch, rng):
        loss = jnp.sum(params["w"] * batch["x"]) / batch["denom"]
        return loss, {"sample_size": 1}

    params = {"w": jnp.ones(4)}
    tx = optax.adam(1e-2)
    state = create_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)

    good = {"x": jnp.ones(4), "denom": jnp.asarray(1.0)}
    bad = {"x": jnp.ones(4), "denom": jnp.asarray(0.0)}  # -> inf loss

    state, m1 = step(state, good, jax.random.PRNGKey(0))
    w_after_good = np.asarray(state.params["w"]).copy()
    assert int(m1["skipped"]) == 0

    state, m2 = step(state, bad, jax.random.PRNGKey(0))
    assert int(m2["skipped"]) == 1
    assert not np.isfinite(float(m2["loss"]))
    np.testing.assert_array_equal(np.asarray(state.params["w"]),
                                  w_after_good)
    assert np.isfinite(np.asarray(state.params["w"])).all()
    # training continues cleanly after the skip
    state, m3 = step(state, good, jax.random.PRNGKey(0))
    assert int(m3["skipped"]) == 0
    assert np.isfinite(float(m3["loss"]))


def test_nan_grads_under_finite_loss_skip_update():
    """A FINITE loss with non-finite gradients (the jnp.where masked-
    branch trap, bf16 backward overflow) must also skip — otherwise
    the NaN grads poison params permanently and every later step
    skips (the reference's apex loss scaler skips on gradient
    overflow too)."""

    def loss_fn(params, batch, rng):
        w = params["w"]
        # Forward: w >= 1 everywhere -> where selects w, loss finite.
        # Backward: the unselected branch sqrt(-w) has NaN derivative,
        # and where's vjp computes 0 * NaN = NaN.
        loss = jnp.sum(jnp.where(w >= 0, w, jnp.sqrt(-w)) * batch["x"])
        return loss, {"sample_size": 1}

    params = {"w": jnp.ones(4)}
    tx = optax.adam(1e-2)
    state = create_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)

    state, m = step(state, {"x": jnp.ones(4)}, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))          # loss itself is fine
    assert not np.isfinite(float(m["grad_norm"]))
    assert int(m["skipped"]) == 1
    np.testing.assert_array_equal(np.asarray(state.params["w"]),
                                  np.ones(4))     # untouched


def test_nan_grads_skip_o2_master_update():
    """Same gradient guard on the O2-true (bf16 stored + fp32 master)
    step variant."""
    from news_image_caption_tpu.training.train_step import \
        create_o2_train_state

    def loss_fn(params, batch, rng):
        w = params["w"]
        loss = jnp.sum(jnp.where(w >= 0, w, jnp.sqrt(-w)) * batch["x"])
        return loss.astype(jnp.float32), {"sample_size": 1}

    params = {"w": jnp.ones(4)}
    tx = optax.adam(1e-2)
    state = create_o2_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False, o2_master=True)
    state, m = step(state, {"x": jnp.ones(4)}, jax.random.PRNGKey(0))
    assert int(m["skipped"]) == 1
    np.testing.assert_array_equal(
        np.asarray(state.opt_state["master"]["w"]), np.ones(4))


def test_checkpoint_fallback_on_corruption(tmp_path):
    store = CheckpointStore(str(tmp_path), keep=5)
    state = {"w": jnp.arange(4.0)}
    store.save({"w": jnp.ones(4) * 1}, 1, {"loss": 3.0})
    store.save({"w": jnp.ones(4) * 2}, 2, {"loss": 2.0})
    store.save({"w": jnp.ones(4) * 3}, 3, {"loss": 1.0})
    # corrupt the newest checkpoint file
    with open(store._path(3), "wb") as f:
        f.write(b"garbage")
    restored, step = store.load_with_fallback(state)
    assert step == 2
    np.testing.assert_allclose(np.asarray(restored["w"]), 2.0)


def test_checkpoint_fallback_all_corrupt(tmp_path):
    import pytest
    store = CheckpointStore(str(tmp_path), keep=5)
    store.save({"w": jnp.ones(2)}, 1, {})
    with open(store._path(1), "wb") as f:
        f.write(b"x")
    with pytest.raises(FileNotFoundError):
        store.load_with_fallback({"w": jnp.ones(2)})
