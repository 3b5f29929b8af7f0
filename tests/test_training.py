"""Checkpoint store, trainer loop, config system, CLI end-to-end."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.config import (build_dataset, build_model,
                                           build_optimizer, load_config,
                                           merge_overrides)
from news_image_caption_tpu.training.checkpoint import CheckpointStore
from news_image_caption_tpu.training.optim import (noam_schedule,
                                                   warmup_linear_schedule)

TINY = os.path.join(os.path.dirname(__file__), "..", "configs",
                    "tiny_test.yaml")


def test_warmup_linear_schedule():
    s = warmup_linear_schedule(lr=1.0, t_total=100, warmup=0.1)
    assert float(s(0)) == 0.0
    assert float(s(5)) == pytest.approx(0.5)       # ramp x/warmup
    # original warmup_linear switches to 1-x at the boundary
    assert float(s(10)) == pytest.approx(0.9)
    assert float(s(55)) == pytest.approx(0.45)     # linear decay 1-x
    assert float(s(100)) == pytest.approx(0.0)


def test_clip_by_per_tensor_norm_is_per_leaf():
    """BertAdam clips each tensor's grad norm INDEPENDENTLY (the
    reference calls clip_grad_norm_(p, c) per parameter) — a small
    leaf must pass through untouched while a large one rescales."""
    from news_image_caption_tpu.training.optim import \
        clip_by_per_tensor_norm

    tx = clip_by_per_tensor_norm(0.1)
    grads = {"big": jnp.ones((4,)),           # norm 2  -> scaled
             "small": jnp.full((4,), 1e-3)}   # norm 2e-3 -> untouched
    out, _ = tx.update(grads, tx.init(grads))
    np.testing.assert_allclose(
        float(jnp.linalg.norm(out["big"])), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["small"]),
                               np.asarray(grads["small"]))


def test_noam_schedule_peak_at_warmup():
    s = noam_schedule(model_size=512, warmup=100)
    vals = [float(s(t)) for t in [1, 50, 100, 200, 400]]
    assert vals.index(max(vals)) == 2              # peak at warmup


def test_checkpoint_save_load_best_and_retention(tmp_path):
    store = CheckpointStore(str(tmp_path), keep=2, best_metric="loss")
    state = {"w": jnp.arange(4.0), "step": jnp.asarray(0)}
    store.save(state, 1, {"loss": 5.0})
    store.save({"w": jnp.ones(4) * 2, "step": jnp.asarray(2)}, 2,
               {"loss": 3.0})
    store.save({"w": jnp.ones(4) * 3, "step": jnp.asarray(3)}, 3,
               {"loss": 4.0})
    # retention: keep=2 -> step 1 file deleted
    assert store.latest_step() == 3
    assert not os.path.exists(os.path.join(str(tmp_path),
                                           "ckpt_1.msgpack"))
    # best is step 2 (loss 3.0)
    best = store.load(state, "best")
    np.testing.assert_allclose(np.asarray(best["w"]), 2.0)
    latest = store.load(state, "latest")
    np.testing.assert_allclose(np.asarray(latest["w"]), 3.0)


def test_checkpoint_async_save(tmp_path):
    """blocking=False: writes land on a background thread; readers
    drain pending writes, so load-after-save is always consistent.
    The host snapshot must be a REAL copy taken synchronously: the
    worker is gated here until AFTER the caller mutates the source
    buffer (donation analog), and the written bytes must still be the
    pre-mutation values."""
    import threading

    store = CheckpointStore(str(tmp_path), keep=3, best_metric="loss")
    release = threading.Event()
    orig_commit = store._commit

    def gated_commit(host_state, path, step, metrics):
        release.wait(timeout=10)   # serialize only after the mutation
        orig_commit(host_state, path, step, metrics)

    store._commit = gated_commit
    w = np.arange(4.0)
    store.save({"w": w, "step": np.asarray(0)}, 1, {"loss": 5.0},
               blocking=False)
    w += 100.0  # caller reuses the buffer while the write is queued
    release.set()
    store.save({"w": np.ones(4) * 2, "step": np.asarray(2)}, 2,
               {"loss": 3.0}, blocking=False)
    store.save({"w": np.ones(4) * 3, "step": np.asarray(3)}, 3,
               {"loss": 4.0}, blocking=False)
    assert store.latest_step() == 3          # drains pending writes
    got1 = store.load({"w": np.zeros(4), "step": np.asarray(0)}, 1)
    np.testing.assert_allclose(np.asarray(got1["w"]),
                               np.arange(4.0))  # pre-mutation bytes
    best = store.load({"w": np.zeros(4), "step": np.asarray(0)}, "best")
    np.testing.assert_allclose(np.asarray(best["w"]), 2.0)
    # a fresh store sees the meta the worker wrote
    store2 = CheckpointStore(str(tmp_path), keep=3, best_metric="loss")
    assert store2.latest_step() == 3
    assert store2.best_value() == 3.0


def test_checkpoint_load_averaged(tmp_path):
    """Element-wise average over the newest N checkpoints; integer
    leaves (step counters) come from the newest instead."""
    store = CheckpointStore(str(tmp_path), keep=5)
    for step, val in [(1, 1.0), (2, 2.0), (3, 6.0)]:
        store.save({"w": np.full(3, val),
                    "step": np.asarray(step, np.int32)}, step)
    tgt = {"w": np.zeros(3), "step": np.asarray(0, np.int32)}
    got = store.load_averaged(tgt, last_n=2)
    np.testing.assert_allclose(np.asarray(got["w"]), 4.0)  # (2+6)/2
    assert int(got["step"]) == 3                  # newest, not mean
    got_all = store.load_averaged(tgt)
    np.testing.assert_allclose(np.asarray(got_all["w"]), 3.0)
    got_explicit = store.load_averaged(tgt, steps=[1, 3])
    np.testing.assert_allclose(np.asarray(got_explicit["w"]), 3.5)


def test_checkpoint_blocking_save_orders_after_pending_async(tmp_path):
    """A blocking save drains queued async writes first — otherwise a
    queued write for the SAME step lands after it and clobbers the
    blocking entry in meta (seen live: the preemption checkpoint at an
    epoch boundary lost to the epoch's still-queued async save)."""
    import threading

    store = CheckpointStore(str(tmp_path), keep=4)
    release = threading.Event()

    # Queue an async save whose WORKER is held back (the host
    # snapshot is synchronous either way), then issue a blocking save
    # for the same step and release the worker.
    orig_commit = store._commit

    def gated_commit(host_state, path, step, metrics):
        if metrics and metrics.get("tag") == "async":
            release.wait(timeout=10)
        orig_commit(host_state, path, step, metrics)

    store._commit = gated_commit
    store.save({"w": np.zeros(2)}, 7, {"tag": "async"}, blocking=False)
    t = threading.Timer(0.2, release.set)
    t.start()
    store.save({"w": np.ones(2)}, 7, {"tag": "blocking"})
    t.join()
    meta = store.meta["checkpoints"]
    assert [c["metrics"]["tag"] for c in meta
            if c["step"] == 7] == ["blocking"]
    got = store.load({"w": np.zeros(2)}, 7)
    np.testing.assert_allclose(np.asarray(got["w"]), 1.0)


def test_checkpoint_async_save_error_surfaces_at_wait(tmp_path):
    store = CheckpointStore(str(tmp_path), keep=2)
    store.save({"w": np.zeros(2)}, 1, blocking=False)
    store.wait()
    # Occupy the write path with a directory, then the NEXT async
    # write must raise at wait() rather than vanish.
    os.makedirs(os.path.join(str(tmp_path), "ckpt_2.msgpack.tmp"))
    store.save({"w": np.zeros(2)}, 2, blocking=False)
    with pytest.raises(OSError):
        store.wait()


def test_preemption_handler_latches_and_restores():
    import signal

    from news_image_caption_tpu.training.preemption import \
        PreemptionHandler

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionHandler() as guard:
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        # CPython delivers the pending signal at the next interpreter
        # check — a no-op call suffices to force it.
        signal.getsignal(signal.SIGTERM)
        assert guard.triggered
        assert guard.signum == signal.SIGTERM
    assert signal.getsignal(signal.SIGTERM) is before


def test_trainer_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-epoch -> the trainer writes a checkpoint tagged
    preempted=True at the exact step it reached and returns cleanly;
    --recover restarts the interrupted epoch from that state."""
    import signal

    from news_image_caption_tpu.data.loader import DeviceLoader
    from news_image_caption_tpu.training.train_step import \
        create_train_state
    from news_image_caption_tpu.training.trainer import (Trainer,
                                                         TrainerConfig)

    cfg = load_config(TINY)
    model = build_model(cfg)
    train_ds = build_dataset(cfg, "train")
    tx = build_optimizer(cfg)
    batch = next(train_ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(params, tx)

    tconf = TrainerConfig(num_epochs=3, serialization_dir=str(tmp_path),
                          log_every=2)
    trainer = Trainer(model.loss_fn, tx, tconf)

    def batches(epoch):
        for i, b in enumerate(
                DeviceLoader(train_ds.batches(4, seed=epoch))):
            if epoch == 1 and i == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    state = trainer.train(state, batches)
    # epoch 0 ran fully (8 steps); epoch 1 stopped after 3.
    assert int(state.step) == 8 + 3
    meta = json.load(open(os.path.join(str(tmp_path), "checkpoints",
                                       "meta.json")))
    last = max(meta["checkpoints"], key=lambda c: c["step"])
    assert last["step"] == 11
    assert last["metrics"].get("preempted") is True
    assert last["metrics"]["epoch"] == 1
    # The handler is gone: SIGTERM would now kill us (don't send it).
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    # Recover: restarts epoch 1 with the preempted optimizer state.
    state2 = create_train_state(params, tx)
    trainer2 = Trainer(model.loss_fn, tx, tconf)
    state2 = trainer2.train(
        state2,
        lambda e: DeviceLoader(train_ds.batches(4, seed=e)),
        recover=True)
    assert int(state2.step) == 11 + 2 * 8   # epochs 1 and 2 rerun


def test_trainer_profile_window_writes_trace(tmp_path):
    """trainer.profile_steps captures a jax.profiler trace of the
    configured step window into <serialization_dir>/profile."""
    from news_image_caption_tpu.data.loader import DeviceLoader
    from news_image_caption_tpu.training.train_step import \
        create_train_state
    from news_image_caption_tpu.training.trainer import (Trainer,
                                                         TrainerConfig)

    cfg = load_config(TINY)
    model = build_model(cfg)
    ds = build_dataset(cfg, "train")
    tx = build_optimizer(cfg)
    batch = next(ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(params, tx)

    tconf = TrainerConfig(num_epochs=1, serialization_dir=str(tmp_path),
                          log_every=4, profile_start=2,
                          profile_steps=3)
    trainer = Trainer(model.loss_fn, tx, tconf)
    trainer.train(state, lambda e: DeviceLoader(ds.batches(4)))
    prof_dir = os.path.join(str(tmp_path), "profile")
    files = [os.path.join(r, f) for r, _, fs in os.walk(prof_dir)
             for f in fs]
    assert files, "no profiler trace written"
    assert any(f.endswith((".trace.json.gz", ".xplane.pb"))
               for f in files)


def test_config_load_and_overrides():
    cfg = load_config(TINY)
    assert cfg["model"]["decoder"]["embed_dim"] == 16
    cfg2 = merge_overrides(cfg, {"model": {"decoder": {"embed_dim": 8}},
                                 "iterator": {"batch_size": 2}})
    assert cfg2["model"]["decoder"]["embed_dim"] == 8
    assert cfg2["iterator"]["batch_size"] == 2
    assert cfg["model"]["decoder"]["embed_dim"] == 16  # original intact


def test_build_model_and_train_from_config(tmp_path):
    cfg = load_config(TINY)
    model = build_model(cfg)
    ds = build_dataset(cfg, "train")
    tx = build_optimizer(cfg)
    batch = next(ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, _ = model.loss_fn(params, batch)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_trainer_end_to_end_with_recover(tmp_path):
    from news_image_caption_tpu.data.loader import DeviceLoader
    from news_image_caption_tpu.training.train_step import \
        create_train_state
    from news_image_caption_tpu.training.trainer import (Trainer,
                                                         TrainerConfig)

    cfg = load_config(TINY)
    model = build_model(cfg)
    train_ds = build_dataset(cfg, "train")
    val_ds = build_dataset(cfg, "val")
    tx = build_optimizer(cfg)
    batch = next(train_ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(params, tx)

    tconf = TrainerConfig(num_epochs=2, serialization_dir=str(tmp_path),
                          log_every=4)
    trainer = Trainer(model.loss_fn, tx, tconf)
    state = trainer.train(
        state,
        lambda e: DeviceLoader(train_ds.batches(4, seed=e)),
        lambda e: DeviceLoader(val_ds.batches(4, shuffle=False)))
    assert int(state.step) == 2 * (32 // 4)
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoints",
                                       "meta.json"))
    # Recover restores step count and continues.
    state2 = create_train_state(params, tx)
    trainer2 = Trainer(model.loss_fn, tx, tconf)
    state2 = trainer2.train(
        state2,
        lambda e: DeviceLoader(train_ds.batches(4, seed=e)),
        recover=True)
    assert int(state2.step) >= int(state.step)


def test_cli_evaluate_writes_generations(tmp_path):
    import shutil

    from news_image_caption_tpu.cli import main

    cfg_path = str(tmp_path / "cfg.yaml")
    shutil.copy(TINY, cfg_path)
    rc = main(["evaluate", cfg_path, "--split", "test"])
    assert rc == 0
    ser = tmp_path / "serialization"
    gens = (ser / "generations.jsonl").read_text().strip().split("\n")
    assert len(gens) == 8
    rec = json.loads(gens[0])
    assert "generation" in rec and "caption" in rec
    # records are enriched as the reference's evaluate writes them
    # (names/entities/readability/TTR, commands/evaluate.py:180-356)
    for key in ("generated_names", "caption_entities",
                "gen_readability", "gen_np", "ner_backend"):
        assert key in rec, key
    metrics = json.loads((ser / "evaluate-metrics.json").read_text())
    assert "bleu-4" in metrics and "cider" in metrics


def test_cli_evaluate_speculative_matches_greedy(tmp_path):
    """`generation.speculative_k` produces byte-identical
    generations.jsonl to the plain greedy evaluate (the speculative
    contract), driven through the CLI."""
    import shutil

    from news_image_caption_tpu.cli import main

    cfg_path = str(tmp_path / "cfg.yaml")
    shutil.copy(TINY, cfg_path)
    rc = main(["evaluate", cfg_path, "--split", "test"])
    assert rc == 0
    ser = tmp_path / "serialization"
    plain = (ser / "generations.jsonl").read_text()

    rc = main(["evaluate", cfg_path, "--split", "test", "-s", "_spec",
               "-o", json.dumps(
                   {"generation": {"speculative_k": 4}})])
    assert rc == 0
    spec = (ser / "generations_spec.jsonl").read_text()
    assert spec == plain

    # generation.ngram_n tunes the prompt-lookup key length; exactness
    # holds for ANY draft quality, so output stays byte-identical.
    rc = main(["evaluate", cfg_path, "--split", "test", "-s", "_n3",
               "-o", json.dumps(
                   {"generation": {"speculative_k": 4, "ngram_n": 3}})])
    assert rc == 0
    assert (ser / "generations_n3.jsonl").read_text() == plain

    # ngram_n < 1 is rejected up front (ADVICE r4: it used to reach
    # ngram_drafts and fail at jit trace with an opaque stack error;
    # 0 used to be silently coerced to 2).
    for bad in (0, -1):
        with pytest.raises(ValueError, match="ngram_n"):
            main(["evaluate", cfg_path, "--split", "test", "-s", "_bad",
                  "-o", json.dumps({"generation":
                                    {"speculative_k": 4,
                                     "ngram_n": bad}})])


def test_cli_evaluate_dumps_attention_maps(tmp_path):
    """--dump-attention writes per-batch npz with per-layer,
    per-context attention over the generated captions (parity:
    Gen-1 eval_utils attention dumping / serving attention maps)."""
    import shutil

    import numpy as np

    from news_image_caption_tpu.cli import main

    cfg_path = str(tmp_path / "cfg.yaml")
    shutil.copy(TINY, cfg_path)
    attn_dir = tmp_path / "attn"
    rc = main(["evaluate", cfg_path, "--split", "test",
               "--dump-attention", str(attn_dir)])
    assert rc == 0
    files = sorted(attn_dir.glob("attn_*.npz"))
    assert files
    data = np.load(files[0])
    keys = set(data.keys())
    assert "tokens" in keys
    img_keys = [k for k in keys if k.endswith("_image")]
    art_keys = [k for k in keys if k.endswith("_article")]
    assert img_keys and art_keys
    a = data[img_keys[0]]
    # [B, T, S']: rows are attention distributions.
    assert a.ndim == 3
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_bf16_mixed_precision_matches_fp32_trajectory():
    """apex-O2 analog: bf16 compute + fp32 master params tracks the
    fp32 loss curve (callback_apex_trainer.py:121-125 parity)."""
    from news_image_caption_tpu.training.train_step import (
        create_train_state, make_train_step)

    cfg = load_config(TINY)
    model = build_model(cfg)
    ds = build_dataset(cfg, "train")
    tx = build_optimizer(cfg)
    batch = next(ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)

    losses = {}
    for name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        state = create_train_state(params, tx)
        step = make_train_step(model.loss_fn, tx, donate=False,
                               compute_dtype=dtype)
        traj = []
        for i, b in enumerate(ds.batches(4, seed=0)):
            state, m = step(state, b, jax.random.PRNGKey(0))
            traj.append(float(m["loss"]))
            if i >= 7:
                break
        losses[name] = traj
    # bf16 master params stay fp32.
    assert all(np.isfinite(losses["bf16"]))
    # Trajectories agree loosely (bf16 rounding) and both decrease.
    np.testing.assert_allclose(losses["bf16"], losses["fp32"], rtol=0.05)
    assert losses["fp32"][-1] < losses["fp32"][0]
    assert losses["bf16"][-1] < losses["bf16"][0]


def test_gradient_accumulation_matches_full_batch():
    """Two accumulated micro-batches of B=2 reproduce one step on the
    combined B=4 batch (grad of a batch = mean of its micro-batch
    grads; clip/Adam then see the averaged grad)."""
    from news_image_caption_tpu.training.optim import (
        accumulate_gradients, make_bert_adam)
    from news_image_caption_tpu.training.train_step import (
        create_train_state, make_train_step)

    cfg = load_config(TINY)
    model = build_model(cfg)
    ds = build_dataset(cfg, "train")
    full = next(ds.batches(4, shuffle=False))
    micro = [jax.tree.map(lambda x: x[:2], full),
             jax.tree.map(lambda x: x[2:], full)]

    tx = make_bert_adam(lr=1e-3, t_total=1000, warmup=0.01)
    params = model.init(jax.random.PRNGKey(0), full)

    state_f = create_train_state(params, tx)
    step_f = make_train_step(model.loss_fn, tx, donate=False)
    state_f, _ = step_f(state_f, full, jax.random.PRNGKey(0))

    tx_a = accumulate_gradients(tx, 2)
    state_a = create_train_state(params, tx_a)
    # fold_in(rng, step) must see the same dropout key as the full
    # batch's single step; use deterministic loss to sidestep it
    step_a = make_train_step(
        lambda p, b, r: model.loss_fn(p, b, dropout_rng=None),
        tx_a, donate=False)
    step_f_det = make_train_step(
        lambda p, b, r: model.loss_fn(p, b, dropout_rng=None),
        tx, donate=False)
    state_f2 = create_train_state(params, tx)
    state_f2, _ = step_f_det(state_f2, full, jax.random.PRNGKey(0))
    state_a, m0 = step_a(state_a, micro[0], jax.random.PRNGKey(0))
    # micro-step 1: params unchanged (zero update)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), state_a.params, params)
    state_a, m1 = step_a(state_a, micro[1], jax.random.PRNGKey(0))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7),
        state_a.params, state_f2.params)


def test_bf16_moments_match_fp32_moments_trajectory():
    """Opt-in bf16 FIRST-moment storage (bert_adam moment_dtype)
    tracks the fp32-moment trajectory: mu only steers the update
    direction, nu (precision-sensitive near zero) stays fp32."""
    from news_image_caption_tpu.training.optim import make_bert_adam
    from news_image_caption_tpu.training.train_step import (
        create_train_state, make_train_step)

    cfg = load_config(TINY)
    model = build_model(cfg)
    ds = build_dataset(cfg, "train")
    batch = next(ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)

    losses = {}
    for name, mdt in (("fp32", None), ("bf16", jnp.bfloat16)):
        tx = make_bert_adam(lr=1e-3, t_total=1000, warmup=0.01,
                            moment_dtype=mdt)
        state = create_train_state(params, tx)
        if mdt is not None:
            mu_leaves = jax.tree_util.tree_leaves(
                jax.tree.map(lambda x: x,
                             state.opt_state[1].mu))
            assert all(l.dtype == jnp.bfloat16 for l in mu_leaves)
        step = make_train_step(model.loss_fn, tx, donate=False)
        traj = []
        for i, b in enumerate(ds.batches(4, seed=0)):
            state, m = step(state, b, jax.random.PRNGKey(0))
            traj.append(float(m["loss"]))
            if i >= 7:
                break
        losses[name] = traj
    assert all(np.isfinite(losses["bf16"]))
    np.testing.assert_allclose(losses["bf16"], losses["fp32"],
                               rtol=0.05)
    assert losses["bf16"][-1] < losses["bf16"][0]


@pytest.mark.slow
def test_o2_master_params_match_bf16_trajectory():
    """O2-TRUE storage (bf16 stored params + fp32 master in the opt
    state, create_o2_train_state) tracks the cast-per-step bf16 path:
    the forward sees identical bf16 weights, only the gradient
    round-trip differs by bf16 rounding."""
    from news_image_caption_tpu.training.train_step import (
        create_o2_train_state, create_train_state, make_train_step)

    cfg = load_config(TINY)
    model = build_model(cfg)
    ds = build_dataset(cfg, "train")
    tx = build_optimizer(cfg)
    batch = next(ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)

    state_a = create_train_state(params, tx)
    step_a = make_train_step(model.loss_fn, tx, donate=False,
                             compute_dtype=jnp.bfloat16)
    state_b = create_o2_train_state(params, tx)
    step_b = make_train_step(model.loss_fn, tx, donate=False,
                             compute_dtype=jnp.bfloat16,
                             o2_master=True)
    # stored params really are bf16; master really is fp32
    leaf = jax.tree_util.tree_leaves(state_b.params)[0]
    assert leaf.dtype == jnp.bfloat16
    mleaf = jax.tree_util.tree_leaves(state_b.opt_state["master"])[0]
    assert mleaf.dtype == jnp.float32

    tra, trb = [], []
    for i, b in enumerate(ds.batches(4, seed=0)):
        state_a, ma = step_a(state_a, b, jax.random.PRNGKey(0))
        state_b, mb = step_b(state_b, b, jax.random.PRNGKey(0))
        tra.append(float(ma["loss"]))
        trb.append(float(mb["loss"]))
        if i >= 7:
            break
    assert all(np.isfinite(trb))
    np.testing.assert_allclose(trb, tra, rtol=0.05)
    assert trb[-1] < trb[0]


@pytest.mark.slow
def test_trainer_oom_batches_are_skipped(tmp_path, monkeypatch):
    """RESOURCE_EXHAUSTED batches are skipped with gc, like the
    reference's OOM try/except (final_roberta2/custom_v4.py:286-363)."""
    from news_image_caption_tpu.data.loader import DeviceLoader
    from news_image_caption_tpu.training.train_step import \
        create_train_state
    from news_image_caption_tpu.training.trainer import (Trainer,
                                                         TrainerConfig)

    cfg = load_config(TINY)
    model = build_model(cfg)
    ds = build_dataset(cfg, "train")
    tx = build_optimizer(cfg)
    batch = next(ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(params, tx)

    tconf = TrainerConfig(num_epochs=1, serialization_dir=str(tmp_path),
                          log_every=2)
    trainer = Trainer(model.loss_fn, tx, tconf)

    real_step = trainer.train_step
    calls = {"n": 0}

    def flaky_step(state, b, rng):
        calls["n"] += 1
        if calls["n"] in (2, 5):
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory allocating 1 bytes")
        return real_step(state, b, rng)

    trainer.train_step = flaky_step
    state = trainer.train(state, lambda e: DeviceLoader(ds.batches(4)))
    # 8 batches offered, 2 rejected with OOM -> 6 optimizer steps.
    assert int(state.step) == 6


def test_trainer_oom_gives_up_after_consecutive_failures(tmp_path):
    from news_image_caption_tpu.data.loader import DeviceLoader
    from news_image_caption_tpu.training.train_step import \
        create_train_state
    from news_image_caption_tpu.training.trainer import (Trainer,
                                                         TrainerConfig)

    cfg = load_config(TINY)
    model = build_model(cfg)
    ds = build_dataset(cfg, "train")
    tx = build_optimizer(cfg)
    batch = next(ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(params, tx)

    tconf = TrainerConfig(num_epochs=1, serialization_dir=str(tmp_path),
                          max_consecutive_oom=2)
    trainer = Trainer(model.loss_fn, tx, tconf)

    def always_oom(state, b, rng):
        raise jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: boom")

    trainer.train_step = always_oom
    with pytest.raises(jax.errors.JaxRuntimeError):
        trainer.train(state, lambda e: DeviceLoader(ds.batches(4)))


# ---- pointer family through the CLI (synthetic copy supervision) ------

TINY_POINTER = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "tiny_pointer.yaml")


def test_synthetic_dataset_emits_copy_supervision():
    """SyntheticNewsDataset marks the article-embedded caption span as
    entity 1 in caption_copy_masks and flags the matching article
    positions in context_proper_masks (the roberta_indexer copy-mask
    contract the pointer family trains on); caption pad positions
    carry -1 (= ignore)."""
    cfg = load_config(TINY_POINTER)
    ds = build_dataset(cfg, "train")
    batch = next(ds.batches(4, shuffle=False))
    cap = batch["caption_ids"]
    masks = batch["caption_copy_masks"]
    proper = batch["context_proper_masks"]
    ids = batch["article_ids"]
    assert masks.shape == cap.shape
    assert proper.shape == ids.shape
    assert (masks == 1).any() and (proper == 1).any()
    for b in range(cap.shape[0]):
        # every entity-marked caption token is present at a
        # proper-marked article position
        for t in np.flatnonzero(masks[b] == 1):
            hits = ids[b][proper[b] == 1]
            assert cap[b, t] in hits, (b, t)
        # pad positions (caption_ids == 1 after eos) are ignored
        eos = np.flatnonzero(cap[b] == 2)
        if eos.size:
            assert (masks[b, eos[0] + 1:] == -1).all()


def test_tgnc_template_label_from_config():
    """dataset.n_templates emits one-hot template_label and the tgnc
    loss consumes it (template classification head trains from the
    shipped joganic_tgnc config path)."""
    cfg = load_config(TINY_POINTER)
    cfg["dataset"]["n_templates"] = 3
    cfg["model"] = {"type": "tgnc", "n_templates": 3,
                    "use_template_decoder": False,
                    "article_dim": 12,
                    "template_loss_weight": 1.0}
    ds = build_dataset(cfg, "train")
    batch = next(ds.batches(4, shuffle=False))
    assert batch["template_label"].shape == (4, 3)
    np.testing.assert_allclose(batch["template_label"].sum(axis=1), 1.0)
    model = build_model(cfg)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def init_and_loss():
        variables = model.init(jax.random.PRNGKey(0), batch)
        return model.loss_fn(variables, batch)

    loss_shape, aux = jax.eval_shape(init_and_loss)
    assert "template_loss" in aux  # the BCE actually engaged


@pytest.mark.slow
def test_cli_pointer_train_evaluate_speculative(tmp_path):
    """The shipped pointer-family config shape drives the FULL CLI
    loop on synthetic copy supervision: train (entity+copy losses),
    evaluate (copy-gated generation), and speculative evaluate
    (byte-identical generations — the pointer generate_speculative
    glue, 3-tuple unpack included)."""
    import shutil

    from news_image_caption_tpu.cli import main

    cfg_path = str(tmp_path / "cfg.yaml")
    shutil.copy(TINY_POINTER, cfg_path)
    rc = main(["train", cfg_path])
    assert rc == 0
    ser = tmp_path / "serialization"
    metrics = [json.loads(line) for line in
               (ser / "metrics.jsonl").read_text().strip().split("\n")]
    assert any("loss" in m for m in metrics)

    rc = main(["evaluate", cfg_path, "--split", "test"])
    assert rc == 0
    plain = (ser / "generations.jsonl").read_text()
    lines = plain.strip().split("\n")
    assert len(lines) == 8
    # pointer models decode their copied flags into copied_texts
    # (reference commands/evaluate.py:187-205)
    assert all("copied_texts" in json.loads(line) for line in lines)

    rc = main(["evaluate", cfg_path, "--split", "test", "-s", "_spec",
               "-o", json.dumps({"generation": {"speculative_k": 4}})])
    assert rc == 0
    assert (ser / "generations_spec.jsonl").read_text() == plain


@pytest.mark.slow
def test_cli_train_evaluate_from_nics_shards(tmp_path):
    """The PRODUCTION ingest path end-to-end through the CLI: NICS
    shards on disk -> `dataset: {type: nics_shards}` -> C++ prefetch
    reader -> tellax train (checkpoints + metrics) -> tellax evaluate
    (generations.jsonl). This is the composed loop VERDICT r03 item 3
    exercises at flagship dims on the chip; here it is pinned at toy
    dims on CPU."""
    import yaml

    from news_image_caption_tpu.cli import main
    from news_image_caption_tpu.data.native_loader import write_shard

    rng = np.random.default_rng(0)
    T, P, S, IMG, ART, V = 12, 4, 6, 16, 24, 64
    for split, n_shards, n in (("train", 2, 12), ("val", 1, 6),
                               ("test", 1, 6)):
        for i in range(n_shards):
            caption = rng.integers(3, V, size=(n, T)).astype(np.int32)
            caption[:, 0] = 0
            caption[:, -1] = 2
            write_shard(str(tmp_path / f"{split}-{i:03d}.nics"), {
                "caption_ids": caption,
                "image": rng.standard_normal(
                    (n, P, IMG)).astype(np.float32),
                "article": rng.standard_normal(
                    (n, S, ART)).astype(np.float32),
                "article_mask": (rng.random((n, S)) > 0.9).astype(
                    np.uint8),
                "image_mask": np.zeros((n, P), np.uint8),
            })
    cfg = {
        "dataset": {
            "type": "nics_shards",
            "train": {"pattern": str(tmp_path / "train-*.nics")},
            "val": {"pattern": str(tmp_path / "val-*.nics")},
            "test": {"pattern": str(tmp_path / "test-*.nics")},
        },
        "model": {"type": "transformer_flattened", "decoder": {
            "type": "dynamic_conv_decoder_flattened",
            "vocab_size": V, "embed_dim": 16, "ffn_dim": 32,
            "num_heads": 4, "num_layers": 2, "kernel_sizes": [3, 5],
            "cutoff": [16, 32, V], "image_dim": IMG,
            "article_dim": ART, "max_positions": 32}},
        "iterator": {"batch_size": 4},
        "generation": {"max_len": 8},
        # bf16_o2 ALSO pins the restore-template fix: evaluate must
        # rebuild the O2 state (fp32 master in opt_state) to load a
        # checkpoint this run writes — a plain template rejects it.
        "trainer": {"num_epochs": 2, "patience": None,
                    "mixed_precision": "bf16_o2",
                    "optimizer": {"type": "bert_adam", "lr": 1e-3,
                                  "t_total": 100}},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    rc = main(["train", cfg_path])
    assert rc == 0
    ser = tmp_path / "serialization"
    metrics = [json.loads(line) for line in
               (ser / "metrics.jsonl").read_text().strip().split("\n")]
    losses = [m["loss"] for m in metrics if "loss" in m]
    assert len(losses) >= 2
    rc = main(["evaluate", cfg_path, "--split", "test"])
    assert rc == 0
    lines = (ser / "generations.jsonl").read_text().strip().split("\n")
    # 6 test records, batch 4, drop_last in the loader: evaluate sees
    # at least one full batch
    assert len(lines) >= 4
