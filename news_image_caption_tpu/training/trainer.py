"""Training loop with validation/checkpoint/patience callbacks.

Capability parity target: Gen-3 CallbackApexTrainer
(/root/reference/ttl/tell/training/callback_apex_trainer.py:51-375):
per-epoch train + validate, checkpoint callback with keep-N, metric
tracking with patience early-stop, NaN-loss batch skip, tensorboard-
style scalar logging (here: jsonl metrics sink), recover-from-latest.

apex AMP is unnecessary on TPU — bf16 is handled by the model dtype
policy; the whole step is one fused XLA program.
"""

from __future__ import annotations

import gc
import json
import os
import signal
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from news_image_caption_tpu.training.checkpoint import CheckpointStore
from news_image_caption_tpu.training.preemption import PreemptionHandler
from news_image_caption_tpu.training.train_step import (
    TrainState, make_eval_step, make_train_step)
from news_image_caption_tpu.utils.logging import setup_logger


@dataclass
class TrainerConfig:
    num_epochs: int = 10
    patience: Optional[int] = None          # epochs without val improvement
    keep_checkpoints: int = 10
    validation_metric: str = "loss"         # on val set
    maximize_metric: bool = False
    log_every: int = 40
    serialization_dir: str = "runs/default"
    skip_nan_batches: bool = True           # ref: trainer :225-227
    # "bf16" = apex-O2-style mixed precision (fp32 stored params cast
    # to bf16 compute each step); "bf16_o2" = O2-TRUE storage (bf16
    # stored params + fp32 master inside the optimizer state — build
    # the state with create_o2_train_state); None/"fp32" = full
    # precision.
    mixed_precision: Optional[str] = None
    # Reference OOM recovery (final_roberta2/custom_v4.py:286-363):
    # skip the batch, collect garbage, keep training; give up after
    # this many CONSECUTIVE out-of-memory batches.
    max_consecutive_oom: int = 3
    # Gradient accumulation window (1 = off). The CALLER must build
    # both the optimizer state and this Trainer with the SAME wrapped
    # tx (optim.accumulate_gradients(tx, n)) — the cli does this from
    # the trainer.accumulate_steps YAML key.
    accumulate_steps: int = 1
    # TensorBoard scalar logging (reference: log_to_tensorboard
    # callback, config.yaml:160-163, summary_interval: 512). Event
    # files go to <serialization_dir>/log; 0 disables. Written with
    # the dependency-free utils/tensorboard.py writer. Train scalars
    # are emitted at the existing `log_every` host-sync points (the
    # hot loop never syncs for logging alone), at most every
    # `summary_interval` steps; val scalars every epoch.
    summary_interval: int = 512
    # Async checkpointing: snapshot to host synchronously (donated
    # device buffers stay safe), serialize + write on a background
    # thread so the epoch loop never blocks on disk. The reference
    # blocks its train loop for every torch.save
    # (callback_apex_trainer checkpoint callback; train.py:235-269).
    async_checkpoint: bool = True
    # Graceful preemption: latch SIGTERM (TPU-pod/spot eviction
    # warning) at batch boundaries, write a final checkpoint tagged
    # preempted=True, and return cleanly so --recover resumes from
    # the preemption step instead of the last epoch boundary. The
    # reference loses everything since its last epoch torch.save.
    handle_preemption: bool = True
    # "msgpack" (default): single-file checkpoints, gathered to host
    # — right for one host. "sharded": per-shard tensorstore/OCDBT
    # writes via orbax with resharding-aware restore — the multi-host
    # production schema (training/checkpoint_sharded.py).
    checkpoint_format: str = "msgpack"
    # Windowed jax.profiler capture: trace steps
    # [profile_start, profile_start + profile_steps) into
    # <serialization_dir>/profile (0 steps = off). View with
    # tensorboard/xprof or jax.profiler tooling. Replaces the
    # reference's print-based timing + GPUtil dumps (SURVEY.md §5:
    # train.py:135-143, custom_v3.py:450-451) with a real trace.
    profile_start: int = 2
    profile_steps: int = 0
    seed: int = 0


class Trainer:
    def __init__(self, loss_fn: Callable, tx, config: TrainerConfig,
                 eval_loss_fn: Optional[Callable] = None):
        self.config = config
        self.tx = tx
        mp = config.mixed_precision
        compute_dtype = (jnp.bfloat16
                         if mp in ("bf16", "bf16_o2") else None)
        self.train_step = make_train_step(
            loss_fn, tx, donate=True,
            guard_nonfinite=config.skip_nan_batches,
            compute_dtype=compute_dtype,
            o2_master=(mp == "bf16_o2"))
        # Validation runs under the SAME precision policy as training
        # (the apex-O2 reference validates the fp16 model), so the
        # early-stopping metric is consistent with the trained model.
        self.eval_step = make_eval_step(eval_loss_fn or loss_fn,
                                        compute_dtype=compute_dtype)
        if config.checkpoint_format == "sharded":
            from news_image_caption_tpu.training.checkpoint_sharded \
                import ShardedCheckpointStore as _Store
        elif config.checkpoint_format == "msgpack":
            _Store = CheckpointStore
        else:
            raise ValueError(
                f"unknown checkpoint_format "
                f"{config.checkpoint_format!r}; use 'msgpack' or "
                f"'sharded'")
        self.store = _Store(
            os.path.join(config.serialization_dir, "checkpoints"),
            keep=config.keep_checkpoints,
            best_metric=config.validation_metric,
            maximize=config.maximize_metric)
        self.logger = setup_logger("trainer")
        self._metrics_path = os.path.join(
            config.serialization_dir, "metrics.jsonl")
        os.makedirs(config.serialization_dir, exist_ok=True)
        self._tb = None            # lazy SummaryWriter
        self._last_summary_step = -(10 ** 12)

    def _log_metrics(self, record: Dict[str, Any]):
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _tb_writer(self):
        if self._tb is None:
            from news_image_caption_tpu.utils.tensorboard import \
                SummaryWriter
            self._tb = SummaryWriter(
                os.path.join(self.config.serialization_dir, "log"))
        return self._tb

    def _tb_scalars(self, step: int, scalars, force: bool = False):
        """Scalars to TensorBoard every `summary_interval` steps
        (reference log_to_tensorboard cadence)."""
        interval = self.config.summary_interval
        if interval <= 0:
            return
        if not force and step - self._last_summary_step < interval:
            return
        self._last_summary_step = step
        self._tb_writer().add_scalars(
            [(t, v) for t, v in scalars
             if isinstance(v, (int, float))], step)
        self._tb.flush()

    def train(self, state: TrainState,
              train_batches: Callable[[int], Iterable],
              val_batches: Optional[Callable[[int], Iterable]] = None,
              recover: bool = False) -> TrainState:
        """train_batches(epoch) -> iterable of device-ready batches."""
        cfg = self.config
        start_epoch = 0
        if recover:
            step = self.store.latest_step()
            if step is not None:
                state = self.store.load(state, "latest")
                start_epoch = int(
                    next((c["metrics"].get("epoch", 0)
                          for c in self.store.meta["checkpoints"]
                          if c["step"] == step), 0))
                self.logger.info("recovered step=%s epoch=%s",
                                 step, start_epoch)
        rng = jax.random.PRNGKey(cfg.seed)
        best = self.store.best_value()
        epochs_since_best = 0
        guard = PreemptionHandler(
            (signal.SIGTERM,) if cfg.handle_preemption else ())
        guard.__enter__()
        try:
            state = self._epoch_loop(state, train_batches, val_batches,
                                     rng, start_epoch, best,
                                     epochs_since_best, guard)
        finally:
            guard.__exit__()
        # Surface any async write error before declaring success.
        self.store.wait()
        return state

    def _epoch_loop(self, state, train_batches, val_batches, rng,
                    start_epoch, best, epochs_since_best,
                    guard: PreemptionHandler) -> TrainState:
        cfg = self.config
        # Host-side step mirror for the profiler window (int(state.
        # step) every batch would sync the device; one sync here).
        host_step = int(state.step) if cfg.profile_steps > 0 else 0
        self._prof_active = False
        self._prof_done = False
        self._prof_started_at = 0
        try:
            return self._run_epochs(state, train_batches, val_batches,
                                    rng, start_epoch, best,
                                    epochs_since_best, guard,
                                    host_step)
        finally:
            if self._prof_active:
                jax.profiler.stop_trace()
                self._prof_active = False

    def _profile_tick(self, host_step: int, last_loss=None) -> None:
        """Start/stop the windowed jax.profiler trace at step edges.

        Start is >= (not ==) so a --recover run resuming PAST
        profile_start still captures its window (of the first
        profile_steps steps after resume); stop is relative to the
        actual start step."""
        cfg = self.config
        if cfg.profile_steps <= 0 or self._prof_done:
            return
        if (not self._prof_active
                and host_step >= cfg.profile_start):
            logdir = os.path.join(cfg.serialization_dir, "profile")
            self.logger.info("profiling steps %d..%d -> %s",
                             host_step,
                             host_step + cfg.profile_steps, logdir)
            jax.profiler.start_trace(logdir)
            self._prof_active = True
            self._prof_started_at = host_step
        elif (self._prof_active and
              host_step >= self._prof_started_at + cfg.profile_steps):
            if last_loss is not None:
                # Flush async dispatch so the traced window actually
                # contains the device work of the profiled steps.
                jax.block_until_ready(last_loss)
            jax.profiler.stop_trace()
            self._prof_active = False
            self._prof_done = True
            self.logger.info("profile trace written")

    def _preemption_agreed(self, guard: PreemptionHandler) -> bool:
        """Cross-host agreement on the preemption flag.

        Hosts can observe SIGTERM at different batch boundaries, but
        the loop exit and the (collective, when sharded) checkpoint
        save must happen at the SAME step everywhere — take the
        global OR of the per-host flags. Single-process: the local
        flag, no collective."""
        if jax.process_count() == 1:
            return guard.triggered
        import numpy as np
        from jax.experimental import multihost_utils
        return bool(multihost_utils.process_allgather(
            np.asarray(guard.triggered)).any())

    def _run_epochs(self, state, train_batches, val_batches, rng,
                    start_epoch, best, epochs_since_best,
                    guard: PreemptionHandler,
                    host_step: int) -> TrainState:
        cfg = self.config
        for epoch in range(start_epoch, cfg.num_epochs):
            t_epoch = time.time()
            n_batches = 0
            total_tokens = 0
            consecutive_oom = 0
            # Device-side scalars accumulated between log points; the
            # ONLY host syncs in the hot loop happen every `log_every`
            # steps (the in-jit nonfinite guard already skips bad
            # batches without a round trip).
            window: list = []
            preempted = False
            # Input-wait accounting: host time blocked in the batch
            # iterator vs wall. Step dispatch is async, so this is the
            # standard starvation proxy — ~0% means the pipeline
            # (C++ reader -> DeviceLoader prefetch) outruns the step;
            # large values mean the loop is ingest-bound (BASELINE.md
            # records it for the flagship e2e run).
            t_input = 0.0
            batch_iter = iter(train_batches(epoch))
            while True:
                t_fetch = time.time()
                try:
                    batch = next(batch_iter)
                except StopIteration:
                    t_input += time.time() - t_fetch
                    break
                t_input += time.time() - t_fetch
                if self._preemption_agreed(guard):
                    preempted = True
                    break
                self._profile_tick(host_step)
                try:
                    state, metrics = self.train_step(state, batch, rng)
                except jax.errors.JaxRuntimeError as e:
                    if "RESOURCE_EXHAUSTED" not in str(e):
                        raise
                    consecutive_oom += 1
                    self.logger.warning(
                        "OOM batch skipped (%d consecutive): %s",
                        consecutive_oom, str(e).splitlines()[0])
                    if consecutive_oom >= cfg.max_consecutive_oom:
                        raise
                    gc.collect()
                    # The step donates the state; a failure mid-
                    # execution can leave its buffers deleted. If so,
                    # restore from the newest checkpoint.
                    state = self._revive_if_donated(state)
                    continue
                consecutive_oom = 0
                n_batches += 1
                host_step += 1
                self._profile_tick(host_step, metrics["loss"])
                window.append((metrics["loss"],
                               metrics.get("sample_size", 0),
                               metrics["skipped"]))
                if n_batches % cfg.log_every == 0:
                    losses, sizes, skips = zip(*window)
                    window = []
                    # Window-MEAN loss, like the reference's running
                    # average (custom_v3.py:300-311) — the last-batch
                    # value is too noisy a signal.  One host sync point.
                    loss = float(jnp.mean(jnp.stack(losses)))
                    total_tokens += int(sum(int(s) for s in sizes))
                    n_skipped = int(sum(int(s) for s in skips))
                    dt = time.time() - t_epoch
                    if n_skipped and cfg.skip_nan_batches:
                        self.logger.warning(
                            "%d NaN/inf-loss batches guarded in-jit",
                            n_skipped)
                    input_wait = t_input / max(dt, 1e-9)
                    self.logger.info(
                        "epoch %d step %d loss %.4f (%.1f tok/s, "
                        "input wait %.1f%%)",
                        epoch, int(state.step), loss,
                        total_tokens / max(dt, 1e-9),
                        100.0 * input_wait)
                    self._log_metrics({
                        "epoch": epoch, "step": int(state.step),
                        "loss": loss, "skipped": n_skipped,
                        "input_wait": round(input_wait, 4),
                        "split": "train"})
                    self._tb_scalars(int(state.step), [
                        ("train/loss", loss),
                        ("train/tokens_per_sec",
                         total_tokens / max(dt, 1e-9)),
                        ("train/input_wait", input_wait),
                        ("train/skipped_batches", n_skipped)])
            if preempted or self._preemption_agreed(guard):
                # Eviction imminent: persist NOW (blocking — the
                # process may not live long enough for async I/O),
                # tagged with the in-progress epoch so --recover
                # restarts this epoch with the exact mid-epoch
                # optimizer state and step counter.
                self.logger.warning(
                    "preemption signal %s: checkpointing at step %d "
                    "and exiting cleanly", guard.signum,
                    int(state.step))
                self.store.save(
                    state, int(state.step),
                    {"epoch": epoch, "preempted": True},
                    blocking=True)
                return state
            # Validation.
            val_metrics: Dict[str, float] = {}
            if val_batches is not None:
                val_metrics = self.evaluate(state.params,
                                            val_batches(epoch))
                self._log_metrics({"epoch": epoch,
                                   "step": int(state.step),
                                   "split": "val", **val_metrics})
                self.logger.info("epoch %d val %s", epoch, val_metrics)
                self._tb_scalars(
                    int(state.step),
                    [(f"validation/{k}", v)
                     for k, v in val_metrics.items()], force=True)
            ckpt_metrics = {"epoch": epoch + 1, **val_metrics}
            self.store.save(state, int(state.step), ckpt_metrics,
                            blocking=not cfg.async_checkpoint)
            # Patience tracking on the validation metric.
            if cfg.patience is not None and val_metrics:
                val = val_metrics.get(cfg.validation_metric)
                improved = (best is None or
                            (val > best if cfg.maximize_metric
                             else val < best))
                if improved:
                    best = val
                    epochs_since_best = 0
                else:
                    epochs_since_best += 1
                    if epochs_since_best >= cfg.patience:
                        self.logger.info(
                            "early stop: no %s improvement in %d epochs",
                            cfg.validation_metric, cfg.patience)
                        break
        return state

    def _revive_if_donated(self, state: TrainState) -> TrainState:
        """Recover state whose donated buffers died in a failed step."""
        deleted = any(
            leaf.is_deleted() for leaf in jax.tree.leaves(state)
            if hasattr(leaf, "is_deleted"))
        if not deleted:
            return state
        if self.store.latest_step() is None:
            raise RuntimeError(
                "train state lost to a failed donated step and no "
                "checkpoint exists to restore from")
        self.logger.warning("restoring train state from latest "
                            "checkpoint after failed donated step")
        state, _ = self.store.load_with_fallback(state)
        return state

    def evaluate(self, params, batches: Iterable) -> Dict[str, float]:
        total_loss, total_size, n = 0.0, 0, 0
        for batch in batches:
            m = self.eval_step(params, batch)
            size = int(m.get("sample_size", 1))
            total_loss += float(m["loss"]) * size
            total_size += size
            n += 1
        return {"loss": total_loss / max(total_size, 1),
                "n_batches": n}
