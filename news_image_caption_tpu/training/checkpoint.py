"""Checkpoint store: latest/best/keep-N with metadata, msgpack format.

Capability parity targets (the reference's three resume schemas,
SURVEY.md §5):
1. Gen-1: model/optimizer + infos pickle (iter, epoch, best score)
   + model-best on metric improvement (/root/reference/train.py:235-269)
2. Gen-2: latest.pt + best.pt + scheduler + epoch info + fast-forward
   resume (/root/reference/final_roberta/custom_v4.py:455-530)
3. Gen-3: AllenNLP checkpointer, num_serialized_models_to_keep,
   best.th (/root/reference/ttl/expt/.../config.yaml:156-158)

One store covers all three: `save(state, metrics)` writes
step-numbered checkpoints + json metadata, tracks the best metric,
retains the newest N, and `load('latest'|'best'|step)` restores.
"""

from __future__ import annotations

import json
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


class CheckpointStore:
    def __init__(self, directory: str, keep: int = 10,
                 best_metric: str = "loss", maximize: bool = False):
        self.dir = directory
        self.keep = keep
        self.best_metric = best_metric
        self.maximize = maximize
        os.makedirs(directory, exist_ok=True)
        self._meta_path = os.path.join(directory, "meta.json")
        self.meta: Dict[str, Any] = {"checkpoints": [], "best": None}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.meta = json.load(f)
        # Async saves: one worker thread serializes writes in order;
        # the lock guards meta against reader/writer races.
        self._executor: Optional[ThreadPoolExecutor] = None
        self._pending: list = []
        self._lock = threading.Lock()

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"ckpt_{step}.msgpack")

    def _write_meta(self):
        with open(self._meta_path, "w") as f:
            json.dump(self.meta, f, indent=1)

    def save(self, state: Any, step: int,
             metrics: Optional[Dict[str, float]] = None,
             blocking: bool = True) -> str:
        """Write a step checkpoint.

        blocking=False returns as soon as the state is snapshotted to
        host memory; serialization + disk writes + meta updates happen
        on a single background worker (in submission order), so the
        train loop never stalls on disk I/O. The host snapshot itself
        is synchronous — after `save` returns, the caller may freely
        donate or overwrite the device buffers. Call `wait()` to drain
        pending writes and surface any write errors.
        """
        # Pull to host before serializing (works for sharded arrays).
        # MUST be a real copy: np.asarray aliases numpy leaves and can
        # be zero-copy for CPU jax.Arrays, so a background writer
        # would race caller mutation / donated-buffer reuse.
        host_state = jax.tree.map(lambda x: np.array(x, copy=True),
                                  state)
        path = self._path(step)
        if blocking:
            # Drain queued async writes first: a blocking save must
            # not commit ahead of earlier saves (a queued write for
            # the same step would otherwise land after and clobber
            # this entry in meta).
            self.wait()
            self._commit(host_state, path, step, metrics)
            return path
        if self._executor is None:
            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer")
        fut = self._executor.submit(
            self._commit, host_state, path, step, metrics)
        with self._lock:
            self._pending.append(fut)
        return path

    def _commit(self, host_state: Any, path: str, step: int,
                metrics: Optional[Dict[str, float]]) -> None:
        blob = serialization.to_bytes(host_state)
        # Write-then-rename so a crash mid-write never leaves a
        # truncated ckpt_N.msgpack for load_with_fallback to trip on.
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        with self._lock:
            entry = {"step": step, "metrics": metrics or {}}
            self.meta["checkpoints"] = [
                c for c in self.meta["checkpoints"] if c["step"] != step
            ] + [entry]
            # Track best.
            val = (metrics or {}).get(self.best_metric)
            if val is not None:
                best = self.meta.get("best")
                better = (best is None
                          or (val > best["value"] if self.maximize
                              else val < best["value"]))
                if better:
                    self.meta["best"] = {"step": step,
                                         "value": float(val)}
                    best_path = os.path.join(self.dir, "best.msgpack")
                    with open(best_path + ".tmp", "wb") as f:
                        f.write(blob)
                    os.replace(best_path + ".tmp", best_path)
            # Retention: keep newest N.
            ckpts = sorted(self.meta["checkpoints"],
                           key=lambda c: c["step"])
            while len(ckpts) > self.keep:
                victim = ckpts.pop(0)
                p = self._path(victim["step"])
                if os.path.exists(p):
                    os.remove(p)
            self.meta["checkpoints"] = ckpts
            self._write_meta()

    def wait(self) -> None:
        """Drain pending async saves; re-raises the first write error.

        ALL drained futures are awaited before raising — an early
        failure must not discard the completion (or errors) of later
        queued writes."""
        with self._lock:
            pending, self._pending = self._pending, []
        first: Optional[BaseException] = None
        for fut in pending:
            try:
                fut.result()
            except BaseException as e:
                if first is None:
                    first = e
        if first is not None:
            raise first

    def latest_step(self) -> Optional[int]:
        self.wait()
        if not self.meta["checkpoints"]:
            return None
        return max(c["step"] for c in self.meta["checkpoints"])

    def load(self, target: Any, which: Any = "latest") -> Any:
        """Restore into the pytree structure of `target`.

        which: 'latest', 'best', or an int step.
        """
        self.wait()
        if which == "latest":
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.dir}")
            path = self._path(step)
        elif which == "best":
            path = os.path.join(self.dir, "best.msgpack")
        else:
            path = self._path(int(which))
        with open(path, "rb") as f:
            return serialization.from_bytes(target, f.read())

    def load_with_fallback(self, target: Any):
        """Restore the newest readable checkpoint, falling back to
        older ones on corruption (reference analog: the
        .npy -> .pkl -> recompute cache chain,
        final_roberta2/encoder.py:64-92). Returns (state, step)."""
        self.wait()
        steps = sorted((c["step"] for c in self.meta["checkpoints"]),
                       reverse=True)
        last_err: Optional[Exception] = None
        for step in steps:
            try:
                return self.load(target, step), step
            except Exception as e:  # corrupt/missing file
                last_err = e
                continue
        raise FileNotFoundError(
            f"no readable checkpoint in {self.dir}") from last_err

    def best_value(self) -> Optional[float]:
        self.wait()
        b = self.meta.get("best")
        return None if b is None else b["value"]

    def load_averaged(self, target: Any,
                      last_n: Optional[int] = None,
                      steps: Optional[list] = None) -> Any:
        """Restore the element-wise average of several checkpoints
        (fairseq's average_checkpoints trick — smooths the tail of
        training; integer leaves, e.g. step counters, are taken from
        the newest checkpoint instead of averaged).

        last_n: average the newest N retained checkpoints;
        steps: explicit step list (overrides last_n).
        """
        self.wait()
        if steps is None:
            avail = sorted(c["step"] for c in self.meta["checkpoints"])
            if not avail:
                raise FileNotFoundError(
                    f"no checkpoints in {self.dir}")
            steps = avail[-(last_n or len(avail)):]
        states = [self.load(target, s) for s in sorted(steps)]

        def avg(*leaves):
            first = np.asarray(leaves[0])
            if not np.issubdtype(first.dtype, np.floating):
                return leaves[-1]          # newest wins for ints
            acc = np.zeros(first.shape, np.float64)
            for x in leaves:
                acc += np.asarray(x, np.float64)
            return (acc / len(leaves)).astype(first.dtype)

        return jax.tree.map(avg, *states)
