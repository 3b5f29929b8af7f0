"""Sharded checkpoint store: per-shard tensorstore/OCDBT writes.

The msgpack `CheckpointStore` gathers every array to one host before
serializing — correct on a single host, impossible at multi-host
scale (a non-fully-addressable `jax.Array` cannot be materialized on
one process, and a 100B-param state would not fit host RAM anyway).
This store writes each device shard directly via orbax/tensorstore
(OCDBT: one data file per process, `ocdbt.process_N`), so:

- every host writes only its local shards in parallel (saves scale
  with host count instead of serializing through host 0);
- restore is *resharding-aware*: pass a target pytree whose leaves
  carry `NamedSharding`s for the CURRENT mesh and each host reads
  only the bytes it needs, even when the save-time mesh layout was
  different (e.g. trained on data=4 x model=2, resumed on
  data=2 x model=4).

The reference has no analog (single-GPU torch.save,
callback_apex_trainer checkpoint callback); this is the TPU-pod
production schema. Metadata semantics (latest/best/keep-N, async
drain ordering) match `CheckpointStore`; "best" is tracked as a
pinned step rather than a byte copy (sharded checkpoints are
directories — the best step's directory is exempt from retention).

Multi-host note: orbax saves/restores are collective across
`jax.process_count()` processes; the meta.json bookkeeping here runs
on process 0 only.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax

from news_image_caption_tpu.training.checkpoint import CheckpointStore


def _abstractify(leaf):
    """Concrete array or ShapeDtypeStruct -> restore spec.

    jax.Array leaves contribute their sharding so each host reads only
    its shards onto the right devices; plain host arrays/scalars
    restore as saved (orbax reads the recorded sharding).
    """
    sharding = getattr(leaf, "sharding", None)
    if isinstance(leaf, jax.ShapeDtypeStruct):
        return leaf
    if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=sharding)
    return leaf


class ShardedCheckpointStore(CheckpointStore):
    def __init__(self, directory: str, keep: int = 10,
                 best_metric: str = "loss", maximize: bool = False):
        super().__init__(os.path.abspath(directory), keep=keep,
                         best_metric=best_metric, maximize=maximize)
        import orbax.checkpoint as ocp  # deferred: heavy import
        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())

    # A checkpoint is a directory, not a file.
    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"ckpt_{step}")

    def save(self, state: Any, step: int,
             metrics: Optional[Dict[str, float]] = None,
             blocking: bool = True) -> str:
        """Collective sharded save.

        `AsyncCheckpointer.save` returns once device shards are copied
        to host memory (donated buffers are immediately safe to
        reuse); tensorstore writes proceed in the background. Meta
        updates (latest/best/retention) are finalized only after the
        data is durably written — on the ordered worker for
        blocking=False, inline for blocking=True.
        """
        path = self._path(step)
        # One outstanding orbax save at a time (its own contract), and
        # blocking saves must not commit ahead of queued ones.
        self.wait()
        self._ckptr.save(path, args=self._ocp.args.StandardSave(state),
                         force=True)
        if blocking:
            self._finalize(step, path, metrics)
            return path
        from concurrent.futures import ThreadPoolExecutor
        if self._executor is None:
            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer")
        fut = self._executor.submit(self._finalize, step, path, metrics)
        with self._lock:
            self._pending.append(fut)
        return path

    def _finalize(self, step: int, path: str,
                  metrics: Optional[Dict[str, float]]) -> None:
        self._ckptr.wait_until_finished()  # surfaces write errors
        if jax.process_index() != 0:
            return
        with self._lock:
            entry = {"step": step, "metrics": metrics or {}}
            self.meta["checkpoints"] = [
                c for c in self.meta["checkpoints"]
                if c["step"] != step] + [entry]
            val = (metrics or {}).get(self.best_metric)
            if val is not None:
                best = self.meta.get("best")
                better = (best is None
                          or (val > best["value"] if self.maximize
                              else val < best["value"]))
                if better:
                    self.meta["best"] = {"step": step,
                                         "value": float(val)}
            ckpts = sorted(self.meta["checkpoints"],
                           key=lambda c: c["step"])
            best = self.meta.get("best")
            best_step = None if best is None else best["step"]
            keep = [c for c in ckpts[-self.keep:]]
            victims = [c for c in ckpts[:-self.keep]
                       if c["step"] != best_step]
            # The best step's directory is pinned (no byte copy of a
            # sharded dir); its meta entry survives retention too so
            # load('best') stays resolvable.
            keep = sorted(
                keep + [c for c in ckpts[:-self.keep]
                        if c["step"] == best_step],
                key=lambda c: c["step"])
            for victim in victims:
                shutil.rmtree(self._path(victim["step"]),
                              ignore_errors=True)
            self.meta["checkpoints"] = keep
            self._write_meta()

    def load(self, target: Any, which: Any = "latest") -> Any:
        """Restore into `target`'s structure with `target`'s shardings.

        Leaves that are jax.Arrays (or ShapeDtypeStructs with a
        sharding) are restored directly onto their mesh placement —
        any mesh layout, not just the save-time one.
        """
        self.wait()
        if which == "latest":
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints in {self.dir}")
        elif which == "best":
            best = self.meta.get("best")
            if best is None:
                raise FileNotFoundError(f"no best entry in {self.dir}")
            step = best["step"]
        else:
            step = int(which)
        abstract = jax.tree.map(_abstractify, target)
        return self._ckptr.restore(
            self._path(step),
            args=self._ocp.args.StandardRestore(abstract))

    def close(self) -> None:
        self.wait()
        self._ckptr.close()
