"""Profiling and tracing hooks (SURVEY.md §5 aux subsystems).

The reference's observability is print-based wall-clock timing and
"Tokens / Sec" logs (/root/reference/train.py:135-143,187-190,
final/custom_v3.py:300-324) plus TensorBoard scalars. TPU-native
equivalents:

- `trace(logdir)`: context manager around jax.profiler.trace —
  produces a TensorBoard-loadable device trace (per-op HLO timing).
- `annotate(name)`: jax.profiler.TraceAnnotation for host-side spans.
- `StepTimer`: tokens/sec + step-time EMA with the host/device async
  caveat handled (forces a host fetch on the watched value).
- `MetricsLogger`: JSONL scalar sink (the trainer writes through it).
- Real TensorBoard event files: `utils/tensorboard.py::SummaryWriter`
  (dependency-free writer; the trainer emits train/val scalars every
  `summary_interval` steps like the reference's log_to_tensorboard
  callback).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock + tokens/sec with EMA smoothing."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.step_time: Optional[float] = None
        self.tokens_per_sec: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self, watched: Any = None, tokens: int = 0) -> Dict[str, float]:
        """Call once per step. `watched` is fetched to host so the
        measured interval includes device execution (async dispatch
        otherwise under-reports; on the axon tunnel block_until_ready
        alone is insufficient)."""
        if watched is not None:
            np.asarray(watched)
        now = time.perf_counter()
        out: Dict[str, float] = {}
        if self._last is not None:
            dt = now - self._last
            self.step_time = (dt if self.step_time is None
                              else self.ema * self.step_time
                              + (1 - self.ema) * dt)
            out["step_time_s"] = self.step_time
            if tokens:
                tps = tokens / dt
                self.tokens_per_sec = (
                    tps if self.tokens_per_sec is None
                    else self.ema * self.tokens_per_sec
                    + (1 - self.ema) * tps)
                out["tokens_per_sec"] = self.tokens_per_sec
        self._last = now
        return out


class MetricsLogger:
    """Append-only JSONL scalar sink with optional flush cadence."""

    def __init__(self, path: str, flush_every: int = 1):
        self.path = path
        self.flush_every = flush_every
        self._buf = []
        self._f = open(path, "a")

    def log(self, step: int, **scalars):
        rec = {"step": step, "time": time.time(), **{
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in scalars.items()}}
        self._buf.append(json.dumps(rec))
        if len(self._buf) >= self.flush_every:
            self.flush()

    def flush(self):
        if self._buf:
            self._f.write("\n".join(self._buf) + "\n")
            self._f.flush()
            self._buf = []

    def close(self):
        self.flush()
        self._f.close()
