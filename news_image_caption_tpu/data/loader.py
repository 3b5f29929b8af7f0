"""Host->device input pipeline with background prefetch.

The reference hides I/O latency with joblib worker processes per batch
(/root/reference/dataloader.py:279-296) and torch DataLoader workers.
TPU-first equivalent: a background thread prepares the next batches
and `jax.device_put` overlaps the host->HBM copy with the current
step's compute (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator

import jax
import numpy as np


class DeviceLoader:
    """Wrap a host batch iterator with prefetch + device placement."""

    def __init__(self, batches: Iterable[Dict[str, np.ndarray]],
                 prefetch: int = 2,
                 sharding=None):
        self._batches = batches
        self._prefetch = prefetch
        self._sharding = sharding

    def _put(self, batch):
        if self._sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, self._sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        sentinel = object()
        err: list = []

        def worker():
            try:
                for b in self._batches:
                    q.put(self._put(b))
            except Exception as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item


class FixedStepsLoader:
    """Fixed steps-per-epoch over an endless batch stream with
    fast-forward resume.

    Capability parity target: Gen-2's LoaderWrapper + start_idx resume
    (/root/reference/final_roberta/custom_v4.py:422-448,455-530): an
    "epoch" is exactly `steps_per_epoch` batches regardless of dataset
    size, and resuming at epoch E fast-forwards the underlying stream
    by E * steps_per_epoch batches (deterministic batch order).
    """

    def __init__(self, make_batches: Callable[[int], Iterable],
                 steps_per_epoch: int):
        """make_batches(seed) -> finite iterable of batches; the
        stream chains seeds 0, 1, 2, ... endlessly."""
        self.make_batches = make_batches
        self.steps_per_epoch = steps_per_epoch

    def _endless(self):
        seed = 0
        while True:
            yielded = False
            for b in self.make_batches(seed):
                yielded = True
                yield b
            if not yielded:
                raise ValueError("make_batches produced no batches")
            seed += 1

    def epoch(self, epoch_index: int) -> Iterator:
        """Batches for one epoch, fast-forwarding past prior epochs."""
        stream = self._endless()
        skip = epoch_index * self.steps_per_epoch
        for _ in range(skip):
            next(stream)
        for _ in range(self.steps_per_epoch):
            yield next(stream)
