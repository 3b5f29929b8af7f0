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
from typing import Callable, Dict, Iterable, Iterator, Optional

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
