"""Multi-host bootstrap and per-process data sharding.

The reference never runs beyond one machine (its only parallelism is
single-node torch DataParallel, callback_apex_trainer.py:187-189).
On TPU pods every host runs the SAME program against its local chips
and JAX stitches them into one global mesh — this module carries the
three pieces a multi-host run needs:

1. `initialize()` — idempotent `jax.distributed.initialize` (TPU pods
   auto-discover the coordinator; CPU/GPU fleets pass explicit
   coordinator/num_processes/process_id).
2. `shard_iterator()` — deterministic disjoint batch streams per
   host: every host draws the same logical epoch and keeps batches
   i ≡ process_index (mod process_count). No coordination traffic.
3. `device_put_global()` — assemble a GLOBAL sharded batch from each
   host's local slice via `jax.make_array_from_process_local_data`
   (the multi-host replacement for a plain `jax.device_put`, which
   can only address local devices).

Single-process runs degrade to no-ops (count=1 keeps every batch,
device_put_global == sharded device_put), so the same training
script is correct from 1 chip to a pod — tests exercise exactly that
degradation plus the sharding arithmetic.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, Iterable, Iterator, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               **kwargs) -> None:
    """Idempotent multi-host runtime bootstrap.

    Call once per process before building meshes. On TPU pods all
    arguments are auto-detected; elsewhere pass
    coordinator_address="host:port", num_processes, process_id.
    A second call (or a single-process run where the backend is
    already up) is a no-op rather than an error.
    """
    global _initialized
    if _initialized:
        return
    # Do NOT touch jax.process_count()/devices() here: any backend
    # query initializes XLA, after which jax.distributed.initialize
    # refuses to run — that would break pod auto-detection.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            **kwargs)
    except (ValueError, RuntimeError) as e:
        if coordinator_address is not None or num_processes is not None:
            raise   # explicit cluster spec that failed: a real error
        # No cluster detected (plain single-host run): degrade to
        # single-process rather than failing the training script.
        import logging
        logging.getLogger("distributed").info(
            "no multi-host cluster detected (%s); running "
            "single-process", e)
    _initialized = True


def shard_iterator(batches: Iterable, index: Optional[int] = None,
                   count: Optional[int] = None) -> Iterator:
    """Round-robin slice of a batch stream for this process.

    Every host constructs the SAME epoch iterator (same seed) and
    consumes batches index, index+count, ... — disjoint coverage with
    deterministic resume (the FixedStepsLoader index arithmetic
    composes: global_step -> batch i = step*count + index).

    A ragged tail (epoch length not divisible by count) is DROPPED so
    every host sees the same number of batches — unequal counts would
    desynchronize the per-host loops and hang the collectives of the
    extra global step.
    """
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    if count == 1:
        return iter(batches)

    def even_slices() -> Iterator:
        it = iter(batches)
        while True:
            group = list(itertools.islice(it, count))
            if len(group) < count:
                return
            yield group[index]

    return even_slices()


def device_put_global(batch: Dict[str, Any], sharding,
                      spec: Optional[PartitionSpec] = None
                      ) -> Dict[str, Any]:
    """Host-local numpy batch -> global jax.Array under `sharding`.

    `sharding` is a NamedSharding, or a Mesh combined with `spec`
    (default: batch dim over the "data" axis). Each process passes
    its LOCAL slice of the global batch; the result is one global
    array data-sharded across all hosts' devices. With one process
    this is exactly a sharded device_put. This is the production
    placement path — DeviceLoader routes through it whenever
    process_count > 1.
    """
    if isinstance(sharding, Mesh):
        sharding = NamedSharding(
            sharding, spec if spec is not None
            else PartitionSpec("data"))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, batch)
