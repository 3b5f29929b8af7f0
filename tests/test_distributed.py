"""Multi-host bootstrap helpers (parallel/distributed.py): sharding
arithmetic, single-process degradation, global batch assembly on the
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from news_image_caption_tpu.parallel.distributed import (
    device_put_global, initialize, shard_iterator)


def test_initialize_single_process_is_noop():
    initialize()          # no cluster spec, one process: no-op
    initialize()          # idempotent
    assert jax.process_count() == 1


def test_shard_iterator_round_robin_equal_counts():
    """Disjoint round-robin cover with the ragged tail DROPPED —
    unequal per-host batch counts would desynchronize the global
    train steps and hang multi-host collectives."""
    batches = list(range(10))
    shards = [list(shard_iterator(iter(batches), index=i, count=3))
              for i in range(3)]
    assert shards[0] == [0, 3, 6]
    assert shards[1] == [1, 4, 7]
    assert shards[2] == [2, 5, 8]          # 9 is the dropped tail
    assert len({len(s) for s in shards}) == 1
    # count=1 (single process) keeps everything including the tail
    assert list(shard_iterator(iter(batches), index=0,
                               count=1)) == batches
    # default index/count come from the runtime (single process here)
    assert list(shard_iterator(iter(batches))) == batches


def test_initialize_explicit_bad_spec_raises():
    """An explicit cluster spec that cannot be joined is a real error
    (only the no-spec auto-detect path degrades to single-process)."""
    import news_image_caption_tpu.parallel.distributed as dist

    old = dist._initialized
    dist._initialized = False
    try:
        with np.testing.assert_raises(Exception):
            initialize(coordinator_address="127.0.0.1:1",
                       num_processes=2, process_id=0,
                       initialization_timeout=1)
    finally:
        dist._initialized = old


def test_device_put_global_single_process_matches_device_put():
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    batch = {"x": np.arange(32.0).reshape(8, 4),
             "ids": np.arange(16, dtype=np.int32).reshape(8, 2)}
    out = device_put_global(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
        assert out[k].sharding.spec == P("data")
        assert len(out[k].sharding.device_set) == 8
    # Sharded compute consumes it directly.
    s = jax.jit(lambda b: jnp.sum(b["x"]))(out)
    assert float(s) == float(batch["x"].sum())


def test_device_loader_with_global_sharding():
    """DeviceLoader(sharding=NamedSharding) places batches sharded;
    the multi-host branch (make_array_from_process_local_data) is the
    same call single-process."""
    from news_image_caption_tpu.data.loader import DeviceLoader

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    batches = [{"x": np.full((8, 2), float(i))} for i in range(3)]
    got = list(DeviceLoader(iter(batches), sharding=sharding))
    assert len(got) == 3
    for i, b in enumerate(got):
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      batches[i]["x"])
        assert len(b["x"].sharding.device_set) == 8
