"""Native C++ shard reader: build, round-trip, shuffle, multi-shard."""

import numpy as np
import pytest

from news_image_caption_tpu.data.native_loader import (NativeShardLoader,
                                                       write_shard)


def make_arrays(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "caption_ids": rng.integers(0, 100, (n, 8)).astype(np.int32),
        "image": rng.standard_normal((n, 4, 6)).astype(np.float32),
    }


def test_roundtrip_ordered(tmp_path):
    arrays = make_arrays(10)
    path = str(tmp_path / "a.nics")
    write_shard(path, arrays)
    loader = NativeShardLoader([path], batch_size=5, drop_last=True)
    assert len(loader) == 10
    batches = list(loader.epoch(shuffle=False))
    assert len(batches) == 2
    got_cap = np.concatenate([b["caption_ids"] for b in batches])
    got_img = np.concatenate([b["image"] for b in batches])
    np.testing.assert_array_equal(got_cap, arrays["caption_ids"])
    np.testing.assert_allclose(got_img, arrays["image"])
    loader.close()


def test_stale_generator_does_not_stop_new_epoch(tmp_path):
    """An abandoned epoch iterator's GC finalization must not stop
    the CURRENTLY running epoch (epoch-generation token), and
    post-close finalization must not touch the freed handle."""
    import gc

    arrays = make_arrays(12)
    path = str(tmp_path / "s.nics")
    write_shard(path, arrays)
    loader = NativeShardLoader([path], batch_size=4)
    it1 = loader.epoch(shuffle=False)
    next(it1)                      # epoch 1 live
    it2 = loader.epoch(shuffle=False)   # supersedes epoch 1
    first = next(it2)
    del it1
    gc.collect()                   # stale finalizer runs shard_stop?
    rest = list(it2)               # must still deliver the full epoch
    got = np.concatenate([first["caption_ids"]]
                         + [b["caption_ids"] for b in rest])
    np.testing.assert_array_equal(got, arrays["caption_ids"])
    # close() with a live iterator, then GC: no segfault/null deref.
    it3 = loader.epoch(shuffle=False)
    next(it3)
    loader.close()
    del it3
    gc.collect()
    with pytest.raises(ValueError):
        len(loader)


def test_corrupt_header_overflow_rejected(tmp_path):
    """A header whose n*record_bytes wraps uint64 must be rejected,
    not accepted with a bogus record count (OOB reads)."""
    import json
    import struct

    arrays = make_arrays(4)
    path = str(tmp_path / "o.nics")
    write_shard(path, arrays)
    with open(path + ".schema") as f:
        rb = json.load(f)["record_bytes"]
    with open(path, "r+b") as f:
        f.seek(8)
        # n = 2^64 / rb rounded so n*rb wraps to a tiny value
        f.write(struct.pack("<Q", (2 ** 64 // rb) + 1))
    with pytest.raises(OSError):
        NativeShardLoader([path], batch_size=2)


def test_shuffle_deterministic_and_complete(tmp_path):
    arrays = make_arrays(16)
    path = str(tmp_path / "b.nics")
    write_shard(path, arrays)
    loader = NativeShardLoader([path], batch_size=4)
    e1 = np.concatenate([b["caption_ids"]
                         for b in loader.epoch(shuffle=True, seed=7)])
    e2 = np.concatenate([b["caption_ids"]
                         for b in loader.epoch(shuffle=True, seed=7)])
    e3 = np.concatenate([b["caption_ids"]
                         for b in loader.epoch(shuffle=True, seed=8)])
    np.testing.assert_array_equal(e1, e2)          # same seed = same order
    assert not np.array_equal(e1, e3)              # different seed differs
    # all records present exactly once
    key = lambda a: sorted(map(tuple, a.tolist()))
    assert key(e1) == key(arrays["caption_ids"])
    loader.close()


def test_multi_shard(tmp_path):
    a1, a2 = make_arrays(6, seed=1), make_arrays(6, seed=2)
    p1, p2 = str(tmp_path / "s1.nics"), str(tmp_path / "s2.nics")
    write_shard(p1, a1)
    write_shard(p2, a2)
    loader = NativeShardLoader([p1, p2], batch_size=3)
    total = sum(b["caption_ids"].shape[0]
                for b in loader.epoch(shuffle=True))
    assert total == 12
    loader.close()


def test_drop_last_false(tmp_path):
    arrays = make_arrays(7)
    path = str(tmp_path / "c.nics")
    write_shard(path, arrays)
    loader = NativeShardLoader([path], batch_size=4, drop_last=False)
    sizes = [b["caption_ids"].shape[0]
             for b in loader.epoch(shuffle=False)]
    assert sorted(sizes) == [3, 4]
    loader.close()


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "bad.nics")
    with open(path, "wb") as f:
        f.write(b"\x00" * 64)
    with open(path + ".schema", "w") as f:
        f.write('{"record_bytes": 8, "fields": []}')
    with pytest.raises(OSError):
        NativeShardLoader([path], batch_size=2)


def test_shard_open_rejects_corrupt_files(tmp_path):
    """Failure paths must not leak: bad magic, truncated header, and
    short payload all return null (and valgrind-clean cleanup)."""
    import struct

    from news_image_caption_tpu.data.native_loader import (MAGIC,
                                                           get_lib)
    import ctypes

    lib = get_lib()

    def try_open(paths):
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        return lib.shard_open(arr, len(paths))

    bad_magic = tmp_path / "bad_magic.nics"
    bad_magic.write_bytes(struct.pack("<QQQ", 0xdead, 1, 8) + b"x" * 8)
    assert not try_open([str(bad_magic)])

    truncated = tmp_path / "trunc.nics"
    truncated.write_bytes(b"\x00" * 10)
    assert not try_open([str(truncated)])

    short_payload = tmp_path / "short.nics"
    short_payload.write_bytes(struct.pack("<QQQ", MAGIC, 4, 8) + b"x" * 8)
    assert not try_open([str(short_payload)])

    # A good shard + a bad shard -> fail (good one's fd/mmap released).
    good = tmp_path / "good.nics"
    good.write_bytes(struct.pack("<QQQ", MAGIC, 1, 8) + b"y" * 8)
    assert not try_open([str(good), str(bad_magic)])
    # The good shard alone still opens.
    h = try_open([str(good)])
    assert h
    assert lib.shard_num_records(ctypes.c_void_p(h)) == 1
    lib.shard_close(ctypes.c_void_p(h))


def test_resume_mid_epoch_deterministic_over_shards(tmp_path):
    """VERDICT r02 item 5: FixedStepsLoader over the C++ shard reader
    resumes mid-STREAM deterministically — epoch E of a fresh loader
    yields byte-identical batches to continuous iteration, across the
    shard-epoch boundary (seed rollover included)."""
    from news_image_caption_tpu.data.loader import FixedStepsLoader

    rng = np.random.RandomState(3)
    paths = []
    for s in range(2):
        p = str(tmp_path / f"t-{s}.nics")
        write_shard(p, {
            "x": rng.randint(0, 1000, size=(20, 3)).astype(np.int32)})
        paths.append(p)
    loader = NativeShardLoader(paths, batch_size=4)
    per_seed = 40 // 4

    def make_batches(seed):
        return loader.epoch(shuffle=True, seed=seed)

    steps = 7        # not a divisor of per_seed -> epochs straddle
    fsl = FixedStepsLoader(make_batches, steps_per_epoch=steps,
                           batches_per_seed=per_seed)
    continuous = []
    for e in range(4):
        continuous.extend(np.copy(b["x"]) for b in fsl.epoch(e))
    # fresh loader resuming straight at epoch 2 (mid seed-0 stream)
    loader2 = NativeShardLoader(paths, batch_size=4)
    fsl2 = FixedStepsLoader(lambda seed: loader2.epoch(shuffle=True,
                                                       seed=seed),
                            steps_per_epoch=steps,
                            batches_per_seed=per_seed)
    resumed = [np.copy(b["x"]) for b in fsl2.epoch(2)]
    for a, b in zip(continuous[2 * steps:3 * steps], resumed):
        np.testing.assert_array_equal(a, b)
    loader.close()
    loader2.close()


def test_soa_matches_aos_delivery(tmp_path):
    """SoA (deinterleaved zero-copy) delivery yields byte-identical
    batches to the AoS (copied) path, including the partial batch."""
    arrays = make_arrays(11, seed=3)
    path = str(tmp_path / "soa.nics")
    write_shard(path, arrays)
    soa = NativeShardLoader([path], batch_size=4, drop_last=False,
                            soa=True)
    aos = NativeShardLoader([path], batch_size=4, drop_last=False,
                            soa=False)
    got_soa = [{k: v.copy() for k, v in b.items()}
               for b in soa.epoch(shuffle=True, seed=5)]
    got_aos = list(aos.epoch(shuffle=True, seed=5))
    assert len(got_soa) == len(got_aos) == 3
    for bs, ba in zip(got_soa, got_aos):
        for k in ba:
            np.testing.assert_array_equal(bs[k], ba[k])
    soa.close()
    aos.close()


def test_soa_pool_keeps_last_pool_size_batches_valid(tmp_path):
    """The zero-copy contract: a yielded batch stays intact until
    pool_size further batches are drawn."""
    arrays = make_arrays(32, seed=4)
    path = str(tmp_path / "pool.nics")
    write_shard(path, arrays)
    loader = NativeShardLoader([path], batch_size=4, soa=True,
                               pool_size=2)
    ref = list(NativeShardLoader([path], batch_size=4, soa=False)
               .epoch(shuffle=False))
    held = []
    for i, b in enumerate(loader.epoch(shuffle=False)):
        held.append((i, b))
        if len(held) > 2:
            held.pop(0)
        # every held batch (within pool_size) still matches
        for j, hb in held:
            np.testing.assert_array_equal(hb["caption_ids"],
                                          ref[j]["caption_ids"])
    loader.close()


def test_nics_dataset_promotes_f16_to_bf16(tmp_path):
    """float16 is a DISK format only: NicsShardDataset must deliver
    bfloat16 to the model (Mosaic has no f16, and the compute-dtype-
    follows-input linears would propagate f16 into every TPU kernel —
    the r4 e2e flagship run died exactly this way)."""
    import ml_dtypes

    from news_image_caption_tpu.data.dataset import NicsShardDataset

    rng = np.random.default_rng(7)
    n = 8
    write_shard(str(tmp_path / "h-000.nics"), {
        "caption_ids": rng.integers(0, 50, (n, 6)).astype(np.int32),
        "image": rng.standard_normal((n, 3, 4)).astype(np.float16),
        "article": rng.standard_normal((n, 5, 4)).astype(np.float16),
        "article_mask": (rng.random((n, 5)) > 0.5).astype(np.uint8),
    })
    ds = NicsShardDataset(pattern=str(tmp_path / "h-*.nics"))
    batch = next(ds.batches(4, shuffle=False))
    assert batch["image"].dtype == ml_dtypes.bfloat16
    assert batch["article"].dtype == ml_dtypes.bfloat16
    assert batch["article_mask"].dtype == np.bool_
    assert batch["caption_ids"].dtype == np.int32
    # values survive the promotion (f16 -> bf16 rounds the mantissa)
    raw = next(NativeShardLoader([str(tmp_path / "h-000.nics")],
                                 batch_size=4).epoch(shuffle=False))
    np.testing.assert_allclose(batch["image"].astype(np.float32),
                               raw["image"].astype(np.float32),
                               rtol=2**-7)
    ds.close()
