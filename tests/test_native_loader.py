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
