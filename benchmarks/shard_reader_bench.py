"""C++ NICS shard reader throughput (mmap + prefetch ring + ctypes).

Writes a synthetic multi-shard dataset, then measures cold and warm
sequential batch-read throughput through NativeShardLoader.

Run: python benchmarks/shard_reader_bench.py [TOTAL_MB]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from news_image_caption_tpu.data.native_loader import (  # noqa: E402
    NativeShardLoader, write_shard)

TOTAL_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def main():
    feat_elems = 16384                 # 64 KiB fp32 per record
    record_bytes = feat_elems * 4
    n_records = TOTAL_MB * 1024 * 1024 // record_bytes
    per_shard = max(1, n_records // 8)
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        base = rng.standard_normal((64, feat_elems)).astype(np.float32)
        paths = []
        written = 0
        for s in range(8):
            n = min(per_shard, n_records - written)
            if n <= 0:
                break
            feats = np.tile(base, (n // 64 + 1, 1))[:n]
            p = os.path.join(d, f"shard_{s}.nics")
            write_shard(p, {"feat": feats})
            paths.append(p)
            written += n
        total_bytes = written * record_bytes
        for label in ("cold", "warm"):
            loader = NativeShardLoader(paths, batch_size=256,
                                       n_threads=2, drop_last=False)
            t0 = time.perf_counter()
            seen = 0
            for batch in loader.epoch(shuffle=False):
                seen += batch["feat"].shape[0]
            dt = time.perf_counter() - t0
            print(f"{label}: {seen} records, "
                  f"{total_bytes / dt / 1e9:.2f} GB/s "
                  f"({dt * 1e3:.0f} ms)", flush=True)
            loader.close()


if __name__ == "__main__":
    main()
