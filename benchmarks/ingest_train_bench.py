"""Close the ingestion loop: feed the REAL flagship train step from
the C++ shard reader + DeviceLoader and measure input-wait fraction.

The reference's design bends around input starvation (joblib/HDF5,
/root/reference/dataloader.py:279-296). Here the path is:
  NativeShardLoader (mmap C++ reader, double-buffered)
    -> per-batch numpy views -> DeviceLoader (background thread,
       jax.device_put prefetch) -> donated jitted train step.

Flagship record = caption_ids[64]i32 + image[49,2048]f16 +
article[512,1024]f16 + article_mask[512]u8 ≈ 1.25 MB; at B=64 the
step consumes ~80 MB/batch, so sustaining the ~889 samples/s
synthetic-step rate needs ~1.1 GB/s of ingest (f16 on disk, cast to
bf16 on device — the training compute dtype; the measured reader rate
is 2.9-3.4 GB/s).

Run: python benchmarks/ingest_train_bench.py [STEPS] [BATCH]
Writes shards under /tmp/nic_ingest (reused if present).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.data.loader import DeviceLoader  # noqa: E402
from news_image_caption_tpu.data.native_loader import (  # noqa: E402
    NativeShardLoader, write_shard)
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    TrainState, make_train_step)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64
T, P, S = 64, 49, 512
IMAGE_DIM, ARTICLE_DIM, VOCAB = 2048, 1024, 50265
SHARD_DIR = "/tmp/nic_ingest"
RECORDS_PER_SHARD = 256
N_SHARDS = 6


def build_shards():
    os.makedirs(SHARD_DIR, exist_ok=True)
    paths = [os.path.join(SHARD_DIR, f"train-{i:03d}.nics")
             for i in range(N_SHARDS)]
    if all(os.path.exists(p) for p in paths):
        return paths
    rng = np.random.RandomState(0)
    for p in paths:
        n = RECORDS_PER_SHARD
        caption = rng.randint(2, VOCAB, size=(n, T)).astype(np.int32)
        caption[:, 0] = 0
        write_shard(p, {
            "caption_ids": caption,
            "image": rng.randn(n, P, IMAGE_DIM).astype(np.float16),
            "article": rng.randn(n, S, ARTICLE_DIM).astype(np.float16),
            "article_mask": (rng.rand(n, S) > 0.9).astype(np.uint8),
        })
        print("wrote", p)
    return paths


def batches(paths, epochs):
    loader = NativeShardLoader(paths, batch_size=BATCH)
    for ep in range(epochs):
        for b in loader.epoch(shuffle=True, seed=ep):
            yield {
                "caption_ids": b["caption_ids"],
                "image": b["image"],
                "article": b["article"],
                "article_mask": b["article_mask"].astype(bool),
            }


def main():
    paths = build_shards()
    model = ge._flagship(dtype=jnp.bfloat16)
    tx = make_bert_adam(lr=1e-4, t_total=437600, warmup=0.05)

    def loss_fn(p, b, rng):
        return model.loss_fn(p, b, dropout_rng=rng)

    step = make_train_step(loss_fn, tx, donate=True,
                           compute_dtype=jnp.bfloat16)
    warm = next(batches(paths, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), warm)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    rng = jax.random.PRNGKey(1)
    state, m = step(state, warm, rng)
    np.asarray(m["loss"])                      # compile

    total_records = len(paths) * RECORDS_PER_SHARD
    epochs = (STEPS * BATCH) // total_records + 2
    it = iter(DeviceLoader(batches(paths, epochs), prefetch=4))
    n = 0
    wait = 0.0
    t0 = time.perf_counter()
    while n < STEPS:
        tw = time.perf_counter()
        batch = next(it)
        wait += time.perf_counter() - tw
        state, m = step(state, batch, rng)
        n += 1
        if n % 200 == 0:
            np.asarray(m["loss"])
            el = time.perf_counter() - t0
            print(f"step {n}: {n*BATCH/el:.1f} samples/s, "
                  f"input wait {100*wait/el:.2f}%")
    np.asarray(m["loss"])
    el = time.perf_counter() - t0
    print(f"FINAL steps={n} batch={BATCH}: {n*BATCH/el:.1f} samples/s "
          f"({el/n*1e3:.2f} ms/step), input-wait fraction "
          f"{100*wait/el:.2f}% (data: {n*BATCH*1.25/1024:.1f} GB read)")


if __name__ == "__main__":
    main()
