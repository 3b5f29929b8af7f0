"""Flagship serving latency on the real TPU worker under load.

VERDICT r02 item 4: one TPU-pinned CaptioningWorker hosting the
FLAGSHIP captioner (bf16, DecodeKV, early-exit greedy) behind the full
ZMQ ventilator/sink stack; a closed-loop client drives production
request shapes (article 512x1024 features, image 49x2048 patches) and
reports p50/p95/p99 latency + captions/s. Matches the reference's
serving topology (/root/reference/ttl/tell/tasks/captioner.py:79-144 +
server/base.py:30-382).

Run: python benchmarks/serving_tpu_bench.py [N_JOBS] [quantize_kv] [BATCH]
BATCH > 1 measures serving THROUGHPUT at a production request batch
(the worker pre-compiles that shape; clients pad to it — reference
analog: BasicIterator batching, tasks/captioner.py). The parent
process stays off the TPU (numpy + zmq only); the worker owns the
chip.
"""

import sys
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

N_JOBS = int(sys.argv[1]) if len(sys.argv) > 1 else 50
QUANT = len(sys.argv) > 2 and sys.argv[2] in ("1", "true", "quantize_kv")
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 1


def make_job(seed=0, B=1):
    # Feature payloads go over the wire as float16: the worker casts
    # to bf16 anyway (worker.py predict), so f32 frames would double
    # both the ZMQ bytes and the host->device transfer for zero
    # fidelity gain. The wire format preserves dtype (messages.py),
    # so this is purely a client-side choice.
    rng = np.random.default_rng(seed)
    return {
        "image": rng.standard_normal((B, 49, 2048)).astype(np.float16),
        "image_mask": np.zeros((B, 49), bool),
        "article": rng.standard_normal((B, 512, 1024)).astype(
            np.float16),
        "article_mask": np.zeros((B, 512), bool),
    }


def main():
    import functools

    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.client import CaptioningClient
    from news_image_caption_tpu.serving.worker import (
        CaptioningWorker, flagship_model_builder)

    builder = functools.partial(flagship_model_builder,
                                quantize_kv=QUANT, batch_size=BATCH)
    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(
            model_builder=builder, **kw),
        num_workers=1).start()
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr,
                              timeout_ms=900000)
    try:
        t = time.perf_counter()
        out = client.caption(make_job(B=BATCH))     # worker start + compile
        print(f"first job (startup+compile): "
              f"{time.perf_counter()-t:.1f}s, tokens shape "
              f"{out['tokens'].shape}")
        lats = []
        t0 = time.perf_counter()
        for i in range(N_JOBS):
            t = time.perf_counter()
            out = client.caption(make_job(seed=i, B=BATCH))
            lats.append(time.perf_counter() - t)
        el = time.perf_counter() - t0
        lats_ms = np.array(lats) * 1e3
        tag = "int8-KV" if QUANT else "exact"
        print(f"FLAGSHIP TPU serving ({tag}, closed loop, B={BATCH}): "
              f"p50 {np.percentile(lats_ms, 50):.1f} ms, "
              f"p95 {np.percentile(lats_ms, 95):.1f} ms, "
              f"p99 {np.percentile(lats_ms, 99):.1f} ms, "
              f"{N_JOBS*BATCH/el:.2f} captions/s")

        # Pipelined: window=3 keeps the worker's ingest thread staging
        # (unpack + host->device) job N+1 while job N decodes, so
        # throughput approaches max(transfer, decode), not their sum.
        jobs = (make_job(seed=i, B=BATCH) for i in range(N_JOBS))
        t0 = time.perf_counter()
        n_done = sum(1 for _ in client.caption_stream(jobs, window=3))
        el = time.perf_counter() - t0
        print(f"FLAGSHIP TPU serving ({tag}, PIPELINED w=3, "
              f"B={BATCH}): {n_done*BATCH/el:.2f} captions/s "
              f"({el/n_done*1e3:.1f} ms/job steady-state)")
    finally:
        client.close()
        server.stop()


if __name__ == "__main__":
    main()
