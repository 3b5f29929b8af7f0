"""Serving-stack latency/throughput under load.

Spins up the ZMQ ventilator + N CaptioningWorkers (tiny toy model so
the numbers measure the SERVING substrate: pack/unpack, socket hops,
scheduling) and drives a closed-loop client, reporting per-request
latency percentiles and aggregate jobs/sec.

Run: python benchmarks/serving_bench.py [N_WORKERS] [N_JOBS]
"""

import sys
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

N_WORKERS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
N_JOBS = int(sys.argv[2]) if len(sys.argv) > 2 else 60


def make_job(B=1, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.standard_normal((B, 4, 16)).astype(np.float32),
        "image_mask": np.zeros((B, 4), bool),
        "article": rng.standard_normal((B, 6, 24)).astype(np.float32),
        "article_mask": np.zeros((B, 6), bool),
    }


def main():
    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.client import CaptioningClient
    from news_image_caption_tpu.serving.worker import CaptioningWorker

    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(platform="cpu",
                                                     **kw),
        num_workers=N_WORKERS).start()
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr,
                              timeout_ms=120000)
    try:
        client.caption(make_job())          # warm (compile in worker)
        lats = []
        t0 = time.perf_counter()
        for i in range(N_JOBS):
            t = time.perf_counter()
            client.caption(make_job(seed=i))
            lats.append(time.perf_counter() - t)
        wall = time.perf_counter() - t0
        lats_ms = np.sort(np.array(lats) * 1e3)
        print(f"workers={N_WORKERS} jobs={N_JOBS} closed-loop: "
              f"{N_JOBS / wall:.1f} jobs/s | latency ms "
              f"p50={lats_ms[int(0.5 * N_JOBS)]:.1f} "
              f"p90={lats_ms[int(0.9 * N_JOBS)]:.1f} "
              f"p99={lats_ms[min(N_JOBS - 1, int(0.99 * N_JOBS))]:.1f}",
              flush=True)
    finally:
        client.close()
        server.stop()


if __name__ == "__main__":
    main()
