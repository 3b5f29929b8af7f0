"""Continuous-batching serving on the real TPU worker under load.

TPU TODO item 5 (NOTES_NEXT_ROUND.md): one TPU-pinned worker running
the CONTINUOUS engine (--continuous-slots) behind the full ZMQ
ventilator/sink stack, driven by a pipelined client at production
request shapes, vs the plain per-job worker on the SAME workload.

Workload: N single-request jobs (B=1, article 512x1024, image
49x2048) with heterogeneous per-request length caps drawn uniform
from [lo, hi] (seeded). The plain worker cannot honor per-request
caps, so it decodes every job to the compiled max_len = hi with
early_exit (random weights never emit eos -> full hi steps): exactly
the fixed-batch cost model the slot engine exists to beat. The
continuous worker frees each slot at its request's own cap and
refills from the queue mid-flight.

Run: python benchmarks/serving_continuous_bench.py \
        [--n 64] [--slots 16] [--inner 8] [--lo 8] [--hi 96] \
        [--window 64] [--skip-plain] [--beam 0]
Prints one JSON line per measurement.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))


def make_job(seed: int, max_len: int | None = None,
             tiny: bool = False):
    rng = np.random.default_rng(seed)
    if tiny:   # default_model_builder shapes (CPU smoke)
        job = {
            "image": rng.standard_normal((1, 4, 16)).astype(
                np.float32),
            "image_mask": np.zeros((1, 4), bool),
            "article": rng.standard_normal((1, 6, 24)).astype(
                np.float32),
            "article_mask": np.zeros((1, 6), bool),
        }
    else:
        job = {
            "image": rng.standard_normal((1, 49, 2048)).astype(
                np.float16),
            "image_mask": np.zeros((1, 49), bool),
            "article": rng.standard_normal((1, 512, 1024)).astype(
                np.float16),
            "article_mask": np.zeros((1, 512), bool),
        }
    if max_len is not None:
        job["max_len"] = np.array([max_len], np.int32)
    return job


def drive(server, jobs, window, n, tag):
    from news_image_caption_tpu.serving.client import CaptioningClient
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr,
                              timeout_ms=2_400_000)
    try:
        # First job alone: absorbs worker startup + compile so the
        # measured loop sees only queue + decode (serving_tpu_bench
        # pattern).
        t = time.perf_counter()
        client.caption(next(jobs))
        print(f"[{tag}] first job (startup+compile): "
              f"{time.perf_counter() - t:.1f}s", flush=True)
        t0 = time.perf_counter()
        lats = []
        t_prev = t0
        for _ in client.caption_stream(jobs, window=window):
            t_now = time.perf_counter()
            lats.append(t_now - t_prev)
            t_prev = t_now
        el = time.perf_counter() - t0
        row = {
            "mode": tag, "n_jobs": n, "wall_s": round(el, 2),
            "captions_per_s": round(n / el, 2) if el > 0 else None,
        }
        if lats:   # --n 1 streams nothing after the warmup job
            lats_ms = np.array(lats) * 1e3
            row["gap_ms_p50"] = round(
                float(np.percentile(lats_ms, 50)), 1)
            row["gap_ms_p99"] = round(
                float(np.percentile(lats_ms, 99)), 1)
        print(json.dumps(row), flush=True)
        return row
    finally:
        client.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--lag", type=int, default=1,
                    help="harvest_lag for the continuous worker")
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=96)
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--skip-plain", action="store_true")
    ap.add_argument("--beam", action="store_true",
                    help="continuous EXACT beam engine instead of "
                         "greedy slots (width = GenerationConfig "
                         "default beam_size=5)")
    ap.add_argument("--tiny", action="store_true",
                    help="toy model on CPU (harness smoke)")
    args = ap.parse_args()

    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.worker import (
        CaptioningWorker, default_model_builder, flagship_model_builder)

    caps = np.random.default_rng(7).integers(
        args.lo, args.hi + 1, size=args.n + 1)
    worker_kw = {"platform": "cpu"} if args.tiny else {}

    def make_server(**bkw):
        if args.tiny:
            bkw.pop("max_len", None)
            bkw.pop("batch_size", None)
            builder = functools.partial(default_model_builder, **bkw)
        else:
            builder = functools.partial(flagship_model_builder, **bkw)
        return CaptionServer(
            worker_factory=lambda **kw: CaptioningWorker(
                model_builder=builder, **worker_kw, **kw),
            num_workers=1).start()

    if not args.skip_plain and not args.beam:
        server = make_server(max_len=args.hi, batch_size=1)
        try:
            jobs = (make_job(i, tiny=args.tiny)
                    for i in range(args.n + 1))
            drive(server, jobs, args.window, args.n,
                  f"plain-B1-maxlen{args.hi}")
        finally:
            server.stop()

    server = make_server(max_len=args.hi,
                         continuous_slots=args.slots,
                         inner_steps=args.inner,
                         harvest_lag=args.lag,
                         continuous_beam=args.beam)
    try:
        jobs = (make_job(i, max_len=int(caps[i]), tiny=args.tiny)
                for i in range(args.n + 1))
        tag = ("continuous-beam5" if args.beam
               else f"continuous-slots{args.slots}-inner{args.inner}"
                    f"-lag{args.lag}")
        drive(server, jobs, args.window, args.n,
              f"{tag}-caps[{args.lo},{args.hi}]")
    finally:
        server.stop()


if __name__ == "__main__":
    main()
