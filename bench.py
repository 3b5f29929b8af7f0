"""Benchmark harness: flagship captions/sec at beam=5 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference stack is CPU/GPU PyTorch with a per-step
Python decode loop and no KV reuse; BASELINE.md records the measured
torch-CPU captions/sec for the same flagship architecture
(benchmarks/reference_torch.py). vs_baseline = value / baseline.

Production decode runs in bf16 (weights + activations + attention
score intermediates, matching the reference's AMP decode; softmaxes
stay fp32 internally). Batch 128 is the measured v5e throughput sweet
spot after the bf16-scores fix (B=64: 207, B=128: 228, B=192+: 207 —
BASELINE.md).

Second (production-decode) metric: when the span-structured e2e run's
trained checkpoint is on disk (benchmarks/e2e_flagship_run.py --span),
the same JSON line also carries greedy-scan and speculative-greedy
captions/s on that TRAINED model at news-like verbatim-span caption
structure — the rate the production serving path (2-gram article
drafts, exact verify) actually achieves, vs the exact beam-5 headline
which is HBM-roofline-bound (BASELINE.md "span-structure acceptance
curve"). The extras are best-effort: the headline never depends on
them.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Measured with benchmarks/reference_torch.py on this machine's CPU
# (see BASELINE.md). Updated whenever the baseline script reruns.
REFERENCE_CPU_CAPTIONS_PER_SEC = 0.068  # greedy, batch 16, 2026-08-16

BATCH = 128
MAX_LEN = 100
BEAM = 5


def _cast_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, tree)


def _wait_for_device(max_wait_s: float = 1800.0,
                     probe_timeout_s: float = 360.0) -> bool:
    """The axon tunnel goes down for stretches (hours observed); a
    probe op in a watchdogged subprocess tells us whether the chip is
    reachable without hanging the whole bench. Retries up to
    max_wait_s, returns False if the device never comes up."""
    import subprocess
    import sys
    code = ("import jax, numpy as np; "
            "print(float(np.asarray(jax.numpy.ones((8,8)).sum())))")
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                timeout=probe_timeout_s)
            if out.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"# device probe {attempt} failed; retrying "
              f"({int(deadline - time.time())}s left)", flush=True)
        time.sleep(min(240.0, max(deadline - time.time(), 1.0)))


def _load_span_artifacts():
    """Production-decode extras (VERDICT r4 item 6): if this round's
    span-structured e2e run left its trained checkpoint + test shards
    on disk (benchmarks/e2e_flagship_run.py --span), load them so the
    headline line can also report what the PRODUCTION decode path
    (speculative greedy, 2-gram article drafts) achieves on a trained
    model at news-like verbatim-span structure. Returns
    (params, batch, draft_source) or None — the exact-decode headline
    never depends on these artifacts existing."""
    import glob
    import os
    ckpt = "/tmp/nic_e2e_span/flagship_trained.npz"
    shards = sorted(glob.glob("/tmp/nic_e2e_span/shards/test-*.nics"))
    cfg_path = "/tmp/nic_e2e_span/flagship_e2e.yaml"
    if not (os.path.exists(ckpt) and shards
            and os.path.exists(cfg_path)):
        return None
    from news_image_caption_tpu.data.native_loader import \
        NativeShardLoader
    flat = np.load(ckpt)
    params = {}
    for k in flat.files:
        node = params
        *path, leaf = k.split("/")
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = jnp.asarray(flat[k])
    loader = NativeShardLoader(shards[:1], batch_size=SPEC_BATCH,
                               n_threads=1, soa=False)
    raw = next(loader.epoch(shuffle=False))
    batch = {
        "caption_ids": jnp.asarray(raw["caption_ids"]),
        "image": jnp.asarray(raw["image"].astype(np.float32)),
        "image_mask": jnp.asarray(raw["image_mask"].astype(bool)),
        "article": jnp.asarray(raw["article"].astype(np.float32)),
        "article_mask": jnp.asarray(raw["article_mask"].astype(bool)),
    }
    src = jnp.asarray(raw["article_ids"])
    loader.close()
    return _cast_bf16(params), _cast_bf16(batch), src


SPEC_BATCH = 64
SPEC_MAX_LEN = 60
SPEC_K = 4      # dominates at news-like span structure (BASELINE.md)


def _production_decode_extras(ge, GenerationConfig):
    """Measure greedy-scan and speculative-greedy captions/s on the
    trained span checkpoint. Speculative greedy is token-identical to
    greedy on peaked models (tested + measured in BASELINE.md); its
    rate is what a production server actually serves."""
    art = _load_span_artifacts()
    if art is None:
        return {}
    params, batch, src = art
    model = ge._flagship(dtype=jnp.bfloat16)
    cfg = GenerationConfig(max_len=SPEC_MAX_LEN, sampling_topk=1)
    gen = jax.jit(lambda p, b: model.generate(p, b, cfg))
    spec = jax.jit(lambda p, b, s: model.generate_speculative(
        p, b, cfg, spec_k=SPEC_K, draft_source=s))
    out = gen(params, batch)
    np.asarray(out[0])
    sout = spec(params, batch, src)
    np.asarray(sout[0])
    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        out = gen(params, batch)
    np.asarray(out[0])
    dt_g = (time.perf_counter() - t0) / steps
    t0 = time.perf_counter()
    for _ in range(steps):
        sout = spec(params, batch, src)
    np.asarray(sout[0])
    dt_s = (time.perf_counter() - t0) / steps
    return {
        "trained_greedy_captions_per_sec": round(SPEC_BATCH / dt_g, 1),
        "production_spec_greedy_captions_per_sec":
            round(SPEC_BATCH / dt_s, 1),
        "spec_speedup_vs_greedy": round(dt_g / dt_s, 2),
    }


def main():
    import __graft_entry__ as ge
    from news_image_caption_tpu.generation.generator import GenerationConfig

    model = ge._flagship(dtype=jnp.bfloat16)
    init_batch = ge._batch(B=2, T=32, P=49, S=512, image_dim=2048,
                           article_dim=1024, vocab=50265)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch)
    params = _cast_bf16(params)
    cfg = GenerationConfig(max_len=MAX_LEN, beam_size=BEAM,
                           sampling_topk=1)

    gen = jax.jit(lambda p, b: model.generate_beam(p, b, cfg))
    # Warmup / compile. NOTE: on the axon tunnel backend
    # block_until_ready can return before execution completes until a
    # host fetch has happened — always fetch to host for timing.
    warm = _cast_bf16(ge._batch(B=BATCH, T=32, P=49, S=512,
                                image_dim=2048, article_dim=1024,
                                vocab=50265))
    toks, scores = gen(params, warm)
    np.asarray(toks)

    # Pre-place the feature batches on device: production decode
    # consumes encoder outputs that already live in HBM (ResNet +
    # RoBERTa run on-chip), so host->device transfer of the ~134 MB
    # feature tensors is not part of the decode rate being measured.
    n_iters = 20
    batches = [jax.device_put(_cast_bf16(
        ge._batch(B=BATCH, T=32, P=49, S=512,
                  image_dim=2048, article_dim=1024,
                  vocab=50265, key=i + 1)))
               for i in range(5)]
    for b in batches:
        # axon's block_until_ready can return early; a (tiny) host
        # fetch is the reliable completion barrier on this backend.
        jax.tree.map(lambda x: np.asarray(x[(0,) * x.ndim]), b)
    # Steady-state throughput: dispatch all iterations and fetch once
    # at the end. Per-iteration host fetches would serialize dispatch
    # across the tunnel (one RTT bubble per batch) — production
    # serving streams batches without a host sync between them.
    # Device execution is in-order, so fetching the LAST output is a
    # completion barrier for every prior iteration.
    t0 = time.perf_counter()
    for i in range(n_iters):
        toks, scores = gen(params, batches[i % len(batches)])
    np.asarray(toks)  # host fetch forces completion of the stream
    dt = time.perf_counter() - t0
    captions_per_sec = BATCH * n_iters / dt

    vs = (captions_per_sec / REFERENCE_CPU_CAPTIONS_PER_SEC
          if REFERENCE_CPU_CAPTIONS_PER_SEC else None)
    rec = {
        "metric": "captions_per_sec_beam5",
        "value": round(captions_per_sec, 3),
        "unit": "captions/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    try:
        rec.update(_production_decode_extras(ge, GenerationConfig))
    except Exception as e:  # extras must never sink the headline
        rec["production_decode_note"] = f"extras skipped: {e}"
    print(json.dumps(rec))


if __name__ == "__main__":
    if not _wait_for_device():
        print(json.dumps({
            "metric": "captions_per_sec_beam5",
            "value": 0.0, "unit": "captions/s",
            "vs_baseline": 0.0,
            "error": "tpu device unreachable after 30 min of probes "
                     "(axon tunnel down); see BASELINE.md / "
                     "BENCH_r02.json for the last measured value "
                     "(252.5 captions/s exact beam-5)"}))
        raise SystemExit(0)
    main()
