"""Composed production serving mode: continuous batching x speculative
decode (x sampling) on a TRAINED flagship (VERDICT r4 item 4).

The two headline serving features are advertised as composing
(generation/continuous.py:19-22: every slot can decode speculatively
from its own article ids) and their exactness is CPU-tested
(test_continuous.py::test_speculative_slots_are_exact_and_fewer_chunks)
— but r4 only measured them separately on the chip. This bench runs
the configuration a production server would actually run:

  1. overfit the flagship on ONE span-structured group at news-like
     verbatim-span structure (f=2/3, span=12 — the BASELINE.md
     span-curve row where the 2-gram drafter measured 1.35x), same
     recipe as spec_decode_spans.py;
  2. 64 single-row requests from the trained rows, heterogeneous
     per-request caps (uniform [lo, hi] — the continuous engine's win
     case), measured as:
       - plain batched greedy (early_exit, batch-max cap) baseline
       - continuous greedy spec_k=1      (r4's measured 1.40x config)
       - continuous greedy spec_k=4      (the COMPOSED mode)
       - continuous top-k sampling       (spec_k=1; sampling is
         incompatible with speculative by construction — drafts are
         verified against the greedy argmax)
     each with measured tunnel wall AND --project-local chunk device
     time (the engine pays one device->host flag fetch per chunk; on
     the axon tunnel that RTT is ~10-20x the chunk's device work —
     BASELINE.md "Continuous batching on the real chip").

Cross-engine exactness check on the chip: the spec_k=4 engine's
harvested tokens must be identical to the spec_k=1 engine's for every
request (speculative greedy is token-identical to greedy; both honor
the same per-request caps).

Run: python benchmarks/continuous_spec_bench.py [STEPS] [TRAIN_B]
Numbers land in BASELINE.md ("continuous + speculative composed").
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

# argv handled BEFORE the benchmarks imports: flash_train_bench /
# spec_decode_spans parse sys.argv at import time.
TINY = "--tiny" in sys.argv          # CPU smoke of the full flow
if TINY:
    sys.argv.remove("--tiny")
N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else (20 if TINY else 800)
TRAIN_B = int(sys.argv[2]) if len(sys.argv) > 2 else (8 if TINY else 128)
sys.argv = sys.argv[:1]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import __graft_entry__ as ge  # noqa: E402
from benchmarks.flash_train_bench import flagship  # noqa: E402
from benchmarks.spec_decode_spans import span_copy_captions  # noqa: E402
from news_image_caption_tpu.generation.continuous import \
    ContinuousBatcher  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    create_o2_train_state, create_train_state, make_train_step)
T, S, VOCAB = 64, 512, 50265
N_REQ, SLOTS, LO, HI, INNER = 64, 16, 8, 96, 8
if TINY:
    T, S, VOCAB = 16, 32, 64
    N_REQ, SLOTS, LO, HI, INNER = 8, 4, 4, 12, 4
MAX_LEN = HI


def _cast(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, t)


def main():
    # span_copy_captions reads its module's T/S/VOCAB globals; keep
    # them in sync (identical at real dims; patched for --tiny).
    import benchmarks.spec_decode_spans as sds
    sds.T, sds.S, sds.VOCAB = T, S, VOCAB

    rng = np.random.default_rng(7)
    articles = rng.integers(4, VOCAB, (TRAIN_B, S)).astype(np.int32)
    caps_tok, actual_f = span_copy_captions(
        articles, 2 / 3, 12 if not TINY else 4,
        np.random.default_rng(8))
    print(f"span group: actual copy fraction {actual_f:.3f}",
          flush=True)
    P, IMG, ART = (8, 16, 24) if TINY else (49, 2048, 1024)
    batch = ge._batch(B=TRAIN_B, T=T, P=P, S=S, image_dim=IMG,
                      article_dim=ART, vocab=VOCAB, key=0)
    batch["caption_ids"] = jnp.asarray(caps_tok)

    model = ge._flagship(tiny=True) if TINY else flagship(True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tx = make_bert_adam(lr=5e-5 if not TINY else 1e-3,
                        t_total=N_STEPS, warmup=0.05)
    if TINY:
        step = make_train_step(
            lambda p, b, r: model.loss_fn(p, b, r), tx, donate=True)
        state = create_train_state(params, tx)
    else:
        step = make_train_step(
            lambda p, b, r: model.loss_fn(p, b, r), tx, donate=True,
            compute_dtype=jnp.bfloat16, o2_master=True)
        state = create_o2_train_state(params, tx)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(N_STEPS):
        state, m = step(state, batch, key)
        if i % 200 == 199:
            print(f"step {i + 1}: loss "
                  f"{float(np.asarray(m['loss'])):.4f}", flush=True)
    print(f"trained {N_STEPS} steps in {time.perf_counter() - t0:.0f}s",
          flush=True)
    params = state.params if TINY else _cast(state.params)

    # ---- request stream: trained rows, heterogeneous caps
    caps = np.random.default_rng(3).integers(LO, HI + 1, size=N_REQ)
    rows = batch if TINY else _cast(batch)
    reqs, srcs = [], []
    for i in range(N_REQ):
        r = i % TRAIN_B
        reqs.append({k: rows[k][r:r + 1]
                     for k in ("image", "image_mask", "article",
                               "article_mask")})
        srcs.append(articles[r])
    print(json.dumps({"mode": "setup", "n": N_REQ, "slots": SLOTS,
                      "caps_mean": float(caps.mean()),
                      "caps_max": int(caps.max())}), flush=True)

    # ---- plain batched greedy baseline (early_exit, batch-max cap)
    cfgb = GenerationConfig(max_len=MAX_LEN, sampling_topk=1,
                            early_exit=True)
    gen = jax.jit(lambda p, b: model.generate(p, b, cfgb)[0])

    def run_batched():
        outs = []
        for i in range(0, N_REQ, SLOTS):
            group = reqs[i:i + SLOTS]
            big = {k: jnp.concatenate([g[k] for g in group])
                   for k in group[0]}
            outs.append(gen(params, big))
        return np.asarray(outs[-1])

    run_batched()
    t0 = time.perf_counter()
    run_batched()
    dt_b = time.perf_counter() - t0
    print(json.dumps({"mode": "batch_greedy",
                      "seconds": round(dt_b, 3),
                      "captions_per_s": round(N_REQ / dt_b, 1)}),
          flush=True)

    def drive(eng, label, sampling=False, extra=None):
        """Warm, run the stream, report wall + projected-local."""
        eng.submit(reqs[0], source_row=srcs[0], max_len=max(2, LO))
        eng.run()
        eng.n_chunks = eng.n_committed = eng.n_slot_steps = 0
        t0 = time.perf_counter()
        rids = [eng.submit(r, source_row=srcs[i],
                           max_len=int(caps[i]))
                for i, r in enumerate(reqs)]
        raw = eng.run()
        dt = time.perf_counter() - t0
        assert len(raw) == N_REQ
        results = [raw[rid] for rid in rids]
        rec = {"mode": label, "inner_steps": INNER,
               "seconds": round(dt, 3),
               "captions_per_s": round(N_REQ / dt, 1),
               "chunks": eng.n_chunks,
               "occupancy": round(eng.occupancy, 3),
               "speedup_vs_batch": round(dt_b / dt, 2)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        # projected local: stream chunk dispatches, one barrier
        chunks_real = eng.n_chunks
        for _ in range(SLOTS):
            eng.submit(reqs[0], source_row=srcs[0], max_len=MAX_LEN)
        eng.step()
        M = 20
        t0 = time.perf_counter()
        for _ in range(M):
            eng._dispatch_chunk()
        np.asarray(eng.state.finished)
        t_chunk = (time.perf_counter() - t0) / M
        proj = chunks_real * t_chunk
        print(json.dumps({
            "mode": label + "_projected", "chunks": chunks_real,
            "chunk_device_ms": round(t_chunk * 1e3, 2),
            "projected_seconds": round(proj, 3),
            "projected_captions_per_s": round(N_REQ / proj, 1),
            "projected_speedup_vs_batch": round(dt_b / proj, 2)}),
            flush=True)
        eng.reset()
        return results

    cfg1 = GenerationConfig(max_len=MAX_LEN, sampling_topk=1)
    eng1 = ContinuousBatcher.for_flattened(
        model, params, cfg1, n_slots=SLOTS, inner_steps=INNER,
        spec_k=1, source_len=S)
    res1 = drive(eng1, "continuous_greedy")

    eng4 = ContinuousBatcher.for_flattened(
        model, params, cfg1, n_slots=SLOTS, inner_steps=INNER,
        spec_k=4, source_len=S)
    res4 = drive(eng4, "continuous_spec4")

    # exactness: speculative slots must commit the greedy tokens
    agree = all(
        np.array_equal(np.asarray(res1[i][0]), np.asarray(res4[i][0]))
        for i in range(N_REQ))
    print(json.dumps({"mode": "exactness",
                      "spec4_tokens_identical_to_greedy": agree}),
          flush=True)

    cfgs = GenerationConfig(max_len=MAX_LEN, sampling_topk=3,
                            sampling_temp=0.8)
    engs = ContinuousBatcher.for_flattened(
        model, params, cfgs, n_slots=SLOTS, inner_steps=INNER,
        spec_k=1)
    drive(engs, "continuous_sampling",
          extra={"sampling_topk": 3, "sampling_temp": 0.8})


if __name__ == "__main__":
    main()
