"""Speculative greedy decode on a TRAINED (peaked) flagship.

`spec_decode_bench.py` with random weights measures only the
chunk-forward OVERHEAD: at vocab 50k the random-weight top-1/top-2
logit gap is below bf16 resolution, so chunk-vs-step rounding flips
argmax at nearly every token and acceptance is ~0 regardless of
draft quality (see that module's docstring). Production serves a
trained model whose logits are peaked; this harness produces that
regime the same way `trained_int8_fidelity.py` does — overfit the
flagship on 8 fixed synthetic batches (loss 15.4 -> ~2 after 800
steps at B=128) — then measures the acceptance/throughput curve on
in-distribution features:

- plain greedy scan (baseline `generate`, sampling_topk=1);
- speculative (generate_speculative) for spec_k in {4, 8, 16} against
  draft sources of controlled quality: ORACLE (greedy output embedded
  in noise — prompt-lookup finds it; ceiling), CORRUPT-25/50 (every
  oracle token independently corrupted; intermediate), NOISE (random
  ids; floor = overhead row).

eos_id is the REAL eos here (trained models emit it; both paths
handle finished rows identically) and max_len is 60 < the 64-token
training captions, so every decoded position sits in the memorized
(peaked) regime — beyond position 63 the overfit model's logits are
arbitrary and acceptance would measure rounding noise again.
Reported per row: captions/s, chunks, tokens/chunk (acceptance),
speedup vs greedy, token agreement vs greedy.

Numbers + interpretation in BASELINE.md ("speculative decode").

Run: python benchmarks/spec_decode_trained.py [STEPS] [TRAIN_BATCH]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from benchmarks.flash_train_bench import flagship  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    create_o2_train_state, make_train_step)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 800
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
EVAL_B, MAX_LEN, STEPS = 64, 60, 10


def _cast(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, t)


def train():
    batches = [ge._batch(B=B, T=64, P=49, S=512, image_dim=2048,
                         article_dim=1024, vocab=50265, key=i)
               for i in range(8)]
    model = flagship(True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0])
    tx = make_bert_adam(lr=5e-5, t_total=N, warmup=0.05)

    def loss_fn(p, b, r):
        return model.loss_fn(p, b, dropout_rng=r)

    step = make_train_step(loss_fn, tx, donate=True,
                           compute_dtype=jnp.bfloat16, o2_master=True)
    state = create_o2_train_state(params, tx)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(N):
        state, m = step(state, batches[i % 8], rng)
        if i % 200 == 199:
            print(f"step {i+1}: loss "
                  f"{float(np.asarray(m['loss'])):.4f}", flush=True)
    print(f"trained {N} steps in {time.perf_counter()-t0:.0f}s, "
          f"final loss {float(np.asarray(m['loss'])):.4f}", flush=True)
    eval_batch = _cast(jax.tree.map(lambda x: x[:EVAL_B], batches[0]))
    return model, state.params, eval_batch


def main():
    model, params, batch = train()
    cfg = GenerationConfig(max_len=MAX_LEN, sampling_topk=1)

    gen = jax.jit(lambda p, b: model.generate(p, b, cfg))
    out = gen(params, batch)
    greedy_toks = np.asarray(out[0])
    lens = (greedy_toks[:, 1:] != cfg.pad_id).sum(axis=1)
    print(f"greedy lengths: mean {lens.mean():.1f} min {lens.min()} "
          f"max {lens.max()}", flush=True)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = gen(params, batch)
    np.asarray(out[0])
    base_dt = (time.perf_counter() - t0) / STEPS
    print(f"B={EVAL_B} greedy scan: {EVAL_B/base_dt:.1f} captions/s "
          f"({base_dt*1e3:.1f} ms/batch)", flush=True)

    key = jax.random.PRNGKey(1)
    noise = jax.random.randint(key, (EVAL_B, 32), 4, 50265)
    oracle = jnp.asarray(greedy_toks)

    def corrupted(p, key):
        flip = jax.random.bernoulli(key, p, oracle.shape)
        junk = jax.random.randint(key, oracle.shape, 4, 50265)
        return jnp.where(flip, junk, oracle)

    sources = {
        "oracle": jnp.concatenate([noise, oracle, noise], axis=1),
        "corrupt25": jnp.concatenate(
            [noise, corrupted(0.25, jax.random.PRNGKey(2)), noise],
            axis=1),
        "corrupt50": jnp.concatenate(
            [noise, corrupted(0.50, jax.random.PRNGKey(3)), noise],
            axis=1),
        "noise": jax.random.randint(
            jax.random.PRNGKey(4), (EVAL_B, 164), 4, 50265),
    }

    for spec_k in (4, 8, 16):
        spec = jax.jit(lambda p, b, s, k=spec_k:
                       model.generate_speculative(p, b, cfg, spec_k=k,
                                                  draft_source=s))
        for name, src in sources.items():
            toks, _, nc = spec(params, batch, src)
            toks_np, nc0 = np.asarray(toks), int(nc)
            agree = float((toks_np == greedy_toks).mean())
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = spec(params, batch, src)
            np.asarray(out[0])
            dt = (time.perf_counter() - t0) / STEPS
            print(f"B={EVAL_B} spec_k={spec_k:2d} {name:9s}: "
                  f"{EVAL_B/dt:7.1f} captions/s ({dt*1e3:6.1f} ms) "
                  f"chunks={nc0:3d} tok/chunk={lens.mean()/nc0:4.1f} "
                  f"speedup={base_dt/dt:4.2f}x "
                  f"agree_vs_greedy={agree:.3f}", flush=True)


if __name__ == "__main__":
    main()
