"""Speculative greedy decode: throughput vs draft acceptance rate.

Measures the flagship model (bf16, DecodeKV) at B x 100 tokens:
- plain greedy scan (the baseline `generate` path);
- speculative decode (generate_speculative) against draft sources of
  controlled quality: ORACLE (the greedy output embedded in the
  source — ceiling), CORRUPT-p (every token independently corrupted
  with probability p — intermediate acceptance), NOISE (random ids —
  worst case: every chunk commits exactly 1 token, so this measures
  the chunk-forward overhead directly).

eos_id=-1 in all runs so every row decodes the full 100 tokens
(fixed work; random weights would otherwise emit eos at arbitrary
steps and make the comparison ragged). Acceptance on REAL trained
checkpoints with real articles is workload-dependent; these sweeps
bound the win (oracle) and the loss (noise).

Run: python benchmarks/spec_decode_bench.py [BATCH ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402

MAX_LEN, STEPS = 100, 10


def _cast(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, t)


def main():
    model = ge._flagship(dtype=jnp.bfloat16)
    params = _cast(jax.jit(model.init)(
        jax.random.PRNGKey(0),
        ge._batch(B=2, T=32, P=49, S=512, image_dim=2048,
                  article_dim=1024, vocab=50265)))
    cfg = GenerationConfig(max_len=MAX_LEN, sampling_topk=1, eos_id=-1)

    for B in [int(a) for a in (sys.argv[1:] or ["64"])]:
        batch = _cast(ge._batch(B=B, T=32, P=49, S=512, image_dim=2048,
                                article_dim=1024, vocab=50265))

        gen = jax.jit(lambda p, b: model.generate(p, b, cfg))
        out = gen(params, batch)
        greedy_toks = np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = gen(params, batch)
        np.asarray(out[0])
        base_dt = (time.perf_counter() - t0) / STEPS
        print(f"B={B} greedy scan: {B/base_dt:.1f} captions/s "
              f"({base_dt*1e3:.1f} ms/batch)")

        # Draft sources: noise prefix + (possibly corrupted) greedy
        # caption + noise tail, so the n-gram lookup has to actually
        # find the continuation.
        key = jax.random.PRNGKey(1)
        noise = jax.random.randint(key, (B, 32), 4, 50265)
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
                jax.random.PRNGKey(4), (B, 164), 4, 50265),
        }

        for spec_k in (4, 8, 16):
            spec = jax.jit(lambda p, b, k=spec_k:
                           model.generate_speculative(p, b, cfg,
                                                      spec_k=k))
            for name, src in sources.items():
                b2 = dict(batch)
                b2["article_ids"] = src
                toks, _, nc = spec(params, b2)
                toks_np, nc0 = np.asarray(toks), int(nc)
                exact = bool((toks_np == greedy_toks).all())
                t0 = time.perf_counter()
                for _ in range(STEPS):
                    out = spec(params, b2)
                np.asarray(out[0])
                dt = (time.perf_counter() - t0) / STEPS
                print(f"B={B} spec_k={spec_k:2d} {name:9s}: "
                      f"{B/dt:7.1f} captions/s ({dt*1e3:6.1f} ms) "
                      f"chunks={nc0:3d} tok/chunk={MAX_LEN/nc0:4.1f} "
                      f"speedup={base_dt/dt:4.2f}x exact={exact}")


if __name__ == "__main__":
    main()
