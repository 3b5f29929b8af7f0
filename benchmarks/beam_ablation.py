"""Ablation timing for the beam-5 decode step on the real chip.

Isolates where per-step time goes:
  full        — production beam search (bench.py path)
  greedy_w    — greedy at the same flat width B*K (no beam bookkeeping)
  no_topk     — beam body with argmax instead of top_k over K*V
  no_reorder  — beam body without the per-step cache/token gathers
  step_only   — just the decoder step_fn in a scan (no selection at all)

Run: python benchmarks/beam_ablation.py [BATCH]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.generation.generator import (  # noqa: E402
    GenerationConfig, beam_search, generate)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MAX_LEN = 100
BEAM = 5


def _cast_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, tree)


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    per_step = dt / MAX_LEN * 1e3
    print(f"{name:12s} {dt*1e3:8.1f} ms/batch  {per_step:6.2f} ms/step  "
          f"{BATCH/dt:7.1f} captions/s")
    return dt


def main():
    model = ge._flagship()
    init_batch = ge._batch(B=2, T=32, P=49, S=512, image_dim=2048,
                           article_dim=1024, vocab=50265)
    params = _cast_bf16(jax.jit(model.init)(jax.random.PRNGKey(0),
                                            init_batch))
    batch = _cast_bf16(ge._batch(B=BATCH, T=32, P=49, S=512,
                                 image_dim=2048, article_dim=1024,
                                 vocab=50265, key=1))
    cfg = GenerationConfig(max_len=MAX_LEN, beam_size=BEAM,
                           sampling_topk=1)

    # --- full beam ----------------------------------------------------
    gen = jax.jit(lambda p, b: model.generate_beam(p, b, cfg))
    timeit("full", gen, params, batch)

    # --- greedy at flat width B*K --------------------------------------
    wide = _cast_bf16(ge._batch(B=BATCH * BEAM, T=32, P=49, S=512,
                                image_dim=2048, article_dim=1024,
                                vocab=50265, key=2))
    gen_g = jax.jit(lambda p, b: model.generate(p, b, cfg))
    timeit("greedy_w", gen_g, params, wide)

    # --- beam variants over a shared step_fn ---------------------------
    from news_image_caption_tpu.models.decoder_flattened import \
        DynamicConvDecoder

    def make_parts(p, b):
        contexts = model._contexts(b)
        B = contexts["image"].shape[0]
        kvs = model.decoder.apply(
            p, contexts, method=DynamicConvDecoder.precompute_kv)
        caches = model.decoder.init_cache(B * BEAM)
        return kvs, caches

    kvs, caches = jax.jit(make_parts)(params, batch)

    def step(tok, i, c):
        return model.decoder.apply(
            params, tok, i, kvs, c, beam=BEAM,
            method=DynamicConvDecoder.step_shift)

    seed = jnp.full((BATCH,), cfg.bos_id, jnp.int32)
    flat_seed = jnp.repeat(seed, BEAM)

    # step_only: scan the decoder step, feed argmax token back
    def run_step_only(caches):
        def body(carry, i):
            cur, c = carry
            lp, c = step(cur, i, c)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            return (nxt, c), nxt
        (_, _), toks = jax.lax.scan(
            body, (flat_seed, caches), jnp.arange(MAX_LEN), unroll=4)
        return toks

    timeit("step_only", jax.jit(run_step_only), caches)

    # no_topk: full beam body but argmax-based selection (keeps gathers)
    def run_no_topk(caches):
        scores0 = jnp.zeros((BATCH * BEAM,), jnp.float32)

        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            # fake reorder with a rolled index to keep the gather
            flat_src = jnp.roll(jnp.arange(BATCH * BEAM), 1)
            c = jax.tree.map(lambda x: jnp.take(x, flat_src, axis=0), c)
            scores = scores + jnp.max(lp, axis=-1)
            return (nxt, scores, c), nxt
        (_, scores, _), toks = jax.lax.scan(
            body, (flat_seed, scores0, caches), jnp.arange(MAX_LEN),
            unroll=4)
        return toks, scores

    timeit("no_topk", jax.jit(run_no_topk), caches)

    # no_reorder: top_k selection kept, cache gather dropped
    def run_no_reorder(caches):
        V = 50265
        scores0 = jnp.tile(jnp.concatenate(
            [jnp.zeros((1,)), jnp.full((BEAM - 1,), -1e9)]), (BATCH,))

        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            cand = (scores[:, None] + lp).reshape(BATCH, BEAM * V)
            top_scores, top_flat = jax.lax.top_k(cand, BEAM)
            tok = (top_flat % V).astype(jnp.int32).reshape(-1)
            return (tok, top_scores.reshape(-1), c), tok
        (_, scores, _), toks = jax.lax.scan(
            body, (flat_seed, scores0, caches), jnp.arange(MAX_LEN),
            unroll=4)
        return toks, scores

    timeit("no_reorder", jax.jit(run_no_reorder), caches)


if __name__ == "__main__":
    main()
