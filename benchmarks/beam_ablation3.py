"""Ablation for the candidate-top-k beam path (production since r02).

Isolates the per-step cost of:
  step_topk   — decoder step + banded exact top-k, argmax-0 feedback
  no_reorder  — + finished masking + K*K combine (no cache reorder)
  full        — production generate_beam (impl='topk')

Run: python benchmarks/beam_ablation3.py [BATCH]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.generation.generator import (  # noqa: E402
    GenerationConfig, permute_rows)
from news_image_caption_tpu.models.decoder_flattened import \
    DynamicConvDecoder  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
WHICH = sys.argv[2] if len(sys.argv) > 2 else 'step,nore,rot,full'
MAX_LEN, BEAM, V = 25, 5, 50265
N = BATCH * BEAM


def _cast_bf16(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t)


def timeit(name, fn, *args, iters=2):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:12s} {dt*1e3:8.1f} ms/batch  "
          f"{dt/MAX_LEN*1e3:6.2f} ms/step  "
          f"{BATCH/dt:7.1f} captions/s(@{MAX_LEN})", flush=True)


def main():
    model = ge._flagship()
    params = _cast_bf16(jax.jit(model.init)(
        jax.random.PRNGKey(0),
        ge._batch(B=2, T=32, P=49, S=512, image_dim=2048,
                  article_dim=1024, vocab=V)))
    batch = _cast_bf16(ge._batch(B=BATCH, T=32, P=49, S=512,
                                 image_dim=2048, article_dim=1024,
                                 vocab=V, key=1))
    cfg = GenerationConfig(max_len=MAX_LEN, beam_size=BEAM,
                           scan_unroll=1)

    def make_parts(p, b):
        contexts = model._contexts(b)
        kvs = model.decoder.apply(
            p, contexts, method=DynamicConvDecoder.precompute_kv)
        return kvs, model.decoder.init_cache(N)

    kvs, caches = jax.jit(make_parts)(params, batch)

    def step(tok, i, c):
        return model.decoder.apply(
            params, tok, i, kvs, c, BEAM, beam=BEAM,
            method=DynamicConvDecoder.step_topk)

    flat_seed = jnp.zeros((N,), jnp.int32)
    scores0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((BEAM - 1,), -1e9)]), (BATCH,))

    def run_step_only(caches):
        def body(carry, i):
            cur, c = carry
            rv, ri, c = step(cur, i, c)
            return (ri[:, 0], c), ri[:, 0]
        (_, _), toks = jax.lax.scan(
            body, (flat_seed, caches), jnp.arange(MAX_LEN), unroll=1)
        return toks

    if "step" in WHICH:
        timeit("step_topk", jax.jit(run_step_only), caches)

    def run_no_reorder(caches):
        def body(carry, i):
            cur, scores, c = carry
            rv, ri, c = step(cur, i, c)
            cand = (scores[:, None] + rv).reshape(BATCH, BEAM * BEAM)
            ts, tf = jax.lax.top_k(cand, BEAM)
            tok = jnp.take_along_axis(
                ri.reshape(BATCH, BEAM * BEAM), tf, axis=1).reshape(-1)
            return (tok, ts.reshape(-1), c), tok
        (_, _, _), toks = jax.lax.scan(
            body, (flat_seed, scores0, caches), jnp.arange(MAX_LEN),
            unroll=1)
        return toks

    if "nore" in WHICH:
        timeit("no_reorder", jax.jit(run_no_reorder), caches)

    def run_reorder_only(caches):
        def body(carry, i):
            cur, c = carry
            rv, ri, c = step(cur, i, c)
            flat_src = jnp.roll(jnp.arange(N), 1)
            c = [permute_rows(x, flat_src) for x in c]
            return (ri[:, 0], c), ri[:, 0]
        (_, _), toks = jax.lax.scan(
            body, (flat_seed, caches), jnp.arange(MAX_LEN), unroll=1)
        return toks

    if "rot" in WHICH:
        timeit("rot_reorder", jax.jit(run_reorder_only), caches)

    if "full" in WHICH:
        gen = jax.jit(lambda p, b: model.generate_beam(p, b, cfg))
        timeit("full", gen, params, batch)


if __name__ == "__main__":
    main()
