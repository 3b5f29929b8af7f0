"""Consolidated ablation harness for the beam-5 decode step.

Supersedes the four round-1/2 beam_ablation{,2,3,4}.py scripts; the
historical measurements they produced live in BASELINE.md. Suites:

  shift  — step_shift-path ablations (full / greedy@B*K / step_only /
           no_topk / no_reorder): where beam bookkeeping costs go.
  small  — same ablations plus two-stage vs vocab-wide top-k, at
           unroll=1 / MAX_LEN=50 (smaller graphs — the unroll=4 x
           100-step graphs repeatedly broke the remote-compile tunnel).
  topk   — candidate-top-k production path (step_topk) ablations:
           step / no_reorder / rot_reorder / full.
  dims   — attribute step time by shrinking one dimension at a time
           (article S, scan length, batch).

Run: python benchmarks/beam_ablations.py SUITE [BATCH] [WHICH]
  e.g. python benchmarks/beam_ablations.py topk 64 step,full
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.generation.generator import (  # noqa: E402
    GenerationConfig, permute_rows)
from news_image_caption_tpu.models.decoder_flattened import \
    DynamicConvDecoder  # noqa: E402

BEAM, V = 5, 50265


def _cast_bf16(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t)


def timeit(name, fn, *args, iters=3, batch=64, max_len=100):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:12s} {dt*1e3:8.1f} ms/batch  "
          f"{dt/max_len*1e3:6.2f} ms/step  "
          f"{batch/dt:7.1f} captions/s(@{max_len})", flush=True)
    return dt


def _setup(batch, S=512):
    model = ge._flagship()
    params = _cast_bf16(jax.jit(model.init)(
        jax.random.PRNGKey(0),
        ge._batch(B=2, T=32, P=49, S=S, image_dim=2048,
                  article_dim=1024, vocab=V)))
    data = _cast_bf16(ge._batch(B=batch, T=32, P=49, S=S,
                                image_dim=2048, article_dim=1024,
                                vocab=V, key=1))

    def make_parts(p, b):
        contexts = model._contexts(b)
        kvs = model.decoder.apply(
            p, contexts, method=DynamicConvDecoder.precompute_kv)
        return kvs, model.decoder.init_cache(batch * BEAM)

    kvs, caches = jax.jit(make_parts)(params, data)
    return model, params, data, kvs, caches


def suite_shift(batch, which, max_len=100, unroll=4):
    """step_shift-path ablations (round-1 harness)."""
    model, params, data, kvs, caches = _setup(batch)
    cfg = GenerationConfig(max_len=max_len, beam_size=BEAM,
                           sampling_topk=1, scan_unroll=unroll)
    flat_seed = jnp.full((batch * BEAM,), cfg.bos_id, jnp.int32)
    scores0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((BEAM - 1,), -1e9)]), (batch,))

    def step(tok, i, c):
        return model.decoder.apply(
            params, tok, i, kvs, c, beam=BEAM,
            method=DynamicConvDecoder.step_shift)

    def scan(body, carry):
        _, ys = jax.lax.scan(body, carry, jnp.arange(max_len),
                             unroll=unroll)
        return ys

    if "full" in which:
        gen = jax.jit(lambda p, b: model.generate_beam(p, b, cfg))
        timeit("full", gen, params, data, batch=batch,
               max_len=max_len)
    if "greedy" in which:
        wide = _cast_bf16(ge._batch(B=batch * BEAM, T=32, P=49, S=512,
                                    image_dim=2048, article_dim=1024,
                                    vocab=V, key=2))
        gen_g = jax.jit(lambda p, b: model.generate(p, b, cfg))
        timeit("greedy_w", gen_g, params, wide, batch=batch,
               max_len=max_len)

    def run_step_only(caches):
        def body(carry, i):
            cur, c = carry
            lp, c = step(cur, i, c)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            return (nxt, c), nxt
        return scan(body, (flat_seed, caches))

    if "step" in which:
        timeit("step_only", jax.jit(run_step_only), caches,
               batch=batch, max_len=max_len)

    # + cache gathers via a rolled index (keeps the gather, drops topk)
    def run_no_topk(caches):
        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            flat_src = jnp.roll(jnp.arange(batch * BEAM), 1)
            c = jax.tree.map(lambda x: jnp.take(x, flat_src, axis=0), c)
            return (nxt, scores + jnp.max(lp, -1), c), nxt
        return scan(body, (flat_seed, scores0, caches))

    if "notopk" in which:
        timeit("no_topk", jax.jit(run_no_topk), caches,
               batch=batch, max_len=max_len)

    # + vocab-wide top_k over K*V, no cache gathers
    def run_no_reorder(caches):
        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            cand = (scores[:, None] + lp).reshape(batch, BEAM * V)
            ts, tf = jax.lax.top_k(cand, BEAM)
            tok = (tf % V).astype(jnp.int32).reshape(-1)
            return (tok, ts.reshape(-1), c), tok
        return scan(body, (flat_seed, scores0, caches))

    if "nore" in which:
        timeit("no_reorder", jax.jit(run_no_reorder), caches,
               batch=batch, max_len=max_len)

    # two-stage selection: per-row top-K then K*K combine
    def run_twostage(caches):
        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            row_lp, row_idx = jax.lax.top_k(lp, BEAM)
            cand = (scores[:, None] + row_lp).reshape(batch,
                                                      BEAM * BEAM)
            ts, tf = jax.lax.top_k(cand, BEAM)
            src_beam = tf // BEAM
            flat_src = (jnp.arange(batch)[:, None] * BEAM
                        + src_beam).reshape(-1)
            tok = jnp.take_along_axis(
                row_idx.reshape(batch, BEAM * BEAM), tf,
                axis=1).astype(jnp.int32).reshape(-1)
            c = jax.tree.map(lambda x: jnp.take(x, flat_src, axis=0), c)
            return (tok, ts.reshape(-1), c), tok
        return scan(body, (flat_seed, scores0, caches))

    if "two" in which:
        timeit("twostage", jax.jit(run_twostage), caches,
               batch=batch, max_len=max_len)

    # full beam body rebuilt inline (vocab-wide top_k + gathers)
    def run_full_like(caches):
        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            cand = (scores[:, None] + lp).reshape(batch, BEAM * V)
            ts, tf = jax.lax.top_k(cand, BEAM)
            src_beam = tf // V
            flat_src = (jnp.arange(batch)[:, None] * BEAM
                        + src_beam).reshape(-1)
            tok = (tf % V).astype(jnp.int32).reshape(-1)
            c = jax.tree.map(lambda x: jnp.take(x, flat_src, axis=0), c)
            return (tok, ts.reshape(-1), c), tok
        return scan(body, (flat_seed, scores0, caches))

    if "fullbody" in which:
        timeit("full_like", jax.jit(run_full_like), caches,
               batch=batch, max_len=max_len)


def suite_small(batch, which):
    """Small graphs: unroll=1, MAX_LEN=50 (tunnel-friendly)."""
    suite_shift(batch, which, max_len=50, unroll=1)


def suite_topk(batch, which, max_len=25):
    """Candidate-top-k production path (step_topk) ablations."""
    model, params, data, kvs, caches = _setup(batch)
    n = batch * BEAM
    flat_seed = jnp.zeros((n,), jnp.int32)
    scores0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((BEAM - 1,), -1e9)]), (batch,))

    def step(tok, i, c):
        return model.decoder.apply(
            params, tok, i, kvs, c, BEAM, beam=BEAM,
            method=DynamicConvDecoder.step_topk)

    def run_step_only(caches):
        def body(carry, i):
            cur, c = carry
            rv, ri, c = step(cur, i, c)
            return (ri[:, 0], c), ri[:, 0]
        (_, _), toks = jax.lax.scan(
            body, (flat_seed, caches), jnp.arange(max_len), unroll=1)
        return toks

    if "step" in which:
        timeit("step_topk", jax.jit(run_step_only), caches,
               batch=batch, max_len=max_len)

    def run_no_reorder(caches):
        def body(carry, i):
            cur, scores, c = carry
            rv, ri, c = step(cur, i, c)
            cand = (scores[:, None] + rv).reshape(batch, BEAM * BEAM)
            ts, tf = jax.lax.top_k(cand, BEAM)
            tok = jnp.take_along_axis(
                ri.reshape(batch, BEAM * BEAM), tf, axis=1).reshape(-1)
            return (tok, ts.reshape(-1), c), tok
        (_, _, _), toks = jax.lax.scan(
            body, (flat_seed, scores0, caches), jnp.arange(max_len),
            unroll=1)
        return toks

    if "nore" in which:
        timeit("no_reorder", jax.jit(run_no_reorder), caches,
               batch=batch, max_len=max_len)

    def run_reorder_only(caches):
        def body(carry, i):
            cur, c = carry
            rv, ri, c = step(cur, i, c)
            flat_src = jnp.roll(jnp.arange(n), 1)
            c = [permute_rows(x, flat_src) for x in c]
            return (ri[:, 0], c), ri[:, 0]
        (_, _), toks = jax.lax.scan(
            body, (flat_seed, caches), jnp.arange(max_len), unroll=1)
        return toks

    if "rot" in which:
        timeit("rot_reorder", jax.jit(run_reorder_only), caches,
               batch=batch, max_len=max_len)

    if "full" in which:
        cfg = GenerationConfig(max_len=max_len, beam_size=BEAM,
                               scan_unroll=1)
        gen = jax.jit(lambda p, b: model.generate_beam(p, b, cfg))
        timeit("full", gen, params, data, batch=batch,
               max_len=max_len)


def _dims_run(tag, batch, S, max_len, n=3):
    model = ge._flagship(dtype=jnp.bfloat16)
    params = _cast_bf16(jax.jit(model.init)(
        jax.random.PRNGKey(0),
        ge._batch(B=2, T=32, P=49, S=S, image_dim=2048,
                  article_dim=1024, vocab=V)))
    cfg = GenerationConfig(max_len=max_len, beam_size=BEAM)
    gen = jax.jit(lambda p, b: model.generate_beam(p, b, cfg))
    batches = [_cast_bf16(ge._batch(B=batch, T=32, P=49, S=S,
                                    image_dim=2048, article_dim=1024,
                                    vocab=V, key=i))
               for i in range(n + 1)]
    np.asarray(gen(params, batches[0])[0])
    t0 = time.perf_counter()
    for b in batches[1:]:
        np.asarray(gen(params, b)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:24s} B={batch:4d} S={S:4d} len={max_len:4d}: "
          f"{dt*1e3:8.1f} ms/batch = {dt/max_len*1e3:6.3f} ms/step  "
          f"({batch/dt:7.1f} cap/s)", flush=True)
    return dt


def suite_dims(batch, which):
    """Shrink one dimension at a time to attribute step cost."""
    if "base" in which:
        _dims_run("baseline", batch, 512, 100)
    if "short" in which:
        _dims_run("short-article", batch, 64, 100)
    if "scan" in which:
        _dims_run("short-scan", batch, 512, 25)
    if "batch" in which:
        for b in (64, 128, 192, 256):
            _dims_run(f"batch-{b}", b, 512, 100)


SUITES = {"shift": (suite_shift,
                    "full,greedy,step,notopk,nore"),
          "small": (suite_small,
                    "step,notopk,nore,two,fullbody"),
          "topk": (suite_topk, "step,nore,rot,full"),
          "dims": (suite_dims, "base,short,scan")}


if __name__ == "__main__":
    suite = sys.argv[1] if len(sys.argv) > 1 else "topk"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    fn, default_which = SUITES[suite]
    which = sys.argv[3] if len(sys.argv) > 3 else default_which
    fn(batch, which)
