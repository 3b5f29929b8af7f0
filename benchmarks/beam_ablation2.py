"""Smaller-graph ablations for the beam decode step (unroll=1,
MAX_LEN=50) — the unroll=4 x 100-step graphs repeatedly break the
remote-compile tunnel. Per-step numbers are unaffected by scan length.

Run: python benchmarks/beam_ablation2.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.models.decoder_flattened import \
    DynamicConvDecoder  # noqa: E402

BATCH, MAX_LEN, BEAM = 64, 50, 5
V = 50265


def _cast_bf16(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t)


def timeit(name, fn, *args, iters=3):
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

    def make_parts(p, b):
        contexts = model._contexts(b)
        kvs = model.decoder.apply(
            p, contexts, method=DynamicConvDecoder.precompute_kv)
        return kvs, model.decoder.init_cache(BATCH * BEAM)

    kvs, caches = jax.jit(make_parts)(params, batch)

    def step(tok, i, c):
        return model.decoder.apply(
            params, tok, i, kvs, c, beam=BEAM,
            method=DynamicConvDecoder.step_shift)

    flat_seed = jnp.zeros((BATCH * BEAM,), jnp.int32)
    scores0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((BEAM - 1,), -1e9)]), (BATCH,))

    def scan(body, carry):
        def wrapped(c, i):
            return body(c, i)
        (c), ys = jax.lax.scan(wrapped, carry, jnp.arange(MAX_LEN),
                               unroll=1)
        return ys

    # 1. decoder step only (argmax feedback, no beam machinery)
    def run_step_only(caches):
        def body(carry, i):
            cur, c = carry
            lp, c = step(cur, i, c)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            return (nxt, c), nxt
        return scan(body, (flat_seed, caches))

    timeit("step_only", jax.jit(run_step_only), caches)

    # 2. + cache gathers (no top_k)
    def run_no_topk(caches):
        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            flat_src = jnp.roll(jnp.arange(BATCH * BEAM), 1)
            c = jax.tree.map(lambda x: jnp.take(x, flat_src, axis=0), c)
            return (nxt, scores + jnp.max(lp, -1), c), nxt
        return scan(body, (flat_seed, scores0, caches))

    timeit("no_topk", jax.jit(run_no_topk), caches)

    # 3. + top_k over K*V (no gathers)
    def run_no_reorder(caches):
        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            cand = (scores[:, None] + lp).reshape(BATCH, BEAM * V)
            ts, tf = jax.lax.top_k(cand, BEAM)
            tok = (tf % V).astype(jnp.int32).reshape(-1)
            return (tok, ts.reshape(-1), c), tok
        return scan(body, (flat_seed, scores0, caches))

    timeit("no_reorder", jax.jit(run_no_reorder), caches)

    # 4. full body with TWO-STAGE top-k (per-row top-K then combine)
    def run_twostage(caches):
        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            row_lp, row_idx = jax.lax.top_k(lp, BEAM)       # [B*K, K]
            cand = (scores[:, None] + row_lp).reshape(BATCH,
                                                      BEAM * BEAM)
            ts, tf = jax.lax.top_k(cand, BEAM)              # [B, K]
            src_beam = tf // BEAM
            flat_src = (jnp.arange(BATCH)[:, None] * BEAM
                        + src_beam).reshape(-1)
            tok = jnp.take_along_axis(
                row_idx.reshape(BATCH, BEAM * BEAM), tf,
                axis=1).astype(jnp.int32).reshape(-1)
            c = jax.tree.map(lambda x: jnp.take(x, flat_src, axis=0), c)
            return (tok, ts.reshape(-1), c), tok
        return scan(body, (flat_seed, scores0, caches))

    timeit("twostage", jax.jit(run_twostage), caches)

    # 5. full body with single-stage top_k (current production path)
    def run_full(caches):
        def body(carry, i):
            cur, scores, c = carry
            lp, c = step(cur, i, c)
            cand = (scores[:, None] + lp).reshape(BATCH, BEAM * V)
            ts, tf = jax.lax.top_k(cand, BEAM)
            src_beam = tf // V
            flat_src = (jnp.arange(BATCH)[:, None] * BEAM
                        + src_beam).reshape(-1)
            tok = (tf % V).astype(jnp.int32).reshape(-1)
            c = jax.tree.map(lambda x: jnp.take(x, flat_src, axis=0), c)
            return (tok, ts.reshape(-1), c), tok
        return scan(body, (flat_seed, scores0, caches))

    timeit("full_like", jax.jit(run_full), caches)


if __name__ == "__main__":
    main()
