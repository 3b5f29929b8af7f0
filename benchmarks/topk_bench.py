"""Microbenchmark: beam-selection top-k strategies on the real chip.

The beam body needs, per step, the top-K of scores[:,None]+log_probs
over K*V (K=5, V=50265) per batch row. Candidate strategies:

  flat       — lax.top_k over [B, K*V]            (production r01)
  twostage   — per-row lax.top_k over V, then exact combine over K*K
  banded     — adaptive-softmax-structured: top-k per band
               (head 5000 / tail1 15000 / tail2 30265) + class prior,
               exact merge over 3k candidates per row
  approx     — lax.approx_max_k per row (TPU bin-reduction), exact
               combine; recall_target=0.99
  iter5      — 5 iterations of (argmax, mask) full-width max-reduce

Run: python benchmarks/topk_bench.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, K, V = 64, 5, 50265
N = B * K
STEPS = 50


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters / STEPS
    print(f"{name:10s} {dt*1e3:8.3f} ms/step", flush=True)
    return out


def scanned(sel):
    """Wrap a selection fn in a scan so per-step cost dominates."""
    def run(lp, scores):
        def body(carry, _):
            s = carry
            ts, tok, src = sel(lp + s[:, :, None] * 1e-6, s)
            return ts * 0.999, (tok, src)
        _, ys = jax.lax.scan(body, scores, jnp.arange(STEPS))
        return ys
    return jax.jit(run)


def sel_flat(lp3, scores):
    cand = (scores.reshape(N)[:, None] + lp3.reshape(N, V)).reshape(
        B, K * V)
    ts, tf = jax.lax.top_k(cand, K)
    return ts, (tf % V).astype(jnp.int32), tf // V


def _combine(row_vals, row_idx, scores):
    """row_vals/idx [N, K] per-row candidates -> exact beam top-K."""
    cand = (scores.reshape(N)[:, None] + row_vals).reshape(B, K * K)
    ts, tf = jax.lax.top_k(cand, K)
    tok = jnp.take_along_axis(row_idx.reshape(B, K * K), tf, axis=1)
    return ts, tok.astype(jnp.int32), tf // K


def sel_twostage(lp3, scores):
    rv, ri = jax.lax.top_k(lp3.reshape(N, V), K)
    return _combine(rv, ri, scores)


def sel_approx(lp3, scores):
    rv, ri = jax.lax.approx_max_k(lp3.reshape(N, V), K,
                                  recall_target=0.99)
    return _combine(rv, ri.astype(jnp.int32), scores)


def sel_banded(lp3, scores):
    lp = lp3.reshape(N, V)
    bands = [(0, 5000), (5000, 20000), (20000, V)]
    vals, idxs = [], []
    for lo, hi in bands:
        bv, bi = jax.lax.top_k(lp[:, lo:hi], K)
        vals.append(bv)
        idxs.append(bi + lo)
    rv = jnp.concatenate(vals, axis=1)          # [N, 3K]
    ri = jnp.concatenate(idxs, axis=1)
    cand = (scores.reshape(N)[:, None] + rv).reshape(B, K * 3 * K)
    ts, tf = jax.lax.top_k(cand, K)
    tok = jnp.take_along_axis(ri.reshape(B, -1), tf, axis=1)
    return ts, tok.astype(jnp.int32), tf // (3 * K)


def sel_iter5(lp3, scores):
    cand = (scores.reshape(N)[:, None] + lp3.reshape(N, V)).reshape(
        B, K * V)
    vals, idxs = [], []
    for _ in range(K):
        i = jnp.argmax(cand, axis=-1)
        v = jnp.take_along_axis(cand, i[:, None], axis=1)[:, 0]
        vals.append(v)
        idxs.append(i)
        cand = jax.vmap(lambda c, j: c.at[j].set(-jnp.inf))(cand, i)
    ts = jnp.stack(vals, axis=1)
    tf = jnp.stack(idxs, axis=1)
    return ts, (tf % V).astype(jnp.int32), tf // V


def main():
    key = jax.random.PRNGKey(0)
    lp3 = jax.random.normal(key, (N, V), jnp.float32).reshape(B, K, V)
    if len(sys.argv) > 1 and sys.argv[1] == "bf16":
        lp3 = lp3.astype(jnp.bfloat16)
    scores = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((K - 1,), -1e9)]), (B,)).reshape(B, K)

    # correctness cross-check (single step)
    ts_f, tok_f, src_f = jax.jit(sel_flat)(lp3, scores)
    for name, fn in [("twostage", sel_twostage), ("banded", sel_banded)]:
        ts, tok, src = jax.jit(fn)(lp3, scores)
        assert np.allclose(np.asarray(ts), np.asarray(ts_f)), name
        assert np.array_equal(np.asarray(tok), np.asarray(tok_f)), name

    timeit("flat", scanned(sel_flat), lp3, scores)
    timeit("twostage", scanned(sel_twostage), lp3, scores)
    timeit("banded", scanned(sel_banded), lp3, scores)
    timeit("approx", scanned(sel_approx), lp3, scores)
    timeit("iter5", scanned(sel_iter5), lp3, scores)


if __name__ == "__main__":
    main()
