"""Attribute beam-step time by shrinking one dimension at a time.

Times the production beam decode (bf16, impl=topk) under:
  - baseline        (S=512, full model)
  - short article   (S=64): isolates article-KV attention traffic
  - head-only       (max_len=1 scan vs 100): isolates per-step cost
Run: python benchmarks/beam_ablation4.py
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

BATCH, BEAM, V = 64, 5, 50265


def _cast(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t)


def run(tag, S, max_len, n=3):
    model = ge._flagship(dtype=jnp.bfloat16)
    params = _cast(jax.jit(model.init)(
        jax.random.PRNGKey(0),
        ge._batch(B=2, T=32, P=49, S=S, image_dim=2048,
                  article_dim=1024, vocab=V)))
    cfg = GenerationConfig(max_len=max_len, beam_size=BEAM)
    gen = jax.jit(lambda p, b: model.generate_beam(p, b, cfg))
    batches = [_cast(ge._batch(B=BATCH, T=32, P=49, S=S,
                               image_dim=2048, article_dim=1024,
                               vocab=V, key=i)) for i in range(n + 1)]
    np.asarray(gen(params, batches[0])[0])
    t0 = time.perf_counter()
    for b in batches[1:]:
        np.asarray(gen(params, b)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:24s} S={S:4d} len={max_len:4d}: {dt*1e3:8.1f} ms/batch "
          f"= {dt/max_len*1e3:6.3f} ms/step  "
          f"({BATCH*max_len and BATCH/dt:7.1f} cap/s)")
    return dt


if __name__ == "__main__":
    base = run("baseline", 512, 100)
    run("short-article", 64, 100)
    run("short-scan", 512, 25)


def run_batch(B, n=3):
    global BATCH
    old = BATCH
    BATCH = B
    try:
        run(f"batch-{B}", 512, 100, n)
    finally:
        BATCH = old
