"""Flagship greedy decode throughput (steady-state streamed dispatch).

The ttl reference's own generation mode is greedy/top-k; numbers in
BASELINE.md ("r03 steady-state re-measure").

Run: python benchmarks/greedy_bench.py [BATCH ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402

MAX_LEN, STEPS = 100, 20


def _cast(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, t)


def main():
    model = ge._flagship(dtype=jnp.bfloat16)
    params = _cast(jax.jit(model.init)(
        jax.random.PRNGKey(0),
        ge._batch(B=2, T=32, P=49, S=512, image_dim=2048,
                  article_dim=1024, vocab=50265)))
    for B in [int(a) for a in (sys.argv[1:] or ["64", "128"])]:
        warm = _cast(ge._batch(B=B, T=32, P=49, S=512, image_dim=2048,
                               article_dim=1024, vocab=50265))
        cfg = GenerationConfig(max_len=MAX_LEN, sampling_topk=1)
        gen = jax.jit(lambda p, b, cfg=cfg: model.generate(p, b, cfg))
        out = gen(params, warm)
        np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = gen(params, warm)
        np.asarray(out[0])
        dt = (time.perf_counter() - t0) / STEPS
        print(f"greedy B={B}: {B/dt:.1f} captions/s "
              f"({dt*1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
