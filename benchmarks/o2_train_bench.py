"""bf16 flagship train step: cast-per-step vs O2-true stored params,
with and without the flash attention kernel.

Run: python benchmarks/o2_train_bench.py [BATCH]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from benchmarks.flash_train_bench import flagship  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    TrainState, create_o2_train_state, make_train_step)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ONLY = sys.argv[2] if len(sys.argv) > 2 else None   # e.g. "flash+o2" 


def main():
    batch = ge._batch(B=BATCH, T=64, P=49, S=512, image_dim=2048,
                      article_dim=1024, vocab=50265)
    params = jax.jit(flagship(False).init)(jax.random.PRNGKey(0), batch)
    tx = make_bert_adam(lr=1e-4, t_total=437600, warmup=0.05)

    results = {}
    for use_flash in (False, True):
        for o2 in (False, True):
            tag0 = f"{'flash' if use_flash else 'xla'}+{'o2' if o2 else 'cast'}"
            if ONLY and tag0 != ONLY:
                continue
            model = flagship(use_flash)

            def loss_fn(p, b, rng, model=model):
                return model.loss_fn(p, b, dropout_rng=rng)

            step = make_train_step(loss_fn, tx, donate=True,
                                   compute_dtype=jnp.bfloat16,
                                   o2_master=o2)
            p = jax.tree.map(jnp.copy, params)
            if o2:
                state = create_o2_train_state(p, tx)
            else:
                state = TrainState(step=jnp.zeros((), jnp.int32),
                                   params=p, opt_state=tx.init(p))
            rng = jax.random.PRNGKey(1)
            state, m = step(state, batch, rng)
            loss0 = float(np.asarray(m["loss"]))
            n = 30
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, batch, rng)
            np.asarray(m["loss"])
            dt = (time.perf_counter() - t0) / n
            tag = f"{'flash' if use_flash else 'xla'}+{'o2' if o2 else 'cast'}"
            results[tag] = BATCH / dt
            print(f"{tag}: {dt*1e3:.2f} ms/step  "
                  f"{BATCH/dt:.1f} samples/s  loss0={loss0:.3f}")
    if "xla+cast" in results:
        base = results["xla+cast"]
        for tag, v in results.items():
            print(f"{tag}: {v/base:.3f}x")


if __name__ == "__main__":
    main()
