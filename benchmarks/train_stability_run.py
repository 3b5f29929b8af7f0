"""1000-step stability run of the full fast train path (flash VJP +
O2 master updates + hw-PRNG dropout + lax.cond NaN guard) on fixed
synthetic data. Asserts the loss decreases, stays finite, and no
batch is skipped. Numbers in BASELINE.md.

Run: python benchmarks/train_stability_run.py [STEPS] [BATCH]
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
    create_o2_train_state, make_train_step)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def main():
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
    losses = []
    skipped = 0
    for i in range(N):
        state, m = step(state, batches[i % 8], rng)
        if i % 100 == 99:
            losses.append(float(np.asarray(m["loss"])))
            skipped += int(np.asarray(m["skipped"]))
            print(f"step {i+1}: loss {losses[-1]:.4f}", flush=True)
    el = time.perf_counter() - t0
    print(f"DONE {N} steps: loss {losses[0]:.3f} -> {losses[-1]:.3f}, "
          f"{N*B/el:.0f} samples/s avg (incl. compile), "
          f"skipped={skipped}")
    assert losses[-1] < losses[0] and all(np.isfinite(losses))
    assert skipped == 0


if __name__ == "__main__":
    main()
