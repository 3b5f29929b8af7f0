"""Train-step ablations cited in BASELINE.md (r03):
dropout cost, hw-PRNG masks, bf16 moments, and batch scaling of the
flash+o2 step.

Run: python benchmarks/train_ablation_bench.py [BATCH] [MODE]
MODE:
  a     = production path (hw-PRNG dropout masks)        [default]
  b     = force global rbg PRNG impl (ablation)
  c     = dropout disabled (upper bound on the mask cost)
  bf16m = a + bf16 first-moment storage (bert_adam moment_dtype)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

MODE = sys.argv[2] if len(sys.argv) > 2 else "a"
if MODE == "b":
    jax.config.update("jax_default_prng_impl", "rbg")

import __graft_entry__ as ge  # noqa: E402
from benchmarks.flash_train_bench import flagship  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    create_o2_train_state, make_train_step)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    batch = ge._batch(B=BATCH, T=64, P=49, S=512, image_dim=2048,
                      article_dim=1024, vocab=50265)
    model = flagship(True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tx = make_bert_adam(
        lr=1e-4, t_total=437600, warmup=0.05,
        moment_dtype=jnp.bfloat16 if MODE == "bf16m" else None)

    if MODE == "c":
        def loss_fn(p, b, r):
            return model.loss_fn(p, b, dropout_rng=None)
    else:
        def loss_fn(p, b, r):
            return model.loss_fn(p, b, dropout_rng=r)

    step = make_train_step(loss_fn, tx, donate=True,
                           compute_dtype=jnp.bfloat16, o2_master=True)
    state = create_o2_train_state(params, tx)
    rng = jax.random.PRNGKey(1)
    state, m = step(state, batch, rng)
    print("loss0", float(np.asarray(m["loss"])))
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch, rng)
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"MODE={MODE} B={BATCH}: {dt*1e3:.2f} ms/step  "
          f"{BATCH/dt:.1f} samples/s")


if __name__ == "__main__":
    main()
