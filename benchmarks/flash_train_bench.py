"""bf16 flagship train step: XLA attention vs flash kernel.

Run: python benchmarks/flash_train_bench.py [BATCH]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.models.captioner import \
    TransformerFlattened  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    TrainState, make_train_step)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def flagship(use_flash):
    return TransformerFlattened(
        vocab_size=50265, cutoff=(5000, 20000, 50265), embed_dim=1024,
        ffn_dim=4096, num_heads=16, num_layers=4,
        kernel_sizes=(3, 7, 15, 31), image_dim=2048, article_dim=1024,
        max_positions=512, dtype=jnp.bfloat16,
        use_flash_train=use_flash)


def main():
    batch = ge._batch(B=BATCH, T=64, P=49, S=512, image_dim=2048,
                      article_dim=1024, vocab=50265)
    params = jax.jit(flagship(False).init)(jax.random.PRNGKey(0), batch)
    tx = make_bert_adam(lr=1e-4, t_total=437600, warmup=0.05)

    results = {}
    for use_flash in (False, True):
        model = flagship(use_flash)

        def loss_fn(p, b, rng, model=model):
            return model.loss_fn(p, b, dropout_rng=rng)

        step = make_train_step(loss_fn, tx, donate=True,
                               compute_dtype=jnp.bfloat16)
        p = jax.tree.map(jnp.copy, params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=p,
                           opt_state=tx.init(p))
        rng = jax.random.PRNGKey(1)
        state, m = step(state, batch, rng)
        loss0 = float(np.asarray(m["loss"]))
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, rng)
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / n
        tag = "flash" if use_flash else "xla"
        results[tag] = BATCH / dt
        print(f"{tag}: {dt*1e3:.2f} ms/step  "
              f"{BATCH/dt:.1f} samples/s  loss0={loss0:.3f}")
    print(f"speedup: {results['flash']/results['xla']:.3f}x")


if __name__ == "__main__":
    main()
