"""Flagship train-step throughput: fp32 vs bf16 mixed precision.

Measures the full fwd+bwd+BertAdam jitted step (donated state) on the
flagship decoder at the reference's training shapes (batch 16,
caption 64, article 512 — expt/goodnews/5_transformer_roberta).

Run: python benchmarks/train_bench.py [BATCH]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    TrainState, make_train_step)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def main():
    batch = ge._batch(B=BATCH, T=64, P=49, S=512, image_dim=2048,
                      article_dim=1024, vocab=50265)
    params = jax.jit(ge._flagship().init)(jax.random.PRNGKey(0), batch)
    tx = make_bert_adam(lr=1e-4, t_total=437600, warmup=0.05)

    for dtype, tag in ((None, "fp32"), (jnp.bfloat16, "bf16")):
        # The bf16 variant must ALSO build the model with dtype=bf16:
        # module-level dtype pins preferred_element_type on the
        # embedder/adaptive-softmax matmuls, and fp32 MXU throughput
        # on v5e is ~1/8 of bf16 — casting params alone leaves the
        # head (the FLOPs-dominant matmuls) at fp32 rate. Losses and
        # softmaxes stay fp32 internally either way.
        model = ge._flagship(dtype=dtype) if dtype else ge._flagship()

        def loss_fn(p, b, rng, model=model):
            return model.loss_fn(p, b, dropout_rng=rng)

        step = make_train_step(loss_fn, tx, donate=True,
                               compute_dtype=dtype)
        # fresh buffers per variant: the donated step frees its inputs
        p = jax.tree.map(jnp.copy, params)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=p,
                           opt_state=tx.init(p))
        rng = jax.random.PRNGKey(1)
        state, m = step(state, batch, rng)
        np.asarray(m["loss"])                  # compile + settle
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, rng)
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {BATCH/dt:8.1f} samples/s  ({dt*1e3:6.2f} ms/step,"
              f" loss {float(np.asarray(m['loss'])):.3f})", flush=True)


if __name__ == "__main__":
    main()
