"""decoder.remat at large batch: does rematerialization buy batch?

remat trades ~1 extra layer forward of FLOPs for not storing the
per-layer activations — the standard TPU memory-for-FLOPs lever. The
question NOTES left open: at which batch does the flagship train step
OOM without remat on one v5e chip, and what does remat cost/enable
there.

For each batch in the sweep, runs the fast path (flash attention +
O2-true bf16 stored params) with remat off and on; an OOM is caught
and reported as a row (that IS the result).

Run: python benchmarks/remat_train_bench.py [B1 B2 ...]  (default
256 512)
"""

import json
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
    create_o2_train_state, make_train_step)

BATCHES = [int(a) for a in sys.argv[1:]] or [256, 512]


def flagship(remat):
    return TransformerFlattened(
        vocab_size=50265, cutoff=(5000, 20000, 50265), embed_dim=1024,
        ffn_dim=4096, num_heads=16, num_layers=4,
        kernel_sizes=(3, 7, 15, 31), image_dim=2048, article_dim=1024,
        max_positions=512, dtype=jnp.bfloat16, use_flash_train=True,
        remat=remat)


def main():
    tx = make_bert_adam(lr=1e-4, t_total=437600, warmup=0.05)
    params0 = None
    for B in BATCHES:
        batch = ge._batch(B=B, T=64, P=49, S=512, image_dim=2048,
                          article_dim=1024, vocab=50265)
        for remat in (False, True):
            model = flagship(remat)
            try:
                if params0 is None:
                    params0 = jax.jit(model.init)(
                        jax.random.PRNGKey(0), batch)

                def loss_fn(p, b, rng, model=model):
                    return model.loss_fn(p, b, dropout_rng=rng)

                step = make_train_step(loss_fn, tx, donate=True,
                                       compute_dtype=jnp.bfloat16,
                                       o2_master=True)
                state = create_o2_train_state(
                    jax.tree.map(jnp.copy, params0), tx)
                rng = jax.random.PRNGKey(1)
                state, m = step(state, batch, rng)
                loss0 = float(np.asarray(m["loss"]))
                n = 20
                t0 = time.perf_counter()
                for _ in range(n):
                    state, m = step(state, batch, rng)
                np.asarray(m["loss"])   # end-of-stream barrier
                dt = (time.perf_counter() - t0) / n
                print(json.dumps({
                    "batch": B, "remat": remat,
                    "ms_per_step": round(dt * 1e3, 2),
                    "samples_per_s": round(B / dt, 1),
                    "loss0": round(loss0, 3)}), flush=True)
                del state
            except Exception as e:   # XlaRuntimeError OOM etc.
                print(json.dumps({
                    "batch": B, "remat": remat,
                    "error": type(e).__name__,
                    "detail": str(e).split("\n")[0][:160]}),
                    flush=True)


if __name__ == "__main__":
    main()
