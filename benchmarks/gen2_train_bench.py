"""A/B the Gen-2 loss form inside the full Gen-2 train step.

Same experiment as `head_loss_bench.py` but for the Gen-2 family: the
pre-r4 `loss_fn` materialized log_softmax over [B, T, 50265] (the
`Gen2Transformer.log_probs` path) before the smoothed-CE gather; the
r4 form (`label_smoothing_loss_from_logits`) consumes the generator
LOGITS with reductions only. Runs the complete jitted train step
(Noam/Adam, donated, bf16 compute) under both forms in one process at
the shipped `configs/goodnews/gen2_roberta.yaml` dims — d=1024, 3
layers, vocab 50265, caption 64, article 512x1024, image 196x1024
(parity: /root/reference/final_roberta2/custom_v4.py).

Run: python benchmarks/gen2_train_bench.py [BATCH ...]   (default 64)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.models import gen2 as G  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    TrainState, make_train_step)

STEPS = 30


def legacy_loss_fn(self, params, batch, dropout_rng=None):
    """The pre-r4 Gen2Captioner.loss_fn: log-prob materialization."""
    tgt_in = batch["caption_ids"][:, :-1]
    tgt_y = batch["caption_ids"][:, 1:]
    deterministic = dropout_rng is None
    rngs = {} if deterministic else {"dropout": dropout_rng}
    lp = self.module.apply(
        params, self._memory(batch), tgt_in,
        src_masks=self._src_masks(batch),
        deterministic=deterministic, rngs=rngs,
        method=G.Gen2Transformer.log_probs)
    loss, ntokens = G.label_smoothing_loss(
        lp, tgt_y, pad_id=self.module.pad_id, smoothing=self.smoothing)
    sample = jnp.maximum(ntokens, 1)
    return loss / sample, {"loss_sum": loss, "sample_size": ntokens}


def run(B, form):
    import optax
    model = G.Gen2Captioner(
        vocab_size=50265, d_model=1024, d_ff=4096, num_heads=8,
        num_layers=3, img_dim=1024, sent_dim=1024, pad_id=1)
    batch = ge._batch(B=B, T=64, P=196, S=512, image_dim=1024,
                      article_dim=1024, vocab=50265)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-4)

    def loss_fn(p, b, r):
        return model.loss_fn(p, b, dropout_rng=r)

    step = make_train_step(loss_fn, tx, donate=True,
                           compute_dtype=jnp.bfloat16)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, rng)     # compile
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    loss = float(metrics["loss"])                # stream barrier
    dt = (time.perf_counter() - t0) / STEPS
    print(f"B={B} {form:12s}: {dt*1e3:7.2f} ms/step "
          f"{B/dt:7.1f} samples/s (loss {loss:.4f})", flush=True)
    return dt


def main():
    batches = [int(a) for a in (sys.argv[1:] or ["64"])]
    new = G.Gen2Captioner.loss_fn
    for B in batches:
        G.Gen2Captioner.loss_fn = legacy_loss_fn
        dt_old = run(B, "log_softmax")
        G.Gen2Captioner.loss_fn = new
        dt_new = run(B, "lse-gather")
        print(f"B={B} speedup {dt_old/dt_new:.3f}x", flush=True)


if __name__ == "__main__":
    main()
