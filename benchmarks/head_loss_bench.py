"""A/B the adaptive-head loss form inside the full flagship train step.

VERDICT-r3 item 7 named the adaptive head (~60% MXU, 9.3 ms of the
B=64 flash+o2 step) as the last profiled train headroom. Hypothesis:
the cost is not the band matmuls but the [N, band_v] fp32 log-prob
matrices `log_softmax + gather` materializes (head 7k + tails
15k/30k wide ≈ 856 MB/step at B=64) — `logsumexp - gather` consumes
the logits with reductions only. This bench runs the COMPLETE train
step (flash+o2+hw-PRNG, the production fast path) under both forms
in one process.

Run: python benchmarks/head_loss_bench.py [BATCH ...]   (default 64 256)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.ops import adaptive as A  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    create_o2_train_state, make_train_step)

STEPS = 30


def legacy_loss_sum(self, x, target, padding_idx=1, embed_tables=None,
                    deterministic=True):
    """The pre-r4 form: per-band log_softmax materialized, then a
    one-column gather (bitwise-same math, different dataflow)."""
    c0 = self.cutoff[0]
    ranges = A.band_ranges(self.cutoff)
    head_target = target
    for i, (lo, hi) in enumerate(ranges[1:]):
        in_band = (target >= lo) & (target < hi)
        head_target = jnp.where(in_band, c0 + i, head_target)
    hlog = jax.nn.log_softmax(
        self.head_logits(x, embed_tables).astype(jnp.float32), axis=-1)
    head_nll = -jnp.take_along_axis(
        hlog, head_target[:, None], axis=1)[:, 0]
    head_valid = head_target != padding_idx
    loss = jnp.sum(jnp.where(head_valid, head_nll, 0.0))
    for i, (lo, hi) in enumerate(ranges[1:], start=1):
        in_band = (target >= lo) & (target < hi)
        tgt_in = jnp.clip(target - lo, 0, hi - lo - 1)
        tlog = jax.nn.log_softmax(
            self.tail_logits(x, i, embed_tables,
                             deterministic).astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(tlog, tgt_in[:, None], axis=1)[:, 0]
        valid = in_band & (tgt_in != padding_idx)
        loss = loss + jnp.sum(jnp.where(valid, nll, 0.0))
    ntokens = jnp.sum((target != padding_idx).astype(jnp.int32))
    return loss, ntokens


def run(B, loss_form):
    from benchmarks.flash_train_bench import flagship
    model = flagship(True)
    batch = ge._batch(B=B, T=64, P=49, S=512, image_dim=2048,
                      article_dim=1024, vocab=50265)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tx = make_bert_adam(lr=1e-4, t_total=1000, warmup=0.05)

    def loss_fn(p, b, r):
        return model.loss_fn(p, b, dropout_rng=r)

    step = make_train_step(loss_fn, tx, donate=True,
                           compute_dtype=jnp.bfloat16, o2_master=True)
    state = create_o2_train_state(params, tx)
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, rng)     # compile
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    loss = float(metrics["loss"])                # stream barrier
    dt = (time.perf_counter() - t0) / STEPS
    print(f"B={B} {loss_form:12s}: {dt*1e3:7.2f} ms/step "
          f"{B/dt:7.1f} samples/s (loss {loss:.4f})", flush=True)
    return dt, loss


def main():
    batches = [int(a) for a in (sys.argv[1:] or ["64", "256"])]
    lse = A.AdaptiveSoftmax.loss_sum
    for B in batches:
        A.AdaptiveSoftmax.loss_sum = legacy_loss_sum
        dt_old, loss_old = run(B, "log_softmax")
        A.AdaptiveSoftmax.loss_sum = lse
        dt_new, loss_new = run(B, "lse-gather")
        print(f"B={B} speedup {dt_old/dt_new:.3f}x, "
              f"|dloss|={abs(loss_old-loss_new):.2e}", flush=True)


if __name__ == "__main__":
    main()
