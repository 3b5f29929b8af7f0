"""Train-step MFU from XLA cost analysis (FLOPs + bytes) and the
measured step time. Numbers in BASELINE.md (50.4% at B=256).

Run: python benchmarks/train_mfu.py [BATCH] [MEASURED_MS]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from benchmarks.flash_train_bench import flagship  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    create_o2_train_state, make_train_step)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
MEASURED_MS = float(sys.argv[2]) if len(sys.argv) > 2 else None
V5E_PEAK_TFLOPS = 197.0  # bf16 spec peak


def main():
    batch = ge._batch(B=B, T=64, P=49, S=512, image_dim=2048,
                      article_dim=1024, vocab=50265)
    model = flagship(True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tx = make_bert_adam(lr=1e-4, t_total=437600, warmup=0.05)

    def loss_fn(p, b, r):
        return model.loss_fn(p, b, dropout_rng=r)

    step = make_train_step(loss_fn, tx, donate=False,
                           compute_dtype=jnp.bfloat16, o2_master=True)
    state = create_o2_train_state(params, tx)
    comp = jax.jit(step).lower(state, batch,
                               jax.random.PRNGKey(1)).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = ca.get("flops", 0.0)
    print(f"B={B}: {flops/1e12:.3f} TFLOP/step, "
          f"{ca.get('bytes accessed', 0)/1e9:.2f} GB accessed")
    if MEASURED_MS:
        ach = flops / 1e12 / (MEASURED_MS / 1e3)
        print(f"at {MEASURED_MS} ms/step: {ach:.1f} TFLOP/s = "
              f"{ach/V5E_PEAK_TFLOPS*100:.1f}% of spec peak")


if __name__ == "__main__":
    main()
