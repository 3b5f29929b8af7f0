"""int8 serving-mode fidelity on a TRAINED (peaked) flagship model.

`int8_fidelity_bench.py` measures the WORST case: random weights give
near-uniform logits, so the top-2 candidates sit inside the
quantization noise and a single flip cascades autoregressively.
Production serving decodes a *trained* model whose distributions are
peaked; this harness produces that regime without real data by
overfitting the flagship on 8 fixed synthetic batches (the
train_stability_run recipe: loss 15.4 -> ~3 after 1000 steps, i.e.
the model substantially memorizes the 1024 feature->caption pairs),
then compares beam-5 decodes on in-distribution features:
exact bf16 vs quantize_kv vs quantize_kv+quantize_head.

Numbers + interpretation in BASELINE.md ("int8-mode fidelity").

Run: python benchmarks/trained_int8_fidelity.py [STEPS] [TRAIN_BATCH]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from benchmarks.flash_train_bench import flagship  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    create_o2_train_state, make_train_step)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 800
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
EVAL_B, MAX_LEN, BEAM = 64, 32, 5


def _cast(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, t)


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
    for i in range(N):
        state, m = step(state, batches[i % 8], rng)
        if i % 200 == 199:
            print(f"step {i+1}: loss "
                  f"{float(np.asarray(m['loss'])):.4f}", flush=True)
    print(f"trained {N} steps in {time.perf_counter()-t0:.0f}s, "
          f"final loss {float(np.asarray(m['loss'])):.4f}", flush=True)

    # state.params ARE the bf16 stored weights (O2 storage).
    trained = state.params
    # In-distribution features: the first EVAL_B rows of training
    # batch 0 (the peaked regime serving would see).
    eval_batch = _cast(jax.tree.map(lambda x: x[:EVAL_B], batches[0]))

    outs = {}
    for name, kw in (("exact", {}),
                     ("int8_kv", {"quantize_kv": True}),
                     ("int8_both", {"quantize_kv": True,
                                    "quantize_head": True})):
        cfg = GenerationConfig(max_len=MAX_LEN, beam_size=BEAM,
                               sampling_topk=1, **kw)
        toks, scores = jax.jit(
            lambda p, b, cfg=cfg: model.generate_beam(p, b, cfg))(
                trained, eval_batch)
        outs[name] = (np.asarray(toks), np.asarray(scores))
        print(name, "done", flush=True)

    ref_t, ref_s = outs["exact"]
    for name in ("int8_kv", "int8_both"):
        t, s = outs[name]
        tok = (t[:, 0] == ref_t[:, 0]).mean()
        cap = (t[:, 0] == ref_t[:, 0]).all(axis=1).mean()
        ds = np.abs(s[:, 0] - ref_s[:, 0]).mean()
        print(f"{name}: top-beam token agreement {tok*100:.2f}%, "
              f"caption-identical {cap*100:.1f}%, "
              f"mean |dscore| {ds:.4f}")


if __name__ == "__main__":
    main()
