"""Caption fidelity of the int8 serving modes at flagship scale.

Beam-5 exact vs quantize_kv vs quantize_kv+quantize_head on RANDOM
weights — deliberately the WORST-case regime (near-uniform logits put
the top-2 candidates inside the quantization noise, and one flip
cascades autoregressively). Numbers + interpretation in BASELINE.md.

Run: python benchmarks/int8_fidelity_bench.py [BATCH]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MAX_LEN, BEAM = 32, 5


def _cast(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, t)


def main():
    model = ge._flagship(dtype=jnp.bfloat16)
    params = _cast(jax.jit(model.init)(
        jax.random.PRNGKey(0),
        ge._batch(B=2, T=32, P=49, S=512, image_dim=2048,
                  article_dim=1024, vocab=50265)))
    batch = _cast(ge._batch(B=B, T=32, P=49, S=512, image_dim=2048,
                            article_dim=1024, vocab=50265, key=7))
    outs = {}
    for name, kw in (("exact", {}),
                     ("int8_kv", {"quantize_kv": True}),
                     ("int8_both", {"quantize_kv": True,
                                    "quantize_head": True})):
        cfg = GenerationConfig(max_len=MAX_LEN, beam_size=BEAM,
                               sampling_topk=1, **kw)
        toks, scores = jax.jit(
            lambda p, b, cfg=cfg: model.generate_beam(p, b, cfg))(
                params, batch)
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
