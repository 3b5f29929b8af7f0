"""Decode ablation: int8 adaptive-softmax word tables (quantize_head).

Beam-5 flagship captions/s at batch 128 (the bench.py configuration):
exact vs quantize_head vs quantize_kv vs both.

Run: python benchmarks/head_tables_bench.py [VARIANT]
  VARIANT in {exact, head, kv, both} (default: run head + both)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402

BATCH, MAX_LEN, BEAM, STEPS = 128, 100, 5, 30

VARIANTS = {
    "exact": {},
    "head": {"quantize_head": True},
    "kv": {"quantize_kv": True},
    "both": {"quantize_kv": True, "quantize_head": True},
}


def _cast_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, tree)


def main():
    which = sys.argv[1:] or ["head", "both"]
    model = ge._flagship(dtype=jnp.bfloat16)
    init_batch = ge._batch(B=2, T=32, P=49, S=512, image_dim=2048,
                           article_dim=1024, vocab=50265)
    params = _cast_bf16(jax.jit(model.init)(jax.random.PRNGKey(0),
                                            init_batch))
    warm = _cast_bf16(ge._batch(B=BATCH, T=32, P=49, S=512,
                                image_dim=2048, article_dim=1024,
                                vocab=50265))
    for name in which:
        cfg = GenerationConfig(max_len=MAX_LEN, beam_size=BEAM,
                               sampling_topk=1, **VARIANTS[name])
        gen = jax.jit(lambda p, b, cfg=cfg: model.generate_beam(
            p, b, cfg))
        out = gen(params, warm)
        np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = gen(params, warm)
        np.asarray(out[0])
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{name}: {BATCH/dt:.1f} captions/s ({dt*1e3:.1f} ms "
              f"per batch of {BATCH}, beam {BEAM})")


if __name__ == "__main__":
    main()
