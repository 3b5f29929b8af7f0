"""Family-breadth decode throughput: Gen-1 LSTM and Gen-2 transformer
captioners at reference-scale dims on one TPU chip.

The flagship (Gen-3) beam numbers live in bench.py/BASELINE.md; this
records that the OTHER model generations also decode at production
rates through the same scan/cache machinery. Reference scales:
- Gen-1 (/root/reference/opts.py): vocab ~9487, rnn 512, fc 2048,
  att 196x2048 (14x14 ResNet grid), seq_length 16, greedy (beam 1 is
  the reference default, opts.py:69-70).
- Gen-2 (/root/reference/final/custom_v3.py): d_model 512, 3 layers,
  heads 8, vocab ~30k BPE, article sentence memory, max 50 tokens.

Run: python benchmarks/family_decode_bench.py [BATCH]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from news_image_caption_tpu.models.gen1 import (  # noqa: E402
    Gen1Captioner, Gen1Model)
from news_image_caption_tpu.models.gen2 import (  # noqa: E402
    Gen2Captioner, Gen2Transformer)
from news_image_caption_tpu.generation.generator import (  # noqa: E402
    GenerationConfig)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
STEPS = 20


def bench(fn, out_fetch, n=STEPS):
    out = fn()
    np.asarray(out_fetch(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out_fetch(out))
    return (time.perf_counter() - t0) / n


def gen1_bench(model_type: str):
    rng = jax.random.PRNGKey(0)
    model = Gen1Model(Gen1Captioner(
        model_type=model_type, vocab_size=9487, seq_length=16))
    batch = {
        "seq": jax.random.randint(rng, (BATCH, 17), 1, 9487),
        "mask": jnp.ones((BATCH, 17), jnp.float32),
        "fc_feats": jax.random.normal(rng, (BATCH, 2048)),
        "att_feats": jax.random.normal(rng, (BATCH, 196, 2048)),
    }
    params = model.init(jax.random.PRNGKey(1), batch)
    f = jax.jit(lambda p, b: model.sample(p, b, max_len=16))
    dt = bench(lambda: f(params, batch), lambda o: o[0])
    print(f"gen1 {model_type:10s} greedy B={BATCH}: "
          f"{BATCH/dt:.1f} captions/s ({dt*1e3:.1f} ms/batch)")


def gen2_bench():
    rng = jax.random.PRNGKey(0)
    model = Gen2Captioner(Gen2Transformer(
        vocab_size=30522, img_dim=1024, sent_dim=300))
    batch = {
        "caption_ids": jax.random.randint(rng, (BATCH, 20), 3, 30522),
        "image": jax.random.normal(rng, (BATCH, 49, 1024)),
        "article": jax.random.normal(rng, (BATCH, 60, 300)),
        "article_mask": jnp.zeros((BATCH, 60), bool),
    }
    params = model.init(jax.random.PRNGKey(1), batch)
    cfg = GenerationConfig(max_len=50, bos_id=1, eos_id=2, pad_id=0,
                           sampling_topk=1)
    f = jax.jit(lambda p, b: model.generate(p, b, cfg))
    dt = bench(lambda: f(params, batch), lambda o: o[0])
    print(f"gen2 OnlyDecoder greedy B={BATCH} (50 steps): "
          f"{BATCH/dt:.1f} captions/s ({dt*1e3:.1f} ms/batch)")


def pointer_bench():
    """Gen-3 pointer variant at FLAGSHIP dims (copy mechanism per
    decode step: entity gate + aggregated copy distribution,
    transformer_pointer.py:427-640), bf16, greedy, max_len 32."""
    import __graft_entry__ as ge
    from news_image_caption_tpu.models.pointer import TransformerPointer

    B, T, P, S, V = 64, 8, 49, 512, 50265
    rng = jax.random.PRNGKey(0)
    model = TransformerPointer(
        captioner=ge._flagship(dtype=jnp.bfloat16),
        embed_dim=1024, num_heads=16, article_dim=1024)
    ks = jax.random.split(rng, 4)
    caption = jax.random.randint(ks[0], (B, T), 2, V).at[:, 0].set(0)
    batch = {
        "caption_ids": caption,
        "caption_copy_masks": jnp.zeros((B, T), jnp.int32),
        "image": jax.random.normal(ks[1], (B, P, 2048), jnp.bfloat16),
        "image_mask": jnp.zeros((B, P), bool),
        "article": jax.random.normal(ks[2], (B, S, 1024),
                                     jnp.bfloat16),
        "article_mask": jnp.zeros((B, S), bool),
        "article_ids": jax.random.randint(ks[3], (B, S), 2, V),
        "context_proper_masks": (
            jax.random.uniform(ks[3], (B, S)) > 0.9).astype(jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), batch)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables)
    cfg = GenerationConfig(max_len=32, sampling_topk=1)
    f = jax.jit(lambda v, b: model.generate(v, b, cfg))
    dt = bench(lambda: f(variables, batch), lambda o: o[0])
    print(f"gen3 pointer (copy mechanism) greedy B={B} (32 steps): "
          f"{B/dt:.1f} captions/s ({dt*1e3:.1f} ms/batch)")


def main():
    for mt in ("att2in2", "topdown", "show_attend_tell"):
        gen1_bench(mt)
    gen2_bench()
    pointer_bench()


if __name__ == "__main__":
    main()
