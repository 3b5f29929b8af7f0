"""Online-encoder training call stack on TPU (VERDICT r4 item 3).

The reference's Gen-3 trainer runs ResNet-152 + RoBERTa-large INSIDE
the train loop under no_grad
(/root/reference/ttl/tell/models/transformer_flattened.py:185-221,
SURVEY.md §3.2); this repo's production path trains from
offline-materialized features. The in-loop path exists
(models/pipeline.py::Gen3Pipeline, `transformer_weighted_roberta.yaml`)
but had no TPU number — this bench measures it end-to-end:

  raw uint8 images [B, 256, 256, 3] -> normalize + center crop 224
  -> frozen ResNet-152 layer4 patches (49 x 2048)
  -> frozen RoBERTa-large over 512-token articles (24 layers, 1024)
  -> 25-layer softmax-weighted sum (weigh_bert, TRAINABLE bert_weight)
  -> flagship dynamic-conv decoder fwd + bwd + masked BertAdam

at reference-like dims (config.yaml trains B=16 at ~27 samples/s on
its GPU). Precision: O2-true storage (bf16 stored params + fp32
master), flash decoder attention, bf16 encoder compute (RobertaEncoder
dtype=bf16; the ResNet follows its stored param dtype). The optimizer
masks the frozen collections (training/optim.py::mask_frozen) — no
moments for the 415M frozen encoder params.

Second row: `tellax preprocess` materialization throughput
(data/materialize.py — the offline pass that replaces this in-loop
work), instances/s at the same encoder dims, fp32-default and
bf16-encoder variants.

Batches are pre-placed on device; steps stream with one end barrier
(the r03 dispatch discipline — the axon tunnel otherwise dominates).

Run: python benchmarks/online_encoder_bench.py [--tiny] [B ...]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

TINY = "--tiny" in sys.argv
if TINY:
    sys.argv.remove("--tiny")
B_LIST = [int(x) for x in sys.argv[1:]] or ([4] if TINY else [16, 32, 64])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from news_image_caption_tpu.models.pipeline import Gen3Pipeline  # noqa: E402
from news_image_caption_tpu.models.resnet import ResNetTrunk  # noqa: E402
from news_image_caption_tpu.models.roberta import RobertaEncoder  # noqa: E402
from news_image_caption_tpu.training.optim import (make_bert_adam,  # noqa: E402
                                                   mask_frozen)
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    create_o2_train_state, make_train_step)

STEPS = 3 if TINY else 20
T, S, VOCAB = (12, 48, 64) if TINY else (64, 512, 50265)
IMG_RAW = 64 if TINY else 256


def build_model():
    if TINY:
        return Gen3Pipeline(
            resnet=ResNetTrunk(depth=18, num_stages=3),
            roberta=RobertaEncoder(vocab_size=VOCAB, hidden=16,
                                   num_layers=2, heads=4,
                                   intermediate=32, max_positions=64,
                                   dtype=jnp.bfloat16),
            weigh_bert=True, vocab_size=VOCAB, cutoff=(16, 32, VOCAB),
            embed_dim=16, ffn_dim=32, num_heads=4, num_layers=1,
            kernel_sizes=(3,), image_dim=64, article_dim=16,
            max_positions=64, dtype=jnp.bfloat16)
    return Gen3Pipeline(
        resnet=ResNetTrunk(depth=152, num_stages=4),
        roberta=RobertaEncoder(dtype=jnp.bfloat16),
        weigh_bert=True,
        vocab_size=VOCAB, cutoff=(5000, 20000, VOCAB), embed_dim=1024,
        ffn_dim=4096, num_heads=16, num_layers=4,
        kernel_sizes=(3, 7, 15, 31), image_dim=2048, article_dim=1024,
        max_positions=512, dtype=jnp.bfloat16, use_flash_train=True)


def make_batch(B, key=0):
    rng = np.random.RandomState(key)
    lens = rng.randint(S // 2, S + 1, B)
    art = np.where(np.arange(S)[None] < lens[:, None],
                   rng.randint(4, VOCAB, (B, S)), 1).astype(np.int32)
    cap = rng.randint(4, VOCAB, (B, T)).astype(np.int32)
    cap[:, 0] = 0
    return {
        "image": jnp.asarray(
            rng.randint(0, 256, (B, IMG_RAW, IMG_RAW, 3), np.uint8)),
        "article_ids": jnp.asarray(art),
        "caption_ids": jnp.asarray(cap),
    }


def bench_train():
    model = build_model()
    tx = mask_frozen(
        make_bert_adam(lr=1e-4, t_total=437600, warmup=0.05),
        model.frozen_collections)

    for B in B_LIST:
        batch = jax.device_put(make_batch(B))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        state = create_o2_train_state(params, tx)
        step = make_train_step(model.loss_fn, tx,
                               compute_dtype=jnp.bfloat16,
                               o2_master=True)
        rng = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        state, m = step(state, batch, rng)
        np.asarray(m["loss"])
        compile_s = time.perf_counter() - t0
        for _ in range(2):
            state, m = step(state, batch, rng)
        # np.asarray fetch is the only true completion barrier on the
        # axon backend (block_until_ready can return early — NOTES);
        # the loss is a scalar, so the fetch costs one RTT.
        np.asarray(m["loss"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, batch, rng)
        np.asarray(m["loss"])   # one end barrier (host fetch)
        dt = (time.perf_counter() - t0) / STEPS
        print(json.dumps({
            "mode": "gen3_pipeline_train", "batch": B,
            "ms_per_step": round(dt * 1e3, 2),
            "samples_per_s": round(B / dt, 1),
            "loss": round(float(np.asarray(m["loss"])), 3),
            "compile_s": round(compile_s, 1)}), flush=True)
        del state, params


def bench_preprocess():
    """`tellax preprocess` materialization throughput: jsonl records
    -> BPE + copy masks -> frozen encoders -> NICS shards."""
    from news_image_caption_tpu.data.bpe import ByteBPE
    from news_image_caption_tpu.data.indexer import RobertaCopyIndexer
    from news_image_caption_tpu.data.materialize import (
        FeatureEncoders, materialize)

    n_rec = 32 if TINY else 256
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "Smith", "Jones", "Paris"]
    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "recs.jsonl")
    with open(path, "w") as f:
        for i in range(n_rec):
            art = " ".join(rng.choice(words, 500))
            cap = " ".join(rng.choice(words, 12))
            f.write(json.dumps({"caption": cap, "article": art}) + "\n")

    # vocab build is a one-time artifact; excluded like a checkpoint
    from news_image_caption_tpu.data.readers import JsonlNewsReader
    reader = JsonlNewsReader(path)
    corpus = [r.caption for r in reader]
    article_len = 64 if TINY else 512
    indexer = RobertaCopyIndexer(ByteBPE.train(corpus, 200),
                                 max_len=article_len)

    variants = [("fp32_default", {})]
    if not TINY:
        variants.append(
            ("bf16_encoders",
             {"roberta": RobertaEncoder(dtype=jnp.bfloat16)}))
    for label, kw in variants:
        if TINY:
            kw = {"resnet": ResNetTrunk(depth=18, num_stages=3),
                  "roberta": RobertaEncoder(
                      vocab_size=50265, hidden=16, num_layers=2,
                      heads=4, intermediate=32, max_positions=128,
                      dtype=jnp.bfloat16)}
        enc = FeatureEncoders(crop=56 if TINY else 224, **kw)
        if label == "bf16_encoders":
            enc._rv, enc._bv = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating) else x,
                (enc._rv, enc._bv))
        # warm the jits off the clock (full batch shape)
        materialize(None, os.path.join(tmp, f"warm-{label}"),
                    records_per_shard=n_rec, caption_len=16,
                    article_len=article_len, encoders=enc,
                    indexer=indexer, image_size=IMG_RAW,
                    batch_size=16,
                    reader=list(reader)[:16])
        t0 = time.perf_counter()
        paths = materialize(None, os.path.join(tmp, f"out-{label}"),
                            records_per_shard=n_rec, caption_len=16,
                            article_len=article_len, encoders=enc,
                            indexer=indexer, image_size=IMG_RAW,
                            batch_size=16, reader=reader)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "mode": "preprocess_materialize", "variant": label,
            "records": n_rec, "seconds": round(dt, 2),
            "instances_per_s": round(n_rec / dt, 1),
            "shards": len(paths)}), flush=True)


if __name__ == "__main__":
    bench_train()
    bench_preprocess()
