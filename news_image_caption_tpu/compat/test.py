"""`python -m news_image_caption_tpu.compat.test` — the Gen-2
`final*/test.py`-shaped evaluation driver.

Capability parity target: /root/reference/final/test.py:230-387
(identical in all four final* variants): load the trained model
(latest.pt analog), loop over the test split with batched greedy
decoding, accumulate BLEU-1..4 + CIDEr, print per-interval and final
scores. Flags mirror the final* argparse surface where meaningful.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional


def parse_opt(argv: Optional[List[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Gen-2 test driver")
    p.add_argument("--config", type=str, required=True,
                   help="YAML config (replaces the final* hardcoded "
                        "hyperparameters)")
    p.add_argument("--checkpoint", type=str, default="latest",
                   help="'latest' | 'best' | step int (ref: v3/latest.pt)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_batches", type=int, default=1400,
                   help="cap like the reference's 1400-batch test loop")
    p.add_argument("--max_length", type=int, default=50,
                   help="greedy decode cap (final/custom_v3.py:327)")
    p.add_argument("--log_every", type=int, default=100)
    return p.parse_args(argv)


def test(opt) -> dict:
    import jax
    import numpy as np

    from news_image_caption_tpu.compat.eval_utils import (decode_sequence,
                                                          language_eval)
    from news_image_caption_tpu.config import (build_dataset, build_model,
                                               build_optimizer, load_config)
    from news_image_caption_tpu.generation.generator import GenerationConfig
    from news_image_caption_tpu.training.checkpoint import CheckpointStore
    from news_image_caption_tpu.training.train_step import create_train_state

    cfg = load_config(opt.config)
    model = build_model(cfg)
    ds = build_dataset(cfg, "test")

    sample = next(ds.batches(opt.batch_size, shuffle=False))
    params = model.init(jax.random.PRNGKey(0), sample)
    ser = (cfg.get("trainer", {}).get("serialization_dir")
           or os.path.join(os.path.dirname(opt.config) or ".",
                           "serialization"))
    ckpt_dir = os.path.join(ser, "checkpoints")
    if os.path.isdir(ckpt_dir):
        store = CheckpointStore(ckpt_dir)
        state = create_train_state(params, build_optimizer(cfg))
        try:
            which = (int(opt.checkpoint)
                     if opt.checkpoint.isdigit() else opt.checkpoint)
            state = store.load(state, which)
            params = state.params
        except FileNotFoundError:
            print(f"warning: checkpoint {opt.checkpoint!r} not found; "
                  f"random init", file=sys.stderr)

    gcfg = GenerationConfig(max_len=opt.max_length)
    gen = jax.jit(lambda p, b: model.generate(p, b, gcfg))

    preds = []
    for bi, batch in enumerate(ds.batches(opt.batch_size,
                                          shuffle=False)):
        if bi >= opt.max_batches:
            break
        toks, _ = gen(params, batch)
        # generate() returns tokens INCLUDING the bos seed; the seed
        # id is a special, so decoding it would terminate every
        # caption at position 0.
        caps = decode_sequence(None, np.asarray(toks)[:, 1:])
        refs = decode_sequence(
            None, np.asarray(batch["caption_ids"])[:, 1:])
        preds.extend({"image_id": len(preds) + i, "caption": c,
                      "gt": [r]} for i, (c, r) in
                     enumerate(zip(caps, refs)))
        if (bi + 1) % opt.log_every == 0:
            interim = language_eval(preds)
            print(f"batch {bi + 1}: BLEU-4 "
                  f"{interim['Bleu_4'] * 100:.2f} CIDEr "
                  f"{interim['CIDEr']:.3f}", flush=True)
    stats = language_eval(preds)
    out = {f"bleu-{i}": stats[f"Bleu_{i}"] * 100 for i in range(1, 5)}
    out["cider"] = stats["CIDEr"]
    out["n_samples"] = len(preds)
    return out


def main(argv=None) -> int:
    opt = parse_opt(argv)
    print(json.dumps(test(opt)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
