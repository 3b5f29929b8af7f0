"""Flagship e2e production loop on the real chip (VERDICT r03 item 3).

Composes the individually-proven pieces at flagship dims:
  synthetic news examples -> f16 NICS shards on disk (one-time)
  -> `tellax train` (nics_shards dataset -> C++ SoA prefetch reader
     -> flash+O2-bf16 donated train step, async checkpoints)
  -> SIGTERM mid-run -> clean preemption checkpoint -> `tellax train
     -r` resume -> completion
  -> `tellax evaluate` -> generations.jsonl + metrics
  -> best checkpoint exported as a flat .npz for the spec-decode /
     int8-fidelity benches (a TRAINED = peaked flagship).

Reference contract: callback_apex_trainer.py:278-317 (train loop),
commands/evaluate.py:31-177 (evaluate).

Run: python benchmarks/e2e_flagship_run.py [--steps-before-sigterm N]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

RUN_DIR = Path("/tmp/nic_e2e")
SHARD_DIR = RUN_DIR / "shards"
T, P, S, IMG, ART, V = 64, 49, 512, 2048, 1024, 50265
N_TRAIN, PER_SHARD = 8192, 512
N_VAL = 256
BATCH = 64
MODEL = dict(embed_dim=1024, ffn_dim=4096, num_heads=16,
             num_layers=4, kernel_sizes=[3, 7, 15, 31],
             cutoff=[5000, 20000, 50265])
PLATFORM = None       # --tiny: "cpu"
NUM_EPOCHS, LOG_EVERY = 8, 16


SPAN = False          # --span: memorizable span-structured dataset
SPAN_REPEAT = 1       # train-shard tiling factor (see set_span)


def set_span():
    """Nonzero-quality e2e (VERDICT r4 item 5): train on a SMALL fixed
    set of span-structured rows (captions copy verbatim article spans
    at news-like structure, f=2/3 span=12 — the BASELINE.md
    span-curve regime) so the flagship MEMORIZES them, then evaluate
    on a held-IN subset. Features are random, so memorization is the
    only route to captions (BASELINE.md r4 explains why uniform-random
    captions produce structural zeros: argmax-EOS empty generations);
    val/test being subsets of train is therefore the point, not a
    leak — the target is nonzero BLEU/CIDEr/METEOR through the
    production CLI train -> evaluate -> compute_metrics path at
    flagship dims, the closest available stand-in for the blocked
    real-checkpoint quality parity."""
    global SPAN, SPAN_REPEAT, RUN_DIR, SHARD_DIR
    global N_TRAIN, PER_SHARD, N_VAL, NUM_EPOCHS, LOG_EVERY
    SPAN = True
    RUN_DIR = Path("/tmp/nic_e2e_span")
    SHARD_DIR = RUN_DIR / "shards"
    N_TRAIN, PER_SHARD, N_VAL = 512, 512, 256
    # 832 steps total at B=64 ≈ the overfit recipe
    # spec_decode_trained/spans measured (800 @ B=128; ~100 views per
    # row either way). The 512 distinct rows are TILED 13x in the
    # train shards so an epoch is 104 steps, not 8 — per-epoch
    # validation/checkpoint overhead (two 80 MB tunnel transfers per
    # val batch) otherwise dominates the run.
    SPAN_REPEAT = 13
    NUM_EPOCHS, LOG_EVERY = 8, 16


def build_span_shards():
    # spec_decode_spans (via flash_train_bench) parses sys.argv at
    # import; hide this driver's flags from it.
    argv, sys.argv = sys.argv, sys.argv[:1]
    try:
        import benchmarks.spec_decode_spans as sds
    finally:
        sys.argv = argv
    from news_image_caption_tpu.data.native_loader import write_shard
    sds.T, sds.S, sds.VOCAB = T, S, V
    SHARD_DIR.mkdir(parents=True, exist_ok=True)
    done = SHARD_DIR / ".done"
    if done.exists():
        return
    rng = np.random.default_rng(11)
    articles = rng.integers(4, V, (N_TRAIN, S)).astype(np.int32)
    # span 12 = the news-like BASELINE.md row; clamped for toy dims
    # (span must leave room for a source start position)
    span = min(12, S - 1, T - 2)
    caps, actual_f = sds.span_copy_captions(
        articles, 2 / 3, span, np.random.default_rng(12))
    print(f"[driver] span dataset: copy fraction {actual_f:.3f}",
          flush=True)
    feat = np.random.default_rng(13)
    image = feat.standard_normal((N_TRAIN, P, IMG)).astype(np.float16)
    article = feat.standard_normal((N_TRAIN, S, ART)).astype(
        np.float16)
    rows = {
        "caption_ids": caps.astype(np.int32),
        "article_ids": articles,
        "image": image,
        "article": article,
        "article_mask": np.zeros((N_TRAIN, S), np.uint8),
        "image_mask": np.zeros((N_TRAIN, P), np.uint8),
    }
    train_idx = np.tile(np.arange(N_TRAIN), SPAN_REPEAT)
    train_idx = np.random.default_rng(14).permutation(train_idx)
    splits = {"train": train_idx,
              "val": np.arange(N_VAL),                    # memorized
              "test": np.arange(N_TRAIN - N_VAL, N_TRAIN)}
    for split, idx in splits.items():
        for shard_i, lo in enumerate(range(0, len(idx), PER_SHARD)):
            sel = idx[lo:lo + PER_SHARD]
            rec = {k: v[sel] for k, v in rows.items()}
            path = SHARD_DIR / f"{split}-{shard_i:03d}.nics"
            write_shard(str(path), rec)
            print("wrote", path, len(sel), flush=True)
    done.touch()


def _retarget(run_dir: Path):
    global RUN_DIR, SHARD_DIR
    RUN_DIR = run_dir
    SHARD_DIR = RUN_DIR / "shards"


def set_tiny():
    """CPU smoke of the whole driver (SIGTERM dance, meta, recover,
    evaluate, export) at toy dims."""
    global RUN_DIR, SHARD_DIR, T, P, S, IMG, ART, V
    global N_TRAIN, PER_SHARD, N_VAL, BATCH, MODEL, PLATFORM
    global NUM_EPOCHS, LOG_EVERY
    RUN_DIR = Path("/tmp/nic_e2e_tiny")
    SHARD_DIR = RUN_DIR / "shards"
    T, P, S, IMG, ART, V = 12, 4, 6, 16, 24, 64
    N_TRAIN, PER_SHARD, N_VAL, BATCH = 64, 32, 16, 4
    MODEL = dict(embed_dim=16, ffn_dim=32, num_heads=4,
                 num_layers=2, kernel_sizes=[3, 5],
                 cutoff=[16, 32, 64])
    PLATFORM = "cpu"
    NUM_EPOCHS, LOG_EVERY = 40, 4


def build_shards():
    from news_image_caption_tpu.data.dataset import SyntheticNewsDataset
    from news_image_caption_tpu.data.native_loader import write_shard
    SHARD_DIR.mkdir(parents=True, exist_ok=True)
    done = SHARD_DIR / ".done"
    if done.exists():
        return
    for split, n, seed in (("train", N_TRAIN, 0), ("val", N_VAL, 1),
                           ("test", N_VAL, 2)):
        ds = SyntheticNewsDataset(
            size=n, vocab_size=V, caption_len=T, article_len=S,
            n_patches=P, image_dim=IMG, article_dim=ART, seed=seed)
        idx = 0
        shard_i = 0
        while idx < n:
            take = min(PER_SHARD, n - idx)
            batch = ds.collate([ds[i] for i in range(idx, idx + take)])
            rec = {
                "caption_ids": batch["caption_ids"].astype(np.int32),
                "article_ids": batch["article_ids"].astype(np.int32),
                "image": batch["image"].astype(np.float16),
                "article": batch["article"].astype(np.float16),
                "article_mask": batch["article_mask"].astype(np.uint8),
                "image_mask": batch["image_mask"].astype(np.uint8),
            }
            path = SHARD_DIR / f"{split}-{shard_i:03d}.nics"
            write_shard(str(path), rec)
            print("wrote", path, take, flush=True)
            idx += take
            shard_i += 1
    done.touch()


def write_config():
    import yaml
    cfg = {
        "dataset": {
            "type": "nics_shards",
            "train": {"pattern": str(SHARD_DIR / "train-*.nics")},
            "val": {"pattern": str(SHARD_DIR / "val-*.nics")},
            "test": {"pattern": str(SHARD_DIR / "test-*.nics")},
        },
        "model": {"type": "transformer_flattened", "decoder": {
            "type": "dynamic_conv_decoder_flattened",
            "vocab_size": V, "image_dim": IMG,
            "article_dim": ART, "conv_type": "dynamic",
            "decoder_glu": True, "weight_softmax": True,
            "dropout": 0.1, "weight_dropout": 0.1,
            "input_dropout": 0.1, "attention_dropout": 0.1,
            "padding_idx": 0, "target_padding_idx": 1,
            "max_positions": 512,
            "use_flash_train": PLATFORM is None, **MODEL}},
        "iterator": {"batch_size": BATCH},
        # span mode decodes the full caption (eos sits at T-1) so the
        # memorized generations can match their references n-gram for
        # n-gram; lr/t_total follow the measured overfit recipe.
        "generation": {"max_len": T if SPAN else 32},
        "trainer": {
            "serialization_dir": str(RUN_DIR / "serialization"),
            "optimizer": {"type": "bert_adam",
                          "lr": 5e-5 if SPAN else 1e-4,
                          "warmup": 0.05,
                          "t_total": (NUM_EPOCHS * N_TRAIN
                                      * SPAN_REPEAT // BATCH
                                      if SPAN else 4000)},
            "num_epochs": NUM_EPOCHS, "patience": None,
            "num_serialized_models_to_keep": 10,
            "mixed_precision": "bf16_o2",
            "log_every": LOG_EVERY,
        },
    }
    cfg_path = RUN_DIR / "flagship_e2e.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


def run_train(cfg_path, recover=False, sigterm_after_steps=None):
    cmd = [sys.executable, "-m", "news_image_caption_tpu.cli",
           "train", str(cfg_path)] + (["-r"] if recover else [])
    if PLATFORM:
        cmd += ["--platform", PLATFORM]
    metrics_path = RUN_DIR / "serialization" / "metrics.jsonl"
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=str(REPO))
    if sigterm_after_steps is not None:
        # SIGTERM once metrics show the target step (mid-epoch).
        while proc.poll() is None:
            time.sleep(1 if PLATFORM else 10)
            try:
                lines = metrics_path.read_text().strip().split("\n")
                steps = [json.loads(ln).get("step", 0)
                         for ln in lines if ln]
                if steps and max(steps) >= sigterm_after_steps:
                    print(f"[driver] step {max(steps)} reached -> "
                          "SIGTERM", flush=True)
                    proc.send_signal(signal.SIGTERM)
                    break
            except FileNotFoundError:
                pass
    rc = proc.wait()
    print(f"[driver] train exit={rc} wall={time.time()-t0:.0f}s",
          flush=True)
    return rc


def export_npz():
    import jax

    from news_image_caption_tpu.config import (build_model,
                                               build_optimizer,
                                               load_config)
    from news_image_caption_tpu.training.checkpoint import \
        CheckpointStore
    from news_image_caption_tpu.training.train_step import \
        create_train_state
    jax.config.update("jax_platforms", "cpu")   # export is host work
    cfg = load_config(str(RUN_DIR / "flagship_e2e.yaml"), None)
    model = build_model(cfg)
    dummy = {
        "caption_ids": np.zeros((2, 8), np.int32),
        "image": np.zeros((2, P, IMG), np.float32),
        "image_mask": np.zeros((2, P), bool),
        "article": np.zeros((2, S, ART), np.float32),
        "article_mask": np.zeros((2, S), bool),
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    store = CheckpointStore(
        str(RUN_DIR / "serialization" / "checkpoints"))
    if cfg.get("trainer", {}).get("mixed_precision") == "bf16_o2":
        from news_image_caption_tpu.training.train_step import \
            create_o2_train_state
        tmpl = create_o2_train_state(params, build_optimizer(cfg))
    else:
        tmpl = create_train_state(params, build_optimizer(cfg))
    state = store.load(tmpl, "best")
    flat = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, path + (k,))
        else:
            a = np.asarray(node)
            if a.dtype.kind == "V":   # np.savez can't store bfloat16
                a = a.astype(np.float32)
            flat["/".join(path)] = a
    rec(jax.tree.map(lambda x: x, state.params), ())
    out = RUN_DIR / "flagship_trained.npz"
    np.savez(str(out), **flat)
    print(f"[driver] exported {out} ({len(flat)} leaves)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigterm-step", type=int, default=400)
    ap.add_argument("--skip-shards", action="store_true")
    ap.add_argument("--resume-only", action="store_true",
                    help="the preempted checkpoint already exists "
                    "(a prior driver run was killed after the "
                    "SIGTERM dance): skip the first train leg and "
                    "go straight to recover -> evaluate -> export")
    ap.add_argument("--tiny", action="store_true",
                    help="toy dims on CPU (driver smoke)")
    ap.add_argument("--span", action="store_true",
                    help="memorizable span-structured dataset -> "
                         "nonzero BLEU/CIDEr/METEOR through the CLI "
                         "path (see set_span)")
    args = ap.parse_args()
    if args.tiny:
        set_tiny()
        if args.sigterm_step == 400:
            args.sigterm_step = 20
    if args.span:
        set_span()
        if args.tiny:   # smoke of the span driver at toy dims
            global N_TRAIN, PER_SHARD, N_VAL, NUM_EPOCHS, SPAN_REPEAT
            RUN_DIR_ = Path("/tmp/nic_e2e_span_tiny")
            _retarget(RUN_DIR_)
            N_TRAIN, PER_SHARD, N_VAL = 64, 64, 32
            NUM_EPOCHS, SPAN_REPEAT = 20, 2
        elif args.sigterm_step == 400:
            args.sigterm_step = 300
    RUN_DIR.mkdir(parents=True, exist_ok=True)
    if not args.skip_shards:
        build_span_shards() if SPAN else build_shards()
    cfg_path = write_config()
    if not args.resume_only:
        rc = run_train(cfg_path,
                       sigterm_after_steps=args.sigterm_step)
        assert rc == 0, "preempted train must exit 0"
    meta_path = (RUN_DIR / "serialization" / "checkpoints"
                 / "meta.json")
    meta = json.loads(meta_path.read_text())
    latest = meta.get("checkpoints", meta)
    print("[driver] meta after SIGTERM:", str(latest)[-400:],
          flush=True)
    assert "preempted" in meta_path.read_text(), (
        "expected a preempted checkpoint entry — did training finish "
        "before the SIGTERM? raise --sigterm-step headroom")
    rc = run_train(cfg_path, recover=True)
    assert rc == 0, "resumed train failed"
    ecmd = [sys.executable, "-m", "news_image_caption_tpu.cli",
            "evaluate", str(cfg_path), "--split", "test"]
    if not SPAN:
        # span mode keeps enrichment: compute_metrics consumes the
        # enriched records downstream
        ecmd += ["--no-enrich"]
    if PLATFORM:
        ecmd += ["--platform", PLATFORM]
    rc = subprocess.call(ecmd, cwd=str(REPO))
    print(f"[driver] evaluate exit={rc}", flush=True)
    if SPAN:
        gen_path = RUN_DIR / "serialization" / "generations.jsonl"
        rc = subprocess.call(
            [sys.executable, "-m",
             "news_image_caption_tpu.evaluation.compute_metrics",
             str(gen_path)], cwd=str(REPO))
        print(f"[driver] compute_metrics exit={rc}", flush=True)
        em = json.loads((RUN_DIR / "serialization"
                         / "evaluate-metrics.json").read_text())
        print("[driver] evaluate metrics:", json.dumps(em),
              flush=True)
        assert em["bleu-4"] > 0 and em["cider"] > 0, (
            "span-mode e2e must emit nonzero quality metrics "
            f"(got {em})")
    export_npz()
    metrics = [json.loads(ln) for ln in
               (RUN_DIR / "serialization" / "metrics.jsonl")
               .read_text().strip().split("\n")]
    train_rows = [m for m in metrics if m.get("split") == "train"]
    print(json.dumps({
        "rows": len(train_rows),
        "first_loss": train_rows[0]["loss"],
        "last_loss": train_rows[-1]["loss"],
        "max_step": max(m.get("step", 0) for m in metrics),
        "input_wait_last": train_rows[-1].get("input_wait"),
    }), flush=True)


if __name__ == "__main__":
    main()
