"""`python -m news_image_caption_tpu.compat.train --flags` — the Gen-1
training entry point, signature-compatible with the reference
`python train.py` (/root/reference/train.py:30-278):

- infinite iteration loop over `loader.get_batch('train')`;
- epoch-based LR decay (train.py:106-113) and scheduled-sampling ramp
  (train.py:114-118), both realized as schedules inside one jitted
  train step (no per-step host LR pokes);
- periodic eval + language metrics with best-CIDEr checkpointing
  (train.py:211-269) via CheckpointStore + an `infos` json.

Data: HDF5 + split JSON when --input_image_h5/--input_json are given
(H5DataLoader, the reference's get_batch contract); otherwise a
synthetic dataset (--tpu_synthetic_size) so the entry point runs
end-to-end anywhere.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


def _build_loader(opt):
    if opt.input_image_h5 and opt.input_json:
        from news_image_caption_tpu.data.readers import H5DataLoader
        return H5DataLoader(opt.input_image_h5, opt.input_json,
                            seq_per_img=opt.seq_per_img)
    if not opt.tpu_synthetic_size:
        raise SystemExit(
            "no --input_image_h5/--input_json given; pass "
            "--tpu_synthetic_size N to run on synthetic data")
    from news_image_caption_tpu.data.dataset import SyntheticNewsDataset
    return SyntheticNewsDataset(
        size=opt.tpu_synthetic_size, vocab_size=opt.tpu_vocab_size,
        caption_len=16, article_len=opt.sentence_length,
        n_patches=8, image_dim=opt.att_feat_size,
        article_dim=opt.sentence_embed_size)


def _gen1_batch(loader, opt, split: str, rng: np.random.Generator):
    """Normalize both loader kinds onto the Gen-1 batch contract."""
    if hasattr(loader, "get_batch"):                 # H5DataLoader
        data = loader.get_batch(split, opt.batch_size)
        images = data["images"].astype(np.float32) / 255.0
        # The reference runs the CNN here (train.py:151-152); feature
        # extraction is the pipeline's job in this repo — compat mode
        # mean-pools raw pixels into (fc, att) feature stand-ins when
        # no CNN weights are given, or uses ResNet when they are.
        B, H, W, C = images.shape
        P = 49
        att = images.reshape(B, -1, C)
        att = att[:, :P * (att.shape[1] // P), :].reshape(B, P, -1, C)
        # ceil-division so the declared att_feat_size is honored
        # exactly (floor gave 2046 for 2048/C=3 — silently building
        # the model at a different width than the flag says).
        rep = -(-opt.att_feat_size // C)
        att = att.mean(axis=2).repeat(rep, axis=-1)[
            ..., :opt.att_feat_size]
        # One image feeds seq_per_img captions (reference replicates
        # features per caption, dataloader.py:300-320).
        spi = max(1, data["labels"].shape[0] // max(B, 1))
        if spi > 1:
            att = att.repeat(spi, axis=0)
        return {
            "seq": data["labels"],
            # The loader's masks keep the slot AFTER the last word
            # (the <end> token) supervised; (labels != 0) would drop
            # eos supervision and captions would never terminate.
            "mask": data["masks"].astype(np.float32),
            "fc_feats": att.mean(axis=1),
            "att_feats": att,
        }, data["bounds"]["wrapped"]  # epoch flag lives under bounds
           # (the reference's data['bounds']['wrapped'] contract)
    batch = next(loader.batches(opt.batch_size,
                                seed=int(rng.integers(1 << 31))))
    return batch, False


def train(opt) -> Dict[str, float]:
    import jax

    from news_image_caption_tpu.models.gen1 import Gen1Captioner, Gen1Model
    from news_image_caption_tpu.training.checkpoint import CheckpointStore
    from news_image_caption_tpu.training.optim import gen1_adam
    from news_image_caption_tpu.training.train_step import (
        TrainState, create_train_state)

    loader = _build_loader(opt)
    rng = np.random.default_rng(0)
    vocab_size = (getattr(loader, "vocab_size", None)
                  or opt.tpu_vocab_size)
    if opt.cnn_weight:
        import logging
        logging.getLogger("compat.train").warning(
            "--cnn_weight %s is not used by this driver (feature "
            "extraction is the offline pipeline's job here — "
            "`tellax preprocess` + models/resnet.py porters); "
            "training proceeds on pooled-pixel feature stand-ins",
            opt.cnn_weight)

    model = Gen1Model(Gen1Captioner(
        model_type=opt.caption_model,
        vocab_size=vocab_size,
        input_encoding_size=opt.input_encoding_size,
        rnn_size=opt.rnn_size,
        num_layers=opt.num_layers,
        att_hid_size=opt.att_hid_size,
        fc_feat_size=opt.fc_feat_size,
        att_feat_size=opt.att_feat_size,
        drop_prob=opt.drop_prob_lm,
        sentence_embed_method=(opt.sentence_embed_method
                               if opt.sentence_embed else ""),
        sentence_embed_size=opt.sentence_embed_size,
        sentence_length=opt.sentence_length))

    batch, _ = _gen1_batch(loader, opt, "train", rng)
    iters_per_epoch = max(
        1, (getattr(loader, "size", None)
            or len(getattr(loader, "splits", {}).get("train", []))
            or opt.tpu_synthetic_size) // opt.batch_size)

    # Reference schedules, converted from epochs to steps.
    # decay_start < 0 DISABLES decay (reference train.py:108 gates on
    # `>= 0`); mapping -1 to 0 would decay from the first step.
    if opt.learning_rate_decay_start < 0:
        decay_start = 10 ** 12          # never reached
    else:
        decay_start = (opt.learning_rate_decay_start
                       * iters_per_epoch)
    decay_every = opt.learning_rate_decay_every * iters_per_epoch
    tx = gen1_adam(lr=opt.learning_rate, decay_start=decay_start,
                   decay_every=decay_every,
                   decay_rate=opt.learning_rate_decay_rate,
                   grad_clip_value=opt.grad_clip,
                   b1=opt.optim_alpha, b2=opt.optim_beta,
                   eps=opt.optim_epsilon)

    params = model.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(params, tx)
    ckpt_dir = os.path.join(opt.checkpoint_path, "checkpoints")
    store = CheckpointStore(ckpt_dir, keep=5, best_metric="cider",
                            maximize=True)
    infos_path = os.path.join(opt.checkpoint_path,
                              f"infos_{opt.id}.json")
    best_cider: Optional[float] = None
    start_iter = 0
    if opt.start_from:
        # Resume FROM the start_from directory (reference
        # train.py:52-104 loads infos/optimizer from opt.start_from,
        # which may differ from the new checkpoint_path).
        src_infos = os.path.join(opt.start_from,
                                 f"infos_{opt.id}.json")
        if not os.path.exists(src_infos):
            src_infos = infos_path      # same-dir resume
        if os.path.exists(src_infos):
            with open(src_infos) as f:
                infos = json.load(f)
            start_iter = infos.get("iter", 0)
            if opt.load_best_score:
                best_cider = infos.get("best_val_score")
            src_store = CheckpointStore(
                os.path.join(opt.start_from, "checkpoints"),
                keep=5, best_metric="cider", maximize=True)
            if src_store.latest_step() is None:
                src_store = store
            state, _ = src_store.load_with_fallback(state)
        else:
            import logging
            logging.getLogger("compat.train").warning(
                "--start_from %s: no infos_%s.json found; starting "
                "from scratch", opt.start_from, opt.id)

    def ss_prob_for(epoch: int) -> float:
        if opt.scheduled_sampling_start < 0:
            return 0.0
        frac = max(epoch - opt.scheduled_sampling_start, 0) \
            // opt.scheduled_sampling_increase_every
        return min(opt.scheduled_sampling_increase_prob * frac,
                   opt.scheduled_sampling_max_prob)

    import optax

    def make_step(ss_prob: float):
        def step(state: TrainState, b, key):
            (loss, aux), grads = jax.value_and_grad(
                model.loss_fn, has_aux=True)(
                    state.params, b, key, ss_prob)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, new_params,
                              opt_state), loss
        return jax.jit(step, donate_argnums=(0,))

    steps = {}
    it = start_iter
    max_iters = opt.tpu_max_iters or (opt.max_epochs * iters_per_epoch)
    t0 = time.time()
    result: Dict[str, float] = {}
    while it < max_iters:
        epoch = it // iters_per_epoch
        ss = round(ss_prob_for(epoch), 4)
        if ss not in steps:
            steps[ss] = make_step(ss)
        batch, _ = _gen1_batch(loader, opt, "train", rng)
        state, loss = steps[ss](state, batch,
                                jax.random.PRNGKey(it))
        it += 1
        if it % opt.losses_log_every == 0:
            print(f"iter {it} (epoch {epoch}), loss = "
                  f"{float(loss):.3f}, {time.time() - t0:.2f}s")
            t0 = time.time()
        if it % opt.save_checkpoint_every == 0 or it >= max_iters:
            cider = _eval_cider(model, state.params, loader, opt, rng)
            result = {"iter": it, "cider": cider,
                      "loss": float(loss)}
            store.save(state, it, {"cider": cider})
            if best_cider is None or cider > best_cider:
                best_cider = cider
            with open(infos_path, "w") as f:
                json.dump({"iter": it, "epoch": epoch,
                           "best_val_score": best_cider,
                           "vocab_size": vocab_size,
                           "caption_model": opt.caption_model}, f)
    return result


def _eval_cider(model, params, loader, opt, rng) -> float:
    """Periodic val: greedy sample + CIDEr (train.py:211-233)."""
    import jax

    from news_image_caption_tpu.evaluation.metrics import CiderScorer

    scorer = CiderScorer()
    n = 0
    splits = getattr(loader, "splits", {})
    split = "val" if "val" in splits else "train"
    while n < min(opt.val_images_use, 2 * opt.batch_size):
        batch, _ = _gen1_batch(loader, opt, split, rng)
        toks, _ = model.sample(params, batch, max_len=12)
        toks = np.asarray(toks)
        refs = np.asarray(batch.get("seq", batch.get("caption_ids")))
        specials = (0, 1, 2)
        for b in range(toks.shape[0]):
            hyp = " ".join(f"w{t}" for t in toks[b]
                           if t not in specials)
            ref = " ".join(f"w{t}" for t in refs[b]
                           if t not in specials)
            scorer += (hyp or "w0", [ref or "w0"])
            n += 1
    score, _ = scorer.compute_score()
    return float(score)


def main(argv=None) -> int:
    from news_image_caption_tpu.compat.opts import parse_opt
    opt = parse_opt(argv)
    os.makedirs(opt.checkpoint_path, exist_ok=True)
    result = train(opt)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
