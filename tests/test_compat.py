"""Entry-point shims: Gen-1 train.py flags + Gen-2 test.py driver.

North-star clause (BASELINE.json): "Public entrypoints (train.py,
final*/test.py, eval_utils) keep their signatures."
"""

import json
import os

import numpy as np
import pytest

from news_image_caption_tpu.compat.opts import parse_opt

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_parse_opt_accepts_reference_flags():
    opt = parse_opt([
        "--caption_model", "show_tell", "--rnn_size", "64",
        "--input_encoding_size", "32", "--batch_size", "4",
        "--learning_rate", "5e-4", "--beam_size", "3",
        "--scheduled_sampling_start", "0",
        "--checkpoint_path", "save/x", "--id", "st1",
    ])
    assert opt.caption_model == "show_tell"
    assert opt.rnn_size == 64 and opt.beam_size == 3
    # Reference defaults preserved.
    d = parse_opt([])
    assert d.caption_model == "show_attend_tell"
    assert d.max_epochs == 150 and d.grad_clip == 5.0
    assert d.scheduled_sampling_max_prob == 0.25


def test_parse_opt_validation_asserts():
    with pytest.raises(AssertionError):
        parse_opt(["--rnn_size", "0"])
    with pytest.raises(AssertionError):
        parse_opt(["--drop_prob_lm", "1.5"])


def test_compat_train_end_to_end(tmp_path):
    """python -m ...compat.train on synthetic data: trains, logs,
    checkpoints, evals CIDEr, writes infos json."""
    from news_image_caption_tpu.compat.train import main

    ckpt = str(tmp_path / "save")
    rc = main([
        "--caption_model", "show_tell",
        "--rnn_size", "32", "--input_encoding_size", "24",
        "--att_hid_size", "16", "--fc_feat_size", "12",
        "--att_feat_size", "12", "--sentence_embed_size", "8",
        "--batch_size", "4", "--tpu_synthetic_size", "16",
        "--tpu_vocab_size", "50", "--tpu_max_iters", "6",
        "--save_checkpoint_every", "3", "--losses_log_every", "2",
        "--checkpoint_path", ckpt, "--id", "t",
    ])
    assert rc == 0
    infos = json.load(open(os.path.join(ckpt, "infos_t.json")))
    assert infos["iter"] == 6
    assert infos["caption_model"] == "show_tell"
    assert os.path.exists(os.path.join(ckpt, "checkpoints",
                                       "meta.json"))


@pytest.mark.slow
def test_compat_train_scheduled_sampling_flags(tmp_path):
    from news_image_caption_tpu.compat.train import main

    rc = main([
        "--caption_model", "show_attend_tell",
        "--rnn_size", "32", "--input_encoding_size", "24",
        "--att_hid_size", "16", "--fc_feat_size", "12",
        "--att_feat_size", "12", "--sentence_embed_size", "8",
        "--batch_size", "4", "--tpu_synthetic_size", "8",
        "--tpu_vocab_size", "50", "--tpu_max_iters", "4",
        "--save_checkpoint_every", "4",
        "--scheduled_sampling_start", "0",
        "--scheduled_sampling_increase_every", "1",
        "--checkpoint_path", str(tmp_path / "save2"), "--id", "ss",
    ])
    assert rc == 0


@pytest.mark.slow
def test_compat_gen2_test_driver(tmp_path, capsys):
    from news_image_caption_tpu.compat.test import main

    import shutil
    cfg = str(tmp_path / "cfg.yaml")
    shutil.copy(os.path.join(CONFIG_DIR, "tiny_test.yaml"), cfg)
    rc = main(["--config", cfg, "--batch_size", "4",
               "--max_batches", "2", "--max_length", "8"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert {"bleu-1", "bleu-4", "cider", "n_samples"} <= metrics.keys()
    assert metrics["n_samples"] == 8


def test_eval_split_gen1():
    import jax

    from news_image_caption_tpu.compat.eval_utils import eval_split
    from news_image_caption_tpu.data.dataset import SyntheticNewsDataset
    from news_image_caption_tpu.models.gen1 import Gen1Captioner, Gen1Model

    ds = SyntheticNewsDataset(size=8, vocab_size=40, caption_len=10,
                              article_len=6, n_patches=4, image_dim=8,
                              article_dim=6)
    model = Gen1Model(Gen1Captioner(
        model_type="show_tell", vocab_size=40, input_encoding_size=16,
        rnn_size=16, fc_feat_size=8, att_feat_size=8))
    batch = next(ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, preds, stats = eval_split(
        model, params, ds.batches(4, shuffle=False), max_len=6)
    assert np.isfinite(loss)
    assert len(preds) == 8
    assert 0.0 <= stats["Bleu_4"] <= 1.0 and "CIDEr" in stats


def test_eval_split_visual_news_variant():
    """The visual-news loop variant (eval_utils.py:115-245): per-entry
    image metadata plus optional attention maps."""
    import jax

    from news_image_caption_tpu.compat.eval_utils import \
        eval_split_visual_news
    from news_image_caption_tpu.data.dataset import SyntheticNewsDataset
    from news_image_caption_tpu.models.gen1 import (Gen1Captioner,
                                                    Gen1Model)

    ds = SyntheticNewsDataset(size=8, vocab_size=40, caption_len=10,
                              article_len=6, n_patches=4, image_dim=8,
                              article_dim=6)
    model = Gen1Model(Gen1Captioner(
        model_type="show_tell", vocab_size=40, input_encoding_size=16,
        rnn_size=16, fc_feat_size=8, att_feat_size=8))
    batch = next(ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)

    def with_infos(batches):
        for b in batches:
            b = dict(b)
            n = len(np.asarray(b.get("seq", b["caption_ids"])))
            b["infos"] = [{"id": f"im{i}", "file_path": f"p/{i}.jpg"}
                          for i in range(n)]
            yield b

    loss, preds, stats = eval_split_visual_news(
        model, params, with_infos(ds.batches(4, shuffle=False)),
        max_len=6)
    assert np.isfinite(loss)
    assert len(preds) == 8
    assert preds[0]["image_id"] == "im0"
    assert preds[0]["image_path"] == "p/0.jpg"
    assert "CIDEr" in stats
