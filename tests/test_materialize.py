"""Offline materialization: jsonl -> shards -> native loader -> train."""

import json

import jax
import numpy as np
import pytest

from news_image_caption_tpu.data.materialize import (FeatureEncoders,
                                                     materialize)
from news_image_caption_tpu.data.native_loader import NativeShardLoader
from news_image_caption_tpu.models.resnet import ResNetTrunk
from news_image_caption_tpu.models.roberta import RobertaEncoder


def tiny_encoders():
    return FeatureEncoders(
        resnet=ResNetTrunk(depth=18, num_stages=2),
        roberta=RobertaEncoder(vocab_size=5000, hidden=16, num_layers=1,
                               heads=4, intermediate=32,
                               max_positions=64),
        crop=32)


@pytest.mark.slow
def test_cli_preprocess_writes_shards(tmp_path, monkeypatch):
    """`tellax preprocess IN.jsonl PREFIX` — the offline frozen-
    encoder materialization pass as a first-class CLI command."""
    from news_image_caption_tpu import cli
    from news_image_caption_tpu.data import materialize as mat

    src = str(tmp_path / "news.jsonl")
    with open(src, "w") as f:
        for i in range(5):
            f.write(json.dumps({
                "caption": f"Barack Obama visited city number {i}.",
                "article": f"Barack Obama was seen in city {i}."})
                + "\n")
    # The CLI builds full-size frozen encoders; keep the test light.
    monkeypatch.setattr(mat, "FeatureEncoders",
                        lambda: tiny_encoders())
    rc = cli.main(["preprocess", src, str(tmp_path / "t"),
                   "--records-per-shard", "3",
                   "--caption-len", "16", "--article-len", "32"])
    assert rc == 0
    paths = [str(tmp_path / "t-00000.nics"),
             str(tmp_path / "t-00001.nics")]
    loader = NativeShardLoader(paths, batch_size=2)
    assert len(loader) == 5
    batch = next(loader.epoch(shuffle=False))
    assert batch["caption_ids"].shape == (2, 16)
    loader.close()


@pytest.mark.slow
def test_materialize_and_reload(tmp_path):
    src = str(tmp_path / "news.jsonl")
    rng = np.random.default_rng(0)
    with open(src, "w") as f:
        for i in range(6):
            f.write(json.dumps({
                "caption": f"Barack Obama visited city number {i}.",
                "article": ("The president went to several places. "
                            f"Barack Obama was seen in city {i}.")}) + "\n")

    paths = materialize(src, str(tmp_path / "train"),
                        records_per_shard=4, caption_len=16,
                        article_len=32, encoders=tiny_encoders(),
                        image_size=32, batch_size=3)
    assert len(paths) == 2  # 6 records, 4 per shard

    loader = NativeShardLoader(paths, batch_size=2)
    assert len(loader) == 6
    batch = next(loader.epoch(shuffle=False))
    assert batch["caption_ids"].shape == (2, 16)
    assert batch["article_ids"].shape == (2, 32)
    # resnet18/2-stage trunk: 4x4 patches of 128 channels at crop 32
    assert batch["image"].shape == (2, 16, 128)
    assert batch["article"].shape == (2, 32, 16)
    assert batch["caption_copy_masks"].shape == (2, 16)
    # captions start with <s>=0; copy masks mark the entity tokens
    assert (batch["caption_ids"][:, 0] == 0).all()
    assert (batch["caption_copy_masks"] > 0).any()
    loader.close()
