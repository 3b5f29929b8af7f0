"""Data layer: vocab, BPE round-trips, collation, loader."""

import numpy as np
import pytest

from news_image_caption_tpu.data.bpe import ByteBPE, RobertaBPE
from news_image_caption_tpu.data.collate import (collate_captions,
                                                 make_causal_pad_mask)
from news_image_caption_tpu.data.dataset import SyntheticNewsDataset
from news_image_caption_tpu.data.loader import DeviceLoader
from news_image_caption_tpu.data.vocabulary import WordVocab

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a news photo shows people at a rally in the city",
    "the mayor spoke to reporters on tuesday afternoon",
    "protesters gathered outside the court house today",
]


def test_word_vocab_roundtrip():
    v = WordVocab.build(CORPUS, min_count=1)
    ids = v.encode("the mayor spoke")
    assert ids[0] == v.start_id and ids[-1] == v.end_id
    assert v.decode(ids) == "the mayor spoke"


def test_word_vocab_unk_and_threshold():
    v = WordVocab.build(CORPUS, min_count=2)   # only words seen twice
    ids = v.encode("zebra", add_specials=False)
    assert ids == [v.unk_id]
    assert "the" in v.word2idx and "zebra" not in v.word2idx


def test_word_vocab_save_load(tmp_path):
    v = WordVocab.build(CORPUS)
    p = str(tmp_path / "vocab.json")
    v.save(p)
    v2 = WordVocab.load(p)
    assert v2.word2idx == v.word2idx


def test_bpe_roundtrip():
    bpe = ByteBPE.train(CORPUS, num_merges=50)
    for text in CORPUS + ["unseen words zyx!", "CamelCase, punct. 123"]:
        ids = bpe.encode(text)
        assert bpe.decode(ids) == text


def test_bpe_merges_reduce_length():
    bpe0 = ByteBPE.train(CORPUS, num_merges=0)
    bpe50 = ByteBPE.train(CORPUS, num_merges=50)
    t = CORPUS[0]
    assert len(bpe50.encode(t)) < len(bpe0.encode(t))


def test_roberta_bpe_specials():
    tok = RobertaBPE(ByteBPE.train(CORPUS, num_merges=30), max_len=16)
    ids = tok.encode("the mayor spoke")
    assert ids[0] == 0 and ids[-1] == 2
    assert len(ids) <= 16
    assert tok.decode(ids) == "the mayor spoke"


def test_collate_shapes_and_masks():
    batch = collate_captions(
        captions=[[0, 5, 6, 2], [0, 7, 2]], caption_len=6,
        articles=[[10, 11, 12], [13]], article_len=5, pad_id=1)
    assert batch["caption_ids"].shape == (2, 6)
    np.testing.assert_array_equal(batch["caption_ids"][1],
                                  [0, 7, 2, 1, 1, 1])
    # article_mask: True = pad
    np.testing.assert_array_equal(batch["article_mask"][1],
                                  [False, True, True, True, True])
    assert int(batch["ntokens"]) == (3 - 1) + (2 - 1) + 2  # non-pad shifted


def test_causal_pad_mask():
    ids = np.array([[5, 6, 1]])
    m = make_causal_pad_mask(ids, pad_id=1)
    assert m.shape == (1, 3, 3)
    assert m[0, 0, 0] and not m[0, 0, 1]       # causal
    assert not m[0, 2, 2]                      # pad column blocked


def test_synthetic_dataset_batches_deterministic():
    ds = SyntheticNewsDataset(size=32, vocab_size=100, caption_len=12,
                              article_len=16, n_patches=4, image_dim=8,
                              article_dim=6)
    b1 = next(ds.batches(batch_size=4, seed=1))
    b2 = next(ds.batches(batch_size=4, seed=1))
    np.testing.assert_array_equal(b1["caption_ids"], b2["caption_ids"])
    assert b1["image"].shape == (4, 4, 8)
    assert b1["article"].shape == (4, 16, 6)


def test_device_loader_prefetch():
    ds = SyntheticNewsDataset(size=16, vocab_size=50, caption_len=8,
                              article_len=8, n_patches=2, image_dim=4,
                              article_dim=4)
    loader = DeviceLoader(ds.batches(batch_size=4), prefetch=2)
    batches = list(loader)
    assert len(batches) == 4
    import jax
    assert isinstance(batches[0]["caption_ids"], jax.Array)


def test_device_loader_propagates_errors():
    def bad_gen():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    loader = DeviceLoader(bad_gen())
    it = iter(loader)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_fixed_steps_loader_fast_forward():
    from news_image_caption_tpu.data.loader import FixedStepsLoader

    def make_batches(seed):
        # 3 batches per "file pass", content depends on seed + index
        return ({"id": seed * 100 + i} for i in range(3))

    loader = FixedStepsLoader(make_batches, steps_per_epoch=4)
    e0 = [b["id"] for b in loader.epoch(0)]
    e1 = [b["id"] for b in loader.epoch(1)]
    assert e0 == [0, 1, 2, 100]          # crosses the pass boundary
    assert e1 == [101, 102, 200, 201]    # fast-forwarded past epoch 0
    # resume determinism: same epoch twice = same batches
    assert [b["id"] for b in loader.epoch(1)] == e1


def test_fixed_steps_loader_arithmetic_fast_forward():
    """Resume at a late epoch must NOT materialize skipped batches
    (reference fast-forwards by index, final_roberta/dataloader.py:83)."""
    from news_image_caption_tpu.data.loader import FixedStepsLoader

    made = []

    def make_batches(seed, start=0):
        made.append((seed, start))
        return [(seed, i) for i in range(start, 10)]

    loader = FixedStepsLoader(make_batches, steps_per_epoch=7,
                              batches_per_seed=10)
    # Epoch 13 starts at global batch 91 -> seed 9, offset 1, and the
    # dataset-side `start` kwarg skips the offset without materializing.
    got = list(loader.epoch(13))
    assert got == [(9, i) for i in range(1, 8)]
    assert made[0] == (9, 1)

    # Same without start support: only the intra-seed offset batches
    # are materialized (1 here), never the 91 skipped ones.
    def make_batches_nostart(seed):
        return [(seed, i) for i in range(10)]

    loader2 = FixedStepsLoader(make_batches_nostart, steps_per_epoch=7,
                               batches_per_seed=10)
    assert list(loader2.epoch(13)) == got

    # Continuity across the seed boundary.
    assert list(loader.epoch(1))[:3] == [(0, 7), (0, 8), (0, 9)]


def test_token_bucket_batcher_caps_and_buckets():
    """AllenNLP bucket-iterator semantics: batches capped by size AND
    padded-token budget (config.yaml:106 maximum_samples_per_batch)."""
    from news_image_caption_tpu.data.loader import TokenBucketBatcher

    rng = np.random.RandomState(0)
    insts = [{"len": int(rng.randint(5, 500))} for _ in range(200)]
    batcher = TokenBucketBatcher(lambda x: x["len"], batch_size=16,
                                 max_tokens=2048,
                                 bucket_lengths=(32, 64, 128, 256, 512),
                                 window=100)
    batches = list(batcher.batches(insts))
    assert sum(len(b) for b, _ in batches) == 200
    for batch, bucket in batches:
        assert len(batch) <= 16
        longest = max(x["len"] for x in batch)
        assert longest <= bucket          # bucket fits every instance
        assert len(batch) * bucket <= 2048  # padded-token budget
    # Sorting within the window keeps batches length-homogeneous:
    # several distinct buckets are in use (not everything padded to
    # 512), and short instances land in short buckets.
    assert len({b for _, b in batches}) >= 3
    shortest_batch = min(batches, key=lambda x: x[1])
    assert shortest_batch[1] <= 128


def test_synthetic_rng_streams_independent_at_seed0():
    """Regression: the article/extra-context streams used to derive as
    default_rng(seed*K + idx), which collapses onto the base stream's
    keystream at seed 0 (the shipped default) — coupling the article
    ids and faces/obj features to the caption/image draws."""
    from news_image_caption_tpu.data.dataset import _example_stream

    for idx in (0, 3, 17):
        raw = [ _example_stream(0, s, idx).bytes(32) for s in (0, 1, 2) ]
        assert raw[0] != raw[1] and raw[0] != raw[2] and raw[1] != raw[2]
    # the base stream itself is pinned (loss-trajectory tests depend
    # on its draws): stream 0 must still be the multiplier derivation
    import numpy as np
    assert (_example_stream(5, 0, 7).bytes(32)
            == np.random.default_rng(5 * 1_000_003 + 7).bytes(32))
