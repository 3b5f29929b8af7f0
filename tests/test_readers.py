"""Readers: indexer copy masks, paragraph window, jsonl + HDF5 loaders."""

import json

import numpy as np
import pytest

from news_image_caption_tpu.data.bpe import ByteBPE
from news_image_caption_tpu.data.indexer import RobertaCopyIndexer
from news_image_caption_tpu.data.preprocess import (clean_sentence,
                                                    template_entities,
                                                    truncate_words)
from news_image_caption_tpu.data.readers import (H5DataLoader,
                                                 InstanceBuilder,
                                                 JsonlNewsReader,
                                                 NewsRecord,
                                                 paragraph_window)

CORPUS = ["President Barack Obama visited New York on Tuesday.",
          "A large dog runs through the city park every morning.",
          "Officials said the new policy will start next month."]


@pytest.fixture(scope="module")
def indexer():
    return RobertaCopyIndexer(ByteBPE.train(CORPUS, 80), max_len=64)


def test_clean_sentence():
    assert clean_sentence("<p>Hello   <b>world</b>!</p>") == "Hello world !"
    assert clean_sentence("café — nice") == "cafe nice"


def test_template_entities():
    out = template_entities("Barack Obama visited New York.")
    assert "_" in out and "visited" in out


def test_truncate_words():
    assert truncate_words("a b c d e", 3) == "a b c"


def test_encode_offsets_cover_text(indexer):
    text = "Barack Obama spoke."
    ids, offsets = indexer.encode_with_offsets(text)
    assert len(ids) == len(offsets)
    assert indexer.decode(ids) == text
    # offsets are monotone and within bounds
    assert offsets[0][0] == 0
    assert offsets[-1][1] == len(text)


def test_copy_masks_cover_multibyte_entities(indexer):
    """Multi-byte chars (café, José): every BPE piece of the entity
    must carry the mask — proportional-rounding offsets used to give
    the trailing piece a zero-width span and drop its mask."""
    text = "José spoke"
    enc = indexer.encode(text, [(0, 4, 1)])
    ids, masks = enc["ids"], enc["copy_masks"]
    # decode only the masked pieces: they must reconstruct the name
    body_ids = [i for i, m in zip(ids[1:-1], masks[1:-1]) if m == 1]
    assert indexer.decode(body_ids) == "José"
    # and pieces outside the span stay unmasked
    assert 0 in masks


def test_bpe_from_files_keeps_hash_merges(tmp_path):
    """Only the '#version' header line is skipped — '#'-initial lines
    are REAL merges in the canonical GPT-2 merges.txt."""
    from news_image_caption_tpu.data.bpe import ByteBPE

    enc = {"#": 0, "##": 1, "a": 2, "Ġ": 3, "Ġa": 4}
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n# #\nĠ a\n", encoding="utf-8")
    (tmp_path / "encoder.json").write_text(json.dumps(enc))
    bpe = ByteBPE.from_files(str(tmp_path / "encoder.json"),
                             str(tmp_path / "merges.txt"))
    assert ("#", "#") in bpe.bpe_ranks       # kept
    assert ("Ġ", "a") in bpe.bpe_ranks
    assert bpe.bpe("##") == "##"             # the merge applies


def test_copy_masks_mark_entity_tokens(indexer):
    text = "Barack Obama spoke in Paris today."
    start = text.index("Barack")
    end = start + len("Barack Obama")
    enc = indexer.encode(text, [(start, end, 1)])
    ids, masks = enc["ids"], enc["copy_masks"]
    assert len(ids) == len(masks)
    assert masks[0] == 0 and masks[-1] == 0      # specials
    marked = [indexer.decode([i]) for i, m in zip(ids, masks) if m == 1]
    joined = "".join(marked)
    assert "Barack" in joined and "Obama" in joined
    assert "Paris" not in joined


def test_proper_masks_numbering(indexer):
    res = indexer.proper_masks(
        "Barack Obama met Angela Merkel in Berlin.")
    masks = res["proper_masks"]
    distinct = sorted(set(m for m in masks if m > 0))
    assert len(distinct) >= 2        # at least two numbered entities


def test_paragraph_window(indexer):
    paragraphs = [f"Paragraph number {i} talks about topic {i}."
                  for i in range(10)]
    ctx = paragraph_window(paragraphs, image_index=5, indexer=indexer,
                           budget=40)
    assert "number 5" in ctx
    n_tokens = len(indexer.encode_with_offsets(ctx)[0])
    assert n_tokens <= 60


def test_jsonl_reader_and_builder(tmp_path, indexer):
    path = str(tmp_path / "news.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({
            "caption": "Barack Obama spoke in Paris.",
            "paragraphs": ["Intro paragraph.",
                           "Barack Obama went to Paris.",
                           "Closing paragraph."],
            "image_index": 1,
            "face_embeds": [[0.1] * 512],
            "metadata": {"web_url": "http://x"}}) + "\n")
    recs = list(JsonlNewsReader(path))
    assert len(recs) == 1 and recs[0].paragraphs

    builder = InstanceBuilder(indexer, with_copy_masks=True,
                              with_faces=True,
                              use_paragraph_window=True)
    inst = builder.build(recs[0])
    assert inst["caption_ids"][0] == 0
    assert (inst["caption_copy_masks"] > 0).any()
    assert inst["face_embeds"].shape == (4, 512)
    assert np.isnan(inst["face_embeds"][1]).all()   # NaN padding
    assert inst["metadata"]["web_url"] == "http://x"


def test_h5_loader_contract(tmp_path):
    import h5py
    N, M, L = 6, 12, 7
    h5_path = str(tmp_path / "data.h5")
    rng = np.random.default_rng(0)
    with h5py.File(h5_path, "w") as f:
        f["images"] = rng.integers(0, 255, (N, 16, 16, 3),
                                   dtype=np.uint8)
        f["labels"] = rng.integers(1, 50, (M, L)).astype(np.int32)
        starts = np.asarray([1, 3, 5, 7, 9, 11], np.int32)
        ends = np.asarray([2, 4, 6, 8, 10, 12], np.int32)
        f["label_start_ix"] = starts
        f["label_end_ix"] = ends
    split_json = str(tmp_path / "split.json")
    with open(split_json, "w") as f:
        json.dump({"images": [
            {"split": "train" if i < 4 else "val", "id": i}
            for i in range(N)]}, f)

    loader = H5DataLoader(h5_path, split_json, seq_per_img=2)
    batch = loader.get_batch("train", batch_size=2)
    assert batch["images"].shape == (2, 16, 16, 3)
    assert batch["labels"].shape == (4, L + 2)       # B*seq_per_img
    assert batch["labels"][:, 0].sum() == 0          # <start> col
    assert set(batch["bounds"]) == {"it_pos_now", "it_max", "wrapped"}
    # epoch wrap flag fires after exhausting the split
    wrapped = False
    for _ in range(5):
        wrapped = wrapped or loader.get_batch(
            "train", 2)["bounds"]["wrapped"]
    assert wrapped


# ---- Mongo transport (fake DB — pymongo is not installable here) ----

class _FakeCursor:
    """Mimics a pymongo cursor: iterable + close() + no_cursor_timeout
    kwarg acceptance (MongoNewsReader passes it)."""

    def __init__(self, docs):
        self._docs = docs
        self.closed = False

    def __iter__(self):
        return iter(self._docs)

    def close(self):
        self.closed = True


class _FakeCollection:
    def __init__(self, docs):
        self.docs = docs
        self.cursors = []

    def find(self, query, **kwargs):
        split = query.get("split")
        cur = _FakeCursor([d for d in self.docs
                           if split is None or d.get("split") == split])
        self.cursors.append(cur)
        return cur

    def find_one(self, query):
        for d in self.docs:
            if d["_id"] == query["_id"]:
                return d
        return None


class _FakeDB:
    """goodnews/nytimes layout: db.splits + db.articles
    (reference: goodnews_flattened.py:25-118,
    nytimes_faces_ner_matched.py:88-190)."""

    def __init__(self, splits, articles):
        self.splits = _FakeCollection(splits)
        self.articles = _FakeCollection(articles)


def _mongo_fixture(tmp_path, n_images=("s1", "s4", "s5")):
    from PIL import Image
    for name in n_images:
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / f"{name}.jpg")
    splits = [
        # goodnews style: caption looked up in article["images"][idx]
        {"_id": "s1", "article_id": "a1", "image_index": 0,
         "split": "train"},
        # missing image file -> skipped
        {"_id": "s2", "article_id": "a1", "image_index": 1,
         "split": "train"},
        # dangling article_id -> skipped
        {"_id": "s3", "article_id": "zz", "image_index": 0,
         "split": "train"},
        # null caption entry -> skipped
        {"_id": "s4", "article_id": "a2", "image_index": 0,
         "split": "train"},
        # nytimes style: no "images" key, caption on the split doc
        {"_id": "s5", "article_id": "a3", "image_index": 2,
         "split": "train", "caption": "  A captioned scene.  "},
        # other split -> filtered by the query
        {"_id": "s6", "article_id": "a1", "image_index": 0,
         "split": "valid"},
    ]
    articles = [
        {"_id": "a1", "context": "President Obama spoke.",
         "images": {"0": "Obama at the podium.", "1": "Second shot."},
         "web_url": "http://x/1"},
        {"_id": "a2", "context": "No caption here.",
         "images": {"0": None}},
        {"_id": "a3", "context": "City scenes.",
         "paragraphs": ["City scenes.", "More text."]},
    ]
    return _FakeDB(splits, articles)


def test_mongo_reader_schema_mapping(tmp_path):
    from news_image_caption_tpu.data.readers import MongoNewsReader

    db = _mongo_fixture(tmp_path)
    reader = MongoNewsReader(split="train", image_dir=str(tmp_path),
                             db=db)
    recs = list(reader)
    # s2 (missing jpg), s3 (dangling article), s4 (null caption) skip;
    # s6 is another split
    assert [r.metadata["_id"] for r in recs] == ["s1", "s5"]
    r1, r5 = recs
    assert r1.caption == "Obama at the podium."
    assert r1.article == "President Obama spoke."
    assert r1.image_path.endswith("s1.jpg")
    assert r1.image_index == 0
    assert r1.metadata["web_url"] == "http://x/1"
    # nytimes style: caption from the split doc, stripped; paragraphs
    # ride through for the paragraph-window instance builder
    assert r5.caption == "A captioned scene."
    assert r5.paragraphs == ["City scenes.", "More text."]
    assert r5.image_index == 2
    # the no_cursor_timeout cursor is closed even on full drain
    assert db.splits.cursors[-1].closed


def test_mongo_reader_closes_cursor_on_early_break(tmp_path):
    from news_image_caption_tpu.data.readers import MongoNewsReader

    db = _mongo_fixture(tmp_path)
    reader = MongoNewsReader(split="train", image_dir=str(tmp_path),
                             db=db)
    for _ in reader:
        break   # consumer bails out early
    assert db.splits.cursors[-1].closed


def test_preprocess_from_mongo_e2e(tmp_path, monkeypatch):
    """`tellax preprocess - OUT --mongo-db ...` — the reference's live
    data path (Mongo) feeding the offline materialization pass, run
    against the fake DB (no pymongo installed)."""
    from news_image_caption_tpu import cli
    from news_image_caption_tpu.data import materialize as mat
    from news_image_caption_tpu.data import readers as readers_mod
    from news_image_caption_tpu.data.native_loader import \
        NativeShardLoader
    from tests.test_materialize import tiny_encoders

    db = _mongo_fixture(tmp_path)
    real = readers_mod.MongoNewsReader

    def fake_ctor(host="localhost", port=27017, database="goodnews",
                  split="train", image_dir=".", db_arg=db):
        return real(split=split, image_dir=image_dir, db=db_arg)

    monkeypatch.setattr(readers_mod, "MongoNewsReader", fake_ctor)
    monkeypatch.setattr(mat, "FeatureEncoders", lambda: tiny_encoders())
    rc = cli.main(["preprocess", "-", str(tmp_path / "m"),
                   "--records-per-shard", "4",
                   "--caption-len", "16", "--article-len", "32",
                   "--mongo-db", "goodnews",
                   "--image-dir", str(tmp_path)])
    assert rc == 0
    loader = NativeShardLoader([str(tmp_path / "m-00000.nics")],
                               batch_size=2)
    assert len(loader) == 2     # s1 + s5 survive the skips
    batch = next(loader.epoch(shuffle=False))
    assert batch["caption_ids"].shape == (2, 16)
    assert (batch["caption_ids"][:, 0] == 0).all()   # <s>
    loader.close()
