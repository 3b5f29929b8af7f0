"""Text analysis + compute_metrics end-to-end."""

import json

import pytest

from news_image_caption_tpu.evaluation.compute_metrics import (
    compute_metrics, meteor_lite)
from news_image_caption_tpu.evaluation.enrich import (EnrichmentCache,
                                                      enrich_record)
from news_image_caption_tpu.evaluation.text_analysis import (
    HeuristicAnalyzer, count_syllables, flesch_reading_ease,
    narrative_productivity, readability_scores)


def test_proper_nouns_and_entities():
    a = HeuristicAnalyzer()
    text = ("President Barack Obama visited New York City on Tuesday "
            "with officials from Goldman Sachs Inc.")
    names = a.proper_nouns(text)
    assert "Barack" in names and "Obama" in names
    ents = a.entities(text)
    labels = {e["text"]: e["label"] for e in ents}
    assert any("Obama" in t for t in labels)
    assert labels.get("Tuesday") == "DATE"
    # Inc suffix -> ORG
    org = [e for e in ents if "Goldman" in e["text"]]
    assert org and org[0]["label"] == "ORG"


def test_syllables_and_flesch():
    assert count_syllables("cat") == 1
    assert count_syllables("caption") == 2
    assert count_syllables("university") >= 4
    easy = flesch_reading_ease("The cat sat. The dog ran.")
    hard = flesch_reading_ease(
        "Extraordinarily complicated institutional considerations "
        "necessitate comprehensive multidimensional analysis.")
    assert easy > hard


def test_ttr():
    np_ = narrative_productivity("the cat and the dog")
    assert np_["n_words"] == 5 and np_["n_types"] == 4
    assert np_["basic_ttr"] == pytest.approx(0.8)


def test_meteor_lite_orders():
    perfect = meteor_lite("the cat sat", "the cat sat")
    partial = meteor_lite("the cat ran", "the cat sat")
    nothing = meteor_lite("xx yy zz", "the cat sat")
    assert perfect > partial > nothing
    assert perfect == pytest.approx(1.0 - 0.5 / 27, rel=1e-3)


def test_enrich_and_compute_metrics(tmp_path):
    cache = EnrichmentCache()
    records = [
        enrich_record(
            caption="Barack Obama spoke in New York on Tuesday.",
            generation="Barack Obama spoke in Washington on Monday.",
            context="President Barack Obama went to New York.",
            cache=cache),
        enrich_record(
            caption="A dog runs in the park.",
            generation="A dog runs in a park.",
            cache=cache),
    ]
    path = str(tmp_path / "generations.jsonl")
    from news_image_caption_tpu.evaluation.enrich import \
        write_generations
    write_generations(path, records, append=False)

    counters = {"caption": {"Obama": 5}, "context": {"York": 2}}
    metrics = compute_metrics(path, counters)
    assert 0 < metrics["BLEU-1"] <= 1
    assert metrics["All names - recall"]["total"] > 0
    assert metrics["Entity all - recall"]["total"] > 0
    assert metrics["Length - generation"] == pytest.approx(6.5)
    # rare names: 'Barack'/'New'/'York' not in caption counter
    assert metrics["Caption rare names - recall"]["total"] > 0
    assert metrics["Generation TTR"] is not None
    assert metrics["Generation Flesch Reading Ease"] is not None


def test_compute_metrics_cli(tmp_path):
    from news_image_caption_tpu.evaluation.compute_metrics import main
    path = str(tmp_path / "g.jsonl")
    rec = enrich_record(caption="A cat sits.", generation="A cat sat.")
    with open(path, "w") as f:
        f.write(json.dumps(rec) + "\n")
    rc = main([path])
    assert rc == 0
    out = json.loads((tmp_path / "g_reported_metrics.json").read_text())
    assert "BLEU-4" in out and "CIDEr" in out


def test_checkdiff_and_integrity(tmp_path):
    import json as _json

    from news_image_caption_tpu.evaluation.checkdiff import (
        diff_runs, integrity_check)

    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    recs_a = [{"caption": "c1", "generation": "x y z"},
              {"caption": "c2", "generation": "same here"}]
    recs_b = [{"caption": "c1", "generation": "different now"},
              {"caption": "c2", "generation": "same here"}]
    a.write_text("\n".join(_json.dumps(r) for r in recs_a))
    b.write_text("\n".join(_json.dumps(r) for r in recs_b))
    d = diff_runs(str(a), str(b))
    assert d["same"] == 1 and d["different"] == 1
    assert d["examples"][0]["caption"] == "c1"

    chk = integrity_check(str(a))
    assert chk["ok"] and chk["records"] == 2
    # missing generation flagged
    bad = tmp_path / "bad.jsonl"
    bad.write_text(_json.dumps({"caption": "c", "generation": ""}))
    chk2 = integrity_check(str(bad))
    assert not chk2["ok"]


def test_evaluate_output_feeds_compute_metrics(tmp_path):
    """The CLI evaluate's enriched generations.jsonl is directly
    consumable by the offline compute_metrics CLI (the reference's
    metrics.sh flow: tell evaluate -> scripts/compute_metrics.py)."""
    import os
    import shutil

    from news_image_caption_tpu.cli import main as tellax
    from news_image_caption_tpu.evaluation.compute_metrics import \
        main as metrics_main

    cfg_path = str(tmp_path / "cfg.yaml")
    tiny = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "tiny_test.yaml")
    shutil.copy(tiny, cfg_path)
    rc = tellax(["evaluate", cfg_path, "--split", "test"])
    assert rc == 0
    gens = str(tmp_path / "serialization" / "generations.jsonl")
    rc = metrics_main([gens])
    assert rc == 0
    out = json.loads((tmp_path / "serialization" /
                      "generations_reported_metrics.json").read_text())
    assert "BLEU-4" in out and "CIDEr" in out
