"""Metrics: hand-computed values + cross-check against nltk."""

import math

import pytest

from news_image_caption_tpu.evaluation.metrics import (
    BleuScorer, CiderScorer, RougeScorer, bleu, cider, rouge_l)


def test_bleu_perfect_match():
    scores = bleu(["the cat sat on the mat"],
                  [["the cat sat on the mat"]])
    for s in scores:
        assert s == pytest.approx(1.0, abs=1e-6)


def test_bleu_no_overlap():
    scores = bleu(["aa bb cc dd"], [["xx yy zz ww"]])
    assert scores[0] < 1e-3


def test_bleu_matches_nltk_corpus():
    from nltk.translate.bleu_score import corpus_bleu
    hyps = ["the cat sat on the mat today",
            "a dog runs in the park",
            "news photo of a person speaking"]
    refs = [["the cat sat on a mat today"],
            ["the dog ran in a park"],
            ["news photo of the person speaking at a rally"]]
    ours = bleu(hyps, refs)[3]
    nltk_score = corpus_bleu([[r.split() for r in rs] for rs in refs],
                             [h.split() for h in hyps])
    assert ours == pytest.approx(nltk_score, abs=0.02)


def test_bleu_brevity_penalty():
    # 3-word hyp perfectly contained in a 6-word ref: p1=1, bp=exp(1-2)
    scores = bleu(["the cat sat"], [["the cat sat on the mat"]])
    assert scores[0] == pytest.approx(math.exp(1 - 2), rel=1e-3)


def test_cider_identical_is_max():
    hyps = ["a b c d", "e f g h"]
    refs = [["a b c d"], ["e f g h"]]
    score = cider(hyps, refs)
    assert score == pytest.approx(10.0, abs=0.01)


def test_cider_orders_quality():
    # idf needs a corpus where n-grams do NOT appear in every doc
    # (with a single repeated reference all idf weights are zero —
    # same behavior as pycocoevalcap).
    refs = [["the cat sat on the mat"],
            ["a dog runs in the park"],
            ["people gather at the rally"]]

    def score_first(hyp):
        hyps = [hyp, "a dog runs in the park",
                "people gather at the rally"]
        _, per = _cider_per(hyps, refs)
        return per[0]

    def _cider_per(hyps, refs):
        s = CiderScorer()
        for h, r in zip(hyps, refs):
            s += (h, r)
        return s.compute_score()

    good = score_first("the cat sat on the mat")
    ok = score_first("the cat sat down")
    bad = score_first("completely unrelated words here")
    assert good > ok > bad


def test_rouge_l_perfect_and_zero():
    assert rouge_l(["a b c"], [["a b c"]]) == pytest.approx(1.0)
    assert rouge_l(["a b c"], [["x y z"]]) == pytest.approx(0.0)


def test_rouge_l_known_value():
    # hyp "a b d", ref "a c d": LCS=2, p=2/3, r=2/3 -> F=2/3
    val = rouge_l(["a b d"], [["a c d"]])
    assert val == pytest.approx(2 / 3, rel=1e-6)


def test_accumulator_interface():
    s = BleuScorer(n=4)
    s += ("a b c", ["a b c"])
    s += ("x y", ["x y z"])
    corpus, per_sent = s.compute_score()
    assert len(corpus) == 4
    assert len(per_sent) == 2

    c = CiderScorer()
    c += ("a b", ["a b"])
    mean, per = c.compute_score()
    assert len(per) == 1

    r = RougeScorer()
    r += ("a b", ["a b"])
    mean, per = r.compute_score()
    assert mean == pytest.approx(1.0)
