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


# ---------------------------------------------------------------------------
# METEOR (VERDICT r02 item 6)
# ---------------------------------------------------------------------------

METEOR_FIXTURE = [
    ("the cat sat on the mat", "the cat sat on the mat"),
    ("the cat sat on a mat", "a cat was sitting on the mat"),
    ("president barack obama spoke at the rally yesterday",
     "barack obama gave a speech at yesterday's rally"),
    ("dogs running quickly", "the dog runs quickly"),
    ("a b c d", "d c b a"),
    ("the the the cat", "the cat the dog"),          # duplicates
    ("completely unrelated words here", "nothing matches at all"),
    ("firefighters rescued a kitten from the burning building",
     "a kitten was rescued by firefighters from a building on fire"),
    ("stocks fell sharply in early trading",
     "shares dropped sharply during early trade"),
    ("she sells sea shells by the sea shore",
     "sea shells are sold by her at the shore"),
]


def test_meteor_classic_matches_nltk():
    """Staged-alignment core validated against nltk's independent
    METEOR implementation (classic 2007 parameters; nltk's wordnet
    synonym stage stubbed out, since the corpus data is unavailable
    in this image — recorded caveat in evaluation/meteor.py)."""
    pytest.importorskip("nltk")
    from nltk.translate import meteor_score as nms

    from news_image_caption_tpu.evaluation.meteor import meteor

    class _NoWordnet:
        @staticmethod
        def synsets(word):
            return []

    for hyp, ref in METEOR_FIXTURE:
        ours = meteor(hyp, ref, params="classic")
        theirs = nms.single_meteor_score(
            ref.lower().split(), hyp.lower().split(),
            wordnet=_NoWordnet())
        assert abs(ours - theirs) < 1e-9, (hyp, ref, ours, theirs)


def test_meteor_15_hand_computed():
    """meteor-1.5 parameter mode on a hand-traceable pair."""
    from news_image_caption_tpu.evaluation.meteor import meteor

    # "a b" vs "a b": 2 exact matches, 1 chunk.
    # P = R = 1, fmean = 1/(0.85+0.15) = 1
    # frag = 1/2, penalty = 0.6 * 0.5**0.2
    expected = 1.0 * (1 - 0.6 * 0.5 ** 0.2)
    assert abs(meteor("a b", "a b") - expected) < 1e-12
    # stem-only match gets module weight 0.6:
    # hyp "running" vs ref "runs": stems run==run -> 1 stem match
    # w_m = 0.6, P = R = 0.6, fmean = 0.6; frag = 1, penalty = 0.6
    expected = 0.6 * (1 - 0.6)
    assert abs(meteor("running", "runs") - expected) < 1e-12


def test_meteor_synonym_stage_hook():
    from news_image_caption_tpu.evaluation.meteor import meteor

    syn = lambda w: {"car": {"automobile"}}.get(w, set())
    with_syn = meteor("the car", "the automobile", synonyms=syn)
    without = meteor("the car", "the automobile")
    assert with_syn > without


def test_meteor_15_parameters_match_nltk_at_unit_weights():
    """METEOR-1.5 calibration (VERDICT r03 item 5), part 1: with the
    module weights forced to 1.0, our scorer at the meteor-1.5
    parameters (α=0.85, β=0.2, γ=0.6) is IDENTICAL to nltk's
    independent implementation run at those parameters (wordnet
    stubbed on both sides) — the alignment and the α/β/γ scoring
    formula are cross-validated at the 1.5 operating point, not just
    at the classic one."""
    pytest.importorskip("nltk")
    from nltk.translate import meteor_score as nms

    from news_image_caption_tpu.evaluation.meteor import (MeteorParams,
                                                          meteor)

    class _NoWordnet:
        @staticmethod
        def synsets(word):
            return []

    p15_unit = MeteorParams(0.85, 0.2, 0.6, (1.0, 1.0, 1.0))
    for hyp, ref in METEOR_FIXTURE:
        ours = meteor(hyp, ref, params=p15_unit)
        theirs = nms.single_meteor_score(
            ref.lower().split(), hyp.lower().split(),
            wordnet=_NoWordnet(), alpha=0.85, beta=0.2, gamma=0.6)
        assert abs(ours - theirs) < 1e-9, (hyp, ref, ours, theirs)


def test_meteor_15_divergence_bound_vs_nltk():
    """Calibration part 2: the SHIPPED "1.5" mode differs from
    nltk-at-1.5-parameters only through the jar-faithful module
    weights (stem matches count 0.6, not 1.0; synonyms off on both
    sides here). Measured on the fixture: zero divergence on
    exact-only pairs, max |Δ| = 0.108 on the stem-heaviest pair
    ("dogs running quickly": 2 of 3 matches are stem matches).
    This test pins that bound — a regression in alignment or scoring
    would break it from either side."""
    pytest.importorskip("nltk")
    from nltk.translate import meteor_score as nms

    from news_image_caption_tpu.evaluation.meteor import meteor

    class _NoWordnet:
        @staticmethod
        def synsets(word):
            return []

    max_div = 0.0
    for hyp, ref in METEOR_FIXTURE:
        ours = meteor(hyp, ref, params="1.5")
        theirs = nms.single_meteor_score(
            ref.lower().split(), hyp.lower().split(),
            wordnet=_NoWordnet(), alpha=0.85, beta=0.2, gamma=0.6)
        # module weights only ever shrink the weighted match mass
        assert ours <= theirs + 1e-9
        max_div = max(max_div, abs(ours - theirs))
    assert max_div < 0.11, max_div


def test_meteor_15_hand_computed_mixed_and_chunks():
    """Hand-derived 1.5-mode cases: mixed exact+stem weighting and
    the fragmentation penalty with multiple chunks."""
    from news_image_caption_tpu.evaluation.meteor import meteor

    # hyp "dogs running quickly" / ref "the dog runs quickly":
    # exact: quickly (1); stems: dogs/dog, running/runs (2).
    # w_m = 1 + 0.6*2 = 2.2; P = 2.2/3, R = 2.2/4;
    # matches in hyp order (0,1),(1,2),(2,3) are contiguous in both
    # -> 1 chunk; frag = 1/3.
    P, R = 2.2 / 3, 2.2 / 4
    fmean = P * R / (0.85 * P + 0.15 * R)
    expected = fmean * (1 - 0.6 * (1 / 3) ** 0.2)
    got = meteor("dogs running quickly", "the dog runs quickly")
    assert abs(got - expected) < 1e-12, (got, expected)

    # "a b c d" vs "d c b a": 4 exact matches, every adjacent pair
    # breaks monotonicity -> 4 chunks, frag = 1.
    expected = 1.0 * (1 - 0.6 * 1.0 ** 0.2)
    assert abs(meteor("a b c d", "d c b a") - expected) < 1e-12


# ---------------------------------------------------------------------------
# Heuristic-vs-spaCy NER agreement (VERDICT r02 item 6)
# ---------------------------------------------------------------------------

NER_FIXTURE = [
    "President Barack Obama met Angela Merkel in Berlin on Tuesday.",
    "Apple Inc. shares rose after the announcement in New York.",
    "Dr. Jane Smith joined Google last January.",
    "The mayor of London visited Paris in March.",
    "Microsoft Corp. and Amazon are hiring in Seattle.",
]


def test_heuristic_vs_spacy_ner_agreement():
    """Quantifies the heuristic NER's agreement with spaCy (the
    reference's backend). Skips (with the caveat recorded in
    compute_metrics provenance) when spaCy/model are unavailable —
    zero-egress images cannot download en_core_web_sm."""
    from news_image_caption_tpu.evaluation.text_analysis import \
        HeuristicAnalyzer
    try:
        from news_image_caption_tpu.evaluation.text_analysis import \
            SpacyAnalyzer
        sp = SpacyAnalyzer()
    except Exception:
        pytest.skip("spaCy / en_core_web_sm unavailable in this image")
    heur = HeuristicAnalyzer()
    inter = union = 0
    for text in NER_FIXTURE:
        a = {(e["text"].lower()) for e in heur.entities(text)}
        b = {(e["text"].lower()) for e in sp.entities(text)}
        inter += len(a & b)
        union += len(a | b)
    agreement = inter / max(union, 1)
    print(f"heuristic-vs-spacy entity agreement (jaccard): "
          f"{agreement:.2f}")
    assert agreement > 0.3
