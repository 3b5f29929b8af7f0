"""Continuous batching: slot refill, per-slot positions, exactness.

The engine (generation/continuous.py) must produce captions
token-identical to `model.generate(..., sampling_topk=1)` run alone
on each request, no matter when the request entered a slot or what
the other slots were doing — per-slot KV/caches/positions are fully
independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.generation.continuous import ContinuousBatcher
from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.models.captioner import TransformerFlattened

from test_decoder import tiny_batch, tiny_decoder  # noqa: E402

MAX_LEN = 12


@pytest.fixture(scope="module")
def setup():
    model = TransformerFlattened(tiny_decoder())
    params = model.init(jax.random.PRNGKey(0), tiny_batch())
    # 7 distinct single-request batches (different random contexts)
    requests = [
        {k: v for k, v in tiny_batch(B=1, key=100 + i).items()
         if k != "caption_ids"}
        for i in range(7)
    ]
    cfg = GenerationConfig(max_len=MAX_LEN, sampling_topk=1)
    singles = [np.asarray(model.generate(params, r, cfg)[0][0])
               for r in requests]
    return model, params, requests, cfg, singles


def test_staggered_submits_match_single_request_greedy(setup):
    """Requests submitted mid-flight (while other slots are decoding
    at different positions) decode to exactly their standalone greedy
    captions; finished slots are harvested and refilled."""
    model, params, requests, cfg, singles = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=3, inner_steps=2)
    ids = [eng.submit(r) for r in requests[:4]]
    results = {}
    results.update(eng.step())
    results.update(eng.step())
    ids += [eng.submit(r) for r in requests[4:]]   # mid-flight
    results.update(eng.run())
    assert sorted(results) == sorted(ids)
    for rid, want in zip(ids, singles):
        got_tokens, got_lps = results[rid]
        np.testing.assert_array_equal(got_tokens, want)
    # slot reuse happened: 7 requests through 3 slots
    assert eng.W == 3 and len(results) == 7


def test_continuous_log_probs_match_generate(setup):
    model, params, requests, cfg, singles = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2, inner_steps=3)
    rid = eng.submit(requests[0])
    results = eng.run()
    _, want_lps = model.generate(params, requests[0], cfg)
    np.testing.assert_allclose(results[rid][1],
                               np.asarray(want_lps[0]),
                               rtol=1e-5, atol=1e-6)


def test_speculative_slots_are_exact_and_fewer_chunks(setup):
    """spec_k>1: slots draft from their own source ids; captions stay
    token-identical and oracle sources commit multiple tokens per
    step (fewer device dispatches than plain greedy)."""
    model, params, requests, cfg, singles = setup
    plain = ContinuousBatcher.for_flattened(model, params, cfg,
                                            n_slots=2, inner_steps=1)
    for r in requests[:4]:
        plain.submit(r)
    plain_res = plain.run()

    spec = ContinuousBatcher.for_flattened(model, params, cfg,
                                           n_slots=2, inner_steps=1,
                                           spec_k=4, source_len=16)
    ids = [spec.submit(r, source_row=singles[i][1:])  # oracle drafts
           for i, r in enumerate(requests[:4])]
    spec_res = spec.run()
    for i, rid in enumerate(ids):
        np.testing.assert_array_equal(spec_res[rid][0], singles[i])
    assert spec.n_chunks < plain.n_chunks
    assert spec.occupancy > plain.occupancy


def test_garbage_source_still_exact(setup):
    """Worst-case drafts (never accepted) must not corrupt outputs —
    verification commits the corrected token each chunk."""
    model, params, requests, cfg, singles = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2, inner_steps=2,
                                          spec_k=3, source_len=8)
    garbage = np.full((8,), 3, np.int32)
    ids = [eng.submit(r, source_row=garbage) for r in requests[:3]]
    results = eng.run()
    for i, rid in enumerate(ids):
        np.testing.assert_array_equal(results[rid][0], singles[i])


def test_empty_engine_step_is_noop(setup):
    model, params, requests, cfg, _ = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2)
    assert eng.step() == {}
    assert eng.n_chunks == 0
    assert eng.run() == {}


def test_per_request_max_len_frees_slots_early(setup):
    """A short-capped request finishes at its own cap (not the pool
    max), its tokens equal the standalone greedy prefix, and its slot
    frees up for queued work."""
    model, params, requests, cfg, singles = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=1, inner_steps=1)
    short = eng.submit(requests[0], max_len=3)
    long = eng.submit(requests[1])             # queued behind it
    first = {}
    while short not in first:
        first.update(eng.step())
    # the 1-slot pool must still be working on `long`
    assert long not in first
    toks, lps = first[short]
    # capped caption = standalone greedy truncated at 3 tokens + pads
    np.testing.assert_array_equal(toks[:4], singles[0][:4])
    assert np.all(toks[4:] == cfg.pad_id)
    rest = eng.run()
    np.testing.assert_array_equal(rest[long][0], singles[1])
    with pytest.raises(ValueError):
        eng.submit(requests[0], max_len=MAX_LEN + 1)
    # A rejected submit must leave NO zombie queue entry behind (it
    # would later fail at extra-unpack time under an id the caller
    # never received) — and the engine must still serve new work.
    assert eng.backlog == 0 and eng.idle
    ok = eng.submit(requests[0], max_len=2)
    res = eng.run()
    assert not eng.drain_failed()
    np.testing.assert_array_equal(res[ok][0][:3], singles[0][:3])


def test_continuous_matches_generate_under_quantize_kv(setup):
    """quantize_kv flows through the per-request prep: the engine's
    captions equal `generate` on the SAME quantized model (int8 K/V
    slots insert/permute like exact ones)."""
    model, params, requests, _, _ = setup
    cfg = GenerationConfig(max_len=MAX_LEN, sampling_topk=1,
                           quantize_kv=True)
    want = [np.asarray(model.generate(params, r, cfg)[0][0])
            for r in requests[:3]]
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2, inner_steps=2)
    ids = [eng.submit(r) for r in requests[:3]]
    results = eng.run()
    for rid, w in zip(ids, want):
        np.testing.assert_array_equal(results[rid][0], w)


def test_malformed_request_fails_alone(setup):
    """A request whose context shape mismatches the pool (article
    length != compiled S) fails via drain_failed() WITHOUT corrupting
    the engine or the other slots' captions (shape errors raise at
    trace time, before the donated insert consumes the state)."""
    model, params, requests, cfg, singles = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2, inner_steps=2)
    good = eng.submit(requests[0])
    bad_req = dict(requests[1])
    bad_req["article"] = bad_req["article"][:, :3]      # wrong S
    bad_req["article_mask"] = bad_req["article_mask"][:, :3]
    bad = eng.submit(bad_req)
    results, failed = {}, {}
    while good not in results:
        results.update(eng.step())
        failed.update(eng.drain_failed())
    assert bad in failed and good not in failed
    np.testing.assert_array_equal(results[good][0], singles[0])
    assert eng.idle


def test_batched_request_rejected(setup):
    """B>1 jobs are rejected per-request (the engine would silently
    decode only row 0 otherwise)."""
    model, params, requests, cfg, _ = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2, inner_steps=1)
    b2 = {k: np.concatenate([np.asarray(v)] * 2)
          for k, v in requests[0].items()}
    rid = eng.submit(b2)
    eng.step()
    failed = eng.drain_failed()
    assert rid in failed and "B=1" in str(failed[rid])


def test_reset_recovers_and_stays_warm(setup):
    """reset() abandons in-flight work but the engine keeps serving
    correctly (same state shapes -> jit caches stay valid)."""
    model, params, requests, cfg, singles = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2, inner_steps=2)
    eng.submit(requests[0])
    eng.step()                    # mid-decode
    eng.reset()
    assert eng.idle
    rid = eng.submit(requests[1])
    results = eng.run()
    np.testing.assert_array_equal(results[rid][0], singles[1])


def test_gen2_engine_matches_generate(setup):
    """for_gen2: the Gen-2 OnlyDecoder family runs the same slot
    engine (its chunk caches commit by adoption — pos-keyed
    validity); staggered requests match standalone greedy, and
    speculative slots with oracle sources stay exact."""
    import sys
    sys.path.insert(0, "tests")
    from test_gen2 import tiny_batch as g2_batch, tiny_model

    g2 = tiny_model()
    batch0 = g2_batch()
    params = g2.init(jax.random.PRNGKey(0), batch0)
    reqs = [{k: v for k, v in g2_batch(B=1, key=50 + i).items()
             if k != "caption_ids"} for i in range(5)]
    cfg = GenerationConfig(max_len=10, sampling_topk=1, bos_id=1,
                           eos_id=0, pad_id=0, init_finished=False)
    singles = [np.asarray(g2.generate(params, r, cfg)[0][0])
               for r in reqs]

    eng = ContinuousBatcher.for_gen2(g2, params, cfg, n_slots=2,
                                     inner_steps=2)
    ids = [eng.submit(r) for r in reqs]
    results = eng.run()
    for rid, want in zip(ids, singles):
        np.testing.assert_array_equal(results[rid][0], want)

    spec = ContinuousBatcher.for_gen2(g2, params, cfg, n_slots=2,
                                      inner_steps=1, spec_k=3,
                                      source_len=12)
    ids = [spec.submit(r, source_row=singles[i][1:])
           for i, r in enumerate(reqs[:3])]
    spec_res = spec.run()
    for i, rid in enumerate(ids):
        np.testing.assert_array_equal(spec_res[rid][0], singles[i])


def test_beam_engine_matches_generate_beam(setup):
    """ContinuousBeamBatcher: staggered beam-5 requests through a
    2-slot pool are (tokens, scores)-identical to standalone
    generate_beam — per-slot depths, mid-flight refill, frozen done
    slots."""
    from news_image_caption_tpu.generation.continuous import \
        ContinuousBeamBatcher

    model, params, requests, _, _ = setup
    cfg = GenerationConfig(max_len=MAX_LEN, beam_size=3,
                           early_exit=True)
    singles = [model.generate_beam(params, r, cfg) for r in requests]

    eng = ContinuousBeamBatcher(model, params, cfg, n_slots=2,
                                inner_steps=2)
    ids = [eng.submit(r) for r in requests[:3]]
    results = {}
    results.update(eng.step())
    ids += [eng.submit(r) for r in requests[3:]]   # mid-flight
    results.update(eng.run())
    assert sorted(results) == sorted(ids)
    for i, rid in enumerate(ids):
        want_t, want_s = singles[i]
        got_t, got_s = results[rid]
        np.testing.assert_array_equal(got_t, np.asarray(want_t[0]))
        np.testing.assert_allclose(got_s, np.asarray(want_s[0]),
                                   rtol=1e-5, atol=1e-6)


def test_beam_engine_per_request_cap_and_failures(setup):
    from news_image_caption_tpu.generation.continuous import \
        ContinuousBeamBatcher

    model, params, requests, _, _ = setup
    cfg = GenerationConfig(max_len=MAX_LEN, beam_size=3)
    cfg_cap = GenerationConfig(max_len=4, beam_size=3,
                               early_exit=True)
    want_t, want_s = model.generate_beam(params, requests[0], cfg_cap)

    eng = ContinuousBeamBatcher(model, params, cfg, n_slots=1,
                                inner_steps=1)
    capped = eng.submit(requests[0], max_len=4)
    bad_req = dict(requests[1])
    bad_req["article"] = bad_req["article"][:, :3]
    bad_req["article_mask"] = bad_req["article_mask"][:, :3]
    bad = eng.submit(bad_req)
    results, failed = {}, {}
    while not eng.idle:
        results.update(eng.step())
        failed.update(eng.drain_failed())
    got_t = results[capped][0]
    # engine rows live in the pool-wide buffer: cols past the cap pad
    np.testing.assert_array_equal(got_t[:, :5], np.asarray(want_t[0]))
    assert np.all(got_t[:, 5:] == cfg.pad_id)
    assert bad in failed


def test_first_request_sizes_pool_later_mismatches_fail_alone(setup):
    """Pool-shape semantics: the FIRST successfully-inserted request
    defines the pool's context shapes (serving pins them via the
    warmup dummy); a later request with different shapes fails alone
    and the first keeps decoding correctly."""
    model, params, requests, cfg, singles = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2, inner_steps=2)
    short_req = {k: (v[:, :3] if k in ("article", "article_mask")
                     else v) for k, v in requests[0].items()}
    first = eng.submit(short_req)      # sizes the pool at S=3
    mismatched = eng.submit(requests[1])
    results, failed = {}, {}
    while not eng.idle:
        results.update(eng.step())
        failed.update(eng.drain_failed())
    failed.update(eng.drain_failed())
    assert mismatched in failed and first in results
    want = np.asarray(model.generate(params, short_req, cfg)[0][0])
    np.testing.assert_array_equal(results[first][0], want)


def test_engine_constructor_validation(setup):
    from news_image_caption_tpu.generation.continuous import \
        ContinuousBeamBatcher

    model, params, _, cfg, _ = setup
    with pytest.raises(ValueError):
        ContinuousBatcher.for_flattened(model, params, cfg,
                                        n_slots=2, inner_steps=0)
    with pytest.raises(ValueError):
        ContinuousBeamBatcher(model, params,
                              GenerationConfig(max_len=8, beam_size=2),
                              n_slots=2, inner_steps=0)
    with pytest.raises(ValueError):
        ContinuousBatcher.for_flattened(model, params, cfg,
                                        n_slots=0)


def test_sampling_slots_match_generate_with_same_rng(setup):
    """sampling_topk > 1: each slot runs its own PRNG chain
    replicating generate_candidates' B=1 key schedule — a harvested
    caption equals model.generate(request, cfg, rng=<request key>)
    exactly, per-request, regardless of slot timing."""
    model, params, requests, _, _ = setup
    cfg = GenerationConfig(max_len=MAX_LEN, sampling_topk=4,
                           sampling_temp=0.8)
    keys = [jax.random.PRNGKey(1000 + i) for i in range(5)]
    singles = [model.generate(params, r, cfg, rng=keys[i])
               for i, r in enumerate(requests[:5])]

    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2, inner_steps=2)
    ids = [eng.submit(r, rng=keys[i])
           for i, r in enumerate(requests[:5])]
    results = eng.run()
    for i, rid in enumerate(ids):
        want_t, want_lp = singles[i]
        got_t, got_lp = results[rid]
        np.testing.assert_array_equal(got_t, np.asarray(want_t[0]))
        np.testing.assert_allclose(got_lp, np.asarray(want_lp[0]),
                                   rtol=1e-5, atol=1e-6)
    # sampling is not greedy: at temp 0.8/topk 4 at least one caption
    # must differ from the greedy decode (sanity that the draw path ran)
    greedy = model.generate(params, requests[0],
                            GenerationConfig(max_len=MAX_LEN,
                                             sampling_topk=1))
    assert not all(
        np.array_equal(np.asarray(singles[i][0][0]),
                       np.asarray(greedy[0][0])) for i in range(5))


def test_beam_engine_under_quantize_kv(setup):
    """quantize_kv flows through the beam engine's per-request prep:
    results equal generate_beam on the SAME quantized model."""
    from news_image_caption_tpu.generation.continuous import \
        ContinuousBeamBatcher

    model, params, requests, _, _ = setup
    cfg = GenerationConfig(max_len=8, beam_size=3, quantize_kv=True,
                           early_exit=True)
    want = [model.generate_beam(params, r, cfg) for r in requests[:2]]
    eng = ContinuousBeamBatcher(model, params, cfg, n_slots=2,
                                inner_steps=2)
    ids = [eng.submit(r) for r in requests[:2]]
    results = eng.run()
    for i, rid in enumerate(ids):
        np.testing.assert_array_equal(results[rid][0],
                                      np.asarray(want[i][0][0]))


def test_faces_objects_variant_through_both_engines():
    """The reference's production serving model (transformer_faces_
    objects, 4 attended contexts) runs through for_flattened and the
    beam engine unchanged — per-request faces/obj contexts insert
    per-slot like image/article KV."""
    from news_image_caption_tpu.generation.continuous import \
        ContinuousBeamBatcher
    from news_image_caption_tpu.utils.registry import MODELS

    import test_variants as tv

    model = MODELS.get("transformer_faces_objects")(
        face_dim=8, obj_dim=6, **tv.tiny_kwargs())
    init_b = tv.base_batch()
    init_b["faces"] = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
    init_b["faces_mask"] = jnp.zeros((2, 3), bool)
    init_b["obj"] = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 6))
    init_b["obj_mask"] = jnp.zeros((2, 5), bool)
    params = model.init(jax.random.PRNGKey(0), init_b)

    def req(i):
        ks = jax.random.split(jax.random.PRNGKey(200 + i), 4)
        r = {k: v for k, v in tv.base_batch(B=1, key=300 + i).items()
             if k != "caption_ids"}
        r["faces"] = jax.random.normal(ks[0], (1, 3, 8))
        r["faces_mask"] = jnp.zeros((1, 3), bool)
        r["obj"] = jax.random.normal(ks[1], (1, 5, 6))
        r["obj_mask"] = jnp.zeros((1, 5), bool)
        return r

    reqs = [req(i) for i in range(3)]
    cfg = GenerationConfig(max_len=8, sampling_topk=1)
    singles = [np.asarray(model.generate(params, r, cfg)[0][0])
               for r in reqs]
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=2, inner_steps=2)
    ids = [eng.submit(r) for r in reqs]
    results = eng.run()
    for rid, want in zip(ids, singles):
        np.testing.assert_array_equal(results[rid][0], want)

    bcfg = GenerationConfig(max_len=8, beam_size=3, early_exit=True)
    beam_singles = [model.generate_beam(params, r, bcfg)
                    for r in reqs[:2]]
    beng = ContinuousBeamBatcher(model, params, bcfg, n_slots=2,
                                 inner_steps=2)
    bids = [beng.submit(r) for r in reqs[:2]]
    bres = beng.run()
    for i, rid in enumerate(bids):
        np.testing.assert_array_equal(bres[rid][0],
                                      np.asarray(beam_singles[i][0][0]))


def test_pointer_engine_matches_generate():
    """for_pointer: the copy gate + entity head run per slot; tokens
    AND copied flags are identical to standalone
    TransformerPointer.generate, for plain and forced-copy gates,
    with speculative drafts on top."""
    import sys
    sys.path.insert(0, "tests")
    from test_pointer import make_pointer, pointer_batch
    from test_speculative import _force_copy_gate

    model = make_pointer()
    init_b = pointer_batch(B=2, S=10)
    variables = model.init(jax.random.PRNGKey(0), init_b)
    variables = _force_copy_gate(variables)

    def req(i):
        b = pointer_batch(B=1, S=10, key=400 + i)
        return {k: v for k, v in b.items()
                if k not in ("caption_ids", "caption_copy_masks")}

    reqs = [req(i) for i in range(4)]
    cfg = GenerationConfig(max_len=9, sampling_topk=1)
    singles = [model.generate(variables, r, cfg) for r in reqs]

    eng = ContinuousBatcher.for_pointer(model, variables, cfg,
                                        n_slots=2, inner_steps=2)
    ids = [eng.submit(r) for r in reqs]
    results = eng.run()
    for i, rid in enumerate(ids):
        want_t, want_f = singles[i]
        got_t, got_lp, got_f = results[rid]
        np.testing.assert_array_equal(got_t, np.asarray(want_t[0]))
        np.testing.assert_array_equal(got_f, np.asarray(want_f[0]))

    # speculative pointer slots: oracle drafts, same exact outputs
    spec = ContinuousBatcher.for_pointer(model, variables, cfg,
                                         n_slots=2, inner_steps=1,
                                         spec_k=3, source_len=16)
    sids = [spec.submit(r, source_row=np.asarray(singles[i][0][0][1:]))
            for i, r in enumerate(reqs)]
    sres = spec.run()
    for i, rid in enumerate(sids):
        np.testing.assert_array_equal(sres[rid][0],
                                      np.asarray(singles[i][0][0]))
        np.testing.assert_array_equal(sres[rid][2],
                                      np.asarray(singles[i][1][0]))
    assert spec.n_chunks < eng.n_chunks or spec.occupancy >= eng.occupancy


def test_tgnc_engine_matches_generate():
    """for_tgnc: template-mixed heads per slot — staggered requests
    match standalone TGNC.generate exactly (template logits computed
    per request in prep)."""
    import sys
    sys.path.insert(0, "tests")
    from test_variants import base_batch, tiny_kwargs

    from news_image_caption_tpu.models.tgnc import TGNC

    model = TGNC(use_template_decoder=True, n_templates=2,
                 **tiny_kwargs())
    init_b = base_batch()
    variables = model.init(jax.random.PRNGKey(0), init_b)
    reqs = [{k: v for k, v in base_batch(B=1, key=500 + i).items()
             if k != "caption_ids"} for i in range(3)]
    cfg = GenerationConfig(max_len=8, sampling_topk=1)
    singles = [np.asarray(model.generate(variables, r, cfg)[0][0])
               for r in reqs]
    eng = ContinuousBatcher.for_tgnc(model, variables, cfg,
                                     n_slots=2, inner_steps=2)
    ids = [eng.submit(r) for r in reqs]
    results = eng.run()
    for i, rid in enumerate(ids):
        np.testing.assert_array_equal(results[rid][0], singles[i])


def test_harvest_lag_pipeline_exactness(setup):
    """harvest_lag > 1 (deep-pipelined views: the engine keeps
    several chunk dispatches in flight and blocks only on the oldest)
    must not change ANY result: staggered greedy requests through a
    3-slot lag-3 pool are token-identical to standalone generate, and
    every view is attributed to the request that owned the slot when
    its chunk ran (stale views of refilled slots are skipped)."""
    model, params, requests, cfg, singles = setup
    eng = ContinuousBatcher.for_flattened(model, params, cfg,
                                          n_slots=3, inner_steps=2,
                                          harvest_lag=3)
    assert eng.stats()["harvest_lag"] == 3
    ids = [eng.submit(r) for r in requests[:4]]
    results = {}
    results.update(eng.step())
    results.update(eng.step())
    ids += [eng.submit(r) for r in requests[4:]]   # mid-flight
    results.update(eng.run())
    assert sorted(results) == sorted(ids)
    assert not eng._pending          # run() flushed/dropped all views
    for rid, want in zip(ids, singles):
        np.testing.assert_array_equal(results[rid][0], want)


def test_harvest_lag_beam_exactness(setup):
    """Deep-pipelined EXACT beam: lag-2 results identical to
    standalone generate_beam (tokens + scores)."""
    from news_image_caption_tpu.generation.continuous import \
        ContinuousBeamBatcher

    model, params, requests, _, _ = setup
    cfg = GenerationConfig(max_len=MAX_LEN, beam_size=3,
                           early_exit=True)
    singles = [model.generate_beam(params, r, cfg) for r in requests]
    eng = ContinuousBeamBatcher(model, params, cfg, n_slots=2,
                                inner_steps=2, harvest_lag=2)
    ids = [eng.submit(r) for r in requests[:3]]
    results = {}
    results.update(eng.step())
    ids += [eng.submit(r) for r in requests[3:]]
    results.update(eng.run())
    assert sorted(results) == sorted(ids)
    for i, rid in enumerate(ids):
        want_t, want_s = singles[i]
        np.testing.assert_array_equal(results[rid][0],
                                      np.asarray(want_t[0]))
        np.testing.assert_allclose(results[rid][1],
                                   np.asarray(want_s[0]),
                                   rtol=1e-5, atol=1e-6)
