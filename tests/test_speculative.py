"""Speculative greedy decoding: chunk-step parity + exactness vs greedy.

The contract under test (generation/speculative.py): draft-and-verify
greedy decoding is token-for-token IDENTICAL to the plain greedy scan
(`generator.generate` with sampling_topk=1) for any draft quality —
drafts only change wall-clock, never output.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.generation.speculative import (
    commit_conv_caches, ngram_drafts, speculative_greedy)
from news_image_caption_tpu.models.captioner import TransformerFlattened
from news_image_caption_tpu.models.decoder_flattened import DynamicConvDecoder

VOCAB = 40
CUTOFF = (12, 24, 40)


def tiny_decoder(**kw):
    kw.setdefault("vocab_size", VOCAB)
    kw.setdefault("embed_dim", 16)
    kw.setdefault("ffn_dim", 32)
    kw.setdefault("num_heads", 4)
    kw.setdefault("num_layers", 2)
    kw.setdefault("kernel_sizes", (3, 5))
    kw.setdefault("cutoff", CUTOFF)
    kw.setdefault("image_dim", 12)
    kw.setdefault("article_dim", 10)
    kw.setdefault("max_positions", 64)
    return DynamicConvDecoder(**kw)


def tiny_batch(B=3, T=7, P=4, S=6, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    caption = jax.random.randint(ks[0], (B, T), 2, VOCAB)
    caption = caption.at[:, 0].set(0)
    caption = caption.at[:, -1].set(1)
    article_mask = jnp.zeros((B, S), bool).at[:, S - 1:].set(True)
    return {
        "caption_ids": caption,
        "image": jax.random.normal(ks[1], (B, P, 12)),
        "image_mask": jnp.zeros((B, P), bool),
        "article": jax.random.normal(ks[2], (B, S, 10)),
        "article_mask": article_mask,
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = TransformerFlattened(tiny_decoder())
    batch = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def _decode_setup(model, params, batch):
    dec = model.decoder
    contexts = model._contexts(batch)
    kvs = model._decode_setup(params, contexts)
    B = contexts["image"].shape[0]
    return dec, kvs, dec.init_cache(B)


def test_chunk_step_matches_sequential(model_and_params):
    """step_chunk over k tokens == k sequential step_shift calls,
    both from a fresh cache and from mid-sequence history."""
    model, params, batch = model_and_params
    dec, kvs, caches0 = _decode_setup(model, params, batch)
    B = batch["image"].shape[0]
    key = jax.random.PRNGKey(7)
    toks = jax.random.randint(key, (B, 9), 2, VOCAB)

    for start in (0, 4):  # fresh cache / history longer than K-1
        # Sequential reference: shifted-copy steps.
        caches = caches0
        seq_lp = []
        for t in range(toks.shape[1]):
            lp, caches = dec.apply(params, toks[:, t], t, kvs, caches,
                                   method=DynamicConvDecoder.step_shift)
            seq_lp.append(lp)
            if t == start - 1:
                caches_mid = caches
        caches_mid = caches0 if start == 0 else caches_mid

        k = toks.shape[1] - start
        pos = jnp.full((B,), start, jnp.int32)
        lp_c, ids_c, hs = dec.apply(
            params, toks[:, start:], pos, kvs, caches_mid,
            method=DynamicConvDecoder.step_chunk)
        for j in range(k):
            full = np.asarray(seq_lp[start + j])
            np.testing.assert_allclose(
                np.asarray(lp_c[:, j]), full.max(axis=-1), atol=2e-4)
            np.testing.assert_array_equal(
                np.asarray(ids_c[:, j]), full.argmax(axis=-1))
        # hs shapes: one [B, k, C] per layer.
        assert len(hs) == dec.num_layers
        assert all(h.shape[:2] == (B, k) for h in hs)


def test_commit_conv_caches_matches_sequential(model_and_params):
    """Committing m chunk inputs leaves the exact cache m sequential
    steps would have left."""
    model, params, batch = model_and_params
    dec, kvs, caches0 = _decode_setup(model, params, batch)
    B = batch["image"].shape[0]
    toks = jax.random.randint(jax.random.PRNGKey(3), (B, 6), 2, VOCAB)

    _, _, hs = dec.apply(params, toks, jnp.zeros((B,), jnp.int32),
                         kvs, caches0,
                         method=DynamicConvDecoder.step_chunk)
    for m_val in (0, 1, 3, 6):
        committed = commit_conv_caches(
            caches0, hs, jnp.full((B,), m_val, jnp.int32))
        caches = caches0
        for t in range(m_val):
            _, caches = dec.apply(params, toks[:, t], t, kvs, caches,
                                  method=DynamicConvDecoder.step_shift)
        for got, want in zip(committed, caches):
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(want), atol=2e-5)

    # Per-row mixed m: row b commits b+1 inputs.
    mixed = jnp.arange(1, B + 1, dtype=jnp.int32)
    committed = commit_conv_caches(caches0, hs, mixed)
    for b in range(B):
        caches = caches0
        for t in range(int(mixed[b])):
            _, caches = dec.apply(params, toks[:, t], t, kvs, caches,
                                  method=DynamicConvDecoder.step_shift)
        for got, want in zip(committed, caches):
            np.testing.assert_allclose(np.asarray(got[b]),
                                       np.asarray(want[b]), atol=2e-5)


def _greedy_reference(model, params, batch, cfg):
    tokens, lps = model.generate(params, batch, cfg)
    return np.asarray(tokens), np.asarray(lps)


def _spec_run(model, params, batch, cfg, spec_k, draft_fn):
    dec, kvs, caches = _decode_setup(model, params, batch)
    B = batch["image"].shape[0]
    tables = None

    def chunk_fn(toks, pos, caches):
        return dec.apply(params, toks, pos, kvs, caches, tables=tables,
                         method=DynamicConvDecoder.step_chunk)

    seed = jnp.full((B,), cfg.bos_id, jnp.int32)
    return speculative_greedy(chunk_fn, commit_conv_caches, caches,
                              seed, cfg, spec_k, draft_fn)


def test_speculative_oracle_drafts_exact_and_fast(model_and_params):
    """Perfect drafts: identical output, ~max_steps/spec_k chunks."""
    model, params, batch = model_and_params
    cfg = GenerationConfig(max_len=12, sampling_topk=1)
    ref_toks, ref_lps = _greedy_reference(model, params, batch, cfg)
    spec_k = 4
    oracle = jnp.asarray(ref_toks)

    def draft_fn(tokens, pos, finished):
        idx = pos[:, None] + 1 + jnp.arange(spec_k - 1)[None, :]
        idx = jnp.clip(idx, 0, oracle.shape[1] - 1)
        return jnp.take_along_axis(oracle, idx, axis=1)

    toks, lps, n_chunks = _spec_run(model, params, batch, cfg,
                                    spec_k, draft_fn)
    np.testing.assert_array_equal(np.asarray(toks), ref_toks)
    np.testing.assert_allclose(np.asarray(lps), ref_lps, atol=2e-4)
    # Each row needs ceil(steps_b / spec_k) chunks; iterations = max.
    steps = (ref_toks[:, 1:] != cfg.pad_id).sum(axis=1)
    steps = np.maximum(steps, (ref_toks[:, 1:] == cfg.eos_id).argmax(1) + 1)
    bound = int(np.ceil(steps.max() / spec_k)) if steps.max() else 1
    assert int(n_chunks) <= max(bound, 1)


def test_speculative_garbage_drafts_exact(model_and_params):
    """Useless drafts: still identical output (one commit per chunk)."""
    model, params, batch = model_and_params
    cfg = GenerationConfig(max_len=12, sampling_topk=1)
    ref_toks, ref_lps = _greedy_reference(model, params, batch, cfg)

    def draft_fn(tokens, pos, finished):
        return jnp.full((tokens.shape[0], 3), cfg.pad_id, jnp.int32)

    toks, lps, n_chunks = _spec_run(model, params, batch, cfg, 4,
                                    draft_fn)
    np.testing.assert_array_equal(np.asarray(toks), ref_toks)
    np.testing.assert_allclose(np.asarray(lps), ref_lps, atol=2e-4)


def test_speculative_eos_handling(model_and_params):
    """An eos actually emitted by the model finishes rows identically
    in both paths (committed-eos truncation)."""
    model, params, batch = model_and_params
    base = GenerationConfig(max_len=12, sampling_topk=1, eos_id=-1)
    ref0, _ = _greedy_reference(model, params, batch, base)
    eos = int(ref0[0, 3])  # a token the model genuinely emits
    cfg = GenerationConfig(max_len=12, sampling_topk=1, eos_id=eos)
    ref_toks, ref_lps = _greedy_reference(model, params, batch, cfg)

    def draft_fn(tokens, pos, finished):
        idx = pos[:, None] + 1 + jnp.arange(4)[None, :]
        idx = jnp.clip(idx, 0, ref_toks.shape[1] - 1)
        return jnp.take_along_axis(jnp.asarray(ref_toks), idx, axis=1)

    toks, lps, _ = _spec_run(model, params, batch, cfg, 5, draft_fn)
    np.testing.assert_array_equal(np.asarray(toks), ref_toks)
    np.testing.assert_allclose(np.asarray(lps), ref_lps, atol=2e-4)


def test_generate_speculative_ngram_article(model_and_params):
    """The captioner entry point with prompt-lookup drafting from a
    synthetic 'article' that contains the caption: identical to
    greedy, fewer chunks than steps."""
    model, params, batch = model_and_params
    cfg = GenerationConfig(max_len=12, sampling_topk=1)
    ref_toks, ref_lps = _greedy_reference(model, params, batch, cfg)

    # Article ids: noise prefix, then the true caption continuation.
    B = ref_toks.shape[0]
    noise = jax.random.randint(jax.random.PRNGKey(9), (B, 4), 2, VOCAB)
    source = jnp.concatenate(
        [noise, jnp.asarray(ref_toks)[:, :], noise], axis=1)
    b2 = dict(batch)
    b2["article_ids"] = source

    toks, lps, n_chunks = model.generate_speculative(
        params, b2, cfg, spec_k=4)
    np.testing.assert_array_equal(np.asarray(toks), ref_toks)
    np.testing.assert_allclose(np.asarray(lps), ref_lps, atol=2e-4)
    steps = (ref_toks[:, 1:] != cfg.pad_id).sum(axis=1).max()
    if steps >= 8:  # enough room for lookup to actually accelerate
        assert int(n_chunks) < int(steps)


def test_speculative_quantized_kv_matches_quantized_greedy(
        model_and_params):
    """With quantize_kv both paths decode the SAME int8 K/V, so the
    exactness contract holds within the quantized model."""
    model, params, batch = model_and_params
    cfg = GenerationConfig(max_len=12, sampling_topk=1,
                           quantize_kv=True)
    ref_toks, ref_lps = _greedy_reference(model, params, batch, cfg)
    b2 = dict(batch)
    b2["article_ids"] = jnp.concatenate(
        [jnp.asarray(ref_toks),
         jnp.full((ref_toks.shape[0], 3), 1, jnp.int32)], axis=1)
    toks, lps, _ = model.generate_speculative(params, b2, cfg,
                                              spec_k=4)
    np.testing.assert_array_equal(np.asarray(toks), ref_toks)
    np.testing.assert_allclose(np.asarray(lps), ref_lps, atol=2e-4)


def test_speculative_jits(model_and_params):
    """The whole speculative loop compiles under jit."""
    model, params, batch = model_and_params
    cfg = GenerationConfig(max_len=10, sampling_topk=1)
    b2 = dict(batch)
    b2["article_ids"] = jax.random.randint(
        jax.random.PRNGKey(2), (batch["image"].shape[0], 16), 2, VOCAB)

    fn = jax.jit(lambda p, b: model.generate_speculative(
        p, b, cfg, spec_k=4))
    toks, lps, n = fn(params, b2)
    ref_toks, ref_lps = _greedy_reference(model, params, batch, cfg)
    np.testing.assert_array_equal(np.asarray(toks), ref_toks)


@pytest.fixture(scope="module")
def gen2_model_and_params():
    from news_image_caption_tpu.models.gen2 import Gen2Captioner

    model = Gen2Captioner(vocab_size=50, d_model=16, d_ff=32,
                          num_heads=4, num_layers=2, img_dim=12,
                          sent_dim=10, max_len=64)
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    B = 3
    batch = {
        "caption_ids": jax.random.randint(ks[0], (B, 9), 3, 50)
        .at[:, 0].set(1),
        "image": jax.random.normal(ks[1], (B, 4, 12)),
        "article": jax.random.normal(ks[2], (B, 7, 10)),
        "article_mask": jnp.zeros((B, 7), bool).at[:, 6:].set(True),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_gen2_chunk_matches_sequential(gen2_model_and_params):
    """Gen-2 step_chunk == sequential step (causal self-attn chunk
    over the bounded KV cache), from fresh and mid-sequence states."""
    from news_image_caption_tpu.models.gen2 import Gen2Transformer

    model, params, batch = gen2_model_and_params
    mod = model.module
    memory = model._memory(batch)
    src_masks = model._src_masks(batch)
    kvs = mod.apply(params, memory,
                    method=Gen2Transformer.precompute_kv)
    B = batch["image"].shape[0]
    T = 8
    toks = jax.random.randint(jax.random.PRNGKey(11), (B, T), 3, 50)

    caches = mod.init_cache(B, T + 2)
    seq_lp = []
    for t in range(T):
        lp, caches = mod.apply(params, toks[:, t], t, kvs, caches,
                               src_masks, method=Gen2Transformer.step)
        seq_lp.append(lp)

    for start in (0, 3):
        caches = mod.init_cache(B, T + 2)
        for t in range(start):
            _, caches = mod.apply(params, toks[:, t], t, kvs, caches,
                                  src_masks,
                                  method=Gen2Transformer.step)
        pos = jnp.full((B,), start, jnp.int32)
        lp_c, ids_c, _ = mod.apply(params, toks[:, start:], pos, kvs,
                                   caches, src_masks,
                                   method=Gen2Transformer.step_chunk)
        for j in range(T - start):
            full = np.asarray(seq_lp[start + j])
            np.testing.assert_allclose(np.asarray(lp_c[:, j]),
                                       full.max(axis=-1), atol=2e-4)
            np.testing.assert_array_equal(np.asarray(ids_c[:, j]),
                                          full.argmax(axis=-1))


def test_gen2_speculative_matches_greedy(gen2_model_and_params):
    """Gen-2 generate_speculative == generate (greedy) for oracle,
    garbage, and article-lookup drafts."""
    from news_image_caption_tpu.generation.generator import \
        GenerationConfig

    model, params, batch = gen2_model_and_params
    cfg = GenerationConfig(max_len=14, sampling_topk=1, bos_id=1,
                           eos_id=2, pad_id=0, init_finished=False)
    ref_toks, ref_lps = model.generate(params, batch, cfg)
    ref_toks, ref_lps = np.asarray(ref_toks), np.asarray(ref_lps)

    b2 = dict(batch)
    noise = jax.random.randint(jax.random.PRNGKey(13),
                               (ref_toks.shape[0], 4), 3, 50)
    b2["article_ids"] = jnp.concatenate(
        [noise, jnp.asarray(ref_toks), noise], axis=1)
    toks, lps, n_chunks = jax.jit(
        lambda p, b: model.generate_speculative(p, b, cfg, spec_k=4)
    )(params, b2)
    np.testing.assert_array_equal(np.asarray(toks), ref_toks)
    np.testing.assert_allclose(np.asarray(lps), ref_lps, atol=2e-4)

    # Garbage drafts: still exact.
    b3 = dict(batch)
    b3["article_ids"] = jnp.full((ref_toks.shape[0], 10), 3, jnp.int32)
    toks3, _, _ = model.generate_speculative(params, b3, cfg, spec_k=4)
    np.testing.assert_array_equal(np.asarray(toks3), ref_toks)


def test_ngram_drafts_basic():
    source = jnp.asarray([[5, 6, 7, 8, 9, 10],
                          [5, 6, 7, 8, 9, 10]], jnp.int32)
    tokens = jnp.asarray([[0, 6, 7, 0, 0],
                          [0, 3, 4, 0, 0]], jnp.int32)
    pos = jnp.asarray([2, 2], jnp.int32)
    drafts = ngram_drafts(source, tokens, pos, k_draft=3, n=2, pad_id=1)
    # Row 0: suffix (6,7) matches source[1:3] -> drafts 8,9,10.
    np.testing.assert_array_equal(np.asarray(drafts[0]), [8, 9, 10])
    # Row 1: no match -> all pad.
    np.testing.assert_array_equal(np.asarray(drafts[1]), [1, 1, 1])


def test_ngram_drafts_match_at_end_pads():
    source = jnp.asarray([[3, 4, 5, 6]], jnp.int32)
    tokens = jnp.asarray([[0, 5, 6, 0]], jnp.int32)
    pos = jnp.asarray([2], jnp.int32)
    drafts = ngram_drafts(source, tokens, pos, k_draft=2, n=2, pad_id=1)
    # Match at the very end: continuation runs off source -> pads.
    np.testing.assert_array_equal(np.asarray(drafts[0]), [1, 1])


def test_ngram_drafts_span_boundary_resync():
    """The mechanism behind the measured span-structure curve
    (benchmarks/spec_decode_spans.py): a caption that jumps between
    two disjoint article spans costs ~2 tokens per boundary — the
    cross-boundary 2-gram is not in the article (one missed draft,
    then a pad step), and drafting re-syncs once two in-span tokens
    are committed."""
    #                      span A: 10..13        span B: 20..23
    source = jnp.asarray([[10, 11, 12, 13, 99, 98, 20, 21, 22, 23]],
                         jnp.int32)
    # committed caption crosses A -> B at position 3.
    tokens = jnp.asarray([[0, 12, 13, 20, 21, 0, 0]], jnp.int32)

    # At the end of span A, the (12, 13) 2-gram matches — but drafts
    # continue the ARTICLE (99, 98), not the caption's jump to 20.
    d = ngram_drafts(source, tokens, jnp.asarray([2], jnp.int32),
                     k_draft=2, n=2, pad_id=1)
    np.testing.assert_array_equal(np.asarray(d[0]), [99, 98])

    # One token into span B the cross-boundary 2-gram (13, 20) is not
    # in the article -> all-pad drafts (the chunk still commits the
    # corrected token; bad drafts cost speed only).
    d = ngram_drafts(source, tokens, jnp.asarray([3], jnp.int32),
                     k_draft=2, n=2, pad_id=1)
    np.testing.assert_array_equal(np.asarray(d[0]), [1, 1])

    # Two tokens in, (20, 21) matches and drafting resumes: 22, 23.
    d = ngram_drafts(source, tokens, jnp.asarray([4], jnp.int32),
                     k_draft=2, n=2, pad_id=1)
    np.testing.assert_array_equal(np.asarray(d[0]), [22, 23])


def test_ngram_drafts_short_prefix():
    """At pos=0 only the seed is available; matching falls back to the
    1-gram suffix."""
    source = jnp.asarray([[9, 0, 7, 8, 9]], jnp.int32)
    tokens = jnp.asarray([[0, 1, 1]], jnp.int32)
    pos = jnp.asarray([0], jnp.int32)
    drafts = ngram_drafts(source, tokens, pos, k_draft=2, n=2, pad_id=1)
    # First window whose LAST token == seed(0) is source[0:2]=(9,0)
    # -> continuation 7, 8.
    np.testing.assert_array_equal(np.asarray(drafts[0]), [7, 8])


# ---- pointer family (entity gate + copy head) ------------------------

@pytest.fixture(scope="module")
def pointer_model_and_params():
    from tests.test_pointer import make_pointer, pointer_batch
    model = make_pointer()
    batch = pointer_batch(B=2, S=10)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return model, variables, batch


def _force_copy_gate(variables):
    """Bias the entity head so argmax is always 'copy' — exercises
    the copy path + already-copied suppression."""
    ef = dict(variables["entity_fc"])
    ef["params"] = dict(ef["params"])
    ef["params"] = {**ef["params"],
                    "bias": jnp.asarray([-5.0, 5.0])}
    return {**variables, "entity_fc": ef}


def test_entity_chunk_matches_steps_with_partial_commits():
    """EntitySelfAttention.chunk == sequential step at every committed
    position, across iterations with PER-ROW partial commits (the
    rewind-free cache claim: stale rows past a row's frontier are
    never attended and get overwritten by the next chunk)."""
    from news_image_caption_tpu.models.pointer import EntitySelfAttention
    m = EntitySelfAttention(embed_dim=16, num_heads=4)
    T, B, k = 7, 2, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 16))
    params = m.init(jax.random.PRNGKey(1), x)
    cache_s = m.init_cache(B, T + k)
    seq_outs = []
    for t in range(T):
        o, cache_s = m.apply(params, x[:, t], t, cache_s,
                             method=EntitySelfAttention.step)
        seq_outs.append(np.asarray(o))
    seq_outs = np.stack(seq_outs, axis=1)          # [B, T, E]

    cache = m.init_cache(B, T + k)
    pos = np.zeros(B, np.int64)
    for m_it in ([2, 1], [1, 3], [3, 2], [1, 1]):  # rows desync
        idx = np.clip(pos[:, None] + np.arange(k), 0, T - 1)
        xi = jnp.take_along_axis(
            x, jnp.asarray(idx)[:, :, None], axis=1)
        out, cache = m.apply(params, xi, jnp.asarray(pos, jnp.int32),
                             cache, method=EntitySelfAttention.chunk)
        out = np.asarray(out)
        for b in range(B):
            for j in range(min(m_it[b], T - int(pos[b]))):
                np.testing.assert_allclose(
                    out[b, j], seq_outs[b, int(pos[b]) + j],
                    atol=1e-5,
                    err_msg=f"row {b} chunk pos {pos[b]}+{j}")
        pos = np.minimum(pos + np.array(m_it), T)


def test_pointer_speculative_matches_greedy(pointer_model_and_params):
    model, variables, batch = pointer_model_and_params
    cfg = GenerationConfig(max_len=10, sampling_topk=1)
    ref_toks, ref_copied = model.generate(variables, batch, cfg)
    toks, copied, n_chunks = model.generate_speculative(
        variables, batch, cfg, spec_k=4)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(ref_toks))
    np.testing.assert_array_equal(np.asarray(copied),
                                  np.asarray(ref_copied))
    assert int(n_chunks) <= cfg.max_len


def test_pointer_speculative_forced_copy_gate(pointer_model_and_params):
    """With the gate forced open the copy path + already-copied
    suppression actually run; speculative must still match exactly
    (tokens AND copied flags)."""
    model, variables, batch = pointer_model_and_params
    v = _force_copy_gate(variables)
    cfg = GenerationConfig(max_len=10, sampling_topk=1)
    ref_toks, ref_copied = model.generate(v, batch, cfg)
    assert np.asarray(ref_copied).any()   # the copy path fired
    for spec_k in (2, 4, 6):
        toks, copied, _ = model.generate_speculative(
            v, batch, cfg, spec_k=spec_k)
        np.testing.assert_array_equal(np.asarray(toks),
                                      np.asarray(ref_toks))
        np.testing.assert_array_equal(np.asarray(copied),
                                      np.asarray(ref_copied))


def test_pointer_speculative_oracle_drafts_accelerate(
        pointer_model_and_params):
    """Drafting from the model's own greedy output: near-total
    acceptance, so chunks << steps."""
    model, variables, batch = pointer_model_and_params
    cfg = GenerationConfig(max_len=10, sampling_topk=1)
    ref_toks, _ = model.generate(variables, batch, cfg)
    toks, _, n_chunks = model.generate_speculative(
        variables, batch, cfg, spec_k=4,
        draft_source=ref_toks[:, 1:])
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(ref_toks))
    assert int(n_chunks) < cfg.max_len


def test_pointer_speculative_only_pointer_delegates(
        pointer_model_and_params):
    """use_entity_head=False routes through the flagship engine and
    flags nothing copied (transformer_only_pointer semantics)."""
    from tests.test_pointer import make_pointer, pointer_batch
    model = make_pointer(use_entity_head=False)
    batch = pointer_batch(B=2, S=10)
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = GenerationConfig(max_len=8, sampling_topk=1)
    ref_toks, _ = model.generate(variables, batch, cfg)
    toks, copied, _ = model.generate_speculative(
        variables, batch, cfg, spec_k=4)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(ref_toks))
    assert not np.asarray(copied).any()


def test_pointer_speculative_jits(pointer_model_and_params):
    model, variables, batch = pointer_model_and_params
    v = _force_copy_gate(variables)
    cfg = GenerationConfig(max_len=8, sampling_topk=1)
    fn = jax.jit(lambda p, b: model.generate_speculative(
        p, b, cfg, spec_k=4))
    toks, copied, _ = fn(v, batch)
    ref_toks, ref_copied = model.generate(v, batch, cfg)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(ref_toks))
    np.testing.assert_array_equal(np.asarray(copied),
                                  np.asarray(ref_copied))


# ---- tgnc template-guided decoder -------------------------------------

@pytest.fixture(scope="module")
def tgnc_model_and_params():
    from tests.test_variants import base_batch, tiny_kwargs
    from news_image_caption_tpu.models.tgnc import TGNC
    model = TGNC(use_template_decoder=True, n_templates=3,
                 **tiny_kwargs())
    batch = base_batch()
    # drafting source (ngram prompt-lookup) — any ids work for
    # exactness; embed nothing special
    batch["article_ids"] = jax.random.randint(
        jax.random.PRNGKey(5), (2, 6), 2, 40)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_tgnc_speculative_matches_greedy(tgnc_model_and_params):
    """Speculative decode through the template-mixed heads (trunk +
    per-template conv caches commit/rewind) is token-identical to
    plain greedy for several chunk sizes."""
    model, variables, batch = tgnc_model_and_params
    cfg = GenerationConfig(max_len=10, sampling_topk=1)
    ref_toks, _ = model.generate(variables, batch, cfg)
    for spec_k in (2, 4, 6):
        toks, _, n_chunks = model.generate_speculative(
            variables, batch, cfg, spec_k=spec_k)
        np.testing.assert_array_equal(np.asarray(toks),
                                      np.asarray(ref_toks))
        assert int(n_chunks) <= cfg.max_len


def test_tgnc_speculative_oracle_drafts_accelerate(
        tgnc_model_and_params):
    model, variables, batch = tgnc_model_and_params
    cfg = GenerationConfig(max_len=10, sampling_topk=1)
    ref_toks, _ = model.generate(variables, batch, cfg)
    toks, _, n_chunks = model.generate_speculative(
        variables, batch, cfg, spec_k=4,
        draft_source=ref_toks[:, 1:])
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(ref_toks))
    assert int(n_chunks) < cfg.max_len


def test_tgnc_speculative_plain_decoder_delegates(
        tgnc_model_and_params):
    """use_template_decoder=False routes through the flagship
    engine (same decoder, so same captions)."""
    from tests.test_variants import base_batch, tiny_kwargs
    from news_image_caption_tpu.models.tgnc import TGNC
    model = TGNC(use_template_decoder=False, **tiny_kwargs())
    batch = base_batch()
    batch["article_ids"] = jax.random.randint(
        jax.random.PRNGKey(5), (2, 6), 2, 40)
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = GenerationConfig(max_len=8, sampling_topk=1)
    ref_toks, _ = model.generate(variables, batch, cfg)
    toks, _, _ = model.generate_speculative(
        variables, batch, cfg, spec_k=4)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(ref_toks))


def test_faces_objects_variant_speculative_matches_greedy():
    """Extra-context variants (faces/objects attention blocks in every
    layer) run the same chunked verification — token-identical to
    greedy through TransformerFlattened.generate_speculative."""
    from news_image_caption_tpu.utils.registry import MODELS
    from tests.test_variants import base_batch, tiny_kwargs
    model = MODELS.get("transformer_faces_objects")(
        face_dim=8, obj_dim=9, **tiny_kwargs())
    batch = base_batch()
    batch["faces"] = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 8))
    batch["faces_mask"] = jnp.zeros((2, 3), bool)
    batch["obj"] = jax.random.normal(jax.random.PRNGKey(8), (2, 3, 9))
    batch["obj_mask"] = jnp.zeros((2, 3), bool)
    batch["article_ids"] = jax.random.randint(
        jax.random.PRNGKey(5), (2, 6), 2, 40)
    params = model.init(jax.random.PRNGKey(0), batch)
    cfg = GenerationConfig(max_len=10, sampling_topk=1)
    ref_toks, _ = model.generate(params, batch, cfg)
    toks, _, n_chunks = model.generate_speculative(
        params, batch, cfg, spec_k=4)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(ref_toks))
    assert int(n_chunks) <= cfg.max_len
