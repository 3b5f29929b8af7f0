"""Adaptive embedding/softmax: dense-masked vs naive full softmax."""

import jax
import jax.numpy as jnp
import numpy as np

from news_image_caption_tpu.ops.adaptive import (
    AdaptiveEmbedding, AdaptiveSoftmax, band_ranges)

CUTOFF = (8, 16, 30)  # tiny: vocab 30, head 8, tails 8 and 14
DIM = 12


def make_embedder_and_softmax():
    emb = AdaptiveEmbedding(cutoff=CUTOFF, initial_dim=DIM, output_dim=DIM,
                            factor=1.0, padding_idx=0, scale_embeds=True)
    sm = AdaptiveSoftmax(vocab_size=CUTOFF[-1], input_dim=DIM, cutoff=CUTOFF,
                         factor=1.0, tied=True)
    return emb, sm


def test_band_ranges():
    assert band_ranges(CUTOFF) == [(0, 8), (8, 16), (16, 30)]


def test_embedding_covers_all_bands():
    emb, _ = make_embedder_and_softmax()
    ids = jnp.arange(30).reshape(1, 30)
    params = emb.init(jax.random.PRNGKey(0), ids)
    out = emb.apply(params, ids)
    assert out.shape == (1, 30, DIM)
    # Each band's internal padding row is zero-initialized (the
    # reference passes padding_idx to every band's nn.Embedding), so
    # tokens 0, 8 (=cutoff0+0) and 16 (=cutoff1+0) embed to zero.
    for tok in (0, 8, 16):
        np.testing.assert_allclose(np.asarray(out[0, tok]), 0.0, atol=1e-6)
    norms = np.linalg.norm(np.asarray(out[0]), axis=-1)
    nonzero = [t for t in range(30) if t not in (0, 8, 16)]
    assert (norms[nonzero] > 1e-6).all()


def _tables(emb, params):
    p = params["params"]
    return [(p[f"embed_{i}"], p[f"proj_{i}"]) for i in range(len(CUTOFF))]


def test_log_prob_normalized_and_matches_naive():
    emb, sm = make_embedder_and_softmax()
    ids = jnp.arange(30).reshape(1, 30)
    eparams = emb.init(jax.random.PRNGKey(0), ids)
    tables = _tables(emb, eparams)

    N = 5
    x = jax.random.normal(jax.random.PRNGKey(1), (N, DIM))
    sparams = sm.init(jax.random.PRNGKey(2), x, embed_tables=tables,
                      method=AdaptiveSoftmax.log_prob)
    lp = sm.apply(sparams, x, embed_tables=tables,
                  method=AdaptiveSoftmax.log_prob)
    assert lp.shape == (N, 30)
    # Proper distribution over the full vocab.
    total = np.exp(np.asarray(lp)).sum(axis=-1)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def test_loss_matches_log_prob_nll():
    """Summed adaptive loss == sum of -log p(target) from log_prob
    (for targets that don't hit the ignore-index quirks)."""
    emb, sm = make_embedder_and_softmax()
    ids = jnp.arange(30).reshape(1, 30)
    eparams = emb.init(jax.random.PRNGKey(0), ids)
    tables = _tables(emb, eparams)

    N = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (N, DIM))
    sparams = sm.init(jax.random.PRNGKey(2), x, embed_tables=tables,
                      method=AdaptiveSoftmax.log_prob)
    # Targets avoiding padding_idx=1, and avoiding in-band index 1
    # (ids 8+1=9 and 16+1=17 trigger the reference's ignore quirk).
    target = jnp.array([2, 3, 8, 10, 16, 20, 29, 5])
    loss, ntokens = sm.apply(sparams, x, target, padding_idx=1,
                             embed_tables=tables,
                             method=AdaptiveSoftmax.loss_sum)
    lp = sm.apply(sparams, x, embed_tables=tables,
                  method=AdaptiveSoftmax.log_prob)
    expected = -np.take_along_axis(
        np.asarray(lp), np.asarray(target)[:, None], axis=1).sum()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    assert int(ntokens) == 8


def test_loss_ignores_padding():
    emb, sm = make_embedder_and_softmax()
    ids = jnp.arange(30).reshape(1, 30)
    eparams = emb.init(jax.random.PRNGKey(0), ids)
    tables = _tables(emb, eparams)
    N = 4
    x = jax.random.normal(jax.random.PRNGKey(1), (N, DIM))
    sparams = sm.init(jax.random.PRNGKey(2), x, embed_tables=tables,
                      method=AdaptiveSoftmax.log_prob)
    t1 = jnp.array([2, 3, 1, 1])   # two pads
    loss1, n1 = sm.apply(sparams, x, t1, padding_idx=1, embed_tables=tables,
                         method=AdaptiveSoftmax.loss_sum)
    t2 = jnp.array([2, 3, 1, 1])
    x2 = x.at[2:].set(123.0)       # pad positions' inputs are irrelevant
    loss2, n2 = sm.apply(sparams, x2, t2, padding_idx=1, embed_tables=tables,
                         method=AdaptiveSoftmax.loss_sum)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    assert int(n1) == 2


def test_topk_log_prob_matches_dense_topk():
    """Banded exact top-k == top_k over the materialized log_prob."""
    emb, sm = make_embedder_and_softmax()
    ids = jnp.arange(30).reshape(1, 30)
    eparams = emb.init(jax.random.PRNGKey(0), ids)
    tables = _tables(emb, eparams)

    N, k = 7, 4
    x = jax.random.normal(jax.random.PRNGKey(3), (N, DIM))
    sparams = sm.init(jax.random.PRNGKey(2), x, embed_tables=tables,
                      method=AdaptiveSoftmax.log_prob)
    lp = sm.apply(sparams, x, embed_tables=tables,
                  method=AdaptiveSoftmax.log_prob)
    ref_v, ref_i = jax.lax.top_k(lp, k)
    v, i = sm.apply(sparams, x, k, embed_tables=tables,
                    method=AdaptiveSoftmax.topk_log_prob)
    assert v.shape == (N, k) and i.shape == (N, k)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                               rtol=1e-6, atol=1e-6)


def test_quantized_head_tables_rms_and_captions():
    """Opt-in int8 head tables (QuantTable): per-row RMS logit error
    bounded, and toy-model greedy captions identical to the exact
    path (flagship-scale captions may differ near ties — documented
    opt-in tradeoff, like quantize_kv)."""
    import __graft_entry__ as ge
    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    from news_image_caption_tpu.ops.adaptive import (
        QuantTable, quantize_embed_tables)

    model = ge._flagship(tiny=True)
    batch = ge._batch(B=3, T=12, P=4, S=9, image_dim=16,
                      article_dim=24, vocab=64, key=5)
    params = model.init(jax.random.PRNGKey(0), batch)

    tables = model.decoder.apply(
        params, method=type(model.decoder).quantized_embed_tables)
    assert isinstance(tables[0][0], QuantTable)
    # per-table dequant RMS error < 1% of rms magnitude
    raw = model.decoder.apply(
        params, method=lambda m: m.embedder.embed_tables())
    qts = quantize_embed_tables(raw)
    for (t, _), (qt, _) in zip(raw, qts):
        deq = qt.q.astype(jnp.float32) * qt.scale.astype(
            jnp.float32)[:, None]
        err = jnp.sqrt(jnp.mean((deq - t) ** 2))
        mag = jnp.sqrt(jnp.mean(t ** 2))
        assert float(err / mag) < 0.01

    cfg = GenerationConfig(max_len=10, sampling_topk=1)
    cfg_q = GenerationConfig(max_len=10, sampling_topk=1,
                             quantize_head=True)
    toks, _ = model.generate(params, batch, cfg)
    toks_q, _ = model.generate(params, batch, cfg_q)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks_q))

    out = model.generate_beam(params, batch,
                              GenerationConfig(max_len=10, beam_size=3,
                                               quantize_head=True))
    assert np.asarray(out[0]).shape[1] == 3


def test_pallas_head_falls_back_to_xla_for_quant_tables(monkeypatch):
    """use_pallas_head + quantize_head: the Pallas kernel streams raw
    fp/bf16 tables only, so QuantTable inputs must route to the XLA
    dequant path (previously an AttributeError at trace time)."""
    import news_image_caption_tpu.ops.adaptive as ad

    sm = ad.AdaptiveSoftmax(vocab_size=32, input_dim=16,
                            cutoff=(8, 16, 32), factor=2.0,
                            use_pallas_head=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    tables = [(jax.random.normal(jax.random.PRNGKey(i + 1),
                                 (n, d)), None)
              for i, (n, d) in enumerate([(8, 16), (8, 8), (16, 4)])]
    sparams = sm.init(jax.random.PRNGKey(2), x, embed_tables=tables,
                      method=ad.AdaptiveSoftmax.log_prob)
    qtables = ad.quantize_embed_tables(tables)
    # Pretend we're on TPU so only the QuantTable guard prevents the
    # Pallas route.
    monkeypatch.setattr(ad.jax, "default_backend", lambda: "tpu")
    v, i = sm.apply(sparams, x, 3, embed_tables=qtables,
                    method=ad.AdaptiveSoftmax.topk_log_prob)
    assert v.shape == (4, 3)
    assert np.isfinite(np.asarray(v)).all()


def test_tie_proj_uses_embedder_projections():
    """tie_proj=True: the tail down-projections are the embedder's
    band projections TRANSPOSED (reference TiedLinear(tied_proj,
    transpose=True), softmax.py:119-120) — no tail_proj params exist,
    and the log-probs still normalize."""
    emb = AdaptiveEmbedding(cutoff=CUTOFF, initial_dim=DIM,
                            output_dim=DIM, factor=1.0, padding_idx=0)
    sm = AdaptiveSoftmax(vocab_size=CUTOFF[-1], input_dim=DIM,
                         cutoff=CUTOFF, factor=1.0, tied=True,
                         tie_proj=True)
    ids = jnp.arange(30).reshape(1, 30)
    eparams = emb.init(jax.random.PRNGKey(0), ids)
    tables = _tables(emb, eparams)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, DIM))
    sparams = sm.init(jax.random.PRNGKey(2), x, tables,
                      method=AdaptiveSoftmax.log_prob)
    assert not any(k.startswith("tail_proj")
                   for k in sparams["params"])
    lp = sm.apply(sparams, x, tables, method=AdaptiveSoftmax.log_prob)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(jnp.exp(lp), axis=-1)), 1.0, atol=1e-4)
    # Manual check: tail-1 hidden must be x @ proj_1.T.
    h = sm.apply(sparams, x, 1, True, tables,
                 method=AdaptiveSoftmax.tail_hidden)
    want = x @ tables[1][1].T
    np.testing.assert_allclose(np.asarray(h), np.asarray(want),
                               atol=1e-5)
    # topk agrees with the materialized matrix.
    v, i = sm.apply(sparams, x, 3, tables,
                    method=AdaptiveSoftmax.topk_log_prob)
    np.testing.assert_array_equal(np.asarray(i[:, 0]),
                                  np.asarray(jnp.argmax(lp, axis=-1)))


def test_tie_proj_requires_tied():
    import pytest

    sm = AdaptiveSoftmax(vocab_size=CUTOFF[-1], input_dim=DIM,
                         cutoff=CUTOFF, tied=False, tie_proj=True)
    x = jnp.zeros((2, DIM))
    with pytest.raises(ValueError, match="tie_proj"):
        sm.init(jax.random.PRNGKey(0), x, None,
                method=AdaptiveSoftmax.log_prob)
