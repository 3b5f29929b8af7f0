"""Gen-1 LSTM family: all model types train + sample + beam."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.models.gen1 import (Gen1Captioner, Gen1Model,
                                                masked_nll_loss)

VOCAB = 30
TYPES = ["show_tell", "fc", "att2in", "att2in2", "adaatt", "adaatt_mo",
         "topdown", "show_attend_tell", "all_img"]


def make_model(model_type, **kw):
    kw.setdefault("vocab_size", VOCAB)
    if model_type in ("adaatt", "adaatt_mo"):
        # AdaAtt requires equal encoding/rnn/att_hid sizes (see core).
        kw.setdefault("input_encoding_size", 16)
        kw.setdefault("att_hid_size", 16)
    else:
        kw.setdefault("input_encoding_size", 12)
        kw.setdefault("att_hid_size", 10)
    kw.setdefault("rnn_size", 16)
    kw.setdefault("fc_feat_size", 14)
    kw.setdefault("att_feat_size", 14)
    kw.setdefault("seq_length", 8)
    return Gen1Model(Gen1Captioner(model_type=model_type, **kw))


def make_batch(B=2, T=7, P=5, key=0, sen=False):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    seq = jax.random.randint(ks[0], (B, T), 1, VOCAB)
    seq = seq.at[:, 0].set(0)
    mask = jnp.ones((B, T))
    batch = {
        "seq": seq,
        "mask": mask,
        "fc_feats": jax.random.normal(ks[1], (B, 14)),
        "att_feats": jax.random.normal(ks[2], (B, P, 14)),
    }
    if sen:
        batch["sen_embed"] = jax.random.normal(ks[3], (B, 6, 9))
    return batch


@pytest.mark.parametrize("model_type", TYPES)
def test_forward_and_loss(model_type):
    model = make_model(model_type)
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    lps = model.forward(params, batch)
    assert lps.shape == (2, 6, VOCAB + 1)
    np.testing.assert_allclose(np.exp(np.asarray(lps)).sum(-1), 1.0,
                               atol=1e-4)
    loss, aux = model.loss_fn(params, batch)
    assert np.isfinite(float(loss)) and float(loss) > 0


@pytest.mark.parametrize("model_type", ["show_tell", "att2in2",
                                        "topdown"])
def test_train_decreases(model_type):
    import optax
    model = make_model(model_type)
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        (l, _), g = jax.value_and_grad(model.loss_fn, has_aux=True)(
            p, batch)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    p = params
    for _ in range(10):
        p, opt, l = step(p, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("model_type", ["show_tell", "fc", "adaatt",
                                        "topdown", "show_attend_tell"])
def test_sample_and_beam(model_type):
    model = make_model(model_type)
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    toks, lps = model.sample(params, batch, max_len=6)
    assert toks.shape == (2, 6)
    btoks, bscores = model.sample_beam(params, batch, beam_size=3,
                                       max_len=6)
    assert btoks.shape == (2, 6)
    assert np.isfinite(np.asarray(bscores)).all()


def test_sample_with_attention_feeds_visual_news_eval():
    """Reference return_attention path (OldModel.py:321 ->
    eval_split_visual_news vis_att/sen_att): greedy decode returns
    per-step visual + sentence attention distributions and the compat
    eval loop attaches them to predictions."""
    from news_image_caption_tpu.compat.eval_utils import \
        eval_split_visual_news

    model = make_model("show_attend_tell", sentence_embed_method="fc",
                       sentence_embed_size=9, sentence_length=6)
    batch = make_batch(sen=True)
    params = model.init(jax.random.PRNGKey(0), batch)
    toks, lps, (vis, sen) = model.sample_with_attention(
        params, batch, max_len=6)
    assert toks.shape == (2, 6) and lps.shape == (2, 6)
    assert np.asarray(vis).shape == (6, 2, 5)       # [T, B, P]
    np.testing.assert_allclose(np.asarray(vis).sum(-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sen).sum(-1), 1.0,
                               atol=1e-5)
    # and the greedy tokens match plain sample()
    ref_toks, _ = model.sample(params, batch, max_len=6)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(ref_toks))
    _, preds, _ = eval_split_visual_news(
        model, params, [batch], max_len=6, return_attention=True,
        language_eval_flag=False)
    assert all("vis_att" in p and "sen_att" in p for p in preds)


def test_forward_with_attention_coverage_loss():
    """Teacher-forced coverage penalty (OldModel.py:65-106,
    return_attention=True): the log-probs match plain forward, and
    cov_loss equals a naive python replay of the reference recipe —
    coverage seeded at t=0, sum(min(att_t, coverage_{t-1})) for t>=1,
    loop broken at the first all-pad seq column, total / B."""
    model = make_model("show_attend_tell", sentence_embed_method="fc",
                       sentence_embed_size=9, sentence_length=6)
    batch = make_batch(sen=True)
    # All-pad tail columns exercise the reference's all-ended break.
    seq = np.asarray(batch["seq"]).copy()
    seq[:, -2:] = 0
    batch["seq"] = jnp.asarray(seq)
    params = model.init(jax.random.PRNGKey(0), batch)

    lps, cov = model.forward_with_attention(params, batch)
    ref_lps = model.forward(params, batch)
    np.testing.assert_allclose(np.asarray(lps), np.asarray(ref_lps),
                               atol=1e-5)

    feats, state = model._prepare(params, batch)
    coverage = np.zeros((2, 6))
    cov_ref = 0.0
    for t in range(seq.shape[1] - 1):
        if t >= 1 and seq[:, t].sum() == 0:
            break
        _, state, (_, sen) = model.module.apply(
            params, jnp.asarray(seq[:, t]), feats, state,
            method=Gen1Captioner.decode_step_attn)
        sen = np.asarray(sen)
        if t >= 1:
            cov_ref += float(np.minimum(sen, coverage).sum())
        coverage = coverage + sen
    assert cov_ref > 0
    np.testing.assert_allclose(float(cov), cov_ref / 2, rtol=1e-5)

    # Unsupported cores reject the attention path like the reference
    # (other cores' forward has no return_attention argument).
    st_model = make_model("show_tell")
    st_batch = make_batch()
    st_params = st_model.init(jax.random.PRNGKey(0), st_batch)
    with pytest.raises(ValueError):
        st_model.forward_with_attention(st_params, st_batch)


@pytest.mark.slow
def test_show_attend_tell_sentence_variants():
    for method in ["fc", "fc_max", "concat", "conv", "conv_deep",
                   "bnews"]:
        # sen_embed is [B, L=6, E=9] (make_batch); conv/conv_deep
        # need the dims declared like the reference's opt fields.
        model = make_model("show_attend_tell",
                           sentence_embed_method=method,
                           sentence_embed_size=9, sentence_length=6)
        batch = make_batch(sen=True)
        params = model.init(jax.random.PRNGKey(0), batch)
        loss, _ = model.loss_fn(params, batch)
        assert np.isfinite(float(loss)), method


def test_scheduled_sampling_changes_loss():
    model = make_model("show_tell")
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    l0, _ = model.loss_fn(params, batch, ss_prob=0.0)
    l1, _ = model.loss_fn(params, batch,
                          dropout_rng=jax.random.PRNGKey(5), ss_prob=0.9)
    assert float(l0) != float(l1)


def test_masked_nll_ignores_masked():
    lp = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(0), (1, 3, 5)), -1)
    tgt = jnp.array([[1, 2, 3]])
    m_full = jnp.ones((1, 3))
    m_part = jnp.array([[1.0, 1.0, 0.0]])
    l_full, n_full = masked_nll_loss(lp, tgt, m_full)
    l_part, n_part = masked_nll_loss(lp, tgt, m_part)
    assert int(n_full) == 3 and int(n_part) == 2
    manual = -(lp[0, 0, 1] + lp[0, 1, 2]) / 2
    np.testing.assert_allclose(float(l_part), float(manual), rtol=1e-6)


def test_lstm_matches_torch():
    """TorchLSTM numerics vs torch.nn.LSTM (bias-free, 1 layer)."""
    import torch

    from news_image_caption_tpu.models.gen1 import TorchLSTM
    B, IN, H = 2, 6, 8
    x = np.random.default_rng(0).standard_normal((B, IN)).astype(np.float32)
    mod = TorchLSTM(hidden_size=H, num_layers=1, use_bias=False)
    state = (jnp.zeros((1, B, H)), jnp.zeros((1, B, H)))
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), state)

    tl = torch.nn.LSTM(IN, H, 1, bias=False)
    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.tensor(
            np.asarray(params["params"]["ih_0"]["kernel"]).T))
        tl.weight_hh_l0.copy_(torch.tensor(
            np.asarray(params["params"]["hh_0"]["kernel"]).T))
        t_out, (t_h, t_c) = tl(torch.tensor(x).unsqueeze(0))

    out, (h, c) = mod.apply(params, jnp.asarray(x), state)
    np.testing.assert_allclose(np.asarray(out),
                               t_out[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c[0]), t_c[0].numpy(),
                               atol=1e-5)
