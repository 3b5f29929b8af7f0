"""Gen-2 transformer family: norms, masks, incremental parity, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.models.gen2 import (
    Gen2Captioner, Gen2LayerNorm, Gen2Transformer, label_smoothing_loss,
    label_smoothing_loss_from_logits)

V, D = 50, 16


def tiny_model(**kw):
    kw.setdefault("vocab_size", V)
    kw.setdefault("d_model", D)
    kw.setdefault("d_ff", 32)
    kw.setdefault("num_heads", 4)
    kw.setdefault("num_layers", 2)
    kw.setdefault("img_dim", 12)
    kw.setdefault("sent_dim", 10)
    kw.setdefault("max_len", 32)
    return Gen2Captioner(Gen2Transformer(**kw))


def tiny_batch(B=2, T=9, P=4, S=6, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    cap = jax.random.randint(ks[0], (B, T), 3, V)
    cap = cap.at[:, 0].set(1).at[:, -1].set(0)   # <start>=1, pad=0
    art_mask = jnp.zeros((B, S), bool).at[:, -2:].set(True)
    return {
        "caption_ids": cap,
        "image": jax.random.normal(ks[1], (B, P, 12)),
        "article": jax.random.normal(ks[2], (B, S, 10)),
        "article_mask": art_mask,
    }


def test_gen2_layernorm_matches_torch_semantics():
    import torch
    x = np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32)
    ln = Gen2LayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(ln.apply(params, jnp.asarray(x)))
    # torch reference: a*(x-mean)/(std+eps)+b with unbiased std
    t = torch.tensor(x)
    expected = ((t - t.mean(-1, keepdim=True))
                / (t.std(-1, keepdim=True) + 1e-6)).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_label_smoothing_loss_zero_smoothing_is_ce():
    lp = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(0), (4, 7)), -1)
    tgt = jnp.array([1, 2, 0, 3])   # one pad (id 0)
    loss, n = label_smoothing_loss(lp, tgt, pad_id=0, smoothing=0.0)
    manual = -(lp[0, 1] + lp[1, 2] + lp[3, 3])
    np.testing.assert_allclose(float(loss), float(manual), rtol=1e-6)
    assert int(n) == 3


def test_label_smoothing_matches_reference_true_dist():
    """smoothing > 0 must equal KL against the reference's true_dist
    (custom_v3.py:193-204): smoothing/(V-2) on every class EXCEPT the
    target column (overwritten with confidence) and the pad column
    (zeroed) — NOT a uniform sum that rewards pad mass."""
    V, s = 7, 0.2
    lp = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(1), (4, V)), -1)
    tgt = jnp.array([1, 2, 0, 3])   # one pad row (id 0)
    loss, n = label_smoothing_loss(lp, tgt, pad_id=0, smoothing=s)
    lp_np, manual = np.asarray(lp), 0.0
    for i, t in enumerate([1, 2, None, 3]):   # skip the pad row
        if t is None:
            continue
        true = np.full(V, s / (V - 2))
        true[t] = 1.0 - s
        true[0] = 0.0                          # pad column zeroed
        manual += -(true * lp_np[i]).sum()
    np.testing.assert_allclose(float(loss), manual, rtol=1e-6)
    assert int(n) == 3


def test_label_smoothing_from_logits_matches_log_prob_form():
    """The reduction-only logits form (what loss_fn now feeds XLA)
    equals the log-prob form to fp tolerance (same max-shifted math;
    the subtractions associate differently: (x-max)-lsm vs
    (max+lsm)-x, and the smoothing sum reassociates)."""
    logits = jax.random.normal(jax.random.PRNGKey(2), (6, 11)) * 3.0
    lp = jax.nn.log_softmax(logits, -1)
    tgt = jnp.array([1, 5, 0, 3, 0, 10])   # two pad rows (id 0)
    l0_old, n0 = label_smoothing_loss(lp, tgt, pad_id=0, smoothing=0.0)
    l0_new, n0b = label_smoothing_loss_from_logits(
        logits, tgt, pad_id=0, smoothing=0.0)
    np.testing.assert_allclose(float(l0_old), float(l0_new), rtol=1e-6)
    assert int(n0) == int(n0b) == 4
    ls_old, _ = label_smoothing_loss(lp, tgt, pad_id=0, smoothing=0.2)
    ls_new, _ = label_smoothing_loss_from_logits(
        logits, tgt, pad_id=0, smoothing=0.2)
    np.testing.assert_allclose(float(ls_old), float(ls_new), rtol=1e-6)


def test_label_smoothing_from_logits_bf16_accumulates_fp32():
    """Under bf16 compute the logits form reduces in fp32 (the
    flagship loss_sum convention) instead of summing bf16 log-probs."""
    logits = (jax.random.normal(jax.random.PRNGKey(3), (32, 11)) * 3.0
              ).astype(jnp.bfloat16)
    tgt = jnp.array([i % 10 + 1 for i in range(32)])
    loss, n = label_smoothing_loss_from_logits(logits, tgt, pad_id=0)
    assert loss.dtype == jnp.float32
    ref, _ = label_smoothing_loss_from_logits(
        logits.astype(jnp.float32), tgt, pad_id=0)
    # bf16 logits quantize the inputs; the reduction itself is fp32.
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-2)


@pytest.mark.slow
def test_loss_and_train_decreases():
    import optax
    model = tiny_model()
    batch = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, rng):
        (l, _), g = jax.value_and_grad(model.loss_fn, has_aux=True)(
            p, batch, rng)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    p, rng = params, jax.random.PRNGKey(1)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        p, opt, l = step(p, opt, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_incremental_matches_teacher_forced():
    model = tiny_model()
    batch = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    mod = model.module
    memory = model._memory(batch)
    src_masks = model._src_masks(batch)
    tgt = batch["caption_ids"][:, :-1]
    full = mod.apply(params, memory, tgt, src_masks=src_masks,
                     method=Gen2Transformer.log_probs)
    B, T = tgt.shape
    kvs = mod.apply(params, memory, method=Gen2Transformer.precompute_kv)
    caches = mod.init_cache(B, T)
    for t in range(T):
        lp, caches = mod.apply(params, tgt[:, t], t, kvs, caches,
                               src_masks, method=Gen2Transformer.step)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(full[:, t]),
                                   atol=2e-4)


def test_greedy_generation():
    model = tiny_model()
    batch = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    cfg = GenerationConfig(max_len=10, bos_id=1, eos_id=2, pad_id=0,
                           sampling_topk=1)
    tokens, lps = model.generate(params, batch, cfg)
    assert tokens.shape == (2, 11)
    assert (np.asarray(tokens[:, 0]) == 1).all()


def test_article_padding_ignored():
    model = tiny_model()
    batch = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    l1, _ = model.loss_fn(params, batch)
    batch2 = dict(batch)
    batch2["article"] = batch["article"].at[:, -2:].set(99.0)
    l2, _ = model.loss_fn(params, batch2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_gen2_remat_is_bit_identical():
    """Gen2Transformer.remat=True (jax.checkpoint per layer) changes
    memory, not numerics: loss, grads (incl. dropout rng streams), and
    greedy decode are identical to the plain module."""
    m0 = tiny_model()
    m1 = tiny_model(remat=True)
    batch = tiny_batch()
    p = m0.init(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(p) == jax.tree_util
            .tree_structure(m1.init(jax.random.PRNGKey(0), batch)))

    l0, _ = m0.loss_fn(p, batch)
    l1, _ = m1.loss_fn(p, batch)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    rng = jax.random.PRNGKey(3)
    g0 = jax.grad(lambda v: m0.loss_fn(v, batch, dropout_rng=rng)[0])(p)
    g1 = jax.grad(lambda v: m1.loss_fn(v, batch, dropout_rng=rng)[0])(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg = GenerationConfig(max_len=8, sampling_topk=1, bos_id=1,
                           eos_id=0, pad_id=0, init_finished=False)
    t0 = np.asarray(m0.generate(p, batch, cfg)[0])
    t1 = np.asarray(m1.generate(p, batch, cfg)[0])
    np.testing.assert_array_equal(t0, t1)
