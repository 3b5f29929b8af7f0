"""Pointer family: copy math, entity head, losses, mixed generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.models.pointer import (CopyAttentionScores,
                                                   EntitySelfAttention,
                                                   TransformerPointer,
                                                   copy_distribution,
                                                   copy_target_prob)

from tests.test_decoder import tiny_decoder

VOCAB = 40


def make_pointer(**kw):
    from news_image_caption_tpu.models.captioner import \
        TransformerFlattened
    kw.setdefault("embed_dim", 16)
    kw.setdefault("num_heads", 4)
    kw.setdefault("article_dim", 10)
    return TransformerPointer(
        captioner=TransformerFlattened(tiny_decoder()), **kw)


def pointer_batch(B=2, T=7, P=4, S=6, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    caption = jax.random.randint(ks[0], (B, T), 2, VOCAB)
    caption = caption.at[:, 0].set(0).at[:, -1].set(1)
    copy_masks = jnp.zeros((B, T), jnp.int32)
    # tokens 2 and 3 of sample 0 belong to entity 1
    copy_masks = copy_masks.at[0, 2].set(1).at[0, 3].set(1)
    copy_masks = copy_masks.at[:, -1].set(-1)  # pad position ignored
    article_ids = jax.random.randint(ks[3], (B, S), 2, VOCAB)
    # make the entity-1 caption tokens actually present in the article
    article_ids = article_ids.at[0, 1].set(caption[0, 2])
    article_ids = article_ids.at[0, 2].set(caption[0, 3])
    proper = jnp.zeros((B, S), jnp.int32).at[0, 1].set(1).at[0, 2].set(1)
    return {
        "caption_ids": caption,
        "caption_copy_masks": copy_masks,
        "image": jax.random.normal(ks[1], (B, P, 12)),
        "image_mask": jnp.zeros((B, P), bool),
        "article": jax.random.normal(ks[2], (B, S, 10)),
        "article_mask": jnp.zeros((B, S), bool),
        "article_ids": article_ids,
        "context_proper_masks": proper,
    }


def test_copy_target_prob_math():
    attn = jnp.array([[[0.2, 0.3, 0.5]]])        # B=1, L=1, S=3
    ctx = jnp.array([[7, 9, 7]])
    tgt = jnp.array([[7]])
    p = copy_target_prob(attn, ctx, tgt)
    np.testing.assert_allclose(float(p[0, 0]), 0.7, rtol=1e-6)


def test_copy_distribution_scatter():
    attn = jnp.array([[0.2, 0.3, 0.5]])
    ctx = jnp.array([[7, 9, 7]])
    d = copy_distribution(attn, ctx, vocab_size=12)
    np.testing.assert_allclose(float(d[0, 7]), 0.7, rtol=1e-6)
    np.testing.assert_allclose(float(d[0, 9]), 0.3, rtol=1e-6)
    np.testing.assert_allclose(float(d.sum()), 1.0, rtol=1e-6)


def test_entity_self_attention_incremental_matches_full():
    m = EntitySelfAttention(embed_dim=16, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    params = m.init(jax.random.PRNGKey(1), x)
    full = m.apply(params, x)
    cache = m.init_cache(2, 5)
    outs = []
    for t in range(5):
        o, cache = m.apply(params, x[:, t], t, cache,
                           method=EntitySelfAttention.step)
        outs.append(o)
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               atol=1e-5)


def test_copy_scores_are_probs_over_sources():
    m = CopyAttentionScores(embed_dim=16, num_heads=4)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    mask = jnp.zeros((2, 5), bool).at[:, 4:].set(True)
    params = m.init(jax.random.PRNGKey(2), q, k, mask)
    probs = m.apply(params, q, k, mask)
    assert probs.shape == (2, 3, 5)
    # sums to <= 1 (bias/zero slots absorb the rest), pads get ~0
    assert (np.asarray(probs).sum(-1) <= 1.0 + 1e-5).all()
    np.testing.assert_allclose(np.asarray(probs[:, :, 4]), 0.0,
                               atol=1e-6)


def test_pointer_loss_components():
    model = make_pointer()
    batch = pointer_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    loss, aux = model.loss_fn(variables, batch)
    for k in ("gen_loss", "entity_loss", "copy_loss"):
        assert np.isfinite(float(aux[k])), k
    # default weights: loss = entity + copy only
    np.testing.assert_allclose(
        float(loss), float(aux["entity_loss"] + aux["copy_loss"]),
        rtol=1e-5)


@pytest.mark.slow
def test_pointer_training_reduces_copy_loss():
    import optax
    model = make_pointer()
    batch = pointer_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    opt = tx.init(variables)

    @jax.jit
    def step(v, o):
        (l, aux), g = jax.value_and_grad(
            model.loss_fn, has_aux=True)(v, batch)
        u, o = tx.update(g, o, v)
        return optax.apply_updates(v, u), o, l, aux

    v = variables
    first = last = None
    for i in range(10):
        v, opt, l, aux = step(v, opt)
        if first is None:
            first = float(l)
        last = float(l)
    assert last < first


def test_pointer_generation_runs():
    model = make_pointer()
    batch = pointer_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = GenerationConfig(max_len=8, sampling_topk=1)
    tokens, copied = model.generate(variables, batch, cfg)
    assert tokens.shape == (2, 9)
    assert copied.shape == (2, 8)
    assert np.asarray(tokens).dtype == np.int32


def test_only_pointer_generates_from_decoder_distribution():
    """use_entity_head=False (transformer_only_pointer): the
    reference's copy gate is commented out entirely, so generation is
    the plain captioner's — token-identical, no copies flagged."""
    model = make_pointer(use_entity_head=False)
    batch = pointer_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    cfg = GenerationConfig(max_len=8, sampling_topk=1)
    rng = jax.random.PRNGKey(3)
    tokens, copied = model.generate(variables, batch, cfg, rng=rng)
    ref_tokens, _ = model.captioner.generate(
        variables["captioner"], batch, cfg, rng=rng)
    np.testing.assert_array_equal(np.asarray(tokens),
                                  np.asarray(ref_tokens))
    assert not np.asarray(copied).any()
    # And its loss is generation-only (reference trains on gen loss
    # alone — the pointer_loss calls are commented out).
    loss, aux = model.loss_fn(variables, batch)
    assert float(aux["entity_loss"]) == 0.0
    assert float(aux["copy_loss"]) == 0.0


def test_entity_free_batch_has_zero_pointer_losses():
    """Reference early return (transformer_pointer.py:189-190): no
    entity tokens anywhere in the batch -> neither entity nor copy
    loss (no gradient pushing the gate toward 'never copy')."""
    model = make_pointer()
    batch = pointer_batch()
    batch["caption_copy_masks"] = jnp.where(
        batch["caption_copy_masks"] > 0, 0,
        batch["caption_copy_masks"])
    variables = model.init(jax.random.PRNGKey(0), batch)
    _, aux = model.loss_fn(variables, batch)
    assert float(aux["entity_loss"]) == 0.0
    assert float(aux["copy_loss"]) == 0.0
    assert float(aux["gen_loss"]) > 0.0


def test_copy_loss_supervises_high_entity_indices():
    """The segment-vectorized copy loss covers ANY entity index (the
    old static loop dropped indices > 24 silently)."""
    model = make_pointer()
    batch = pointer_batch(T=32)
    # relabel sample-0's entity as index 28 (> the old cap of 24;
    # entity indices are bounded by the caption length, so the
    # vectorized num_segments = caption_len + 1 always covers them)
    cm = batch["caption_copy_masks"]
    batch["caption_copy_masks"] = jnp.where(cm == 1, 28, cm)
    variables = model.init(jax.random.PRNGKey(0), batch)
    _, aux = model.loss_fn(variables, batch)
    assert float(aux["copy_loss"]) > 0.0


def test_warm_start_merge():
    model = make_pointer()
    batch = pointer_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    pretrained = model.captioner.init(jax.random.PRNGKey(9), batch)
    merged = model.load_pretrained_captioner(variables, pretrained)
    assert merged["captioner"] is pretrained
    assert merged["entity_attn"] is variables["entity_attn"]
