"""LSTM flattened decoder: loss, training, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.models.decoder_lstm import (LSTMDecoder,
                                                        LSTMFlattenedModel)


def tiny():
    return LSTMFlattenedModel(LSTMDecoder(
        vocab_size=40, embed_dim=16, hidden_size=16, num_layers=2,
        cutoff=(12, 24, 40), image_dim=12, article_dim=10,
        max_positions=64))


def tiny_batch(B=2, T=7, P=4, S=6, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    cap = jax.random.randint(ks[0], (B, T), 2, 40)
    cap = cap.at[:, 0].set(0).at[:, -1].set(1)
    return {
        "caption_ids": cap,
        "image": jax.random.normal(ks[1], (B, P, 12)),
        "image_mask": jnp.zeros((B, P), bool),
        "article": jax.random.normal(ks[2], (B, S, 10)),
        "article_mask": jnp.zeros((B, S), bool).at[:, -1:].set(True),
    }


@pytest.mark.slow
def test_loss_and_training():
    import optax
    model = tiny()
    batch = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, aux = model.loss_fn(params, batch)
    assert np.isfinite(float(loss)) and int(aux["sample_size"]) > 0

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
    for _ in range(8):
        p, opt, l = step(p, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_generation_and_pad_invariance():
    model = tiny()
    batch = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    cfg = GenerationConfig(max_len=8)
    toks, _ = model.generate(params, batch, cfg)
    assert toks.shape == (2, 9)
    batch2 = dict(batch)
    batch2["article"] = batch["article"].at[:, -1:].set(100.0)
    toks2, _ = model.generate(params, batch2, cfg)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


def test_registry():
    from news_image_caption_tpu.utils.registry import DECODERS, MODELS
    assert "lstm_decoder_flattened" in DECODERS
    assert "baseline_glove" in MODELS and "lstm_flattened" in MODELS
