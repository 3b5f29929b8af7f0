"""Faces/objects/glove variants over the generalized decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import news_image_caption_tpu.models.variants as V
from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.utils.registry import MODELS


def tiny_kwargs():
    return dict(vocab_size=40, cutoff=(12, 24, 40), embed_dim=16,
                ffn_dim=32, num_heads=4, num_layers=2,
                kernel_sizes=(3, 5), image_dim=12, article_dim=10,
                max_positions=64)


def base_batch(B=2, T=7, P=4, S=6, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    cap = jax.random.randint(ks[0], (B, T), 2, 40)
    cap = cap.at[:, 0].set(0).at[:, -1].set(1)
    return {
        "caption_ids": cap,
        "image": jax.random.normal(ks[1], (B, P, 12)),
        "image_mask": jnp.zeros((B, P), bool),
        "article": jax.random.normal(ks[2], (B, S, 10)),
        "article_mask": jnp.zeros((B, S), bool),
    }


def test_nan_to_mask():
    feats = jnp.ones((1, 3, 4)).at[0, 1].set(jnp.nan)
    clean, mask = V.nan_to_mask(feats)
    np.testing.assert_array_equal(np.asarray(mask), [[False, True,
                                                      False]])
    assert np.isfinite(np.asarray(clean)).all()


def test_faces_variant_trains_and_masks():
    model = MODELS.get("transformer_faces")(face_dim=8, **tiny_kwargs())
    batch = base_batch()
    faces = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 8))
    faces = faces.at[1, 2].set(jnp.nan)          # missing face
    faces_clean, faces_mask = V.nan_to_mask(faces)
    batch["faces"] = faces_clean
    batch["faces_mask"] = faces_mask
    params = model.init(jax.random.PRNGKey(0), batch)
    l1, _ = model.loss_fn(params, batch)
    assert np.isfinite(float(l1))
    # perturbing masked face rows must not change the loss
    batch2 = dict(batch)
    batch2["faces"] = faces_clean.at[1, 2].set(50.0)
    l2, _ = model.loss_fn(params, batch2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    # generation runs with the extra context
    toks, _ = model.generate(params, batch,
                             GenerationConfig(max_len=6))
    assert toks.shape == (2, 7)


def test_faces_objects_variant():
    model = MODELS.get("transformer_faces_objects")(
        face_dim=8, obj_dim=6, **tiny_kwargs())
    batch = base_batch()
    batch["faces"] = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
    batch["faces_mask"] = jnp.zeros((2, 3), bool)
    batch["obj"] = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 6))
    batch["obj_mask"] = jnp.zeros((2, 5), bool)
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, _ = model.loss_fn(params, batch)
    assert np.isfinite(float(loss))
    # context_fc fuses 4 contexts -> kernel rows = 4 * embed_dim
    fc = params["params"]["layers_0"]["context_fc"]["kernel"]
    assert fc.shape[0] == 4 * 16


def test_glove_variant():
    kw = tiny_kwargs()
    kw.pop("article_dim")
    model = MODELS.get("transformer_glove")(article_dim=9, **kw)
    batch = base_batch()
    batch["article"] = jax.random.normal(jax.random.PRNGKey(3),
                                         (2, 6, 9))
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, _ = model.loss_fn(params, batch)
    assert np.isfinite(float(loss))


def test_registry_has_all_variants():
    for name in ["transformer_faces", "transformer_faces_objects",
                 "transformer_glove", "transformer_only_pointer",
                 "transformer_pointer_2", "transformer_faces_pointer",
                 "transformer_objects_pointer", "transformer_pointer",
                 "transformer_flattened", "gen3_pipeline", "gen1",
                 "gen2_transformer"]:
        assert name in MODELS, name


def test_entity_variant_and_tgnc():
    import jax
    import jax.numpy as jnp

    model = MODELS.get("transformer_entity")(
        entity_dim=8, **tiny_kwargs())
    batch = base_batch()
    batch["entity"] = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 8))
    batch["entity_mask"] = jnp.zeros((2, 3), bool)
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, _ = model.loss_fn(params, batch)
    assert np.isfinite(float(loss))

    from news_image_caption_tpu.models.tgnc import TGNC
    from news_image_caption_tpu.models.captioner import \
        TransformerFlattened
    from news_image_caption_tpu.models.decoder_flattened import \
        DynamicConvDecoder
    tg = TGNC(captioner=TransformerFlattened(
        DynamicConvDecoder(**{k: v for k, v in tiny_kwargs().items()})),
        n_templates=5, template_loss_weight=0.5)
    b2 = base_batch()
    b2["template_label"] = jnp.zeros((2, 5)).at[:, 1].set(1.0)
    v = tg.init(jax.random.PRNGKey(0), b2)
    loss, aux = tg.loss_fn(v, b2, dropout_rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "template_loss" in aux
    probs = tg.template_probs(v, b2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0,
                               atol=1e-5)


@pytest.mark.slow
def test_template_guided_decoder_tgnc():
    """decoder_tgnc parity: trunk + per-template heads mixed by
    sigmoid(template_logits) (decoder_tgnc.py:20-244); the caption
    loss must backprop into the classifier through the mixing
    weights, and generation must be template-dependent."""
    import jax
    import jax.numpy as jnp

    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    from news_image_caption_tpu.models.tgnc import TGNC

    kw = tiny_kwargs()
    model = TGNC(use_template_decoder=True, n_templates=3, **kw)
    batch = base_batch()
    v = model.init(jax.random.PRNGKey(0), batch)
    loss, aux = model.loss_fn(v, batch)
    assert np.isfinite(float(loss))
    assert "sample_size" in aux

    # caption loss reaches the classifier (template mixing)
    grads = jax.grad(lambda vv: model.loss_fn(vv, batch)[0])(v)
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree.leaves(grads["classifier"]))
    assert gnorm > 0.0

    toks, _ = model.generate(v, batch, GenerationConfig(max_len=6))
    assert np.asarray(toks).shape[1] == 7

    # template logits steer the output distribution
    v2 = jax.tree.map(lambda x: x, v)
    v2["classifier"] = jax.tree.map(
        lambda x: x + 1.7, v2["classifier"])
    l2, _ = model.loss_fn(v2, batch)
    assert float(l2) != float(loss)


@pytest.mark.slow
def test_template_decoder_incremental_matches_full():
    """Step path with trunk+head caches == teacher-forced hidden."""
    import jax
    import jax.numpy as jnp

    from news_image_caption_tpu.models.tgnc import (TGNC,
                                                    TemplateGuidedDecoder)

    kw = tiny_kwargs()
    model = TGNC(use_template_decoder=True, n_templates=2, **kw)
    batch = base_batch()
    v = model.init(jax.random.PRNGKey(0), batch)
    dec = model.tg_decoder
    contexts = model._contexts(batch)
    B, T = batch["caption_ids"].shape
    logits = jnp.asarray(
        np.random.RandomState(0).randn(B, 2), jnp.float32)

    ids = batch["caption_ids"]
    x_full = dec.apply(v["decoder"], ids, contexts, logits,
                       method=TemplateGuidedDecoder.hidden)
    kvs = dec.apply(v["decoder"], contexts,
                    method=TemplateGuidedDecoder.precompute_kv)
    caches = dec.init_cache(B)
    tables_lp = []
    for i in range(T):
        lp, caches = dec.apply(v["decoder"], ids[:, i], i, kvs, caches,
                               logits,
                               method=TemplateGuidedDecoder.step)
        tables_lp.append(lp)
    # Compare against the full-path log_probs
    flat = x_full.reshape(-1, x_full.shape[-1])
    full_lp = dec.apply(
        v["decoder"], flat, None,
        method=lambda m, x, _: m.adaptive_softmax.log_prob(
            x, m.embedder.embed_tables()))
    full_lp = full_lp.reshape(B, T, -1)
    step_lp = jnp.stack(tables_lp, axis=1)
    np.testing.assert_allclose(np.asarray(full_lp),
                               np.asarray(step_lp), rtol=2e-4,
                               atol=2e-4)


def test_pipeline_normalizes_raw_uint8_images():
    """Gen3Pipeline.encode applies the reference's ImageNet
    normalize+crop (prepro_images, misc/utils.py:114-129) to raw
    uint8 images — identical to feeding preprocess_image output, and
    matching the offline materialize path. Regression: uint8 frames
    used to flow into the frozen-BN trunk as raw [0,255] floats."""
    import numpy as np

    from news_image_caption_tpu.models.pipeline import Gen3Pipeline
    from news_image_caption_tpu.models.resnet import (ResNetTrunk,
                                                      preprocess_image)
    from news_image_caption_tpu.models.roberta import RobertaEncoder

    model = Gen3Pipeline(
        resnet=ResNetTrunk(depth=18, num_stages=3),
        roberta=RobertaEncoder(vocab_size=40, hidden=16, num_layers=1,
                               heads=4, intermediate=32),
        vocab_size=40, cutoff=(12, 24, 40), embed_dim=16, ffn_dim=32,
        num_heads=4, num_layers=1, kernel_sizes=(3,), image_dim=256,
        article_dim=16, max_positions=64)
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 224, 224, 3)).astype(np.uint8)
    batch = {
        "image": jnp.asarray(img),
        "article_ids": jnp.ones((2, 6), jnp.int32).at[:, :4].set(7),
        "caption_ids": jnp.asarray(
            rng.integers(4, 40, (2, 7)).astype(np.int32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    ctx_raw = model.encode(variables, batch)
    pre = preprocess_image(jnp.asarray(img))
    assert pre.dtype == jnp.float32 and float(jnp.abs(pre).max()) < 5.0
    ctx_pre = model.encode(variables, {**batch, "image": pre})
    np.testing.assert_allclose(np.asarray(ctx_raw["image"]),
                               np.asarray(ctx_pre["image"]),
                               rtol=1e-5, atol=1e-5)


def test_tgnc_remat_is_bit_identical():
    """TemplateGuidedDecoder remat knob: loss identical; grads match
    to float tolerance (the per-template head fan-out lets remat
    reassociate the cotangent sum into x, unlike the flagship's pure
    layer chain which is bit-identical)."""
    import jax
    import jax.numpy as jnp

    from news_image_caption_tpu.models.tgnc import TGNC

    kw = tiny_kwargs()
    batch = base_batch()
    m0 = TGNC(use_template_decoder=True, n_templates=2, **kw)
    m1 = TGNC(use_template_decoder=True, n_templates=2, remat=True,
              **kw)
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
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
