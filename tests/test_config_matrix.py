"""Every shipped experiment config builds and traces a loss.

Parity target: the 35 reference experiment YAMLs
(/root/reference/ttl/expt/{goodnews,nytimes}/*/config.yaml). Each
config here must load, build its model, and trace init + loss
(jax.eval_shape: full graph construction, no compile) on a batch
matching its dataset contract.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.config import build_model, load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(
    glob.glob(os.path.join(CONFIG_DIR, "goodnews", "*.yaml"))
    + glob.glob(os.path.join(CONFIG_DIR, "nytimes", "*.yaml")))


def _batch_for(cfg):
    """Small batch matching the config's dataset contract."""
    d = cfg.get("dataset", {})
    m = cfg.get("model", {})
    rng = np.random.default_rng(0)
    B, T = 2, 12
    P = 4
    img_dim = d.get("image_dim", 2048)
    art_dim = d.get("article_dim", 1024)
    S = 6
    vocab = d.get("vocab_size", 50265)
    caption = rng.integers(4, vocab, (B, T)).astype(np.int32)
    caption[:, 0] = 0
    if m.get("type") == "gen3_pipeline":
        return {
            "caption_ids": jnp.asarray(caption),
            "image": jnp.zeros((B, 64, 64, 3), jnp.float32),
            "article_ids": jnp.ones((B, S), jnp.int32).at[:, :4].set(7),
        }
    batch = {
        "caption_ids": jnp.asarray(caption),
        "image": jnp.asarray(
            rng.standard_normal((B, P, img_dim)), jnp.float32),
        "image_mask": jnp.zeros((B, P), bool),
        "article": jnp.asarray(
            rng.standard_normal((B, S, art_dim)), jnp.float32),
        "article_mask": jnp.zeros((B, S), bool),
    }
    mtype = m.get("type", "")
    if "faces" in mtype or mtype == "transformer_faces_objects":
        batch["faces"] = jnp.zeros((B, 3, 512), jnp.float32)
        batch["faces_mask"] = jnp.zeros((B, 3), bool)
    if "objects" in mtype:
        batch["obj"] = jnp.zeros((B, 3, 2048), jnp.float32)
        batch["obj_mask"] = jnp.zeros((B, 3), bool)
    if "entity" in mtype:
        batch["entity"] = jnp.zeros((B, 3, 1024), jnp.float32)
        batch["entity_mask"] = jnp.zeros((B, 3), bool)
    if "pointer" in mtype or "copy" in mtype:
        batch["article_ids"] = jnp.asarray(
            rng.integers(4, vocab, (B, S)), jnp.int32)
        batch["caption_copy_masks"] = jnp.zeros((B, T), jnp.int32)
        batch["context_copy_masks"] = jnp.zeros((B, S), jnp.int32)
        batch["context_proper_masks"] = jnp.zeros((B, S), jnp.int32)
    if mtype == "tgnc":
        batch["template_label"] = jnp.zeros((B, 5)).at[:, 1].set(1.0)
    return batch


# Representative subset stays in the default suite (~45 s); the full
# matrix runs with -m '' (each trace is ~7 s and they add up).
_DEFAULT_SET = {
    "goodnews/transformer_pointer.yaml",
    "goodnews/transformer_objects.yaml",
    "goodnews/no_image.yaml",
    "goodnews/joganic_tgnc.yaml",
    "nytimes/lstm_roberta.yaml",
    "nytimes/transformer_roberta.yaml",
}


def _param(p):
    rel = os.path.relpath(p, CONFIG_DIR)
    marks = [] if rel in _DEFAULT_SET else [pytest.mark.slow]
    return pytest.param(p, id=rel, marks=marks)


@pytest.mark.parametrize("path", [_param(p) for p in CONFIGS])
def test_config_builds_and_traces_loss(path):
    cfg = load_config(path)
    model = build_model(cfg)
    batch = _batch_for(cfg)

    def init_and_loss():
        variables = model.init(jax.random.PRNGKey(0), batch)
        loss, aux = model.loss_fn(variables, batch)
        return loss

    shape = jax.eval_shape(init_and_loss)
    assert shape.shape == ()
    assert shape.dtype in (jnp.float32, jnp.bfloat16)


@pytest.mark.parametrize("path", [_param(p) for p in CONFIGS])
def test_config_traces_bf16_generate(path):
    """Trace GENERATE (not just loss) with model dtype bf16 and
    bf16-cast params: decode caches/scan carries must be
    dtype-consistent under lax.scan/dynamic_update_slice (this class
    of leak crashed the bf16 pointer decode at flagship dims before
    r03 — loss tracing alone cannot catch it)."""
    from news_image_caption_tpu.generation.generator import \
        GenerationConfig

    cfg = load_config(path)
    cfg.setdefault("model", {})["dtype"] = "bfloat16"
    try:
        model = build_model(cfg)
    except (KeyError, TypeError):
        pytest.skip("model type does not take a dtype")
    if not hasattr(model, "generate"):
        pytest.skip("model has no generate()")
    batch = _batch_for(cfg)
    gcfg = GenerationConfig(max_len=4, sampling_topk=1)

    def init_and_generate():
        variables = model.init(jax.random.PRNGKey(0), batch)
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables)
        return model.generate(variables, batch, gcfg)

    out = jax.eval_shape(init_and_generate)
    toks = jax.tree_util.tree_leaves(out)[0]
    assert toks.shape[0] == 2


@pytest.mark.parametrize("path", [_param(p) for p in CONFIGS])
def test_config_dataset_contract(path):
    """Every shipped config's loss traces from its ACTUAL dataset
    batch (build_dataset -> batches -> loss_fn), not a hand-built
    one — pins the dataset<->model key/shape contract end-to-end
    (synthetic copy supervision, faces/obj/entity contexts, raw
    images for the online-encoder pipeline, template labels)."""
    from news_image_caption_tpu.config import build_dataset

    cfg = load_config(path)
    cfg.setdefault("dataset", {})["train"] = {"size": 4}
    ds = build_dataset(cfg, "train")
    batch = next(ds.batches(2, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = build_model(cfg)

    def init_and_loss():
        variables = model.init(jax.random.PRNGKey(0), batch)
        loss, aux = model.loss_fn(variables, batch)
        return loss

    shape = jax.eval_shape(init_and_loss)
    assert shape.shape == ()
