"""Family-wide checkpoint-porter parity (VERDICT r02 item 2).

Builds the faithful reference-keyed torch pointer model
(torch_tell_pointer.py, matching
/root/reference/ttl/tell/models/transformer_pointer.py), ports its
randomly-initialized state dict through `port_pointer_model` /
`port_checkpoint`, and asserts:
- every reference key is consumed (strict porting);
- entity self-attention, copy-attention scores, and all three loss
  components match torch;
- greedy pointer decode is token-identical (copy gate included);
- `port_checkpoint` detects the family from the keys alone;
- the fairseq-layout RoBERTa porter agrees with the HF-layout porter
  on an identical weight set.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402
from news_image_caption_tpu.models.pointer import (  # noqa: E402
    CopyAttentionScores, EntitySelfAttention, TransformerPointer)
from news_image_caption_tpu.models.port_checkpoint import (  # noqa: E402
    port_checkpoint, port_fairseq_roberta, port_pointer_model)
from news_image_caption_tpu.models.roberta import \
    port_hf_roberta  # noqa: E402

from torch_tell_pointer import TellPointer  # noqa: E402

V, D, FFN, H = 120, 32, 64, 4
CUTOFF = (40, 80, V)
KERNELS = (3, 5)
IMG_DIM, ART_DIM = 48, 32   # article dim must equal embed dim (copy head)
B, T, P, S = 3, 12, 5, 9


@pytest.fixture(scope="module")
def bundle():
    torch.manual_seed(0)
    tmodel = TellPointer(embed_dim=D, num_heads=H, vocab_size=V,
                         ffn_dim=FFN, kernel_sizes=KERNELS,
                         cutoff=CUTOFF, image_dim=IMG_DIM,
                         article_dim=ART_DIM, max_positions=64).eval()
    sd = tmodel.state_dict()

    model = TransformerPointer(
        embed_dim=D, num_heads=H, article_dim=ART_DIM,
        vocab_size=V, cutoff=CUTOFF, ffn_dim=FFN,
        num_layers=len(KERNELS), kernel_sizes=KERNELS,
        image_dim=IMG_DIM, max_positions=64)

    rng = np.random.RandomState(0)
    caption = rng.randint(3, V, size=(B, T)).astype(np.int32)
    caption[:, 0] = 0
    caption[0, -2:] = 1
    image = rng.randn(B, P, IMG_DIM).astype(np.float32)
    article = rng.randn(B, S, ART_DIM).astype(np.float32)
    article_ids = rng.randint(3, V, size=(B, S)).astype(np.int32)
    article_mask = np.zeros((B, S), bool)
    article_mask[1, -2:] = True
    proper = np.zeros((B, S), np.int32)
    proper[:, 2:6] = 1                      # some proper-noun positions
    # entity-labeled caption positions whose target token appears among
    # the article's proper positions (so the copy loss is exercised
    # with positive copy mass, like real data)
    copy_masks = np.zeros((B, T), np.int32)
    for b in range(B):
        caption[b, 3] = article_ids[b, 2]
        caption[b, 4] = article_ids[b, 3]
        copy_masks[b, 3] = 1
        copy_masks[b, 4] = 1
    copy_masks[0, -2:] = -1                 # padded positions ignored

    batch = {
        "caption_ids": jnp.asarray(caption),
        "image": jnp.asarray(image),
        "image_mask": jnp.zeros((B, P), bool),
        "article": jnp.asarray(article),
        "article_mask": jnp.asarray(article_mask),
        "article_ids": jnp.asarray(article_ids),
        "context_proper_masks": jnp.asarray(proper),
        "caption_copy_masks": jnp.asarray(copy_masks),
    }
    variables, unused = port_pointer_model(
        sd, num_layers=len(KERNELS), embed_dim=D, n_bands=len(CUTOFF))
    assert unused == []
    contexts_t = {
        "image": torch.from_numpy(image),
        "image_mask": torch.zeros(B, P, dtype=torch.bool),
        "article": torch.from_numpy(article),
        "article_mask": torch.from_numpy(article_mask),
    }
    return tmodel, model, variables, batch, contexts_t


def test_entity_self_attention_parity(bundle):
    tmodel, model, variables, batch, _ = bundle
    rng = np.random.RandomState(1)
    x = rng.randn(B, T, D).astype(np.float32)
    out_jax = model.entity_attn.apply(
        variables["entity_attn"], jnp.asarray(x))
    with torch.no_grad():
        out_t = tmodel.entity_attn(
            torch.from_numpy(x).transpose(0, 1)).transpose(0, 1)
    np.testing.assert_allclose(np.asarray(out_jax), out_t.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_entity_attention_incremental_matches_full(bundle):
    tmodel, model, variables, batch, _ = bundle
    rng = np.random.RandomState(2)
    x = rng.randn(B, T, D).astype(np.float32)
    full = model.entity_attn.apply(
        variables["entity_attn"], jnp.asarray(x))
    cache = model.entity_attn.init_cache(B, T)
    outs = []
    for t in range(T):
        o, cache = model.entity_attn.apply(
            variables["entity_attn"], jnp.asarray(x[:, t]), t, cache,
            method=EntitySelfAttention.step)
        outs.append(o)
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_copy_scores_parity(bundle):
    tmodel, model, variables, batch, _ = bundle
    rng = np.random.RandomState(3)
    x = rng.randn(B, T, D).astype(np.float32)
    art = np.asarray(batch["article"])
    mask = np.asarray(batch["article_mask"])
    probs_jax = model.copy_attn.apply(
        variables["copy_attn"], jnp.asarray(x), jnp.asarray(art),
        jnp.asarray(mask))
    probs_t = tmodel.copy_scores(
        torch.from_numpy(x), torch.from_numpy(art),
        torch.from_numpy(mask))
    np.testing.assert_allclose(np.asarray(probs_jax), probs_t.numpy(),
                               rtol=2e-4, atol=1e-6)


def test_pointer_loss_components_match(bundle):
    tmodel, model, variables, batch, contexts_t = bundle
    _, aux = model.loss_fn(variables, batch)

    caption_t = torch.from_numpy(np.asarray(batch["caption_ids"])).long()
    x = tmodel.hidden(caption_t[:, :-1], contexts_t)
    targets = caption_t[:, 1:]
    loss_sum, ntokens = tmodel.decoder.adaptive_softmax.adaptive_loss(
        x.reshape(-1, D), targets.reshape(-1), padding_idx=1)
    gen_t = loss_sum / ntokens / np.log(2)

    ent_t, copy_t = tmodel.pointer_loss(
        x,
        torch.from_numpy(np.asarray(batch["caption_copy_masks"])).long(),
        torch.from_numpy(np.asarray(batch["context_proper_masks"])),
        torch.from_numpy(np.asarray(batch["article_ids"])).long(),
        targets,
        torch.from_numpy(np.asarray(batch["article"])),
        torch.from_numpy(np.asarray(batch["article_mask"])))

    np.testing.assert_allclose(float(aux["gen_loss"]), float(gen_t),
                               rtol=2e-4)
    np.testing.assert_allclose(float(aux["entity_loss"]), float(ent_t),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux["copy_loss"]), float(copy_t),
                               rtol=2e-4, atol=1e-5)


def test_pointer_greedy_token_identical(bundle):
    tmodel, model, variables, batch, contexts_t = bundle
    max_len = 14
    cfg = GenerationConfig(max_len=max_len, bos_id=0, eos_id=2,
                           pad_id=1, sampling_topk=1)
    toks_jax, flags_jax = model.generate(variables, batch, cfg)
    toks_t, flags_t = tmodel.generate_greedy(
        B, contexts_t,
        torch.from_numpy(np.asarray(batch["article"])),
        torch.from_numpy(np.asarray(batch["article_mask"])),
        torch.from_numpy(np.asarray(batch["context_proper_masks"])),
        torch.from_numpy(np.asarray(batch["article_ids"])).long(),
        max_len=max_len, bos_id=0, eos_id=2, pad_id=1)
    np.testing.assert_array_equal(np.asarray(toks_jax), toks_t.numpy())
    np.testing.assert_array_equal(np.asarray(flags_jax),
                                  flags_t.numpy())


def test_port_checkpoint_detects_pointer(bundle):
    tmodel, *_ = bundle
    out = port_checkpoint(tmodel.state_dict(),
                          num_layers=len(KERNELS), embed_dim=D,
                          n_bands=len(CUTOFF))
    assert out["model"] == "transformer_pointer"
    assert out["unused"] == []
    assert set(out["variables"]) >= {"captioner", "entity_attn",
                                     "entity_fc", "copy_attn"}


def test_port_checkpoint_detects_only_pointer(bundle):
    tmodel, *_ = bundle
    sd = {k: v for k, v in tmodel.state_dict().items()
          if not k.startswith(("entity_fc.", "entity_attn."))}
    out = port_checkpoint(sd, num_layers=len(KERNELS), embed_dim=D,
                          n_bands=len(CUTOFF))
    assert out["model"] == "transformer_only_pointer"
    assert "entity_attn" not in out["variables"]


def test_port_checkpoint_detects_flattened(bundle):
    tmodel, *_ = bundle
    sd = {k: v for k, v in tmodel.state_dict().items()
          if k.startswith("decoder.")}
    out = port_checkpoint(sd, num_layers=len(KERNELS), embed_dim=D,
                          n_bands=len(CUTOFF))
    assert out["model"] == "transformer_flattened"
    assert out["unused"] == []


@pytest.fixture(scope="module")
def tgnc_bundle():
    from news_image_caption_tpu.models.port_checkpoint import \
        port_tgnc_model
    from news_image_caption_tpu.models.tgnc import TGNC
    from torch_tell_tgnc import TellTGNC

    torch.manual_seed(1)
    tmodel = TellTGNC(embed_dim=D, image_dim=IMG_DIM, n_templates=5,
                      head_kernel=7, ffn_dim=FFN, num_heads=H,
                      article_dim=ART_DIM, vocab_size=V, cutoff=CUTOFF,
                      kernel_sizes=KERNELS, max_positions=64).eval()
    model = TGNC(use_template_decoder=True, n_templates=5,
                 image_dim=IMG_DIM, article_dim=ART_DIM, vocab_size=V,
                 cutoff=CUTOFF, embed_dim=D, ffn_dim=FFN, num_heads=H,
                 num_layers=len(KERNELS), kernel_sizes=KERNELS,
                 head_kernel=7, max_positions=64)

    rng = np.random.RandomState(5)
    caption = rng.randint(3, V, size=(B, T)).astype(np.int32)
    caption[:, 0] = 0
    caption[2, -2:] = 1
    image = rng.randn(B, P, IMG_DIM).astype(np.float32)
    article = rng.randn(B, S, ART_DIM).astype(np.float32)
    article_mask = np.zeros((B, S), bool)
    article_mask[0, -3:] = True
    batch = {
        "caption_ids": jnp.asarray(caption),
        "image": jnp.asarray(image),
        "image_mask": jnp.zeros((B, P), bool),
        "article": jnp.asarray(article),
        "article_mask": jnp.asarray(article_mask),
    }
    variables, unused = port_tgnc_model(
        tmodel.state_dict(), num_layers=len(KERNELS), embed_dim=D,
        n_bands=len(CUTOFF), n_templates=5)
    assert unused == []
    contexts_t = {
        "image": torch.from_numpy(image),
        "image_mask": torch.zeros(B, P, dtype=torch.bool),
        "article": torch.from_numpy(article),
        "article_mask": torch.from_numpy(article_mask.copy()),
    }
    return tmodel, model, variables, batch, contexts_t


def test_tgnc_port_strict_catches_extra_decoder_keys(tgnc_bundle):
    """strict=True must surface UNPORTED trunk keys (a checkpoint
    with more decoder layers than num_layers previously passed the
    audit while silently dropping them)."""
    import pytest as _pytest

    from news_image_caption_tpu.models.port_checkpoint import \
        port_tgnc_model
    tmodel = tgnc_bundle[0]
    sd = dict(tmodel.state_dict())
    sd["decoder.layers.9.linear1.weight_v"] = \
        sd["decoder.layers.0.linear1.weight_v"].clone()
    with _pytest.raises(ValueError, match="unported tgnc keys"):
        port_tgnc_model(sd, num_layers=len(KERNELS), embed_dim=D,
                        n_bands=len(CUTOFF), n_templates=5)


def test_tgnc_loss_parity(tgnc_bundle):
    tmodel, model, variables, batch, contexts_t = tgnc_bundle
    _, aux = model.loss_fn(variables, batch)
    loss_t = tmodel.caption_loss(
        torch.from_numpy(np.asarray(batch["caption_ids"])).long(),
        contexts_t, torch.from_numpy(np.asarray(batch["article"])),
        torch.from_numpy(np.asarray(batch["image"])))
    np.testing.assert_allclose(float(aux["caption_loss"]),
                               float(loss_t), rtol=2e-4)


def test_tgnc_greedy_token_identical(tgnc_bundle):
    tmodel, model, variables, batch, contexts_t = tgnc_bundle
    max_len = 14
    cfg = GenerationConfig(max_len=max_len, bos_id=0, eos_id=2,
                           pad_id=1, sampling_topk=1)
    toks_jax = model.generate(variables, batch, cfg)
    if isinstance(toks_jax, tuple):
        toks_jax = toks_jax[0]
    toks_t = tmodel.generate_greedy(
        B, contexts_t, torch.from_numpy(np.asarray(batch["article"])),
        torch.from_numpy(np.asarray(batch["image"])), max_len=max_len,
        bos_id=0, eos_id=2, pad_id=1)
    np.testing.assert_array_equal(np.asarray(toks_jax),
                                  toks_t.numpy())


def test_port_checkpoint_detects_tgnc(tgnc_bundle):
    tmodel, *_ = tgnc_bundle
    out = port_checkpoint(tmodel.state_dict(),
                          num_layers=len(KERNELS), embed_dim=D,
                          n_bands=len(CUTOFF))
    assert out["model"] == "tgnc"
    assert out["unused"] == []
    assert set(out["variables"]) == {"decoder", "classifier"}


def _hf_and_fairseq_dicts(rng, layers=2, E=16, FF=32, vocab=50):
    """One random weight set in both key layouts."""
    hf, fs = {}, {}
    word = rng.randn(vocab, E).astype(np.float32)
    pos = rng.randn(20, E).astype(np.float32)
    tt = np.zeros((1, E), np.float32)    # HF token-type row 0 == zeros
    g, b = rng.randn(E).astype(np.float32), rng.randn(E).astype(
        np.float32)
    hf["embeddings.word_embeddings.weight"] = word
    hf["embeddings.position_embeddings.weight"] = pos
    hf["embeddings.token_type_embeddings.weight"] = tt
    hf["embeddings.LayerNorm.weight"] = g
    hf["embeddings.LayerNorm.bias"] = b
    fs["decoder.sentence_encoder.embed_tokens.weight"] = word
    fs["decoder.sentence_encoder.embed_positions.weight"] = pos
    fs["decoder.sentence_encoder.emb_layer_norm.weight"] = g
    fs["decoder.sentence_encoder.emb_layer_norm.bias"] = b
    for i in range(layers):
        qw, kw, vw = (rng.randn(E, E).astype(np.float32)
                      for _ in range(3))
        qb, kb, vb = (rng.randn(E).astype(np.float32)
                      for _ in range(3))
        ow, ob = (rng.randn(E, E).astype(np.float32),
                  rng.randn(E).astype(np.float32))
        iw, ib = (rng.randn(FF, E).astype(np.float32),
                  rng.randn(FF).astype(np.float32))
        fw, fb = (rng.randn(E, FF).astype(np.float32),
                  rng.randn(E).astype(np.float32))
        ln1 = (rng.randn(E).astype(np.float32),
               rng.randn(E).astype(np.float32))
        ln2 = (rng.randn(E).astype(np.float32),
               rng.randn(E).astype(np.float32))
        hb = f"encoder.layer.{i}"
        hf[f"{hb}.attention.self.query.weight"] = qw
        hf[f"{hb}.attention.self.query.bias"] = qb
        hf[f"{hb}.attention.self.key.weight"] = kw
        hf[f"{hb}.attention.self.key.bias"] = kb
        hf[f"{hb}.attention.self.value.weight"] = vw
        hf[f"{hb}.attention.self.value.bias"] = vb
        hf[f"{hb}.attention.output.dense.weight"] = ow
        hf[f"{hb}.attention.output.dense.bias"] = ob
        hf[f"{hb}.attention.output.LayerNorm.weight"] = ln1[0]
        hf[f"{hb}.attention.output.LayerNorm.bias"] = ln1[1]
        hf[f"{hb}.intermediate.dense.weight"] = iw
        hf[f"{hb}.intermediate.dense.bias"] = ib
        hf[f"{hb}.output.dense.weight"] = fw
        hf[f"{hb}.output.dense.bias"] = fb
        hf[f"{hb}.output.LayerNorm.weight"] = ln2[0]
        hf[f"{hb}.output.LayerNorm.bias"] = ln2[1]
        fb_ = f"decoder.sentence_encoder.layers.{i}"
        fs[f"{fb_}.self_attn.in_proj_weight"] = np.concatenate(
            [qw, kw, vw], axis=0)
        fs[f"{fb_}.self_attn.in_proj_bias"] = np.concatenate(
            [qb, kb, vb])
        fs[f"{fb_}.self_attn.out_proj.weight"] = ow
        fs[f"{fb_}.self_attn.out_proj.bias"] = ob
        fs[f"{fb_}.self_attn_layer_norm.weight"] = ln1[0]
        fs[f"{fb_}.self_attn_layer_norm.bias"] = ln1[1]
        fs[f"{fb_}.fc1.weight"] = iw
        fs[f"{fb_}.fc1.bias"] = ib
        fs[f"{fb_}.fc2.weight"] = fw
        fs[f"{fb_}.fc2.bias"] = fb
        fs[f"{fb_}.final_layer_norm.weight"] = ln2[0]
        fs[f"{fb_}.final_layer_norm.bias"] = ln2[1]
    return hf, fs


def test_fairseq_roberta_port_matches_hf_port():
    rng = np.random.RandomState(7)
    hf, fs = _hf_and_fairseq_dicts(rng)
    p_hf = port_hf_roberta(hf, num_layers=2)
    p_fs = port_fairseq_roberta(fs, num_layers=2)
    flat_hf = jax.tree_util.tree_leaves_with_path(p_hf)
    flat_fs = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(p_fs)}
    assert len(flat_hf) == len(flat_fs)
    for k, v in flat_hf:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_fs[jax.tree_util.keystr(k)]),
            err_msg=jax.tree_util.keystr(k))


def test_fairseq_roberta_port_separate_qkv_layout():
    rng = np.random.RandomState(8)
    hf, fs = _hf_and_fairseq_dicts(rng)
    # newer fairseq: separate q/k/v projections instead of in_proj
    out = {}
    for k, v in fs.items():
        if k.endswith("self_attn.in_proj_weight"):
            E = v.shape[1]
            base = k[:-len(".in_proj_weight")]
            out[f"{base}.q_proj.weight"] = v[:E]
            out[f"{base}.k_proj.weight"] = v[E:2 * E]
            out[f"{base}.v_proj.weight"] = v[2 * E:]
        elif k.endswith("self_attn.in_proj_bias"):
            E = v.shape[0] // 3
            base = k[:-len(".in_proj_bias")]
            out[f"{base}.q_proj.bias"] = v[:E]
            out[f"{base}.k_proj.bias"] = v[E:2 * E]
            out[f"{base}.v_proj.bias"] = v[2 * E:]
        else:
            out[k] = v
    p_a = port_fairseq_roberta(fs, num_layers=2)
    p_b = port_fairseq_roberta(out, num_layers=2)
    a = jax.tree_util.tree_leaves(p_a)
    bl = jax.tree_util.tree_leaves(p_b)
    for x, y in zip(a, bl):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_cli_port_then_evaluate(tmp_path, capsys):
    """`tellax port` maps a reference-keyed torch best.th into the
    checkpoint store and `tellax evaluate` picks it up as 'best' (the
    reference user's migration path), with NO random-init warning."""
    import json
    import shutil
    import sys as _sys

    from news_image_caption_tpu.cli import main

    torch.manual_seed(0)
    tmodel = TellPointer(embed_dim=D, num_heads=H, vocab_size=V,
                         ffn_dim=FFN, kernel_sizes=KERNELS,
                         cutoff=CUTOFF, image_dim=IMG_DIM,
                         article_dim=ART_DIM, max_positions=64).eval()
    best_th = str(tmp_path / "best.th")
    torch.save(tmodel.state_dict(), best_th)

    cfg = {
        "dataset": {"type": "synthetic_news", "vocab_size": V,
                    "caption_len": 12, "article_len": 9,
                    "n_patches": 5, "image_dim": IMG_DIM,
                    "article_dim": ART_DIM,
                    "test": {"size": 4, "seed": 2}},
        "model": {"type": "transformer_pointer", "embed_dim": D,
                  "num_heads": H, "article_dim": ART_DIM,
                  "vocab_size": V, "ffn_dim": FFN,
                  "num_layers": len(KERNELS),
                  "kernel_sizes": list(KERNELS),
                  "cutoff": list(CUTOFF), "image_dim": IMG_DIM,
                  "max_positions": 64},
        "iterator": {"batch_size": 2},
        "generation": {"max_len": 6, "sampling_topk": 1},
    }
    import yaml
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    rc = main(["port", cfg_path, best_th])
    assert rc == 0
    out = capsys.readouterr()
    assert "transformer_pointer" in out.out

    rc = main(["evaluate", cfg_path, "--split", "test"])
    assert rc == 0
    out = capsys.readouterr()
    assert "random init" not in out.err
    ser = tmp_path / "serialization"
    gens = (ser / "generations.jsonl").read_text().strip().split("\n")
    assert len(gens) == 4


def test_cli_port_then_evaluate_tgnc(tmp_path, capsys):
    """`tellax port` on a tgnc best.th (template count inferred from
    the decoder.head{t} keys) -> evaluate runs the template-guided
    decode from the store's best."""
    from torch_tell_tgnc import TellTGNC

    import yaml

    from news_image_caption_tpu.cli import main

    torch.manual_seed(1)
    tmodel = TellTGNC(embed_dim=D, image_dim=IMG_DIM, n_templates=3,
                      head_kernel=7, ffn_dim=FFN, num_heads=H,
                      article_dim=ART_DIM, vocab_size=V, cutoff=CUTOFF,
                      kernel_sizes=KERNELS, max_positions=64).eval()
    best_th = str(tmp_path / "best.th")
    torch.save(tmodel.state_dict(), best_th)

    cfg = {
        "dataset": {"type": "synthetic_news", "vocab_size": V,
                    "caption_len": 12, "article_len": 9,
                    "n_patches": 5, "image_dim": IMG_DIM,
                    "article_dim": ART_DIM,
                    "test": {"size": 4, "seed": 2}},
        "model": {"type": "tgnc", "use_template_decoder": True,
                  "n_templates": 3, "head_kernel": 7,
                  "embed_dim": D, "num_heads": H,
                  "article_dim": ART_DIM, "vocab_size": V,
                  "ffn_dim": FFN, "num_layers": len(KERNELS),
                  "kernel_sizes": list(KERNELS),
                  "cutoff": list(CUTOFF), "image_dim": IMG_DIM,
                  "max_positions": 64},
        "iterator": {"batch_size": 2},
        "generation": {"max_len": 6, "sampling_topk": 1},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    rc = main(["port", cfg_path, best_th])
    assert rc == 0
    out = capsys.readouterr()
    assert "tgnc" in out.out

    rc = main(["evaluate", cfg_path, "--split", "test"])
    assert rc == 0
    out = capsys.readouterr()
    assert "random init" not in out.err
    gens = (tmp_path / "serialization" /
            "generations.jsonl").read_text().strip().split("\n")
    assert len(gens) == 4


def test_cli_port_weighted_pipeline(tmp_path, capsys):
    """`tellax port` assembles a gen3_pipeline tree: ported decoder +
    bert_weight -> weighted_sum; missing bundled encoders keep their
    init with a warning. Evaluate then runs the online-encoder
    pipeline from the store's best."""
    import yaml

    from news_image_caption_tpu.cli import main

    torch.manual_seed(2)
    IMG256 = 256          # ResNet-18 stage-3 channel count
    tmodel = TellPointer(embed_dim=D, num_heads=H, vocab_size=V,
                         ffn_dim=FFN, kernel_sizes=KERNELS,
                         cutoff=CUTOFF, image_dim=IMG256,
                         article_dim=ART_DIM, max_positions=64).eval()
    sd = {k: v for k, v in tmodel.state_dict().items()
          if k.startswith("decoder.")}
    sd["bert_weight"] = torch.randn(2)   # 1-layer tiny roberta -> 2
    best_th = str(tmp_path / "best.th")
    torch.save(sd, best_th)

    cfg = {
        "dataset": {"type": "synthetic_news", "vocab_size": V,
                    "caption_len": 12, "article_len": 9,
                    "n_patches": 5, "image_dim": IMG256,
                    "article_dim": ART_DIM, "raw_image_size": 64,
                    "test": {"size": 4, "seed": 2}},
        "model": {"type": "gen3_pipeline", "weigh_bert": True,
                  "resnet": {"depth": 18, "num_stages": 3},
                  "roberta": {"vocab_size": V, "hidden": ART_DIM,
                              "num_layers": 1, "heads": H,
                              "intermediate": 64},
                  "decoder": {"type": "dynamic_conv_decoder_flattened",
                              "vocab_size": V, "embed_dim": D,
                              "ffn_dim": FFN, "num_heads": H,
                              "num_layers": len(KERNELS),
                              "kernel_sizes": list(KERNELS),
                              "cutoff": list(CUTOFF),
                              "image_dim": IMG256,
                              "article_dim": ART_DIM,
                              "max_positions": 64}},
        "iterator": {"batch_size": 2},
        "generation": {"max_len": 6, "sampling_topk": 1},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    rc = main(["port", cfg_path, best_th])
    assert rc == 0
    out = capsys.readouterr()
    assert "transformer_flattened" in out.out
    assert "bundles no resnet" in out.err
    assert "bundles no roberta" in out.err
    assert "weighted_sum stays random" not in out.err

    rc = main(["evaluate", cfg_path, "--split", "test"])
    assert rc == 0
    out = capsys.readouterr()
    assert "random init" not in out.err
    gens = (tmp_path / "serialization" /
            "generations.jsonl").read_text().strip().split("\n")
    assert len(gens) == 4


def test_bert_weight_2_consumed_and_reported(bundle):
    """bert_weight_2 is dead in the reference (its only read is
    commented out, transformer_context_pointer.py:243): strict porting
    must pass, bert_weight must surface at out['extras'] (never inside
    the variables tree), and the drop must appear in the unused report
    instead of vanishing silently."""
    tmodel, *_ = bundle
    for family_filter in (lambda k: True,                     # pointer
                          lambda k: k.startswith("decoder.")):  # flattened
        sd = {k: v for k, v in tmodel.state_dict().items()
              if family_filter(k)}
        sd["bert_weight"] = torch.randn(25)
        sd["bert_weight_2"] = torch.randn(25)
        out = port_checkpoint(sd, num_layers=len(KERNELS), embed_dim=D,
                              n_bands=len(CUTOFF), strict=True)
        assert list(out["extras"]) == ["bert_weight"]
        assert "extras" not in out["variables"]
        assert any("bert_weight_2" in u for u in out["unused"])
        assert all("bert_weight_2" not in k for k in out["extras"])


def test_assemble_warns_on_unconsumed_extras(bundle):
    """A weigh_bert checkpoint ported into a config whose model has no
    weighted_sum must WARN that bert_weight was dropped — porting must
    never silently change the reference's weighting semantics."""
    from news_image_caption_tpu.models.port_checkpoint import \
        assemble_for_init

    tmodel, *_ = bundle
    sd = {k: v for k, v in tmodel.state_dict().items()
          if k.startswith("decoder.")}
    sd["bert_weight"] = torch.randn(25)
    out = port_checkpoint(sd, num_layers=len(KERNELS), embed_dim=D,
                          n_bands=len(CUTOFF))
    # non-pipeline init tree: the flattened model's params ARE the
    # decoder tree (no weighted_sum anywhere)
    init_like = {"params": {"dummy": None}}
    cand, warnings = assemble_for_init(out, init_like)
    assert any("bert_weight" in w and "not consumed" in w
               for w in warnings)
    # pipeline init tree WITH weighted_sum: consumed, no warning
    init_pipe = {"resnet": {}, "roberta": {},
                 "weighted_sum": {"params": {"bert_weight": None}}}
    cand, warnings = assemble_for_init(out, init_pipe)
    assert cand["weighted_sum"]["params"]["bert_weight"] is not None
    assert not any("not consumed" in w for w in warnings)
