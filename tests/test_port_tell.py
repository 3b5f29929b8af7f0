"""Full-decoder torch<->JAX parity via the checkpoint porter.

Builds the faithful reference-keyed torch decoder (torch_tell_decoder,
matching /root/reference/ttl/tell/models/decoder_flattened.py), ports
its randomly-initialized state dict through `port_tell_decoder`, and
asserts:
- teacher-forced full-vocab log-probs match;
- incremental greedy captions are token-identical.

This is the north-star parity contract: when a real `best.th` appears,
the same porter call loads it.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402
from news_image_caption_tpu.models.captioner import \
    TransformerFlattened  # noqa: E402
from news_image_caption_tpu.models.port_tell import \
    port_tell_decoder  # noqa: E402

from torch_tell_decoder import TellDecoder  # noqa: E402

V, D, FFN, H = 120, 32, 64, 4
CUTOFF = (40, 80, V)
KERNELS = (3, 5)
IMG_DIM, ART_DIM = 48, 32  # article == embed dim -> packed in_proj
B, T, P, S = 3, 14, 5, 7


@pytest.fixture(scope="module")
def bundle():
    torch.manual_seed(0)
    tdec = TellDecoder(vocab_size=V, embed_dim=D, ffn_dim=FFN,
                       num_heads=H, kernel_sizes=KERNELS, cutoff=CUTOFF,
                       image_dim=IMG_DIM, article_dim=ART_DIM,
                       max_positions=64).eval()
    sd = {f"decoder.{k}": v for k, v in tdec.state_dict().items()}

    model = TransformerFlattened(
        vocab_size=V, cutoff=CUTOFF, embed_dim=D, ffn_dim=FFN,
        num_heads=H, num_layers=len(KERNELS), kernel_sizes=KERNELS,
        image_dim=IMG_DIM, article_dim=ART_DIM, max_positions=64)

    rng = np.random.RandomState(0)
    caption = rng.randint(2, V, size=(B, T)).astype(np.int32)
    caption[:, 0] = 0
    caption[0, -3:] = 1   # right padding exercises pad-aware positions
    image = rng.randn(B, P, IMG_DIM).astype(np.float32)
    article = rng.randn(B, S, ART_DIM).astype(np.float32)
    image_mask = np.zeros((B, P), bool)
    article_mask = np.zeros((B, S), bool)
    article_mask[1, -2:] = True   # some padded article slots

    batch = {
        "caption_ids": jnp.asarray(caption),
        "image": jnp.asarray(image),
        "image_mask": jnp.asarray(image_mask),
        "article": jnp.asarray(article),
        "article_mask": jnp.asarray(article_mask),
    }
    template = model.init(jax.random.PRNGKey(0), batch)
    params, unused = port_tell_decoder(
        sd, num_layers=len(KERNELS), embed_dim=D, n_bands=len(CUTOFF),
        template=template)
    assert unused == []

    contexts_t = {
        "image": torch.from_numpy(image),
        "image_mask": torch.from_numpy(image_mask),
        "article": torch.from_numpy(article),
        "article_mask": torch.from_numpy(article_mask),
    }
    return tdec, model, params, batch, contexts_t, caption


def test_ported_teacher_forced_log_prob_matches(bundle):
    tdec, model, params, batch, contexts_t, caption = bundle
    from news_image_caption_tpu.models.decoder_flattened import \
        DynamicConvDecoder
    contexts = model._contexts(batch)
    lp_jax = model.decoder.apply(params, batch["caption_ids"], contexts,
                                 method=DynamicConvDecoder.log_prob)
    lp_torch = tdec.log_prob(torch.from_numpy(caption).long(),
                             contexts_t).numpy()
    np.testing.assert_allclose(np.asarray(lp_jax), lp_torch,
                               rtol=2e-4, atol=2e-4)


def test_ported_greedy_decode_token_identical(bundle):
    tdec, model, params, batch, contexts_t, _ = bundle
    max_len = 16
    cfg = GenerationConfig(max_len=max_len, bos_id=0, eos_id=2, pad_id=1,
                           sampling_topk=1)
    toks_jax, _ = model.generate(params, batch, cfg)
    toks_torch = tdec.generate_greedy(
        B, contexts_t, max_len=max_len, bos_id=0, eos_id=2, pad_id=1)
    np.testing.assert_array_equal(np.asarray(toks_jax),
                                  toks_torch.numpy())


def test_porter_strict_flags_unknown_keys(bundle):
    tdec, *_ = bundle
    sd = {f"decoder.{k}": v for k, v in tdec.state_dict().items()}
    sd["decoder.mystery.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="unported"):
        port_tell_decoder(sd, num_layers=len(KERNELS), embed_dim=D,
                          n_bands=len(CUTOFF))
    _, unused = port_tell_decoder(sd, num_layers=len(KERNELS),
                                  embed_dim=D, n_bands=len(CUTOFF),
                                  strict=False)
    assert unused == ["mystery.weight"]
