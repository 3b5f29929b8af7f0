"""MHA parity vs torch.nn.functional.multi_head_attention_forward.

The reference's fairseq MultiHeadAttention delegates to exactly this
torch function when available (multi_head.py:300-321, with separate
q/k/v projection weights, bias_k/bias_v and add_zero_attn). Porting
our params into the torch call and comparing outputs checks the full
semantics: separate kdim projections, bias/zero slots, key padding,
scaling and head averaging.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from news_image_caption_tpu.ops.attention import MultiHeadAttention


def test_mha_matches_torch_multi_head_attention_forward():
    E, H, KD = 16, 4, 10
    B, T, S = 2, 3, 6
    rng = np.random.default_rng(0)
    q_np = rng.standard_normal((B, T, E)).astype(np.float32)
    kv_np = rng.standard_normal((B, S, KD)).astype(np.float32)
    pad = np.zeros((B, S), bool)
    pad[:, 5:] = True

    mha = MultiHeadAttention(embed_dim=E, num_heads=H, kdim=KD, vdim=KD)
    params = mha.init(jax.random.PRNGKey(0), jnp.asarray(q_np),
                      jnp.asarray(kv_np), jnp.asarray(kv_np),
                      key_padding_mask=jnp.asarray(pad))
    ours, ours_w = mha.apply(params, jnp.asarray(q_np),
                             jnp.asarray(kv_np), jnp.asarray(kv_np),
                             key_padding_mask=jnp.asarray(pad),
                             need_weights=True)

    p = params["params"]
    qw = torch.tensor(np.asarray(p["q_proj"]["kernel"]).T)
    kw = torch.tensor(np.asarray(p["k_proj"]["kernel"]).T)
    vw = torch.tensor(np.asarray(p["v_proj"]["kernel"]).T)
    in_bias = torch.tensor(np.concatenate([
        np.asarray(p["q_proj"]["bias"]),
        np.asarray(p["k_proj"]["bias"]),
        np.asarray(p["v_proj"]["bias"])]))
    out_w = torch.tensor(np.asarray(p["out_proj"]["kernel"]).T)
    out_b = torch.tensor(np.asarray(p["out_proj"]["bias"]))
    bias_k = torch.tensor(np.asarray(p["bias_k"]))
    bias_v = torch.tensor(np.asarray(p["bias_v"]))

    # torch expects [T, B, E] layouts
    q_t = torch.tensor(q_np).transpose(0, 1)
    kv_t = torch.tensor(kv_np).transpose(0, 1)
    with torch.no_grad():
        t_out, t_w = torch.nn.functional.multi_head_attention_forward(
            q_t, kv_t, kv_t, E, H,
            torch.empty(0), in_bias, bias_k, bias_v,
            True,          # add_zero_attn
            0.0,           # dropout
            out_w, out_b,
            training=False,
            key_padding_mask=torch.tensor(pad),
            need_weights=True,
            use_separate_proj_weight=True,
            q_proj_weight=qw, k_proj_weight=kw, v_proj_weight=vw)
    expected = t_out.transpose(0, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-5)
    # head-averaged weights match over the S real slots
    np.testing.assert_allclose(np.asarray(ours_w)[:, :, :S],
                               t_w.numpy()[:, :, :S], atol=2e-5)
