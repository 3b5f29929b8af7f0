"""RoBERTa encoder: HF parity with ported random weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_image_caption_tpu.models.roberta import (RobertaEncoder,
                                                   WeightedSumFeatures,
                                                   port_hf_roberta,
                                                   position_ids_from_tokens)


def test_position_ids():
    ids = jnp.array([[0, 5, 6, 2, 1, 1]])
    pos = position_ids_from_tokens(ids, padding_idx=1)
    np.testing.assert_array_equal(np.asarray(pos), [[2, 3, 4, 5, 1, 1]])


def test_hf_parity_small():
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig, RobertaModel

    cfg = RobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1,
        layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    hf = RobertaModel(cfg, add_pooling_layer=False).eval()

    ours = RobertaEncoder(vocab_size=100, hidden=32, num_layers=2,
                          heads=4, intermediate=64, max_positions=40)
    params = port_hf_roberta(hf.state_dict(), num_layers=2)

    ids_np = np.array([[0, 7, 8, 9, 2, 1, 1], [0, 11, 12, 2, 1, 1, 1]])
    with torch.no_grad():
        expected = hf(torch.tensor(ids_np),
                      attention_mask=torch.tensor(
                          (ids_np != 1).astype(np.int64))
                      ).last_hidden_state.numpy()
    got, hiddens = ours.apply(params, jnp.asarray(ids_np))
    assert len(hiddens) == 3
    # Compare only non-pad positions (HF computes garbage at pads too,
    # but masked attention makes non-pad positions identical).
    mask = ids_np != 1
    np.testing.assert_allclose(np.asarray(got)[mask], expected[mask],
                               atol=2e-4)


def test_weighted_sum():
    hiddens = [jnp.ones((2, 3, 4)) * i for i in range(3)]
    m = WeightedSumFeatures(num_layers=3)
    params = m.init(jax.random.PRNGKey(0), hiddens)
    out = m.apply(params, hiddens)
    assert out.shape == (2, 3, 4)
    v = float(out[0, 0, 0])
    assert 0.0 < v < 2.0  # convex combination of {0,1,2}
