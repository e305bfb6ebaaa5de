"""Native text tower vs torch transformers BERT (tiny local config, no
download): the HF checkpoint import must be numerically faithful."""

import numpy as np
import pytest
import torch

from texttoaudiogrounding_tpu.models.pretrained_text import (
    Bert,
    ClapTextEncoder,
    SentenceBert,
    TextTower,
    config_from_hf,
    import_hf_bert_params,
    tiny_text_tower_config,
)


@pytest.fixture(scope="module")
def torch_bert():
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(hf_cfg)
    model.eval()
    return model, hf_cfg


def test_bert_parity_with_torch(torch_bert, rng):
    import jax

    model, hf_cfg = torch_bert
    cfg = config_from_hf(hf_cfg)
    params = import_hf_bert_params(
        {k: v for k, v in model.state_dict().items()}, cfg)

    input_ids = rng.integers(1, 100, size=(3, 7))
    attention_mask = np.ones((3, 7), np.int64)
    attention_mask[1, 5:] = 0
    attention_mask[2, 3:] = 0

    with torch.no_grad():
        t_out = model(input_ids=torch.tensor(input_ids),
                      attention_mask=torch.tensor(attention_mask))
    tower = TextTower(cfg)
    hidden, pooled = tower.apply({"params": params}, input_ids,
                                 attention_mask)
    np.testing.assert_allclose(
        np.asarray(hidden), t_out.last_hidden_state.numpy(),
        rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pooled), t_out.pooler_output.numpy(),
        rtol=1e-4, atol=2e-5)


def test_bert_encoder_contract(rng):
    import jax

    cfg = tiny_text_tower_config()
    enc = Bert(cfg)
    batch = {"input_ids": rng.integers(1, 100, size=(2, 6)),
             "attention_mask": np.ones((2, 6), np.int64),
             "token_type_ids": np.zeros((2, 6), np.int64)}
    params = enc.init({"params": jax.random.PRNGKey(0)}, batch)
    out = enc.apply(params, batch)
    assert out["seq_emb"].shape == (2, 32)
    assert out["token_emb"].shape == (2, 6, 32)
    assert enc.embed_dim == 32


def test_sentence_bert_mean_pooling(rng):
    import jax

    cfg = tiny_text_tower_config()
    enc = SentenceBert(cfg)
    mask = np.ones((2, 6), np.int64)
    mask[0, 4:] = 0
    batch = {"input_ids": rng.integers(1, 100, size=(2, 6)),
             "attention_mask": mask}
    params = enc.init({"params": jax.random.PRNGKey(0)}, batch)
    out = enc.apply(params, batch)
    # masked mean: padded positions excluded
    token = np.asarray(out["token_emb"][0])
    np.testing.assert_allclose(np.asarray(out["seq_emb"][0]),
                               token[:4].mean(0), rtol=1e-5, atol=1e-6)


def test_clap_text_encoder(rng):
    import jax

    cfg = tiny_text_tower_config()
    enc = ClapTextEncoder(cfg, projection_dim=16)
    batch = {"input_ids": rng.integers(1, 100, size=(2, 6)),
             "attention_mask": np.ones((2, 6), np.int64)}
    params = enc.init({"params": jax.random.PRNGKey(0)}, batch)
    out = enc.apply(params, batch)
    assert out["seq_emb"].shape == (2, 16)
    assert out["token_emb"].shape == (2, 6, 16)
    # seq_emb is L2-normalized (reference models/text_encoder.py:326)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["seq_emb"]), axis=-1), 1.0,
        rtol=1e-5)
