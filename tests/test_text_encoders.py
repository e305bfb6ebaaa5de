"""Remaining text encoders: RnnEncoder, IntraAttention, SelfAttention
(reference models/text_encoder.py:91-268)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.models.text_encoder import (
    EmbeddingAgg,
    IntraAttention,
    RnnEncoder,
    SelfAttention,
)


@pytest.fixture
def text_batch(rng):
    return {"text": jnp.asarray(rng.integers(1, 50, size=(3, 7))),
            "text_len": jnp.array([7, 4, 2])}


@pytest.mark.parametrize("rnn_type,bidirectional", [
    ("GRU", False), ("GRU", True), ("LSTM", True)])
def test_rnn_encoder(text_batch, rnn_type, bidirectional):
    enc = RnnEncoder(vocab_size=50, embed_dim=16, hidden_dim=8,
                     rnn_type=rnn_type, bidirectional=bidirectional)
    params = enc.init({"params": jax.random.PRNGKey(0)}, text_batch)
    out = enc.apply(params, text_batch)
    d = 16 if bidirectional else 8
    assert out["token_emb"].shape == (3, 7, d)
    assert out["seq_emb"].shape == (3, d)
    # masked mean respects text_len
    manual = np.asarray(out["token_emb"][2, :2]).mean(0)
    np.testing.assert_allclose(np.asarray(out["seq_emb"][2]), manual,
                               rtol=1e-5, atol=1e-6)


def test_intra_attention(text_batch):
    enc = IntraAttention(vocab_size=50, embed_dim=16, num_layers=2)
    params = enc.init({"params": jax.random.PRNGKey(0)}, text_batch)
    out = enc.apply(params, text_batch)
    assert out["token_emb"].shape == (3, 7, 16)
    assert out["seq_emb"].shape == (3, 16)
    assert np.isfinite(np.asarray(out["seq_emb"])).all()


def test_self_attention(text_batch):
    enc = SelfAttention(vocab_size=50, embed_dim=16, num_heads=2)
    params = enc.init({"params": jax.random.PRNGKey(0)}, text_batch)
    out = enc.apply(params, text_batch)
    assert out["token_emb"].shape == (3, 7, 16)
    assert out["seq_emb"].shape == (3, 16)


def test_embedding_agg_attention_pooling(text_batch):
    enc = EmbeddingAgg(vocab_size=50, embed_dim=16,
                       aggregation="attention")
    params = enc.init({"params": jax.random.PRNGKey(0)}, text_batch)
    out = enc.apply(params, text_batch)
    assert out["seq_emb"].shape == (3, 16)


def test_embedding_agg_pretrained_npy(tmp_path, text_batch, rng):
    weight = rng.normal(size=(50, 16)).astype(np.float32)
    np.save(tmp_path / "w2v.npy", weight)
    enc = EmbeddingAgg(vocab_size=50, embed_dim=16,
                       pretrained_embedding=str(tmp_path / "w2v.npy"))
    params = enc.init({"params": jax.random.PRNGKey(0)}, text_batch)
    loaded = np.asarray(
        params["params"]["embedding"]["embed"]["embedding"])
    np.testing.assert_allclose(loaded, weight)


def test_vanilla_rnn_torch_parity():
    """RnnEncoder(rnn_type='RNN') must be a real Elman RNN (reference
    getattr(nn, rnn_type) accepts 'RNN'), bit-close to torch nn.RNN —
    not silently a GRU."""
    import torch

    from texttoaudiogrounding_tpu.models.layers import RNN

    b, t, d, h = 3, 7, 8, 10
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, t, d)).astype(np.float32)

    ref = torch.nn.RNN(d, h, batch_first=True, bidirectional=True)
    model = RNN(h, bidirectional=True)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x))

    def fill(params, w_ih, b_ih, w_hh, b_hh):
        params["ih"]["kernel"] = jnp.asarray(w_ih.detach().numpy().T)
        params["ih"]["bias"] = jnp.asarray(b_ih.detach().numpy())
        params["hh"]["kernel"] = jnp.asarray(w_hh.detach().numpy().T)
        params["hh"]["bias"] = jnp.asarray(b_hh.detach().numpy())

    params = jax.tree_util.tree_map(lambda v: v, variables)["params"]
    fill(params["fwd0"], ref.weight_ih_l0, ref.bias_ih_l0,
         ref.weight_hh_l0, ref.bias_hh_l0)
    fill(params["bwd0"], ref.weight_ih_l0_reverse, ref.bias_ih_l0_reverse,
         ref.weight_hh_l0_reverse, ref.bias_hh_l0_reverse)

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    want = ref(torch.from_numpy(x))[0].detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
