"""Composite model forward contracts (reference models/audio_text_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.models import (
    AudioTagging,
    BiEncoder,
    Cnn8Rnn,
    CrnnEncoder,
    EmbeddingAgg,
    MultiTextBiEncoder,
)
from texttoaudiogrounding_tpu.models.align import AlignDotProduct
from texttoaudiogrounding_tpu.models.audio_text_model import (
    MultiTextBiEncoderWithAlign,
    _multi_text_frame_sim,
)
from texttoaudiogrounding_tpu.models.match import CrossAttention, DotProduct
from texttoaudiogrounding_tpu.models.sim_pooling import SimPooling
from texttoaudiogrounding_tpu.utils.registry import instantiate

SR = 32000


def audio_batch(rng, b=2, n=SR):
    return {
        "waveform": jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)
                                * 0.1),
        "waveform_len": jnp.array([n, n // 2][:b]),
    }


def make_biencoder(**kw):
    return BiEncoder(
        audio_encoder=Cnn8Rnn(sample_rate=SR),
        text_encoder=EmbeddingAgg(vocab_size=50, embed_dim=128),
        match_fn=DotProduct(),
        shared_dim=512, add_proj=True, **kw)


def test_biencoder_contract(rng):
    model = make_biencoder()
    batch = audio_batch(rng)
    batch.update(text=jnp.asarray(rng.integers(1, 50, size=(2, 5))),
                 text_len=jnp.array([5, 3]))
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(params, batch)
    # 1 s @32 kHz → 101 mel frames → ÷4 = 25; lengths 101//4, 51//4
    assert out["frame_sim"].shape == (2, 25)
    np.testing.assert_array_equal(np.asarray(out["length"]), [25, 12])
    fs = np.asarray(out["frame_sim"])
    assert (fs > 0).all() and (fs <= 1).all()


def test_biencoder_upsample(rng):
    model = make_biencoder(upsample=True)
    batch = audio_batch(rng)
    batch.update(text=jnp.asarray(rng.integers(1, 50, size=(2, 5))),
                 text_len=jnp.array([5, 3]))
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(params, batch)
    assert out["frame_sim"].shape == (2, 100)
    np.testing.assert_array_equal(np.asarray(out["length"]), [100, 48])


def test_crnn_encoder(rng):
    enc = CrnnEncoder(sample_rate=SR, embed_dim=256)
    batch = audio_batch(rng)
    params = enc.init({"params": jax.random.PRNGKey(0)}, batch)
    out = enc.apply(params, batch)
    # hop 640: 32000//640+1 = 51 frames → ÷4 = 12
    assert out["embedding"].shape == (2, 12, 256)
    np.testing.assert_array_equal(np.asarray(out["length"]), [12, 6])


def test_multitext_pairwise_equals_broadcast(rng):
    """The einsum pairwise path must equal the reference-style B·N
    broadcast path bit-for-bit (same math, different schedule)."""
    b, nphr, t, d = 2, 4, 25, 16
    audio = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    seq = jnp.asarray(rng.normal(size=(b * nphr, d)).astype(np.float32))
    text_emb = {"seq_emb": seq}
    lens = jnp.full((b * nphr,), 3)
    match = DotProduct()
    pair = _multi_text_frame_sim(match, None, None, audio,
                                 jnp.array([t, t]), text_emb, lens,
                                 b, nphr, False)

    class NoPairwise:  # force the broadcast branch
        text_level = "seq"

        def __call__(self, fd, train=False):
            return match(fd, train=train)

    bcast = _multi_text_frame_sim(NoPairwise(), None, None, audio,
                                  jnp.array([t, t]), text_emb, lens,
                                  b, nphr, False)
    np.testing.assert_allclose(np.asarray(pair), np.asarray(bcast),
                               atol=2e-7)


@pytest.mark.parametrize("pooling", ["linear_softmax", "max", "mean",
                                     "exp_softmax"])
def test_multitext_poolings(rng, pooling):
    model = MultiTextBiEncoder(
        audio_encoder=Cnn8Rnn(sample_rate=SR),
        text_encoder=EmbeddingAgg(vocab_size=50, embed_dim=128),
        match_fn=DotProduct(), shared_dim=512, add_proj=True,
        pooling=pooling)
    batch = audio_batch(rng)
    batch.update(text=jnp.asarray(rng.integers(1, 50, size=(2, 4, 5))),
                 text_len=jnp.asarray(rng.integers(1, 6, size=(2, 4))))
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(params, batch)
    assert out["frame_sim"].shape == (2, 25, 4)
    assert out["clip_sim"].shape == (2, 4)
    assert np.isfinite(np.asarray(out["clip_sim"])).all()


def test_multitext_cross_attention_match(rng):
    model = MultiTextBiEncoder(
        audio_encoder=Cnn8Rnn(sample_rate=SR),
        text_encoder=EmbeddingAgg(vocab_size=50, embed_dim=128),
        match_fn=CrossAttention(embed_dim=512, num_heads=4),
        shared_dim=512, add_proj=True)
    batch = audio_batch(rng)
    batch.update(text=jnp.asarray(rng.integers(1, 50, size=(2, 3, 5))),
                 text_len=jnp.asarray(rng.integers(1, 6, size=(2, 3))))
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(params, batch)
    assert out["frame_sim"].shape == (2, 25, 3)


def test_with_align(rng):
    # NB: the reference align branch uses *unprojected* text embeddings
    # (models/audio_text_model.py:366-388), so align configs require
    # text embed_dim == audio embed dim; replicated here.
    model = MultiTextBiEncoderWithAlign(
        audio_encoder=Cnn8Rnn(sample_rate=SR),
        text_encoder=EmbeddingAgg(vocab_size=50, embed_dim=512),
        match_fn=DotProduct(),
        align_fn=AlignDotProduct(),
        sentence_pooling=SimPooling(audio_pool="max", text_pool="mean"),
        shared_dim=512, add_proj=True)
    batch = audio_batch(rng)
    batch.update(text=jnp.asarray(rng.integers(1, 50, size=(2, 4, 5))),
                 text_len=jnp.asarray(rng.integers(1, 6, size=(2, 4))),
                 label=jnp.array([[1., 1., 0., 0.], [1., 0., 0., 0.]]))
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(params, batch)
    assert out["sentence_sim"].shape == (2, 2)
    assert out["clip_sim"].shape == (2, 4)


def test_audio_tagging(rng):
    model = AudioTagging(audio_encoder=Cnn8Rnn(sample_rate=SR),
                         classes_num=10)
    batch = audio_batch(rng)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(params, batch)
    assert out["frame_sim"].shape == (2, 25, 10)
    assert out["clip_sim"].shape == (2, 10)


def test_registry_instantiate_model_tree():
    cfg = {
        "type": "BiEncoder",
        "args": {"shared_dim": 512, "add_proj": True},
        "audio_encoder": {"type": "Cnn8Rnn", "args": {"sample_rate": SR}},
        "text_encoder": {"type": "EmbeddingAgg",
                         "args": {"vocab_size": 50, "embed_dim": 128}},
        "match_fn": {"type": "DotProduct", "args": {}},
    }
    model = instantiate(cfg)
    assert isinstance(model, BiEncoder)
    assert model.audio_encoder.sample_rate == SR


def test_convblock_cin64_nonpair_geometry_stays_on_xla(monkeypatch):
    """Cin=64 blocks outside the pair-kernel geometry (Cout % 128 != 0
    here) must fall back to XLA — the generic fused kernel's banded
    dots measured SLOWER than XLA at 64 channels (STATUS.md), so
    routing it would be a perf regression the e2e bench can't see."""
    import texttoaudiogrounding_tpu.ops.pallas.conv_block as CB
    from texttoaudiogrounding_tpu.models.layers import ConvBlock

    def forbidden(*a, **k):
        raise AssertionError("generic fused kernel routed for Cin=64")

    monkeypatch.setattr(CB, "fused_double_conv_pool", forbidden)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 64)),
                    jnp.float32)
    block = ConvBlock(out_channels=192)
    variables = block.init({"params": jax.random.PRNGKey(0)}, x,
                           bn_train=False)
    out = block.apply(variables, x, bn_train=False, fused="int8")
    assert out.shape == (2, 4, 4, 192)
