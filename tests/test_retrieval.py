"""Retrieval model zoo: Cnn14 tower + AudioTextClip dual encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.models.pretrained_text import (
    tiny_text_tower_config,
)
from texttoaudiogrounding_tpu.models.retrieval import (
    AudioSingleTextClip,
    AudioTextClip,
    Cnn14,
    RetrievalBert,
    grad_scale,
)


def test_cnn14_contract(rng):
    model = Cnn14(sample_rate=32000)
    n = 32000
    batch = {"waveform": jnp.asarray(
        rng.normal(size=(2, n)).astype(np.float32) * 0.1),
        "waveform_len": jnp.array([n, n // 2])}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(params, batch)
    # 1 s @ 32 kHz → 101 frames → ÷32 = 3
    assert out["time_emb"].shape == (2, 3, 2048)
    assert out["clip_emb"].shape == (2, 2048)
    np.testing.assert_array_equal(np.asarray(out["length"]), [3, 1])


def test_grad_scale():
    g = jax.grad(lambda x: grad_scale(x, 0.1).sum())(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(g), 0.1)
    # forward unchanged
    np.testing.assert_allclose(np.asarray(grad_scale(jnp.ones(3), 0.1)), 1.0)


@pytest.mark.parametrize("cls", [AudioTextClip, AudioSingleTextClip])
def test_audio_text_clip(rng, cls):
    cfg = tiny_text_tower_config()
    model = cls(audio_encoder=Cnn14(sample_rate=32000),
                text_encoder=RetrievalBert(cfg),
                audio_dim=2048, text_dim=cfg.hidden_size, shared_dim=16,
                gradient_clip=0.5)
    n = 32000
    batch = {
        "waveform": jnp.asarray(
            rng.normal(size=(2, n)).astype(np.float32) * 0.1),
        "waveform_len": jnp.array([n, n]),
        "input_ids": jnp.asarray(rng.integers(1, 100, size=(2, 6))),
        "attention_mask": jnp.ones((2, 6), jnp.int32),
        "token_type_ids": jnp.zeros((2, 6), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(params, batch)
    assert out["audio_emb"].shape == (2, 16)
    # embeddings are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["audio_emb"]), axis=-1), 1.0,
        rtol=1e-4)
    assert float(out["logit_scale"]) == pytest.approx(1 / 0.07, rel=1e-3)
    if cls is AudioTextClip:
        assert out["text_emb"].shape == (2, 1, 16)
    else:
        assert out["text_emb"].shape == (2, 16)
