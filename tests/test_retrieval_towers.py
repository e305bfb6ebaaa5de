"""ResNet38 / Wavegram-Logmel-Cnn14 / AST retrieval towers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.models.retrieval_towers import (
    AudioSpectrogramTransformer,
    ResNet38,
    WavegramLogmelCnn14,
)


@pytest.fixture
def batch(rng):
    n = 32000
    return {"waveform": jnp.asarray(
        rng.normal(size=(2, n)).astype(np.float32) * 0.1),
        "waveform_len": jnp.array([n, n // 2])}


@pytest.mark.parametrize("cls,kw,clip_dim", [
    (ResNet38, {}, 2048),
    (WavegramLogmelCnn14, {}, 2048),
    (AudioSpectrogramTransformer,
     dict(hidden_size=64, num_layers=2, num_heads=2, mlp_dim=128,
          embed_dim=64), 64),
])
def test_tower_contract(batch, cls, kw, clip_dim):
    model = cls(sample_rate=32000, **kw)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(variables, batch)
    assert out["clip_emb"].shape == (2, clip_dim)
    assert out["time_emb"].shape[0] == 2
    assert out["time_emb"].shape[2] == clip_dim
    assert np.isfinite(np.asarray(out["clip_emb"])).all()
    # train mode with dropout/specaug RNGs and BN stats
    out2, mut = model.apply(
        variables, {**batch, "specaug": True}, train=True,
        rngs={"dropout": jax.random.PRNGKey(1),
              "specaug": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert "batch_stats" in mut
