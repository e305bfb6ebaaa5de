"""Fused Pallas log-mel kernel vs the XLA reference path (TPU only — the
Mosaic kernel has no CPU interpreter coverage in this suite; the routing
logic is tested everywhere)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.frontend import (
    cdur_mel_config,
    cnn8rnn_mel_config,
    log_mel_spectrogram,
)
from texttoaudiogrounding_tpu.ops.pallas.logmel import pallas_supported

requires_tpu = pytest.mark.skipif(not pallas_supported(),
                                  reason="needs a TPU backend")


def test_auto_routing_falls_back_on_cpu(rng):
    """On CPU `use_pallas='auto'` must silently use the XLA path."""
    cfg = cnn8rnn_mel_config(32000)
    wav = jnp.asarray(rng.normal(size=(1, 16000)).astype(np.float32))
    out = log_mel_spectrogram(wav, cfg, use_pallas="auto")
    ref = log_mel_spectrogram(wav, cfg, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


@requires_tpu
@pytest.mark.parametrize("make_cfg", [cnn8rnn_mel_config, cdur_mel_config])
def test_fused_kernel_matches_xla(rng, make_cfg):
    from texttoaudiogrounding_tpu.ops.pallas.logmel import \
        fused_log_mel_spectrogram

    cfg = make_cfg(32000)
    wav = jnp.asarray(rng.normal(size=(2, 48000)).astype(np.float32) * 0.1)
    ref = np.asarray(log_mel_spectrogram(wav, cfg, use_pallas=False))
    out = np.asarray(fused_log_mel_spectrogram(wav, cfg))
    assert out.shape == ref.shape
    # the kernel's DFT dot is bf16 (the serving precision, same internal
    # arithmetic as XLA "f32" convs on TPU) — dB-scale tolerance
    d = np.abs(out - ref)
    assert d.max() < 0.08 and d.mean() < 0.005
