"""Fused Pallas log-mel kernels vs the XLA reference path.

The shipped kernel's logic is pinned ON CPU via the Pallas interpreter
(a kernel regression now fails the suite, not just on-chip scripts —
round-2 verdict item 5); the on-chip compiled path is additionally
checked when a TPU backend is present."""


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


@pytest.mark.parametrize("make_cfg", [cnn8rnn_mel_config, cdur_mel_config])
def test_fused_kernel_interpret_matches_xla(rng, make_cfg):
    """Interpreter-mode parity of the shipped kernel on CPU."""
    import texttoaudiogrounding_tpu.ops.pallas.logmel as L

    cfg = make_cfg(32000)
    wav = jnp.asarray(rng.normal(size=(2, 48000)).astype(np.float32) * 0.1)
    ref = np.asarray(log_mel_spectrogram(wav, cfg, use_pallas=False))
    out = np.asarray(L.fused_log_mel_spectrogram(wav, cfg,
                                                 interpret=True))
    assert out.shape == ref.shape
    d = np.abs(out - ref)
    assert d.max() < 0.15 and d.mean() < 0.01


def test_v3_kernel_interpret_matches_xla(rng):
    """The shifted-basis v3 kernel: exact-K framing, bf16 mel dot and
    XLA edge fix-up, pinned in interpreter mode (incl. reflect-pad
    boundary frames, which v3 splices from the exact XLA path)."""
    from texttoaudiogrounding_tpu.ops.pallas.logmel import (
        _v3_supported,
        fused_log_mel_spectrogram_v3,
    )

    cfg = cnn8rnn_mel_config(32000)
    assert _v3_supported(cfg)
    wav = jnp.asarray(rng.normal(size=(2, 48000)).astype(np.float32) * 0.1)
    ref = np.asarray(log_mel_spectrogram(wav, cfg, use_pallas=False))
    out = np.asarray(fused_log_mel_spectrogram_v3(wav, cfg,
                                                  interpret=True))
    assert out.shape == ref.shape
    d = np.abs(out - ref)
    assert d.max() < 0.15 and d.mean() < 0.01


def test_v4_kernel_interpret_bit_matches_shipped(rng):
    """The pipelined-epilogue v4 kernel computes the SAME math as the
    shipped kernel (the pipeline only re-schedules it): bit-identical
    in interpreter mode, XLA-close like the shipped kernel."""
    import texttoaudiogrounding_tpu.ops.pallas.logmel as L

    cfg = cnn8rnn_mel_config(32000)
    wav = jnp.asarray(rng.normal(size=(2, 48000)).astype(np.float32) * 0.1)
    ref = np.asarray(log_mel_spectrogram(wav, cfg, use_pallas=False))
    shipped = np.asarray(L.fused_log_mel_spectrogram(wav, cfg,
                                                     interpret=True))
    v4 = np.asarray(L.fused_log_mel_spectrogram_v4(wav, cfg,
                                                   interpret=True))
    np.testing.assert_array_equal(v4, shipped)
    d = np.abs(v4 - ref)
    assert d.max() < 0.15 and d.mean() < 0.01


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
