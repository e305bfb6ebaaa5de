"""Log-mel frontend: conv-DFT path vs FFT path vs float64 NumPy golden,
plus filterbank/window semantics pinned to torchaudio formulas
(reference frontend: models/audio_encoder.py:107-124 and :29-37)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.ops.frontend import (
    LogMelConfig,
    cdur_mel_config,
    cnn8rnn_mel_config,
    log_mel_spectrogram,
    log_mel_spectrogram_numpy,
    mel_filterbank,
    num_frames,
)


def test_num_frames():
    cfg = cnn8rnn_mel_config(32000)
    assert cfg.hop_length == 320 and cfg.n_fft == 1024
    # 10 s at 32 kHz -> 1001 frames, as the reference length math expects
    assert num_frames(320000, cfg.hop_length) == 1001
    assert num_frames(np.array([320000, 160000]), 320).tolist() == [1001, 501]


def test_mel_filterbank_properties():
    cfg = cnn8rnn_mel_config(32000)
    fb = mel_filterbank(cfg)
    assert fb.shape == (513, 64)
    assert fb.min() >= 0.0
    # slaney-normalized filters: area-normalized, so peak << 1
    assert fb.max() < 0.1
    # filters below f_min (50 Hz) must be zero
    freqs = np.linspace(0, 16000, 513)
    assert fb[freqs < 45].sum() == 0.0
    # htk default variant peaks at 1.0 (unnormalized triangles)
    fb_htk = mel_filterbank(cdur_mel_config(32000))
    assert fb_htk.shape == (1025, 64)
    assert 0.9 < fb_htk.max() <= 1.0


@pytest.mark.parametrize("make_cfg", [cnn8rnn_mel_config, cdur_mel_config])
def test_conv_dft_matches_fft_and_numpy(rng, make_cfg):
    cfg = make_cfg(32000)
    wav = rng.normal(size=(2, 16000)).astype(np.float32) * 0.1
    out_conv = np.asarray(log_mel_spectrogram(jnp.array(wav), cfg))
    out_fft = np.asarray(log_mel_spectrogram(jnp.array(wav), cfg,
                                             use_fft=True))
    out_np = log_mel_spectrogram_numpy(wav, cfg)
    assert out_conv.shape == (2, num_frames(16000, cfg.hop_length), 64)
    # dB-domain agreement: conv-DFT vs fp64 golden (~1e-5 dB on CPU)
    np.testing.assert_allclose(out_conv, out_np, atol=1e-2)
    np.testing.assert_allclose(out_fft, out_np, atol=1e-2)


def test_sine_peak_lands_in_right_mel_bin():
    """A pure 1 kHz tone must concentrate energy near the 1 kHz mel bin."""
    cfg = cnn8rnn_mel_config(32000)
    t = np.arange(32000) / 32000.0
    wav = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
    mel = np.asarray(log_mel_spectrogram(jnp.array(wav), cfg))
    peak_bin = mel[0, 50].argmax()
    fb = mel_filterbank(cfg)
    freqs = np.linspace(0, 16000, 513)
    center = freqs[fb[:, peak_bin].argmax()]
    assert abs(center - 1000.0) < 120.0


def test_jit_and_grad():
    cfg = cnn8rnn_mel_config(32000)
    wav = jnp.ones((1, 6400)) * 0.01

    @jax.jit
    def f(w):
        return log_mel_spectrogram(w, cfg).sum()

    g = jax.grad(f)(wav)
    assert np.isfinite(np.asarray(g)).all()


def test_golden_torch_stft():
    """Committed golden fixtures pin the frontend to the TORCH STFT
    stack (float64 torch.stft + reflect center padding + slaney mels —
    the exact pipeline torchaudio's MelSpectrogram executes), closing
    the round-2 'self-consistency only' gap.  Regenerate with
    scripts/gen_frontend_golden.py (provenance documented there)."""
    import pathlib

    fix = np.load(pathlib.Path(__file__).parent / "fixtures"
                  / "frontend_golden.npz")
    for name, cfg in (("cnn8rnn", cnn8rnn_mel_config(32000)),
                      ("cdur", cdur_mel_config(32000))):
        wav = jnp.asarray(fix[f"{name}_wav"])
        want = fix[f"{name}_logmel"]
        got = np.asarray(log_mel_spectrogram(wav, cfg, use_pallas=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=0,
                                   err_msg=name)
