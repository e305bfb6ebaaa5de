"""Generate committed log-mel golden fixtures from the TORCH STFT stack.

Provenance: torchaudio's ``MelSpectrogram`` is ``torch.stft(center=True,
pad_mode="reflect", periodic hann, onesided) -> |.|^2 -> melscale_fbanks
matmul`` (torchaudio/transforms/_transforms.py); this script evaluates
exactly that pipeline with ``torch.stft`` in float64 — the same FFT and
padding code torchaudio calls — so the fixtures pin our frontend to the
reference's *underlying* numerics even though torchaudio itself is not
installed in this image.  Where torchaudio IS available, the optional
``--check-torchaudio`` flag additionally diffs against
``torchaudio.transforms.MelSpectrogram`` + ``AmplitudeToDB``.

Output: ``tests/fixtures/frontend_golden.npz`` with, per config,
the deterministic input waveform and the float64 log-mel reference.
Consumed by tests/test_frontend.py::test_golden_torch_stft.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import torch

from texttoaudiogrounding_tpu.ops.frontend import (
    _padded_window,
    cdur_mel_config,
    cnn8rnn_mel_config,
    mel_filterbank,
)


def torch_logmel(wav: np.ndarray, cfg) -> np.ndarray:
    w = torch.from_numpy(wav).double()
    win = torch.from_numpy(_padded_window(cfg)).double()
    spec = torch.stft(w, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                      win_length=cfg.n_fft, window=win, center=True,
                      pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    power = spec.abs() ** 2                                  # [B, F, T]
    fb = torch.from_numpy(mel_filterbank(cfg)).double()      # [F, M]
    mel = torch.einsum("bft,fm->btm", power, fb)
    return (10.0 * torch.log10(torch.clamp(mel, min=cfg.amin))).numpy()


def main():
    rng = np.random.default_rng(20260817)
    out = {}
    for name, cfg, n in (("cnn8rnn", cnn8rnn_mel_config(32000), 48000),
                         ("cdur", cdur_mel_config(32000), 48000)):
        wav = (rng.normal(size=(2, n)) * 0.1).astype(np.float32)
        # mix in a tone + silence region so quiet/loud frames both appear
        t = np.arange(n) / 32000.0
        wav[0] += 0.3 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        wav[1, : n // 4] = 0.0
        golden = torch_logmel(wav, cfg)
        out[f"{name}_wav"] = wav
        out[f"{name}_logmel"] = golden.astype(np.float32)
        if "--check-torchaudio" in sys.argv:
            import torchaudio

            ms = torchaudio.transforms.MelSpectrogram(
                sample_rate=cfg.sample_rate, n_fft=cfg.n_fft,
                win_length=cfg.win_length, hop_length=cfg.hop_length,
                f_min=cfg.f_min, f_max=cfg.f_max, n_mels=cfg.n_mels,
                norm=cfg.norm, mel_scale=cfg.mel_scale)
            db = torchaudio.transforms.AmplitudeToDB("power", top_db=None)
            ta = db(ms(torch.from_numpy(wav))).transpose(1, 2).numpy()
            print(f"{name}: torchaudio max delta "
                  f"{np.max(np.abs(ta - golden)):.2e} dB")
    path = Path(__file__).resolve().parent.parent / "tests" / "fixtures"
    path.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path / "frontend_golden.npz", **out)
    print(f"wrote {path / 'frontend_golden.npz'}")


if __name__ == "__main__":
    main()
