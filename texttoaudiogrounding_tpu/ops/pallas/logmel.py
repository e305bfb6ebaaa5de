"""Fused Pallas log-mel frontend kernel (serving path).

One kernel computes, per frame tile: windowed DFT (bf16 MXU matmuls) →
power → mel projection → dB — without ever materializing the
``[B, T, n_fft]`` frame tensor or the ``[B, T, n_freqs]`` power spectrum
in HBM (263 MB each for a 128 x 10 s batch).

Framing trick: the padded waveform reshapes to hop-blocks flattened over
the batch, ``[B*R, hop]``; frame ``t`` of clip ``b`` is blocks
``b*R + t .. b*R + t + J - 1`` (``J = ceil(n_fft / hop)``).  The kernel
receives TWO adjacent ``[tile_r, hop]`` block-tiles (the same array passed
twice, with index maps ``ci`` and ``ci+1``) and computes the DFT as ``J``
accumulated dots of sublane-shifted views against basis row-chunks — no
gathers, no lane relayouts, no frame materialization.  ``R`` is padded so
that every valid frame's blocks stay inside its own clip's rows.

The DFT basis is trimmed to the highest frequency bin any mel filter
touches (f_max = 14 kHz keeps 450 of 513 bins for the Cnn8Rnn frontend;
reference models/audio_encoder.py:107-123) and padded to a lane-aligned
width; trimmed/padded power bins have zero mel weight so the output is
unchanged.

Numerics: the DFT dot runs in bf16 with f32 accumulation — the same
arithmetic XLA uses for "f32" convolutions on this chip (measured
bit-identical), worth ~4x over 6-pass f32.  Max deviation from the
float64 reference is ~0.03 dB, before bn0 normalization.  The XLA path
(:func:`texttoaudiogrounding_tpu.ops.frontend.log_mel_spectrogram`)
remains the fallback and the numerical reference.  Measured v5e, B=128 x
10 s @ 32 kHz: ~5 ms vs ~10 ms for the XLA conv-DFT path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.frontend import (
    LogMelConfig,
    _dft_kernel,
    mel_filterbank,
    num_frames,
)


def pallas_supported() -> bool:
    """Fused kernel requires a TPU backend (Mosaic)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _trimmed_basis(cfg: LogMelConfig, k_pad: int) -> tuple:
    """(real [k_pad, F], imag [k_pad, F], fb [F, n_mels], f_tile).

    F is the number of retained frequency bins — everything up to the last
    bin with nonzero mel weight, rounded up to a multiple of 256.  Rows
    beyond n_fft are zero (frame padding), columns beyond the last active
    bin are zero.  ``f_tile`` halves F until two double-buffered
    ``[k_pad, f_tile]`` bf16 bases fit the VMEM budget (needed for the
    2048-FFT CDur config).
    """
    kernel = _dft_kernel(cfg)  # [n_fft, 2 * n_freqs], windowed
    n_freqs = cfg.n_freqs
    fb_full = mel_filterbank(cfg)  # [n_freqs, n_mels]
    hi = int(np.max(np.nonzero(fb_full.sum(axis=1))[0])) + 1
    f_pad = _round_up(hi, 256)
    m = min(f_pad, n_freqs)
    real = np.zeros((k_pad, f_pad), np.float32)
    imag = np.zeros((k_pad, f_pad), np.float32)
    real[:cfg.n_fft, :m] = kernel[:, :m]
    imag[:cfg.n_fft, :m] = kernel[:, n_freqs:n_freqs + m]
    fb = np.zeros((f_pad, cfg.n_mels), np.float32)
    fb[:m] = fb_full[:m]
    f_tile = f_pad
    while k_pad * f_tile * 2 * 2 > 6 * 2**20:
        f_tile //= 2
    return real, imag, fb, f_tile


def _kernel(rows_a, rows_b, real_ref, imag_ref, fb_ref, out_ref, acc_ref,
            *, tile_r: int, hop: int, j_parts: int, amin: float):
    from jax.experimental import pallas as pl

    f_tile = pl.program_id(1)
    n_f_tiles = pl.num_programs(1)

    rows = jnp.concatenate([rows_a[:], rows_b[:]], axis=0)  # [2*tile_r, hop]
    real = jnp.zeros((tile_r, real_ref.shape[1]), jnp.float32)
    imag = jnp.zeros_like(real)
    for j in range(j_parts):
        part = rows[j:j + tile_r]                        # sublane shift
        real += jnp.dot(part, real_ref[j * hop:(j + 1) * hop, :],
                        preferred_element_type=jnp.float32)
        imag += jnp.dot(part, imag_ref[j * hop:(j + 1) * hop, :],
                        preferred_element_type=jnp.float32)
    power = real * real + imag * imag                    # [tile_r, f_tile]
    partial = jnp.dot(power, fb_ref[:],
                      preferred_element_type=jnp.float32)  # [tile_r, mel]

    @pl.when(f_tile == 0)
    def _():
        acc_ref[:] = partial

    @pl.when(f_tile > 0)
    def _():
        acc_ref[:] = acc_ref[:] + partial

    @pl.when(f_tile == n_f_tiles - 1)
    def _():
        out_ref[:] = (10.0 / np.log(10.0)) * jnp.log(
            jnp.maximum(acc_ref[:], amin))


def fused_log_mel_spectrogram(waveform: jax.Array, cfg: LogMelConfig,
                              tile_r: int = 512) -> jax.Array:
    """``[B, N] -> [B, T, n_mels]`` log-mel via the fused Pallas kernel.

    Matches :func:`ops.frontend.log_mel_spectrogram` to ~0.03 dB (bf16
    DFT dot, f32 accumulation and mel projection).  ``top_db`` is not
    supported here (the reference frontends use ``top_db=None``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if cfg.top_db is not None:
        raise NotImplementedError("fused kernel supports top_db=None only")

    hop = cfg.hop_length
    j_parts = -(-cfg.n_fft // hop)
    k_pad = j_parts * hop

    b, n = waveform.shape
    t = num_frames(n, cfg.hop_length)
    # + j_parts keeps every valid frame's blocks inside its own clip's
    # row range (never reading a neighbouring clip's samples)
    r = _round_up(t + j_parts, tile_r)

    pad = cfg.n_fft // 2
    x = jnp.pad(waveform.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")
    need = r * hop
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    else:
        x = x[:, :need]
    rows = x.reshape(b * r, hop).astype(jnp.bfloat16)

    real, imag, fb, f_tile = _trimmed_basis(cfg, k_pad)
    f_pad = real.shape[1]
    n_f_tiles = f_pad // f_tile
    n_blocks = (b * r) // tile_r

    out = pl.pallas_call(
        functools.partial(_kernel, tile_r=tile_r, hop=hop,
                          j_parts=j_parts, amin=cfg.amin),
        grid=(n_blocks, n_f_tiles),
        in_specs=[
            pl.BlockSpec((tile_r, hop), lambda ci, fi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, hop),
                         lambda ci, fi: (jnp.minimum(ci + 1, n_blocks - 1),
                                         0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, f_tile), lambda ci, fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, f_tile), lambda ci, fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, fb.shape[1]), lambda ci, fi: (fi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, cfg.n_mels),
                               lambda ci, fi: (ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * r, cfg.n_mels), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_r, cfg.n_mels), jnp.float32)],
    )(rows, rows, jnp.asarray(real, jnp.bfloat16),
      jnp.asarray(imag, jnp.bfloat16), jnp.asarray(fb))
    return out.reshape(b, r, cfg.n_mels)[:, :t]
