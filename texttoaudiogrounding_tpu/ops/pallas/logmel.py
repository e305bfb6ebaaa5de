"""Fused Pallas log-mel frontend kernel.

One kernel computes, per waveform row and frame tile: framing → windowed
DFT (as MXU matmuls) → power → mel projection → dB — without ever writing
the ``[B, T, n_freqs]`` power spectrum (263 MB for a 128×10 s batch) or the
``[B, T, n_fft]`` frame tensor to HBM.  The XLA path
(:func:`texttoaudiogrounding_tpu.ops.frontend.log_mel_spectrogram`) remains
the fallback and the numerical reference.

Framing trick (no gathers): with ``g = gcd(hop, n_fft)`` the waveform row
reshapes to ``[rows, g]``; frame ``t`` is rows ``[t*hop/g, t*hop/g +
n_fft/g)``.  Each window column block ``j`` is then
``rows[j : j + (hop/g)*T].reshape(T, hop/g, g)[:, 0]`` — a static reshape +
slice per ``j``, fully vectorized on the VPU.

The DFT basis is padded to a lane-aligned frequency axis (multiple of 128);
the padded kernel columns are zero so padded power bins contribute nothing
to the mel matmul.
"""

from __future__ import annotations

import functools
from math import gcd

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


def _pick_f_tile(n_fft: int) -> int:
    """Frequency-tile width: two double-buffered [n_fft, f_tile] bases
    must stay well under the 16 MB VMEM budget."""
    return 640 if n_fft <= 1024 else 256


@functools.lru_cache(maxsize=8)
def _padded_basis(cfg: LogMelConfig) -> tuple:
    """(real [n_fft, F], imag [n_fft, F], mel [F, 64]) with F padded to a
    multiple of the frequency tile; padded columns/rows are zero."""
    kernel = _dft_kernel(cfg)  # [n_fft, 2 * n_freqs], windowed
    n_freqs = cfg.n_freqs
    f_pad = _round_up(n_freqs, _pick_f_tile(cfg.n_fft))
    real = np.zeros((cfg.n_fft, f_pad), np.float32)
    imag = np.zeros((cfg.n_fft, f_pad), np.float32)
    real[:, :n_freqs] = kernel[:, :n_freqs]
    imag[:, :n_freqs] = kernel[:, n_freqs:]
    fb = np.zeros((f_pad, cfg.n_mels), np.float32)
    fb[:n_freqs] = mel_filterbank(cfg)
    return real, imag, fb


def _kernel(wav_ref, real_ref, imag_ref, fb_ref, out_ref, acc_ref, *,
            tile_t: int, rows_per_hop: int, rows_per_win: int, g: int,
            amin: float):
    from jax.experimental import pallas as pl

    chunk = pl.program_id(1)
    f_tile = pl.program_id(2)
    n_f_tiles = pl.num_programs(2)
    start_row = chunk * tile_t * rows_per_hop
    # build frames [tile_t, n_fft] via reshape-decimation: dynamic ref
    # reads (pl.ds) replace gathers
    cols = []
    span = rows_per_hop * tile_t
    for j in range(rows_per_win):
        block = wav_ref[0, pl.ds(start_row + j, span), :]  # [span, g]
        block = block.reshape(tile_t, rows_per_hop, g)[:, 0, :]
        cols.append(block)
    frames = jnp.concatenate(cols, axis=-1)               # [tile_t, n_fft]

    real = jnp.dot(frames, real_ref[:],
                   preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, imag_ref[:],
                   preferred_element_type=jnp.float32)
    power = real * real + imag * imag                # [tile_t, F_TILE]
    partial = jnp.dot(power, fb_ref[:],
                      preferred_element_type=jnp.float32)  # [tile_t, 64]

    # accumulate mel over frequency tiles; emit dB on the last one
    @pl.when(f_tile == 0)
    def _():
        acc_ref[:] = partial

    @pl.when(f_tile > 0)
    def _():
        acc_ref[:] = acc_ref[:] + partial

    @pl.when(f_tile == n_f_tiles - 1)
    def _():
        out_ref[0] = (10.0 / np.log(10.0)) * jnp.log(
            jnp.maximum(acc_ref[:], amin))


def fused_log_mel_spectrogram(waveform: jax.Array, cfg: LogMelConfig,
                              tile_t: int = 256) -> jax.Array:
    """``[B, N] -> [B, T, n_mels]`` log-mel via the fused Pallas kernel.

    Matches :func:`ops.frontend.log_mel_spectrogram` numerically (same
    windowed-DFT basis and slaney filterbank; dB via natural log).
    ``top_db`` is not supported here (the reference frontends use
    ``top_db=None``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if cfg.top_db is not None:
        raise NotImplementedError("fused kernel supports top_db=None only")
    g = gcd(cfg.hop_length, cfg.n_fft)
    rows_per_hop = cfg.hop_length // g
    rows_per_win = cfg.n_fft // g

    b, n = waveform.shape
    t = num_frames(n, cfg.hop_length)
    t_pad = _round_up(t, tile_t)
    n_chunks = t_pad // tile_t

    pad = cfg.n_fft // 2
    x = jnp.pad(waveform.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")
    # rows needed: frame (t_pad-1) touches rows < (t_pad-1)*rph + rpw;
    # chunk slicing with dynamic_slice needs rows ≥ rph*t_pad + rpw
    rows_needed = rows_per_hop * t_pad + rows_per_win
    total = rows_needed * g
    if x.shape[1] < total:
        x = jnp.pad(x, ((0, 0), (0, total - x.shape[1])))
    else:
        x = x[:, :total]
    wav2d = x.reshape(b, rows_needed, g)

    real, imag, fb = _padded_basis(cfg)
    # frequency tiling keeps the DFT bases within VMEM for large n_fft
    f_pad = real.shape[1]
    f_tile = min(_pick_f_tile(cfg.n_fft), f_pad)
    n_f_tiles = f_pad // f_tile

    kernel = functools.partial(
        _kernel, tile_t=tile_t, rows_per_hop=rows_per_hop,
        rows_per_win=rows_per_win, g=g, amin=cfg.amin)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_chunks, n_f_tiles),
        in_specs=[
            # frame tiles overlap across chunks, which BlockSpec cannot
            # express — each program receives the full (1.3 MB) row and
            # selects its chunk with a dynamic slice in-kernel
            pl.BlockSpec((1, rows_needed, g),
                         lambda bi, ci, fi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, f_tile),
                         lambda bi, ci, fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, f_tile),
                         lambda bi, ci, fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, fb.shape[1]),
                         lambda bi, ci, fi: (fi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, cfg.n_mels),
                               lambda bi, ci, fi: (bi, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, cfg.n_mels),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_t, cfg.n_mels), jnp.float32)],
    )(wav2d, jnp.asarray(real), jnp.asarray(imag), jnp.asarray(fb))
    return out[:, :t]
