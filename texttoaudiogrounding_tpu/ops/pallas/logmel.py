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
import os

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.frontend import (
    LogMelConfig,
    _dft_kernel,
    mel_filterbank,
    num_frames,
)


def default_interpret() -> bool:
    """``TTG_PALLAS_INTERPRET=1`` runs every Pallas kernel in interpret
    mode — the CI hook that lets the CPU mesh exercise the full fused
    routing (model gating + kernel math) without a TPU."""
    return os.environ.get("TTG_PALLAS_INTERPRET") == "1"


def pallas_supported() -> bool:
    """Fused kernels require a TPU backend (Mosaic) — or interpret mode."""
    if default_interpret():
        return True
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


def _v4_kernel(rows_a, rows_b, real_ref, imag_ref, fb_ref, out_ref,
               re_s, im_s, *, tile_r: int, hop: int, j_parts: int,
               amin: float):
    """Software-pipelined variant: the VPU/epilogue work (power, mel
    dot, dB) for block ``g-1`` runs while the MXU DFT dots for block
    ``g`` are in flight — the two halves touch different ping-pong
    scratch slots, so the scheduler can overlap them (the serialized
    epilogue is ~40% of the shipped kernel's step time, STATUS.md).
    Grid = (n_blocks + 1,): step 0 only produces, the last step only
    consumes; out block g-1 is written at step g (index map lags)."""
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    n = pl.num_programs(0)
    slot = g % 2

    @pl.when(g < n - 1)
    def _():
        rows = jnp.concatenate([rows_a[:], rows_b[:]], axis=0)
        real = jnp.zeros((tile_r, real_ref.shape[1]), jnp.float32)
        imag = jnp.zeros_like(real)
        for j in range(j_parts):
            part = rows[j:j + tile_r]                    # sublane shift
            real += jnp.dot(part, real_ref[j * hop:(j + 1) * hop, :],
                            preferred_element_type=jnp.float32)
            imag += jnp.dot(part, imag_ref[j * hop:(j + 1) * hop, :],
                            preferred_element_type=jnp.float32)
        re_s[slot] = real
        im_s[slot] = imag

    @pl.when(g > 0)
    def _():
        prev = (g + 1) % 2
        re = re_s[prev]
        im = im_s[prev]
        power = re * re + im * im
        mel = jnp.dot(power, fb_ref[:],
                      preferred_element_type=jnp.float32)
        out_ref[:] = (10.0 / np.log(10.0)) * jnp.log(
            jnp.maximum(mel, amin))


def fused_log_mel_spectrogram_v4(waveform: jax.Array, cfg: LogMelConfig,
                                 tile_r: int = 256,
                                 interpret: bool | None = None
                                 ) -> jax.Array:
    """Pipelined-epilogue variant of :func:`fused_log_mel_spectrogram`
    (identical math and framing; single-f-tile configs only — the
    flagship Cnn8Rnn geometry).  NOT routed: measured 4.36 ms vs the
    shipped kernel's 4.28 at B=128 (scripts/bench_logmel_v4.py) —
    Mosaic does not overlap the deferred VPU epilogue with the next
    block's MXU dots, so the pipeline buys nothing; kept as a bit-exact
    parity experiment.  Default tile_r=256: the ping-pong re/im scratch
    costs 4 * tile_r * f_pad bytes on top of the shipped kernel's
    budget, and tile_r=512 exceeds the 16 MB scoped-vmem limit
    (measured OOM at 17.89 MB)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if cfg.top_db is not None:
        raise NotImplementedError("fused kernel supports top_db=None only")

    from texttoaudiogrounding_tpu.parallel.kernel_shard import (
        active_kernel_mesh, maybe_shard)
    if interpret is None:
        interpret = default_interpret()
    if active_kernel_mesh() is not None:
        return maybe_shard(
            lambda w: fused_log_mel_spectrogram_v4(
                w, cfg, tile_r, interpret=interpret),
            (waveform,), (0,))

    hop = cfg.hop_length
    j_parts = -(-cfg.n_fft // hop)
    k_pad = j_parts * hop

    b, n = waveform.shape
    t = num_frames(n, cfg.hop_length)
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
    if f_tile != f_pad:
        raise ValueError("v4 requires a single f tile "
                         f"(f_tile {f_tile} != f_pad {f_pad})")
    n_blocks = (b * r) // tile_r

    out = pl.pallas_call(
        functools.partial(_v4_kernel, tile_r=tile_r, hop=hop,
                          j_parts=j_parts, amin=cfg.amin),
        grid=(n_blocks + 1,),
        in_specs=[
            pl.BlockSpec((tile_r, hop),
                         lambda g: (jnp.minimum(g, n_blocks - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, hop),
                         lambda g: (jnp.minimum(g + 1, n_blocks - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, f_pad), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, f_pad), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, fb.shape[1]), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, cfg.n_mels),
                               lambda g: (jnp.maximum(g - 1, 0), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * r, cfg.n_mels), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, tile_r, f_pad), jnp.float32),
                        pltpu.VMEM((2, tile_r, f_pad), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(rows, rows, jnp.asarray(real, jnp.bfloat16),
      jnp.asarray(imag, jnp.bfloat16), jnp.asarray(fb))
    return out.reshape(b, r, cfg.n_mels)[:, :t]


@functools.lru_cache(maxsize=8)
def _v3_basis(cfg: LogMelConfig):
    """(basis [n_fft, 2*F] real|imag merged, fb [F, n_mels]).

    F = highest mel-active bin rounded up to 256 (zero-weight columns
    beyond).  Unlike :func:`_trimmed_basis` there is NO row padding: the
    shifted-framing kernel slices exactly ``n_fft`` basis rows, so the
    DFT dots spend zero FLOPs on padding.
    """
    kernel = _dft_kernel(cfg)
    n_freqs = cfg.n_freqs
    fb_full = mel_filterbank(cfg)
    hi = int(np.max(np.nonzero(fb_full.sum(axis=1))[0])) + 1
    f_pad = _round_up(hi, 256)
    m = min(f_pad, n_freqs)
    basis = np.zeros((cfg.n_fft, 2 * f_pad), np.float32)
    basis[:, :m] = kernel[:, :m]
    basis[:, f_pad:f_pad + m] = kernel[:, n_freqs:n_freqs + m]
    fb = np.zeros((f_pad, cfg.n_mels), np.float32)
    fb[:m] = fb_full[:m]
    return basis, fb


def _v3_parts(cfg: LogMelConfig):
    """Static DFT-part table for the shifted framing.

    Frame ``t`` covers padded samples ``[t*hop - pad, t*hop - pad +
    n_fft)``; with ``pad = n_fft//2`` and ``hop < pad <= 2*hop`` that is
    rows ``t-2 .. t-2+J-1`` of the plain ``[R, hop]`` waveform reshape,
    starting at lane ``lead = 2*hop - pad``.  Returns a list of
    ``(lane_lo, lane_hi, basis_lo, basis_hi)`` per part — every slice
    boundary is a multiple of 128 lanes or covers the full row.
    """
    hop, n_fft, pad = cfg.hop_length, cfg.n_fft, cfg.n_fft // 2
    lead = 2 * hop - pad
    parts = []
    j = 0
    while j * hop - lead < n_fft:
        lo_s = max(0, j * hop - lead)
        hi_s = min(n_fft, (j + 1) * hop - lead)
        parts.append((lo_s - (j * hop - lead), hi_s - (j * hop - lead),
                      lo_s, hi_s))
        j += 1
    return parts


def _v3_supported(cfg: LogMelConfig) -> bool:
    hop, pad = cfg.hop_length, cfg.n_fft // 2
    if not (hop < pad <= 2 * hop) or cfg.n_fft % 8:
        return False
    # every partial-row lane slice must start on a 128-lane boundary and
    # every basis row slice on a sublane boundary
    return all(lo % 128 == 0 and blo % 8 == 0 and bhi % 8 == 0
               for lo, hi, blo, bhi in _v3_parts(cfg))


def _v3_kernel(rows_a, rows_b, rows_c, basis_ref, fb_ref, out_ref, *,
               tile_r: int, hop: int, parts: tuple, f_pad: int,
               amin: float):
    """DFT (exact-K shifted dots) -> power -> mel (bf16 dot) -> dB."""
    cat = jnp.concatenate([rows_a[0], rows_b[0], rows_c[0]], axis=0)
    acc = jnp.zeros((tile_r, 2 * f_pad), jnp.float32)
    for j, (lane_lo, lane_hi, b_lo, b_hi) in enumerate(parts):
        part = cat[tile_r - 2 + j:2 * tile_r - 2 + j]
        if lane_hi - lane_lo < hop:
            part = part[:, lane_lo:lane_hi]
        acc += jax.lax.dot_general(
            part, basis_ref[b_lo:b_hi, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    power = acc[:, :f_pad] ** 2 + acc[:, f_pad:] ** 2
    # bf16 mel projection (f32 accumulate): the f32 MXU dot here measures
    # ~4x slower and dominates the kernel; bf16 rounding of the power
    # spectrum adds < 0.05 dB before bn0 normalization
    mel = jnp.dot(power.astype(jnp.bfloat16), fb_ref[:],
                  preferred_element_type=jnp.float32)
    out_ref[0] = (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(mel, amin))


def _xla_log_mel(waveform: jax.Array, cfg: LogMelConfig) -> jax.Array:
    """Small-slice XLA reference path (edge-frame fix-up)."""
    from texttoaudiogrounding_tpu.ops import frontend as _f

    power = _f.power_spectrogram(waveform, cfg)
    fb = jnp.asarray(mel_filterbank(cfg))
    mel = jnp.einsum("btf,fm->btm", power, fb)
    return (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(mel, cfg.amin))


def fused_log_mel_spectrogram_v3(waveform: jax.Array,
                                 cfg: LogMelConfig,
                                 tile_r: int = 256,
                                 interpret: bool | None = None) -> jax.Array:
    """``[B, N] -> [B, T, n_mels]``, shifted-basis fused kernel.

    v3 of the fused frontend: the waveform is reshaped ``[B, R, hop]``
    with NO reflect-pad copy (the center-pad lane offset is absorbed
    into zero-padded basis slices), the DFT dots contract exactly
    ``n_fft`` rows (v2 wasted 25% on hop-rounding zeros), and the mel
    projection runs as a bf16 MXU dot.  The four frames per clip whose
    window touches the reflect padding are recomputed by the exact XLA
    path and spliced in.  Reference semantics:
    models/audio_encoder.py:107-124 (torchaudio MelSpectrogram center
    padding, pad_mode="reflect").
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from texttoaudiogrounding_tpu.parallel.kernel_shard import (
        active_kernel_mesh, maybe_shard)
    if interpret is None:
        interpret = default_interpret()
    if active_kernel_mesh() is not None:
        return maybe_shard(
            lambda w: fused_log_mel_spectrogram_v3(
                w, cfg, tile_r, interpret=interpret),
            (waveform,), (0,))

    hop = cfg.hop_length
    n_fft = cfg.n_fft
    pad = n_fft // 2
    b, n = waveform.shape
    t_frames = num_frames(n, hop)
    parts = tuple(_v3_parts(cfg))
    j_parts = len(parts)

    r_out = _round_up(t_frames, tile_r)
    k_tiles = r_out // tile_r
    # input rows: row u is read for frames u+2-j ... ; max needed row is
    # t_frames; pad rows (zeros) cover the tail, edge frames are fixed up
    need_rows = (k_tiles + 1) * tile_r
    x = waveform.astype(jnp.bfloat16)
    x = jnp.pad(x, ((0, 0), (0, need_rows * hop - n)))
    rows = x.reshape(b, need_rows, hop)

    basis, fb = _v3_basis(cfg)
    f_pad = fb.shape[0]

    out = pl.pallas_call(
        functools.partial(_v3_kernel, tile_r=tile_r, hop=hop, parts=parts,
                          f_pad=f_pad, amin=cfg.amin),
        grid=(b, k_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_r, hop),
                         lambda bi, ki: (bi, jnp.maximum(ki - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r, hop), lambda bi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r, hop), lambda bi, ki: (bi, ki + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(basis.shape, lambda bi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda bi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_r, cfg.n_mels),
                               lambda bi, ki: (bi, ki, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r_out, cfg.n_mels),
                                       jnp.float32),
        interpret=interpret,
    )(rows, rows, rows,
      jnp.asarray(basis, jnp.bfloat16),
      jnp.asarray(fb, jnp.bfloat16))

    # ---- edge fix-up: frames whose window touches the reflect padding
    t_lo = -(-pad // hop)                                   # first clean
    t_hi = (n + pad - n_fft) // hop + 1                     # first dirty
    left = _xla_log_mel(waveform[:, :(t_lo + 1) * hop + n_fft],
                        cfg)[:, :t_lo]
    s0 = (t_hi - t_lo) * hop
    right = _xla_log_mel(waveform[:, s0:], cfg)[:, t_lo:]
    right = right[:, :t_frames - t_hi]
    mid = out[:, t_lo:t_hi]
    return jnp.concatenate([left, mid, right], axis=1)


def fused_log_mel_spectrogram(waveform: jax.Array, cfg: LogMelConfig,
                              tile_r: int = 512,
                              interpret: bool | None = None) -> jax.Array:
    """``[B, N] -> [B, T, n_mels]`` log-mel via the fused Pallas kernel.

    Matches :func:`ops.frontend.log_mel_spectrogram` to ~0.03 dB (bf16
    DFT dot, f32 accumulation and mel projection).  ``top_db`` is not
    supported here (the reference frontends use ``top_db=None``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if cfg.top_db is not None:
        raise NotImplementedError("fused kernel supports top_db=None only")

    from texttoaudiogrounding_tpu.parallel.kernel_shard import (
        active_kernel_mesh, maybe_shard)
    if interpret is None:
        interpret = default_interpret()
    if active_kernel_mesh() is not None:
        return maybe_shard(
            lambda w: fused_log_mel_spectrogram(
                w, cfg, tile_r, interpret=interpret),
            (waveform,), (0,))

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
        interpret=interpret,
    )(rows, rows, jnp.asarray(real, jnp.bfloat16),
      jnp.asarray(imag, jnp.bfloat16), jnp.asarray(fb))
    return out.reshape(b, r, cfg.n_mels)[:, :t]
