"""On-chip micro-bench of the fused log-mel frontend kernel variants.

Measures the shipped kernel (ops/pallas/logmel.py) against candidate
optimizations: merged real|imag basis (one dot per hop-part instead of
two) and a trimmed final part (the 4th hop block only carries 64 valid
sample rows), across tile_r values.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.frontend import (
    LogMelConfig,
    _dft_kernel,
    cnn8rnn_mel_config,
    mel_filterbank,
    num_frames,
)
from texttoaudiogrounding_tpu.ops.pallas.logmel import (
    _round_up,
    _trimmed_basis,
    fused_log_mel_spectrogram,
)


def timeit(fn, args, iters=30):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    t0 = time.time()
    for _ in range(iters):
        out, carry = fn(*args, carry)
    float(carry)
    return (time.time() - t0) / iters * 1000.0


@functools.lru_cache(maxsize=8)
def _merged_basis(cfg: LogMelConfig, k_pad: int):
    """[k_pad, 2F] real|imag merged, plus fb [F, mel] and per-part valid
    row counts (rows beyond n_fft are zero -> the final part is mostly
    padding and its dot can stop at the last nonzero row, rounded up)."""
    kernel = _dft_kernel(cfg)
    n_freqs = cfg.n_freqs
    fb_full = mel_filterbank(cfg)
    hi = int(np.max(np.nonzero(fb_full.sum(axis=1))[0])) + 1
    f_pad = _round_up(hi, 256)
    m = min(f_pad, n_freqs)
    basis = np.zeros((k_pad, 2 * f_pad), np.float32)
    basis[:cfg.n_fft, :m] = kernel[:, :m]
    basis[:cfg.n_fft, f_pad:f_pad + m] = kernel[:, n_freqs:n_freqs + m]
    fb = np.zeros((f_pad, cfg.n_mels), np.float32)
    fb[:m] = fb_full[:m]
    hop = cfg.hop_length
    j_parts = k_pad // hop
    valid = []
    for j in range(j_parts):
        v = max(0, min(cfg.n_fft - j * hop, hop))
        valid.append(_round_up(v, 8) if v else 0)
    return basis, fb, f_pad, tuple(valid)


def _kernel_v2(rows_a, rows_b, basis_ref, fb_ref, out_ref, *,
               tile_r: int, hop: int, j_parts: int, f_pad: int,
               valid: tuple, amin: float, trim: bool):
    rows = jnp.concatenate([rows_a[:], rows_b[:]], axis=0)
    acc = jnp.zeros((tile_r, 2 * f_pad), jnp.float32)
    for j in range(j_parts):
        if valid[j] == 0:
            continue
        part = rows[j:j + tile_r]
        if trim and valid[j] < hop:
            acc += jax.lax.dot_general(
                part[:, :valid[j]],
                basis_ref[j * hop:j * hop + valid[j], :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc += jax.lax.dot_general(
                part, basis_ref[j * hop:(j + 1) * hop, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    power = (acc[:, :f_pad] * acc[:, :f_pad]
             + acc[:, f_pad:] * acc[:, f_pad:])
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(mel, amin))


def fused_v2(waveform, cfg, tile_r=512, trim=True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    x = jnp.pad(x, ((0, 0), (0, max(0, need - x.shape[1]))))[:, :need]
    rows = x.reshape(b * r, hop).astype(jnp.bfloat16)
    basis, fb, f_pad, valid = _merged_basis(cfg, k_pad)
    n_blocks = (b * r) // tile_r
    out = pl.pallas_call(
        functools.partial(_kernel_v2, tile_r=tile_r, hop=hop,
                          j_parts=j_parts, f_pad=f_pad, valid=valid,
                          amin=cfg.amin, trim=trim),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tile_r, hop), lambda ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, hop),
                         lambda ci: (jnp.minimum(ci + 1, n_blocks - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(basis.shape, lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, cfg.n_mels), lambda ci: (ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * r, cfg.n_mels), jnp.float32),
    )(rows, rows, jnp.asarray(basis, jnp.bfloat16), jnp.asarray(fb))
    return out.reshape(b, r, cfg.n_mels)[:, :t]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = cnn8rnn_mel_config(32000)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (b, 320000), jnp.float32) * 0.1

    def run_current(w, c):
        y = fused_log_mel_spectrogram(w + c, cfg)
        return y, (y[0, 0, 0] * 0).astype(jnp.float32)

    ms = timeit(jax.jit(run_current), (wav,))
    print(f"current (tile 512, split basis): {ms:6.2f} ms")

    ref = None
    for tile_r in (256, 512, 1024):
        for trim in (False, True):
            def run(w, c, _t=tile_r, _tr=trim):
                y = fused_v2(w + c, cfg, tile_r=_t, trim=_tr)
                return y, (y[0, 0, 0] * 0).astype(jnp.float32)
            try:
                ms = timeit(jax.jit(run), (wav,))
                tag = f"v2 tile={tile_r} trim={int(trim)}"
                print(f"{tag:32s}: {ms:6.2f} ms")
                if ref is None:
                    a = np.asarray(fused_log_mel_spectrogram(wav, cfg))
                    v = np.asarray(fused_v2(wav, cfg, tile_r, trim))
                    print(f"  max |delta| vs current: "
                          f"{np.max(np.abs(a - v)):.4f} dB")
                    ref = True
            except Exception as e:
                print(f"v2 tile={tile_r} trim={int(trim)}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
