"""Shipped logmel kernel vs the v4 pipelined-epilogue variant (real chip).

v4 runs the power/mel/dB epilogue of block g-1 while block g's DFT dots
are in flight (ping-pong scratch; bit-identical math).  If Mosaic
overlaps the VPU epilogue with the MXU dots, the kernel should approach
its ~2.6 ms DFT-dot bound (shipped: 4.4 ms in-graph, ~40% epilogue —
STATUS.md frontend account).

Usage: python scripts/bench_logmel_v4.py [B]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.frontend import cnn8rnn_mel_config
from texttoaudiogrounding_tpu.ops.pallas.logmel import (
    fused_log_mel_spectrogram,
    fused_log_mel_spectrogram_v4,
)


def timeit(fn, args, iters=30):
    out = fn(*args)
    float(jnp.sum(out[:, 0, 0]))
    t0 = time.time()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(jnp.sum(acc[:, 0, 0]))
    return (time.time() - t0) / iters * 1000.0


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = cnn8rnn_mel_config(32000)
    wav = jax.random.normal(jax.random.PRNGKey(0), (b, 320000),
                            jnp.float32) * 0.1

    ship = jax.jit(lambda w: fused_log_mel_spectrogram(w, cfg))
    v4 = jax.jit(lambda w: fused_log_mel_spectrogram_v4(w, cfg))

    # parity first
    a = np.asarray(ship(wav[:4]))
    c = np.asarray(v4(wav[:4]))
    print(f"on-chip v4 vs shipped: max|d| {np.abs(a - c).max():.5f}")

    for _ in range(2):  # settle pass then report
        t_ship = timeit(ship, (wav,))
        t_v4 = timeit(v4, (wav,))
    print(f"B={b}: shipped {t_ship:.2f} ms   v4(tile 256) {t_v4:.2f} ms",
          flush=True)
    for tile in (128, 384):
        try:
            f = jax.jit(lambda w, t=tile: fused_log_mel_spectrogram_v4(
                w, cfg, tile_r=t))
            print(f"  v4 tile_r={tile}: {timeit(f, (wav,)):.2f} ms",
                  flush=True)
        except Exception as exc:  # VMEM OOM etc — record and move on
            print(f"  v4 tile_r={tile}: FAILED {str(exc)[:120]}",
                  flush=True)
    for tile in (256, 512):
        f = jax.jit(lambda w, t=tile: fused_log_mel_spectrogram(
            w, cfg, tile_r=t))
        print(f"  shipped tile_r={tile}: {timeit(f, (wav,)):.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
