"""Stage-wise serving-time attribution on the real chip.

Times each pipeline stage of the flagship Cnn8Rnn serving path in
isolation (B=128, 10 s clips, bf16) with chained-carry timing (CLAUDE.md:
block_until_ready is unreliable through the axon tunnel).  Stages use the
same shapes/dtypes as the real model; values are dummies — this measures
compute time, not correctness.

Usage: python scripts/profile_stages.py [B]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters=30):
    """Chained timing: fn must return (out, carry_scalar)."""
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)  # compile + sync
    t0 = time.time()
    for _ in range(iters):
        out, carry = fn(*args, carry)
    float(carry)
    return (time.time() - t0) / iters * 1000.0  # ms


def conv_bn_relu(x, k, pad="SAME"):
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    return jax.nn.relu(y * 1.01 + 0.01)  # folded BN affine


def dual_pool(x, pool):
    w = (1, pool[0], pool[1], 1)
    a = jax.lax.reduce_window(x, jnp.bfloat16(0), jax.lax.add, w, w, "VALID")
    m = jax.lax.reduce_window(x, jnp.bfloat16(-np.inf), jax.lax.max, w, w,
                              "VALID")
    return a / (pool[0] * pool[1]) + m


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    print(f"device: {dev}, B={b}")

    from texttoaudiogrounding_tpu.ops.frontend import (
        cnn8rnn_mel_config, log_mel_spectrogram)
    cfg = cnn8rnn_mel_config(32000)

    wav = jax.random.normal(rng, (b, 320000), jnp.float32) * 0.1
    T = 1001

    # --- frontend (pallas, serving default) ---
    @jax.jit
    def f_frontend(w, c):
        out = log_mel_spectrogram(w + c, cfg, compute_dtype=jnp.bfloat16)
        return out, out[0, 0, 0] * 0.0
    ms = timeit(f_frontend, (wav,))
    print(f"frontend(pallas bf16): {ms:7.2f} ms")

    @jax.jit
    def f_frontend_xla(w, c):
        out = log_mel_spectrogram(w + c, cfg, use_pallas=False,
                                  compute_dtype=jnp.bfloat16)
        return out, out[0, 0, 0] * 0.0
    ms = timeit(f_frontend_xla, (wav,))
    print(f"frontend(xla f32):     {ms:7.2f} ms")

    # --- conv blocks, bf16, NHWC, folded BN ---
    shapes = [
        ("block1", (b, T, 64, 1), 64, (2, 2)),
        ("block2", (b, T // 2, 32, 64), 128, (2, 2)),
        ("block3", (b, T // 4, 16, 128), 256, (1, 2)),
        ("block4", (b, T // 4, 8, 256), 512, (1, 2)),
    ]
    tot = 0.0
    for name, shp, cout, pool in shapes:
        x = jax.random.normal(rng, shp, jnp.bfloat16)
        k1 = jax.random.normal(rng, (3, 3, shp[-1], cout),
                               jnp.bfloat16) * 0.05
        k2 = jax.random.normal(rng, (3, 3, cout, cout), jnp.bfloat16) * 0.05

        def blk(x, k1, k2, c, _pool=pool):
            y = conv_bn_relu(x + c.astype(jnp.bfloat16), k1)
            y = conv_bn_relu(y, k2)
            y = dual_pool(y, _pool)
            return y, (y[0, 0, 0, 0] * 0).astype(jnp.float32)
        ms = timeit(jax.jit(blk), (x, k1, k2))
        # logical flops for the two convs
        h, w = shp[1], shp[2]
        fl = 2 * 9 * h * w * (shp[-1] * cout + cout * cout) * b
        print(f"{name}: {ms:7.2f} ms   ({fl / ms / 1e9:6.1f} TFLOP/s, "
              f"{fl / 1e9 / b:5.2f} GFLOP/clip)")
        tot += ms

    # --- mean over mel + fc1 ---
    x = jax.random.normal(rng, (b, T // 4, 8, 512), jnp.bfloat16)
    k = jax.random.normal(rng, (512, 512), jnp.bfloat16) * 0.05

    @jax.jit
    def f_fc(x, k, c):
        y = jnp.mean(x + c.astype(jnp.bfloat16), axis=2)
        y = jax.nn.relu(y @ k)
        return y, (y[0, 0, 0] * 0).astype(jnp.float32)
    ms = timeit(f_fc, (x, k))
    print(f"mean+fc1: {ms:7.2f} ms")

    # --- BiGRU (f32, as in model) ---
    from texttoaudiogrounding_tpu.models.layers import BiGRU
    gx = jax.random.normal(rng, (b, T // 4, 512), jnp.float32)
    gru = BiGRU(256)
    gvars = gru.init(rng, gx)

    @jax.jit
    def f_gru(v, x, c):
        y = gru.apply(v, x + c)
        return y, y[0, 0, 0] * 0.0
    ms = timeit(f_gru, (gvars, gx))
    print(f"BiGRU(f32): {ms:7.2f} ms")

    # --- full model for reference ---
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_batch, _flagship_model
    model = _flagship_model(serving=True)
    batch = _example_batch(batch_size=b)
    variables = model.init({"params": rng}, batch, train=False)
    jb = jax.device_put(batch)

    @jax.jit
    def f_full(v, bt, c):
        bb = dict(bt)
        bb["waveform"] = bb["waveform"] + c
        out = model.apply(v, bb, train=False)
        return out["frame_sim"], out["frame_sim"][0, 0] * 0.0
    ms = timeit(f_full, (variables, jb))
    print(f"FULL model: {ms:7.2f} ms  -> {b / ms * 1000:.0f} clips/s")


if __name__ == "__main__":
    main()
