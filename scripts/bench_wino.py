"""Winograd fused-block kernel vs direct9 vs XLA (real chip).

NOTE the shapes are a pool-(2,2) ANALOG of blocks 3-4, not the flagship's
actual geometry: Cnn8Rnn pools blocks 3-4 with (1, 2) (output must stay
40 ms/frame, models/audio_encoder.py:111-114), and the wino kernel only
supports (2, 2) — so ``TTG_WINO=1`` never routes in the flagship, and
e2e bench deltas under that flag are noise.  Measured here 2026-08-18
(B=128): block3 wino int8 15.0 ms vs direct9 5.2; block4 9.6 vs 4.3 —
the plane transforms do not overlap the MXU dots; wino is a closed dead
end on v5e (STATUS.md).

  block3-analog: [B, 250, 16, 128] -> [B, 125, 8, 256]
  block4-analog: [B, 125,  8, 256] -> [B,  62, 4, 512]

Usage: python scripts/bench_wino.py [B]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, args, iters=20):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            out, carry = fn(*args, carry)
        float(carry)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def xla_bf16_ref(x, w1, ab1, w2, ab2, pool=(2, 2)):
    """Whole-block XLA reference with bf16 conv passes (f32 BN/pool)."""

    def conv(x, w, a, b):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y * a + b, 0.0)

    y = conv(x, w1, *ab1)
    y = conv(y, w2, *ab2)
    win = (1, pool[0], pool[1], 1)
    t2 = y.shape[1] // pool[0] * pool[0]
    y = y[:, :t2]
    avg = jax.lax.reduce_window(y, 0.0, jax.lax.add, win, win,
                                "VALID") / (pool[0] * pool[1])
    mx = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, win, win, "VALID")
    return avg + mx


def main():
    from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
        fused_double_conv_pool,
    )
    from texttoaudiogrounding_tpu.ops.pallas.conv_block_wino import (
        fused_block_wino,
    )
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = jax.random.PRNGKey(0)

    for name, t, m, cin, cout in (("block3", 250, 16, 128, 256),
                                  ("block4", 125, 8, 256, 512)):
        ks = jax.random.split(jax.random.fold_in(rng, cout), 4)
        x = jax.random.normal(ks[0], (b, t, m, cin), jnp.float32) * 0.1
        w1 = jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.05
        w2 = jax.random.normal(ks[2], (3, 3, cout, cout)) * 0.02
        ab1 = (jnp.ones((cout,)), jnp.zeros((cout,)) + 0.01)
        ab2 = (jnp.ones((cout,)), jnp.zeros((cout,)) + 0.01)
        xb = x.astype(jnp.bfloat16)

        variants = {
            "xla bf16": lambda xx, c: xla_bf16_ref(
                xx + c, w1.astype(jnp.bfloat16), ab1,
                w2.astype(jnp.bfloat16), ab2),
            "direct9 int8": lambda xx, c: fused_double_conv_pool(
                xx + c, w1, ab1, w2, ab2, (2, 2), quantize=True),
            "direct9 bf16": lambda xx, c: fused_double_conv_pool(
                xx + c, w1, ab1, w2, ab2, (2, 2), quantize=False),
            "wino int8": lambda xx, c: fused_block_wino(
                xx + c, w1, ab1, w2, ab2, quantize=True),
            "wino bf16": lambda xx, c: fused_block_wino(
                xx + c, w1, ab1, w2, ab2, quantize=False),
        }
        ref = None
        for vname, fn in variants.items():
            def stepped(xx, c, fn=fn):
                y = fn(xx, c)
                return y, jnp.sum(y[0, 0].astype(jnp.float32)) * 1e-6

            try:
                ms = timeit(jax.jit(stepped), (xb,))
                y = jax.jit(lambda xx: fn(xx, 0.0))(xb)
                yf = jnp.asarray(y, jnp.float32).reshape(-1)
                if ref is None:
                    ref = yf
                    rel = 0.0
                else:
                    rel = float(jnp.sqrt(jnp.mean((yf - ref) ** 2))
                                / jnp.sqrt(jnp.mean(ref ** 2)))
                print(f"{name} {vname:13s}: {ms:7.2f} ms   "
                      f"rel-rms vs xla {rel:.4f}", flush=True)
            except Exception as exc:  # noqa: BLE001 - report and move on
                print(f"{name} {vname:13s}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
