"""Blocks 3-4 int8 fused kernel: mel3 combo sweep (real chip).

direct9 int8 dots are K-starved (K=256 -> 157 TOP/s, K=128 -> 170);
mel3 im2col dots hit K=3C (384/768/1536 -> 237-278) but pay VPU
staging.  Measures every supported combo per block.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
    fused_double_conv_pool)


def timeit(fn, args, iters=30):
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


def main():
    b = 128
    rng = jax.random.PRNGKey(0)
    cases = [
        ("block3", 500, 16, 128, 256, (1, 2)),
        ("block4", 250, 8, 256, 512, (1, 2)),
    ]
    for name, t, m, cin, cout, pool in cases:
        x = jax.random.normal(rng, (b, t, m, cin), jnp.bfloat16)
        w1 = jax.random.normal(rng, (3, 3, cin, cout), jnp.float32) * 0.03
        w2 = jax.random.normal(rng, (3, 3, cout, cout), jnp.float32) * 0.03
        ab1 = (jnp.ones((cout,), jnp.float32),
               jnp.zeros((cout,), jnp.float32))
        ab2 = (jnp.ones((cout,), jnp.float32),
               jnp.zeros((cout,), jnp.float32))
        fl = (2 * 9 * t * m * cin * cout + 2 * 9 * t * m * cout * cout) * b
        for mel3 in [(False, False), (True, False), (True, True)]:
            def f(x, c, mel3=mel3):
                out = fused_double_conv_pool(
                    x + c.astype(x.dtype), w1, ab1, w2, ab2, pool,
                    quantize=True, mel3=mel3)
                return out, jnp.sum(out[0, 0, 0]).astype(jnp.float32)

            try:
                ms = timeit(jax.jit(f), (x,))
                print(f"{name} int8 mel3={mel3}: {ms:6.2f} ms "
                      f"({fl / ms / 1e9:6.1f} TOP/s-equiv)")
            except Exception as e:  # noqa: BLE001
                print(f"{name} int8 mel3={mel3}: FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
