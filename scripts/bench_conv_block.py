"""On-chip speed: fused Pallas conv block vs XLA, per Cnn8Rnn block."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
    fused_double_conv_pool)


def timeit(fn, args, iters=30):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    t0 = time.time()
    for _ in range(iters):
        out, carry = fn(*args, carry)
    float(carry)
    return (time.time() - t0) / iters * 1000.0


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = jax.random.PRNGKey(0)
    blocks = [
        ("block1", 1001, 64, 1, 64, (2, 2)),
        ("block2", 500, 32, 64, 128, (2, 2)),
        ("block3", 250, 16, 128, 256, (1, 2)),
        ("block4", 250, 8, 256, 512, (1, 2)),
    ]
    for name, t, m, cin, cout, pool in blocks:
        if cin == 1:
            print(f"{name}: skipped (handled separately)")
            continue
        x = jax.random.normal(rng, (b, t, m, cin), jnp.bfloat16)
        w1 = jax.random.normal(rng, (3, 3, cin, cout), jnp.float32) * 0.05
        w2 = jax.random.normal(rng, (3, 3, cout, cout), jnp.float32) * 0.05
        a = jnp.ones((cout,), jnp.float32)
        bb = jnp.zeros((cout,), jnp.float32)
        fl = 2 * 9 * t * m * cin * cout * b + 2 * 9 * t * m * cout * cout * b

        def xla(x, c):
            y = x + c.astype(jnp.bfloat16)
            for w in (w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)):
                y = jax.lax.conv_general_dilated(
                    y, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)
                y = jax.nn.relu(y)
            win = (1, pool[0], pool[1], 1)
            avg = jax.lax.reduce_window(y, jnp.bfloat16(0), jax.lax.add,
                                        win, win, "VALID")
            mx = jax.lax.reduce_window(y, jnp.bfloat16(-np.inf), jax.lax.max,
                                       win, win, "VALID")
            y = avg / (pool[0] * pool[1]) + mx
            return y, (y[0, 0, 0, 0] * 0).astype(jnp.float32)
        ms = timeit(jax.jit(xla), (x,))
        print(f"{name} XLA bf16 : {ms:6.2f} ms ({fl/ms/1e9:6.1f} TOP/s)")

        for quant in (False, True):
            def fused(x, c, _q=quant):
                y = fused_double_conv_pool(
                    x + c.astype(jnp.bfloat16), w1, (a, bb), w2, (a, bb),
                    pool, quantize=_q)
                return y, (y[0, 0, 0, 0] * 0).astype(jnp.float32)
            try:
                ms = timeit(jax.jit(fused), (x,))
                tag = "int8" if quant else "bf16"
                print(f"{name} FUSED {tag}: {ms:6.2f} ms "
                      f"({fl/ms/1e9:6.1f} TOP/s)")
            except Exception as e:
                print(f"{name} FUSED {'int8' if quant else 'bf16'}: "
                      f"FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
