"""On-chip: parity-split pair kernel (conv_block_pair) vs XLA, block2."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.pallas.conv_block_pair import (
    fused_block2_pair)


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
    t, m, cin, cout = 500, 32, 64, 128
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, t, m, cin), jnp.bfloat16)
    w1 = jax.random.normal(rng, (3, 3, cin, cout), jnp.float32) * 0.05
    w2 = jax.random.normal(rng, (3, 3, cout, cout), jnp.float32) * 0.05
    ab = (jnp.ones((cout,), jnp.float32), jnp.zeros((cout,), jnp.float32))
    fl = (2 * 9 * t * m * cin * cout + 2 * 9 * t * m * cout * cout) * b

    def xla(x, c):
        y = x + c.astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            y, w1.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y * ab[0] + ab[1], 0.0).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            y, w2.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y * ab[0] + ab[1], 0.0)
        win = (1, 2, 2, 1)
        avg = jax.lax.reduce_window(y, 0.0, jax.lax.add, win, win,
                                    "VALID") / 4
        mx = jax.lax.reduce_window(y, -np.inf, jax.lax.max, win, win,
                                   "VALID")
        out = (avg + mx).astype(jnp.bfloat16)
        return out, jnp.sum(out[0, 0, 0]).astype(jnp.float32)

    ms = timeit(jax.jit(xla), (x,))
    print(f"XLA bf16          : {ms:6.2f} ms ({fl / ms / 1e9:6.1f} TFLOP/s)")

    for tc in (100, 250):
        for quant in (False, True):
            tag = "int8" if quant else "bf16"

            def fused(x, c, tc=tc, quant=quant):
                out = fused_block2_pair(
                    x + c.astype(x.dtype), w1, ab, w2, ab,
                    quantize=quant, tc=tc)
                return out, jnp.sum(out[0, 0, 0]).astype(jnp.float32)

            try:
                ms = timeit(jax.jit(fused), (x,))
                print(f"pair {tag} tc={tc:3d}: {ms:6.2f} ms "
                      f"({fl / ms / 1e9:6.1f} TFLOP/s)")
            except Exception as e:  # noqa: BLE001
                print(f"pair {tag} tc={tc:3d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
