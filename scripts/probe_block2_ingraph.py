"""In-graph marginal of pair-kernel block2 vs XLA block2 (real chip).

Times jitted block1(XLA) -> block2(variant) graphs so any layout
transitions at the kernel boundary are included.
"""

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


def conv_bn_relu(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    return jax.nn.relu(y * 1.01 + 0.01)


def dual_pool(x, pool):
    w = (1, pool[0], pool[1], 1)
    a = jax.lax.reduce_window(x, jnp.bfloat16(0), jax.lax.add, w, w, "VALID")
    m = jax.lax.reduce_window(x, jnp.bfloat16(-np.inf), jax.lax.max, w, w,
                              "VALID")
    return a / (pool[0] * pool[1]) + m


def main():
    b = 128
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (b, 1000, 64, 1), jnp.bfloat16) * 0.1
    k11 = jax.random.normal(rng, (3, 3, 1, 64), jnp.bfloat16) * 0.05
    k12 = jax.random.normal(rng, (3, 3, 64, 64), jnp.bfloat16) * 0.05
    w1 = jax.random.normal(rng, (3, 3, 64, 128), jnp.float32) * 0.05
    w2 = jax.random.normal(rng, (3, 3, 128, 128), jnp.float32) * 0.05
    ab = (jnp.ones((128,), jnp.float32), jnp.zeros((128,), jnp.float32))

    def block1(x):
        x = conv_bn_relu(x, k11)
        x = conv_bn_relu(x, k12)
        return dual_pool(x, (2, 2))

    def b1_only(x, c):
        y = block1(x + c.astype(x.dtype))
        return y, jnp.sum(y[0, 0, 0]).astype(jnp.float32)

    def b12_xla(x, c):
        y = block1(x + c.astype(x.dtype))
        y = conv_bn_relu(y, w1.astype(jnp.bfloat16))
        y = conv_bn_relu(y, w2.astype(jnp.bfloat16))
        y = dual_pool(y, (2, 2))
        return y, jnp.sum(y[0, 0, 0]).astype(jnp.float32)

    def mk_pair(quant):
        def f(x, c):
            y = block1(x + c.astype(x.dtype))
            y = fused_block2_pair(y, w1, ab, w2, ab, quantize=quant)
            return y, jnp.sum(y[0, 0, 0]).astype(jnp.float32)
        return f

    base = timeit(jax.jit(b1_only), (x0,))
    print(f"block1 only      : {base:6.2f} ms")
    for name, f in [("b1+b2 XLA", b12_xla),
                    ("b1+b2 pair bf16", mk_pair(False)),
                    ("b1+b2 pair int8", mk_pair(True))]:
        ms = timeit(jax.jit(f), (x0,))
        print(f"{name:17s}: {ms:6.2f} ms   marginal {ms - base:6.2f}")


if __name__ == "__main__":
    main()
