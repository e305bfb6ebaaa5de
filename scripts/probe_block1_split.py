"""Block1 cost split under XLA: conv1 (Cin=1) vs conv2 (64->64) vs pool.

Informs whether a hybrid (XLA conv1 + pair-kernel conv2) can pay off.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


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
    k1 = jax.random.normal(rng, (3, 3, 1, 64), jnp.bfloat16) * 0.05
    k2 = jax.random.normal(rng, (3, 3, 64, 64), jnp.bfloat16) * 0.05

    def s(y):
        return jnp.sum(y[0, 0, 0]).astype(jnp.float32)

    def f_c1(x, c):
        y = conv_bn_relu(x + c.astype(x.dtype), k1)
        return y, s(y)

    def f_c12(x, c):
        y = conv_bn_relu(x + c.astype(x.dtype), k1)
        y = conv_bn_relu(y, k2)
        return y, s(y)

    def f_full(x, c):
        y = conv_bn_relu(x + c.astype(x.dtype), k1)
        y = conv_bn_relu(y, k2)
        y = dual_pool(y, (2, 2))
        return y, s(y)

    t1 = timeit(jax.jit(f_c1), (x0,))
    t12 = timeit(jax.jit(f_c12), (x0,))
    tf = timeit(jax.jit(f_full), (x0,))
    print(f"conv1 only         : {t1:6.2f} ms")
    print(f"conv1+conv2        : {t12:6.2f} ms  (conv2 marginal {t12-t1:6.2f})")
    print(f"full block (w/pool): {tf:6.2f} ms  (pool marginal {tf-t12:6.2f})")


if __name__ == "__main__":
    main()
