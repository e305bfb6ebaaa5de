"""Variadic (multi-operand) reduce_window: avg+max dual pool in ONE pass.

The PANNs 'avg+max' pool (reference models/panns.py:47-56) is today two
reduce_window passes over the conv output (2x read traffic).  XLA HLO
supports variadic reduce_window; if it lowers well on TPU, the fused
pass halves pool read traffic at every block (serving block1 + all
training forwards).

Measures, per block shape: 2-pass baseline, variadic 1-pass, and the
in-graph marginal after a conv (what serving actually sees).
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


def dual_pool_2pass(x, pool):
    w = (1, pool[0], pool[1], 1)
    a = jax.lax.reduce_window(x, jnp.asarray(0, x.dtype), jax.lax.add,
                              w, w, "VALID")
    m = jax.lax.reduce_window(x, jnp.asarray(-np.inf, x.dtype), jax.lax.max,
                              w, w, "VALID")
    return a / (pool[0] * pool[1]) + m


def dual_pool_variadic(x, pool):
    w = (1, pool[0], pool[1], 1)

    def comp(a, b):
        (s1, m1), (s2, m2) = a, b
        return (s1 + s2, jnp.maximum(m1, m2))

    s, m = jax.lax.reduce_window(
        (x, x), (jnp.asarray(0, x.dtype), jnp.asarray(-np.inf, x.dtype)),
        comp, w, w, "VALID")
    return s / (pool[0] * pool[1]) + m


def conv_bn_relu(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return jax.nn.relu(y * 1.01 + 0.01)


def main():
    b = 128
    rng = jax.random.PRNGKey(0)
    # (T, M, C, pool) per block at serving shapes (B=128, 10 s)
    shapes = [
        ("block1", 1000, 64, 64, (2, 2)),
        ("block2", 500, 32, 128, (2, 2)),
        ("block3", 250, 16, 256, (1, 2)),
        ("block4", 250, 8, 512, (1, 2)),
    ]
    for name, t, m, c, pool in shapes:
        x0 = jax.random.normal(rng, (b, t, m, c), jnp.bfloat16) * 0.1
        k = jax.random.normal(rng, (3, 3, c, c), jnp.bfloat16) * 0.05

        def s(y):
            return jnp.sum(y[0, 0, 0]).astype(jnp.float32)

        def f2(x, carry):
            y = dual_pool_2pass(x + carry.astype(x.dtype), pool)
            return y, s(y)

        def fv(x, carry):
            y = dual_pool_variadic(x + carry.astype(x.dtype), pool)
            return y, s(y)

        def g2(x, carry):
            y = conv_bn_relu(x + carry.astype(x.dtype), k)
            y = dual_pool_2pass(y, pool)
            return y, s(y)

        def gv(x, carry):
            y = conv_bn_relu(x + carry.astype(x.dtype), k)
            y = dual_pool_variadic(y, pool)
            return y, s(y)

        def gc(x, carry):
            y = conv_bn_relu(x + carry.astype(x.dtype), k)
            return y, s(y)

        # parity first
        ya = jax.jit(f2)(x0, jnp.float32(0.0))[0]
        yb = jax.jit(fv)(x0, jnp.float32(0.0))[0]
        d = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                  - yb.astype(jnp.float32))))
        t2 = timeit(jax.jit(f2), (x0,))
        tv = timeit(jax.jit(fv), (x0,))
        tg2 = timeit(jax.jit(g2), (x0,))
        tgv = timeit(jax.jit(gv), (x0,))
        tgc = timeit(jax.jit(gc), (x0,))
        print(f"{name}: pool 2-pass {t2:6.2f}  variadic {tv:6.2f} ms  "
              f"| conv+pool 2-pass {tg2:6.2f}  variadic {tgv:6.2f}  "
              f"(conv alone {tgc:6.2f}; marginal {tg2-tgc:5.2f} -> "
              f"{tgv-tgc:5.2f})  maxdiff {d:.2e}")


if __name__ == "__main__":
    main()
