"""Probe: int8 conv throughput vs bf16 on this chip (XLA path).

Tests block4-shaped convs ([B,250,8,256]->512) and block2-shaped
([B,500,32,64]->128) with int8 inputs/weights, int32 accumulation.
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
    t0 = time.time()
    for _ in range(iters):
        out, carry = fn(*args, carry)
    float(carry)
    return (time.time() - t0) / iters * 1000.0


def conv(x, k, ptype):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=ptype)


def main():
    b = 128
    rng = jax.random.PRNGKey(0)
    cases = [
        ("block2-ish", (b, 500, 32, 64), 128),
        ("block3-ish", (b, 250, 16, 128), 256),
        ("block4-ish", (b, 250, 8, 256), 512),
    ]
    for name, shp, cout in cases:
        fl = 2 * 9 * shp[1] * shp[2] * shp[3] * cout * b

        xb = jax.random.normal(rng, shp, jnp.bfloat16)
        kb = jax.random.normal(rng, (3, 3, shp[-1], cout), jnp.bfloat16) * .05

        @jax.jit
        def f_bf16(x, k, c):
            y = conv(x + c.astype(jnp.bfloat16), k, jnp.bfloat16)
            return y, (y[0, 0, 0, 0] * 0).astype(jnp.float32)
        ms = timeit(f_bf16, (xb, kb))
        print(f"{name} bf16: {ms:6.2f} ms ({fl/ms/1e9:6.1f} TOP/s)")

        xi = jax.random.randint(rng, shp, -127, 127, jnp.int8)
        ki = jax.random.randint(rng, (3, 3, shp[-1], cout), -127, 127,
                                jnp.int8)

        @jax.jit
        def f_int8(x, k, c):
            xs = (x.astype(jnp.int32) + c.astype(jnp.int32)).astype(jnp.int8)
            y = conv(xs, k, jnp.int32)
            return y, (y[0, 0, 0, 0] * 0).astype(jnp.float32)
        ms = timeit(f_int8, (xi, ki))
        print(f"{name} int8: {ms:6.2f} ms ({fl/ms/1e9:6.1f} TOP/s)")

        # int8 data, bf16 conv-with-dequant-inside (scale folding):
        @jax.jit
        def f_mixed(x, k, c):
            xf = x.astype(jnp.bfloat16) + c.astype(jnp.bfloat16)
            kf = k.astype(jnp.bfloat16)
            y = conv(xf, kf, jnp.bfloat16)
            return y, (y[0, 0, 0, 0] * 0).astype(jnp.float32)
        ms = timeit(f_mixed, (xi, ki))
        print(f"{name} i8->bf16 conv: {ms:6.2f} ms ({fl/ms/1e9:6.1f} TOP/s)")

    # pure dot comparison: [M,K]x[K,N] big matmul int8 vs bf16
    m, kk, n = 8192, 2304, 512
    fl = 2 * m * kk * n
    a = jax.random.normal(rng, (m, kk), jnp.bfloat16)
    w = jax.random.normal(rng, (kk, n), jnp.bfloat16)

    @jax.jit
    def d_bf16(a, w, c):
        y = (a + c.astype(jnp.bfloat16)) @ w
        return y, (y[0, 0] * 0).astype(jnp.float32)
    ms = timeit(d_bf16, (a, w), iters=100)
    print(f"dot bf16: {ms:6.3f} ms ({fl/ms/1e9:6.1f} TOP/s)")

    ai = jax.random.randint(rng, (m, kk), -127, 127, jnp.int8)
    wi = jax.random.randint(rng, (kk, n), -127, 127, jnp.int8)

    @jax.jit
    def d_int8(a, w, c):
        aa = (a.astype(jnp.int32) + c.astype(jnp.int32)).astype(jnp.int8)
        y = jax.lax.dot_general(aa, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y, (y[0, 0] * 0).astype(jnp.float32)
    ms = timeit(d_int8, (ai, wi), iters=100)
    print(f"dot int8: {ms:6.3f} ms ({fl/ms/1e9:6.1f} TOP/s)")


if __name__ == "__main__":
    main()
