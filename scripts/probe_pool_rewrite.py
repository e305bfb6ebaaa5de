"""Dual avg+max 2x2 pool: reduce_window (2 passes) vs strided-slice
formulation XLA can fuse into one pass over the input.
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


def main():
    b = 128
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (b, 1000, 64, 64), jnp.bfloat16)

    def s(y):
        return jnp.sum(y[0, 0, 0]).astype(jnp.float32)

    def rw(x, c):
        x = x + c.astype(x.dtype)
        w = (1, 2, 2, 1)
        a = jax.lax.reduce_window(x, jnp.bfloat16(0), jax.lax.add, w, w,
                                  "VALID")
        m = jax.lax.reduce_window(x, jnp.bfloat16(-np.inf), jax.lax.max, w,
                                  w, "VALID")
        y = a / 4 + m
        return y, s(y)

    def sliced(x, c):
        x = x + c.astype(x.dtype)
        a = x[:, 0::2, 0::2]
        bb = x[:, 0::2, 1::2]
        cc = x[:, 1::2, 0::2]
        d = x[:, 1::2, 1::2]
        y = ((a + bb + cc + d) / 4
             + jnp.maximum(jnp.maximum(a, bb), jnp.maximum(cc, d)))
        return y, s(y)

    def reshaped(x, c):
        x = x + c.astype(x.dtype)
        v = x.reshape(b, 500, 2, 32, 2, 64)
        y = (jnp.mean(v, axis=(2, 4)) + jnp.max(jnp.max(v, 2), 3))
        return y, s(y)

    for name, f in [("reduce_window x2", rw), ("strided slices", sliced),
                    ("reshape mean/max", reshaped)]:
        ms = timeit(jax.jit(f), (x0,))
        print(f"{name:17s}: {ms:6.2f} ms")
    # parity
    y1 = rw(x0, jnp.float32(0))[0]
    y2 = sliced(x0, jnp.float32(0))[0]
    y3 = reshaped(x0, jnp.float32(0))[0]
    print("max|d| sliced", float(jnp.max(jnp.abs(y1 - y2))),
          "reshaped", float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                            - y3.astype(jnp.float32)))))


# The old bench_pallas() tail benched a forward-only dual_pool_2x2 kernel
# that the round-4 dual_pool.py rewrite (relu+pool custom-VJP, see
# probe_pool_vjp.py / probe_pool_chain.py) superseded and removed.

if __name__ == "__main__":
    main()
