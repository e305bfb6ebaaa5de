"""BiGRU fwd and fwd+bwd time vs lax.scan unroll (real chip).

The training gap to the 900 clips/s bar is the f32 BiGRU backward
(STATUS.md); the per-step recurrent matmuls are [B,256]@[256,512] +
[B,256]@[256,256] — overhead-dominated, so unrolling amortizes the
while-loop plumbing without touching numerics.
"""

from __future__ import annotations

import os
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


def main():
    from texttoaudiogrounding_tpu.models.layers import BiGRU

    b, t, d = 128, 250, 512
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, t, d), jnp.float32) * 0.1

    for unroll in (1, 2, 4, 8, 16, 25):
        os.environ["TTG_GRU_UNROLL"] = str(unroll)
        gru = BiGRU(256)
        v = gru.init(rng, jnp.zeros((2, 4, d), jnp.float32))

        def fwd(x, c):
            y = gru.apply(v, x + c)
            return y, jnp.sum(y[0, 0]).astype(jnp.float32)

        def fwdbwd(x, c):
            def loss(xx):
                return jnp.sum(gru.apply(v, xx) ** 2)
            g = jax.grad(loss)(x + c)
            return g, jnp.sum(g[0, 0]).astype(jnp.float32)

        mf = timeit(jax.jit(fwd), (x,))
        mb = timeit(jax.jit(fwdbwd), (x,))
        print(f"unroll={unroll:2d}: fwd {mf:6.2f} ms   fwd+bwd {mb:6.2f} ms")


if __name__ == "__main__":
    main()
