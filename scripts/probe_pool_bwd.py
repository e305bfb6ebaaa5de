"""Probe: dual-pool (avg+max) BACKWARD cost at the conv-block shapes.

Hypothesis (round-3 fifth session): the training wall in block1
(44.5 ms fwd+bwd of the 140 ms step, scripts/profile_train_stages.py)
is partly XLA's max-pool gradient — ``reduce_window(max)`` differentiates
into a SelectAndScatter over the full-resolution activation
([B,1001,64,64] f32 = 1 GB at B=128), which TPUs execute poorly.

For non-overlapping windows (stride == window, the only case the
reference uses — models/panns.py:53-57) the pool is equivalent to a
reshape + max/mean over the window axes, whose VJP is an elementwise
argmax-one-hot scatter (exact torch first-argmax semantics) — no
SelectAndScatter.  This probe times fwd+bwd of conv→BN→ReLU→pool at
each block's geometry under:

  A. reduce_window fwd + reduce_window bwd (today's nn.avg/max_pool)
  B. reshape-pool fwd + reshape bwd
  C. custom_vjp: reduce_window fwd, reshape argmax-one-hot bwd

Usage (real chip, from /root/repo):
  nohup python scripts/probe_pool_bwd.py > /tmp/pool_bwd.log 2>&1 &
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import flax.linen as nn


def pool_rw(x, ph, pw):
    return (nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            + nn.max_pool(x, (ph, pw), strides=(ph, pw)))


def pool_reshape(x, ph, pw):
    b, t, m, c = x.shape
    t2, m2 = t // ph, m // pw
    xr = x[:, :t2 * ph, :m2 * pw].reshape(b, t2, ph, m2, pw, c)
    return jnp.mean(xr, axis=(2, 4)) + jnp.max(xr, axis=(2, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pool_hybrid(x, ph, pw):
    return pool_rw(x, ph, pw)


def _pool_hybrid_fwd(x, ph, pw):
    return pool_rw(x, ph, pw), x


def _pool_hybrid_bwd(ph, pw, x, g):
    b, t, m, c = x.shape
    t2, m2 = t // ph, m // pw
    k = ph * pw
    xr = x[:, :t2 * ph, :m2 * pw].reshape(b, t2, ph, m2, pw, c)
    xw = jnp.moveaxis(xr, (2, 4), (4, 5)).reshape(b, t2, m2, c, k)
    onehot = jax.nn.one_hot(jnp.argmax(xw, axis=-1), k, dtype=g.dtype)
    gw = g[..., None] * (onehot + 1.0 / k)
    gr = jnp.moveaxis(gw.reshape(b, t2, m2, c, ph, pw), (4, 5), (2, 4))
    gx = gr.reshape(b, t2 * ph, m2 * pw, c)
    if t2 * ph != t or m2 * pw != m:
        gx = jnp.pad(gx, ((0, 0), (0, t - t2 * ph), (0, m - m2 * pw),
                          (0, 0)))
    return (gx,)


pool_hybrid.defvjp(_pool_hybrid_fwd, _pool_hybrid_bwd)

POOLS = {"A_reduce_window": pool_rw, "B_reshape": pool_reshape,
         "C_hybrid_vjp": pool_hybrid}

# (name, T, M, Cin, Cout, ph, pw) at B=128 training geometry
SHAPES = [
    ("block1", 1001, 64, 64, 64, 2, 2),
    ("block2", 500, 32, 64, 128, 2, 2),
    ("block3", 250, 16, 128, 256, 1, 2),
    ("block4", 250, 8, 256, 512, 1, 2),
]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"B={b} dtype={dtype.__name__} fwd+bwd of relu(x)->pool, "
          f"chained timing", flush=True)

    for name, t, m, cin, cout, ph, pw in SHAPES:
        x = jax.random.normal(key, (b, t, m, cout), jnp.float32)
        for pname, pfn in POOLS.items():
            def loss(x):
                h = nn.relu(x.astype(dtype))
                y = pfn(h, ph, pw)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
            g = jax.jit(jax.grad(loss))

            def chained(x, carry):
                return carry + jnp.sum(g(x).astype(jnp.float32)) * 1e-6
            cj = jax.jit(chained)
            carry = cj(x, jnp.float32(0.0)); float(carry)
            iters = 20
            for _ in range(2):
                t0 = time.time()
                carry = jnp.float32(0.0)
                for _ in range(iters):
                    carry = cj(x, carry)
                float(carry)
                ms = (time.time() - t0) / iters * 1000.0
            print(f"{name} [{t},{m},{cout}] pool({ph},{pw}) "
                  f"{pname:>16}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
