"""Probe: conv→BN(train)→relu→dual-pool fwd+bwd, XLA vs Pallas pool VJP.

The standalone relu→pool kernel beats XLA at blocks 2-3
(probe_pool_vjp.py: 8.94 vs 11.25 / 5.54 vs 7.02 ms) but the full
train step got SLOWER (155 vs 138 ms) — this probe quantifies the
fusion tax the custom_vjp boundary adds around BN(train).

Usage: nohup python scripts/probe_pool_chain.py > /tmp/pool_chain.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp


class Chain(nn.Module):
    cout: int
    pool: tuple
    use_kernel: bool

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.cout, (3, 3), use_bias=False,
                    padding="SAME", dtype=jnp.bfloat16)(x)
        x = nn.BatchNorm(use_running_average=False, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.bfloat16)(x)
        if self.use_kernel:
            from texttoaudiogrounding_tpu.ops.pallas.dual_pool import (
                dual_pool_relu)
            return dual_pool_relu(x, self.pool)
        h = nn.relu(x)
        return (nn.avg_pool(h, self.pool, strides=self.pool)
                + nn.max_pool(h, self.pool, strides=self.pool))


# (name, T, M, Cin, Cout, pool) — conv INPUT geometry at B=128
SHAPES = [
    ("block2", 500, 32, 64, 128, (2, 2)),
    ("block3", 250, 16, 128, 256, (1, 2)),
    ("block4", 250, 8, 256, 512, (1, 2)),
]


def main():
    b = 128
    key = jax.random.PRNGKey(0)
    for name, t, m, cin, cout, pool in SHAPES:
        x = jax.random.normal(key, (b, t, m, cin), jnp.bfloat16)
        for use_kernel in (False, True):
            model = Chain(cout, pool, use_kernel)
            v = model.init(jax.random.PRNGKey(1), x)

            def loss(params, x):
                y, _ = model.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    x, mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

            g = jax.jit(jax.grad(loss, argnums=(0, 1)))

            def chained(params, x, carry):
                gp, gx = g(params, x)
                return carry + jnp.sum(gx.astype(jnp.float32)) * 1e-9
            cj = jax.jit(chained)
            carry = cj(v["params"], x, jnp.float32(0.0)); float(carry)
            iters = 20
            ms = 0.0
            for _ in range(2):
                t0 = time.time()
                carry = jnp.float32(0.0)
                for _ in range(iters):
                    carry = cj(v["params"], x, carry)
                float(carry)
                ms = (time.time() - t0) / iters * 1000.0
            tag = "pallas" if use_kernel else "xla   "
            print(f"{name} conv+bn+relu+pool fwd+bwd {tag}: {ms:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
