"""Probe: Pallas custom-VJP relu+dual-pool vs XLA at the block shapes.

Round-3 closure (scripts/probe_pool_bwd.py): every XLA *form* of the
non-overlapping dual pool loses to reduce_window/SelectAndScatter —
but a fused Pallas kernel that recomputes window masks in-register
(ops/pallas/dual_pool.py) was never measured.  It reads x and g once
and writes dx once (the HBM floor), where SelectAndScatter re-walks
the full-resolution activation.

Usage (real chip, from /root/repo):
  nohup python scripts/probe_pool_vjp.py > /tmp/pool_vjp.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import flax.linen as nn

from texttoaudiogrounding_tpu.ops.pallas.dual_pool import dual_pool_relu


def pool_rw(x, ph, pw):
    h = nn.relu(x)
    return (nn.avg_pool(h, (ph, pw), strides=(ph, pw))
            + nn.max_pool(h, (ph, pw), strides=(ph, pw)))


# (name, T, M, C, ph, pw): pool INPUT geometry at B=128 training
SHAPES = [
    ("block1", 1001, 64, 64, 2, 2),
    ("block2", 500, 32, 128, 2, 2),
    ("block3", 250, 16, 256, 1, 2),
    ("block4", 250, 8, 512, 1, 2),
]


def measure(fn, x):
    g = jax.jit(jax.grad(fn))

    def chained(x, carry):
        return carry + jnp.sum(g(x).astype(jnp.float32)) * 1e-6
    cj = jax.jit(chained)
    carry = cj(x, jnp.float32(0.0)); float(carry)
    iters = 20
    ms = 0.0
    for _ in range(2):
        t0 = time.time()
        carry = jnp.float32(0.0)
        for _ in range(iters):
            carry = cj(x, carry)
        float(carry)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"B={b} {dtype.__name__} fwd+bwd relu->dual-pool, chained",
          flush=True)

    for name, t, m, c, ph, pw in SHAPES:
        x = jax.random.normal(key, (b, t, m, c), jnp.float32)

        def loss_xla(x):
            y = pool_rw(x.astype(dtype), ph, pw)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        def loss_pl(x):
            y = dual_pool_relu(x.astype(dtype), (ph, pw))
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        # parity spot-check on-device (tiny slice via same kernel path)
        ms_a = measure(loss_xla, x)
        try:
            ms_d = measure(loss_pl, x)
            ga = jax.jit(jax.grad(loss_xla))(x)
            gd = jax.jit(jax.grad(loss_pl))(x)
            err = float(jnp.max(jnp.abs(ga - gd)))
        except Exception as e:  # noqa: BLE001
            ms_d, err = float("nan"), float("nan")
            print(f"  {name} pallas failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        print(f"{name} [{t},{m},{c}] pool({ph},{pw}) "
              f"XLA {ms_a:7.2f}  pallas {ms_d:7.2f} ms  "
              f"grad maxdiff {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
