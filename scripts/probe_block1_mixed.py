"""Stage bisect + tc sweep of the block1 pair kernel in MIXED mode.

Round-5e: quantize="conv1" (int8 conv1 dot -> bf16 conv2) measured
9.76 ms standalone vs 9.97 bf16 / 12.46 all-int8.  This probe bisects
where the mixed variant's time goes and whether a larger tc (the conv1
dot is row-starved at tc+2 = 50 rows; int8 made it cheaper per row)
shifts the chunk optimum.

Usage: python scripts/probe_block1_mixed.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.pallas.conv_block1_pair import (
    fused_block1_pair,
)

B, T, M, C = 128, 1001, 64, 64


def timeit(fn, args, iters=20):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    ms = 0.0
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            out, carry = fn(*args, carry)
        float(carry)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (B, T, M), jnp.float32)
    w1 = jax.random.normal(ks[1], (3, 3, 1, C), jnp.float32) * 0.3
    w2 = jax.random.normal(ks[2], (3, 3, C, C), jnp.float32) * 0.05
    ab1 = (jax.random.uniform(ks[3], (C,), jnp.float32, 0.5, 1.5),
           jax.random.normal(ks[4], (C,), jnp.float32) * 0.1)
    ab2 = (jax.random.uniform(ks[5], (C,), jnp.float32, 0.5, 1.5),
           jnp.zeros((C,), jnp.float32))

    for st in (1, 2, 3, 4):
        def f_k(x, cr, st=st):
            out = fused_block1_pair(
                x + cr.astype(x.dtype), w1, ab1, w2, ab2,
                quantize="conv1", tc=48, _stages=st)
            return out, jnp.sum(out[0, 0].astype(jnp.float32))

        try:
            ms = timeit(jax.jit(f_k), (x,))
            print(f"mix1 stage {st} tc=48      : {ms:6.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"mix1 stage {st}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    for tc in (32, 48, 64):
        def f_tc(x, cr, tc=tc):
            out = fused_block1_pair(
                x + cr.astype(x.dtype), w1, ab1, w2, ab2,
                quantize="conv1", tc=tc)
            return out, jnp.sum(out[0, 0].astype(jnp.float32))

        try:
            ms = timeit(jax.jit(f_tc), (x,))
            print(f"mix1 full tc={tc:<3d}        : {ms:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"mix1 tc={tc}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
