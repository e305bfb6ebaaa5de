"""A/B the block1 pair kernel's triple-store vs single-store modes.

Round-5 serving attack (VERDICT r4 item 2): the pair kernel's ~5 ms
serialized VPU epilogue is dominated by the conv2 triple-store (~3.2 GB
of register->VMEM stores per batch).  ``mode="single"`` stores y1 once
per mel-pair block (halo layout) and runs conv2 as three acc-chained
K=4C=256 global-row-offset dots instead of one K=12C=768 dot — trading
~3x less store traffic for a lower int8 dot rate (157 vs 240 TOP/s at
these shapes, scripts/probe_nk_matrix.py).  This probe measures both
modes standalone at serving geometry AND end-to-end via bench.py-style
in-model timing.

Usage: python scripts/probe_block1_single.py [standalone|e2e]
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

    for mode in ("triple", "single"):
        for quant in (True, "conv1", False):
            @jax.jit
            def f(x, cr, mode=mode, quant=quant):
                out = fused_block1_pair(
                    x + cr.astype(x.dtype) * 1e-9, w1, ab1, w2, ab2,
                    quantize=quant, mode=mode)
                return out, jnp.sum(out[0, 0, 0].astype(jnp.float32))

            ms = timeit(f, (x,))
            tag = {True: "int8", False: "bf16", "conv1": "mix1"}[quant]
            print(f"block1-pair [{mode:6s} {tag}]: {ms:7.2f} ms "
                  f"({B * 1000 / ms:7.1f} clips/s standalone)",
                  flush=True)


if __name__ == "__main__":
    main()
