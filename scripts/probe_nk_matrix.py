"""Sustained chained-dot rate per (K, N) tile — the design matrix for
the int8-resident trunk kernels.

Each cell: NDOT acc-chained dots lhs=[ROWS,K] (static shifted slices of
a halo'd src scratch, modeling no-staging conv taps), rhs=[K,N] slices
of a resident weight ref; per-step work held ~constant (~1 GOP) by
scaling NDOT.  Rates include the out-store amortized over that work —
i.e. realistic kernel-loop numbers, not bare-dot peaks.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1664
ITERS = 2048
TARGET_OPS = 1.0e9


def _kernel(x_ref, w_ref, out_ref, src_ref, *, K, N, ndot, quantize):
    j = pl.program_id(0)
    acc_dtype = jnp.int32 if quantize else jnp.float32

    @pl.when(j == 0)
    def _():
        src_ref[...] = x_ref[...]

    acc = jnp.zeros((ROWS, N), acc_dtype)
    for d in range(ndot):
        off = d % 3  # static shifted slices like real conv taps
        acc = acc + jax.lax.dot_general(
            src_ref[off:off + ROWS], w_ref[d * K:(d + 1) * K],
            (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype)
    out_ref[...] = acc.astype(out_ref.dtype)


def build(K, N, ndot, quantize):
    dt = jnp.int8 if quantize else jnp.bfloat16
    kern = functools.partial(_kernel, K=K, N=N, ndot=ndot,
                             quantize=quantize)
    return pl.pallas_call(
        kern,
        grid=(ITERS,),
        in_specs=[
            pl.BlockSpec((ROWS + 8, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ndot * K, N), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, N), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (ROWS, N), jnp.int32 if quantize else jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS + 8, K), dt)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    rng = jax.random.PRNGKey(0)
    for quantize in (True, False):
        tag = "int8" if quantize else "bf16"
        for K in (128, 256, 384):
            for N in (128, 256, 512):
                unit = 2 * ROWS * K * N
                ndot = max(3, int(round(TARGET_OPS / unit / 3)) * 3)
                dt = jnp.int8 if quantize else jnp.bfloat16
                if quantize:
                    x = jax.random.randint(rng, (ROWS + 8, K), -127, 127,
                                           jnp.int8)
                    w = jax.random.randint(rng, (ndot * K, N), -127, 127,
                                           jnp.int8)
                else:
                    x = jax.random.normal(rng, (ROWS + 8, K), dt)
                    w = jax.random.normal(rng, (ndot * K, N), dt)
                tops = unit * ndot / 1e12
                try:
                    fn = jax.jit(build(K, N, ndot, quantize))
                    out = fn(x, w)
                    out.block_until_ready()
                    float(jnp.sum(out.astype(jnp.float32)))
                    t0 = time.time()
                    reps = 4
                    for _ in range(reps):
                        out = fn(x, w)
                    float(jnp.sum(out.astype(jnp.float32)))
                    us = (time.time() - t0) / reps / ITERS * 1e6
                    print(f"{tag} K={K:3d} N={N:3d} ndot={ndot:2d}: "
                          f"{us:7.2f} us/step ({tops / (us / 1e6):6.1f} "
                          f"TOP/s)")
                except Exception as e:  # noqa: BLE001
                    print(f"{tag} K={K:3d} N={N:3d}: FAILED "
                          f"{type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
