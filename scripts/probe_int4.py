"""Does the v5e MXU double-pump int4?  Chained-dot rates (same harness
as probe_nk_matrix.py) for int8 vs int4x4 vs int4x8 operands at the
block3/4 tile shapes.  If int4 sustains ~2x the int8 rate, the trunk's
blocks 3-4 (at their measured int8 ceiling) have one more gear:
weights-int4 (per-channel scales) or full int4.
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


def _kernel(x_ref, w_ref, out_ref, src_ref, *, K, N, ndot):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        src_ref[...] = x_ref[...]

    acc = jnp.zeros((ROWS, N), jnp.int32)
    for d in range(ndot):
        off = d % 3
        acc = acc + jax.lax.dot_general(
            src_ref[off:off + ROWS], w_ref[d * K:(d + 1) * K],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out_ref[...] = acc


def build(K, N, ndot, xdt, wdt):
    kern = functools.partial(_kernel, K=K, N=N, ndot=ndot)
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
        out_shape=jax.ShapeDtypeStruct((ROWS, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ROWS + 8, K), xdt)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    rng = jax.random.PRNGKey(0)
    cases = [("int8x8", jnp.int8, jnp.int8),
             ("int4x4", jnp.int4, jnp.int4),
             ("int8x4", jnp.int8, jnp.int4)]
    for tag, xdt, wdt in cases:
        for K in (128, 256, 512):
            for N in (256, 512):
                unit = 2 * ROWS * K * N
                ndot = max(3, int(round(TARGET_OPS / unit / 3)) * 3)
                x8 = jax.random.randint(rng, (ROWS + 8, K), -7, 7,
                                        jnp.int8)
                w8 = jax.random.randint(rng, (ndot * K, N), -7, 7,
                                        jnp.int8)
                x = x8.astype(xdt)
                w = w8.astype(wdt)
                tops = unit * ndot / 1e12
                try:
                    fn = jax.jit(build(K, N, ndot, xdt, wdt))
                    out = fn(x, w)
                    float(jnp.sum(out.astype(jnp.float32)))
                    t0 = time.time()
                    reps = 4
                    for _ in range(reps):
                        out = fn(x, w)
                    float(jnp.sum(out.astype(jnp.float32)))
                    us = (time.time() - t0) / reps / ITERS * 1e6
                    print(f"{tag} K={K:3d} N={N:3d} ndot={ndot:2d}: "
                          f"{us:7.2f} us/step ({tops / (us / 1e6):6.1f} "
                          f"TOP/s)", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{tag} K={K:3d} N={N:3d}: FAILED "
                          f"{type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
