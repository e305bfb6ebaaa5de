"""Do static sublane-offset slices as dot lhs avoid staging cost?

Blocks-1/2 frontier follow-up (STATUS round-3 campaign): misaligned DMA
is impossible (probe_dma_bisect/probe_dma_hbm), so the remaining design
is NO staging at all — keep the chunk input in a halo'd VMEM buffer
z[rows+2, 128] and compute the 3 time taps as 3 accumulated dots whose
lhs are STATIC sublane-offset slices z[dt:dt+rows].  If Mosaic lowers
offset-1 row slices without a materializing relayout, the 2.4 ms VPU
staging disappears and K=128 bf16 dots decide the kernel.

Variants (ROWS=1664, LANES=K=128, N=128, NDOT taps x NGRP channel
groups so total dot work matches the staged-K=384 pattern):
  staged    3 VPU copies into [rows, 384] then NGRP dots K=384
  shifted   3*NGRP dots, lhs = z[dt:dt+ROWS] static slices, K=128
  shifted0  same but all taps at offset 0 (alignment-cost control)
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
LANES = 128
N = 128
ITERS = 2048
NGRP = 2   # channel-group dots per tap; total work = 6 K=128 dots ~ probe_dma_overlap


def _kernel(x_ref, w_ref, out_ref, src_ref, z_ref, *, variant, quantize):
    j = pl.program_id(0)
    acc_dtype = jnp.int32 if quantize else jnp.float32

    @pl.when(j == 0)
    def _():
        src_ref[...] = x_ref[...]

    acc = jnp.zeros((ROWS, N), acc_dtype)
    if variant == "staged":
        for g in range(3):
            z_ref[:, g * LANES:(g + 1) * LANES] = src_ref[g:g + ROWS]
        for g in range(NGRP):
            acc = acc + jax.lax.dot_general(
                z_ref[...], w_ref[g * 3 * LANES:(g + 1) * 3 * LANES],
                (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype)
    elif variant in ("shifted", "shifted0"):
        for dt in range(3):
            off = dt if variant == "shifted" else 0
            lhs = src_ref[off:off + ROWS]
            for g in range(NGRP):
                k0 = (dt * NGRP + g) * LANES
                acc = acc + jax.lax.dot_general(
                    lhs, w_ref[k0:k0 + LANES],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
    out_ref[...] = acc.astype(out_ref.dtype)


def build(variant, quantize):
    dt = jnp.int8 if quantize else jnp.bfloat16
    kern = functools.partial(_kernel, variant=variant, quantize=quantize)
    return pl.pallas_call(
        kern,
        grid=(ITERS,),
        in_specs=[
            pl.BlockSpec((ROWS + 16, LANES), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * LANES, N), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, N), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (ROWS, N), jnp.int32 if quantize else jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS + 16, LANES), dt),
            pltpu.VMEM((ROWS, 3 * LANES), dt),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    rng = jax.random.PRNGKey(0)
    for quantize in (False, True):
        tag = "int8" if quantize else "bf16"
        dt = jnp.int8 if quantize else jnp.bfloat16
        if quantize:
            x = jax.random.randint(rng, (ROWS + 16, LANES), -127, 127,
                                   jnp.int8)
            w = jax.random.randint(rng, (6 * LANES, N), -127, 127, jnp.int8)
        else:
            x = jax.random.normal(rng, (ROWS + 16, LANES), dt)
            w = jax.random.normal(rng, (6 * LANES, N), dt)
        dot_tops = 2 * ROWS * LANES * N * 6 / 1e12
        for variant in ("staged", "shifted", "shifted0"):
            try:
                fn = jax.jit(build(variant, quantize))
                out = fn(x, w)
                out.block_until_ready()
                float(jnp.sum(out.astype(jnp.float32)))
                t0 = time.time()
                reps = 3
                for _ in range(reps):
                    out = fn(x, w)
                float(jnp.sum(out.astype(jnp.float32)))
                us = (time.time() - t0) / reps / ITERS * 1e6
                print(f"{tag} {variant:9s}: {us:7.2f} us/step "
                      f"({dot_tops / (us / 1e6):6.1f} TOP/s on dots)")
            except Exception as e:  # noqa: BLE001
                print(f"{tag} {variant:9s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
