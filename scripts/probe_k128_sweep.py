"""Clean-chip sweep: can no-staging tap-dot designs beat the staged
K=384 pattern at block2-conv2 shapes?

Misaligned bf16/int8 DMA is impossible on this toolchain
(probe_dma_bisect, probe_dma_hbm) and serialized VPU staging is the
structural ~4 ms of the round-3 pair-dense kernels (STATUS).  Remaining
candidate designs, all with identical MAC volume (= 6 K=128-dot units):

  A_shift   3 taps x NGRP group dots, lhs = src[dt:dt+ROWS] STATIC
            sublane-offset slices, K=128 N=128, acc-chained; no staging
  B_wideN   per group: one dot [ROWS+2,128]x[128,384] (taps on the N
            axis), store to 32-bit scratch, 3 shifted column-block adds
            (32-bit shifted reads are alignment-unrestricted); no staging
  C_staged  3 VPU lane-slot copies into [ROWS,384] then NGRP K=384 dots
            (the measured round-3 kernel pattern — baseline)
  D_dots    NGRP K=384 dots only — pure-dot ceiling of C's geometry

Gate: if best(A,B) meaningfully beats C on a quiet chip, rebuild the
block-1/2 kernels on that pattern; else publish C's ceiling and stop.
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
NGRP = 6


def _kernel(x_ref, w_ref, wb_ref, out_ref, src_ref, z_ref, zf_ref, *,
            variant, quantize):
    j = pl.program_id(0)
    acc_dtype = jnp.int32 if quantize else jnp.float32

    @pl.when(j == 0)
    def _():
        src_ref[...] = x_ref[...]

    acc = jnp.zeros((ROWS, N), acc_dtype)
    if variant == "A_shift":
        for dt in range(3):
            lhs = src_ref[dt:dt + ROWS]
            for g in range(NGRP):
                k0 = (dt * NGRP + g) * LANES
                acc = acc + jax.lax.dot_general(
                    lhs, w_ref[k0:k0 + LANES], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
    elif variant == "B_wideN":
        for g in range(NGRP):
            wide = jax.lax.dot_general(
                src_ref[0:ROWS + 8],
                wb_ref[g * LANES:(g + 1) * LANES],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            zf_ref[...] = wide
            acc = (acc
                   + zf_ref[0:ROWS, 0 * N:1 * N]
                   + zf_ref[1:ROWS + 1, 1 * N:2 * N]
                   + zf_ref[2:ROWS + 2, 2 * N:3 * N])
    elif variant == "C_staged":
        for g in range(3):
            z_ref[:, g * LANES:(g + 1) * LANES] = src_ref[g:g + ROWS]
        for g in range(NGRP):
            acc = acc + jax.lax.dot_general(
                z_ref[...], w_ref[g * 3 * LANES:(g + 1) * 3 * LANES],
                (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype)
    elif variant == "D_dots":
        for g in range(NGRP):
            acc = acc + jax.lax.dot_general(
                z_ref[...], w_ref[g * 3 * LANES:(g + 1) * 3 * LANES],
                (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype)
    out_ref[...] = acc.astype(out_ref.dtype)


def build(variant, quantize):
    dt = jnp.int8 if quantize else jnp.bfloat16
    acc32 = jnp.int32 if quantize else jnp.float32
    kern = functools.partial(_kernel, variant=variant, quantize=quantize)
    return pl.pallas_call(
        kern,
        grid=(ITERS,),
        in_specs=[
            pl.BlockSpec((ROWS + 16, LANES), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * NGRP * LANES, N), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NGRP * LANES, 3 * N), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, N), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (ROWS, N), jnp.int32 if quantize else jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS + 16, LANES), dt),
            pltpu.VMEM((ROWS, 3 * LANES), dt),
            pltpu.VMEM((ROWS + 8, 3 * N), acc32),
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
            w = jax.random.randint(rng, (3 * NGRP * LANES, N), -127, 127, jnp.int8)
            wb = jax.random.randint(rng, (NGRP * LANES, 3 * N), -127, 127,
                                    jnp.int8)
        else:
            x = jax.random.normal(rng, (ROWS + 16, LANES), dt)
            w = jax.random.normal(rng, (3 * NGRP * LANES, N), dt)
            wb = jax.random.normal(rng, (NGRP * LANES, 3 * N), dt)
        dot_tops = 2 * ROWS * LANES * N * 3 * NGRP / 1e12
        for variant in ("A_shift", "B_wideN", "C_staged", "D_dots"):
            try:
                fn = jax.jit(build(variant, quantize))
                out = fn(x, w, wb)
                out.block_until_ready()
                float(jnp.sum(out.astype(jnp.float32)))
                t0 = time.time()
                reps = 5
                for _ in range(reps):
                    out = fn(x, w, wb)
                float(jnp.sum(out.astype(jnp.float32)))
                us = (time.time() - t0) / reps / ITERS * 1e6
                print(f"{tag} {variant:9s}: {us:7.2f} us/step "
                      f"({dot_tops / (us / 1e6):6.1f} TOP/s equivalent)")
            except Exception as e:  # noqa: BLE001
                print(f"{tag} {variant:9s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
