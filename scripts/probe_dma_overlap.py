"""Probe: can VMEM->VMEM async DMA staging overlap MXU dots in Mosaic?

The round-3 blocks-1/2 kernel campaign (STATUS.md) ended with ~4 ms of
serialized VPU staging per block as the structural cost that keeps fused
kernels at XLA parity.  The untested design is: replace VPU staging
stores with async local DMAs into a double buffer, started before the
current chunk's dots so the copy engine runs under the MXU.

This probe measures, at block2-staging shapes ([rows,128] copies into a
384-lane im2col buffer, 6 int8 dots [rows,384]x[384,128] per step):
  dots_only    — staging-free floor
  vpu          — VPU store staging then dots (today's kernel pattern)
  dma_serial   — DMA staging, start+wait, then dots (engine bandwidth)
  dma_overlap  — DMA into slot j+1 started before dots on slot j

If dma_overlap ~= dots_only, the DMA-pipelined kernel design is viable.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1664          # tc=100 chunks x mp=16 pair rows (+ halo ~ block2)
LANES = 128
K = 3 * LANES
N = 128
ITERS = 2048
NDOT = 6


def _kernel(x_ref, w_ref, out_ref, src_ref, z_ref, sem, *, variant: str,
            quantize: bool):
    j = pl.program_id(0)
    acc_dtype = jnp.int32 if quantize else jnp.float32

    @pl.when(j == 0)
    def _():
        src_ref[...] = x_ref[...]

    # bf16/int8 DMA src sublane offsets must be 0 mod 8 (probe_dma_bisect
    # + offset sweep: 1/2/4 fail to lower, 8/16/32 OK; f32 is unrestricted)
    # — use 0/8/16 here; same copy volume as the real ±1-shift staging.
    def start_copies(slot):
        for g in range(3):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(8 * g, ROWS)],
                z_ref.at[slot, :, pl.ds(g * LANES, LANES)],
                sem.at[slot, g],
            ).start()

    def wait_copies(slot):
        for g in range(3):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(8 * g, ROWS)],
                z_ref.at[slot, :, pl.ds(g * LANES, LANES)],
                sem.at[slot, g],
            ).wait()

    if variant == "dots_only":
        acc = _dots_flat(z_ref, w_ref, 0, acc_dtype)
    elif variant == "vpu":
        for g in range(3):
            z_ref[0, :, g * LANES:(g + 1) * LANES] = src_ref[g:g + ROWS]
        acc = _dots_flat(z_ref, w_ref, 0, acc_dtype)
    elif variant == "dma_serial":
        start_copies(0)
        wait_copies(0)
        acc = _dots_flat(z_ref, w_ref, 0, acc_dtype)
    elif variant == "dma_overlap":
        slot = jax.lax.rem(j, 2)
        nxt = 1 - slot

        @pl.when(j == 0)
        def _():
            start_copies(0)
            wait_copies(0)

        @pl.when(j + 1 < pl.num_programs(0))
        def _():
            start_copies(nxt)
        acc = _dots_dyn(z_ref, w_ref, slot, acc_dtype)

        @pl.when(j + 1 < pl.num_programs(0))
        def _():
            wait_copies(nxt)
    else:
        raise ValueError(variant)
    out_ref[...] = acc.astype(out_ref.dtype)


def _dots_flat(z_ref, w_ref, slot, acc_dtype):
    acc = jnp.zeros((ROWS, N), acc_dtype)
    for g in range(NDOT):
        acc = acc + jax.lax.dot_general(
            z_ref[slot], w_ref[g * K:(g + 1) * K],
            (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
    return acc


def _dots_dyn(z_ref, w_ref, slot, acc_dtype):
    acc = jnp.zeros((ROWS, N), acc_dtype)
    zv = z_ref[slot]
    for g in range(NDOT):
        acc = acc + jax.lax.dot_general(
            zv, w_ref[g * K:(g + 1) * K], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
    return acc


def build(variant: str, quantize: bool):
    dt = jnp.int8 if quantize else jnp.bfloat16
    kern = functools.partial(_kernel, variant=variant, quantize=quantize)
    return pl.pallas_call(
        kern,
        grid=(ITERS,),
        in_specs=[
            pl.BlockSpec((ROWS + 16, LANES), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NDOT * K, N), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, N), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (ROWS, N), jnp.int32 if quantize else jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS + 16, LANES), dt),     # persistent src
            pltpu.VMEM((2, ROWS, K), dt),           # double buffer
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    rng = jax.random.PRNGKey(0)
    for quantize in (True, False):
        tag = "int8" if quantize else "bf16"
        dt = jnp.int8 if quantize else jnp.bfloat16
        if quantize:
            x = jax.random.randint(rng, (ROWS + 16, LANES), -127, 127,
                                   jnp.int8)
            w = jax.random.randint(rng, (NDOT * K, N), -127, 127,
                                   jnp.int8)
        else:
            x = jax.random.normal(rng, (ROWS + 16, LANES), dt)
            w = jax.random.normal(rng, (NDOT * K, N), dt)
        dot_tops = 2 * ROWS * K * N * NDOT / 1e12
        for variant in ("dots_only", "vpu", "dma_serial", "dma_overlap"):
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
                print(f"{tag} {variant:12s}: {us:7.2f} us/step "
                      f"({dot_tops / (us / 1e6):6.1f} TOP/s on dots)")
            except Exception as e:  # noqa: BLE001
                print(f"{tag} {variant:12s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
