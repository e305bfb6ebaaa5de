"""Bisect which local-DMA construct fails to lower on this toolchain.

Cases (all VMEM->VMEM, [ROWS,128] copies):
  a_full       dst whole [ROWS,128] ref, src offset 0
  b_srcoff8    src sublane offset 8 (tile-aligned)
  c_srcoff1    src sublane offset 1 (misaligned)
  d_lanedst    dst lane slice [.., 0:128] of a 384-lane ref
  e_slotdst    dst z[0] of [2,ROWS,128] with static slot
  f_dynslot    dst z[slot] with traced slot
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 256
LANES = 128


def _kernel(x_ref, out_ref, z_ref, sem, *, case: str):
    j = pl.program_id(0)
    if case == "a_full":
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, ROWS)], z_ref.at[0], sem.at[0])
    elif case == "b_srcoff8":
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(8, ROWS)], z_ref.at[0], sem.at[0])
    elif case == "c_srcoff1":
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(1, ROWS)], z_ref.at[0], sem.at[0])
    elif case == "d_lanedst":
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, ROWS)],
            z_ref.at[0, :, pl.ds(0, LANES)], sem.at[0])
    elif case == "e_slotdst":
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, ROWS)], z_ref.at[0], sem.at[0])
    elif case == "f_dynslot":
        slot = jax.lax.rem(j, 2)
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, ROWS)], z_ref.at[slot], sem.at[slot])
    dma.start()
    dma.wait()
    out_ref[...] = z_ref[0, 0:8].astype(jnp.float32)


def build(case: str, wide_dst: bool):
    zlanes = 3 * LANES if wide_dst else LANES
    kern = functools.partial(_kernel, case=case)
    return pl.pallas_call(
        kern,
        grid=(4,),
        in_specs=[pl.BlockSpec((ROWS + 16, LANES), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, zlanes), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, zlanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, zlanes), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (ROWS + 16, LANES),
                          jnp.bfloat16)
    for case in ("a_full", "b_srcoff8", "c_srcoff1", "d_lanedst",
                 "e_slotdst", "f_dynslot"):
        wide = case == "d_lanedst"
        try:
            out = jax.jit(build(case, wide))(x)
            out.block_until_ready()
            print(f"{case:10s}: OK")
        except Exception as e:  # noqa: BLE001
            print(f"{case:10s}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
