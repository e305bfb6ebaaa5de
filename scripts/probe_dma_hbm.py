"""Can HBM->VMEM async DMA use arbitrary (sublane-misaligned) src offsets?

probe_dma_bisect established VMEM->VMEM int8/bf16 DMA src offsets must be
0 mod 8 sublanes (f32 unrestricted).  The 3x3 conv taps need +-1-row
shifted copies; if HBM->VMEM copies accept arbitrary row offsets, the
im2col staging can DMA straight from HBM input at shifted offsets and
double-buffer across grid steps (overlap probe's dma_overlap pattern).

Cases (x kept in ANY/HBM, manual copy into VMEM scratch):
  h_off0      src rows [0, ROWS)        (aligned baseline)
  h_off1      src rows [1, 1+ROWS)      (the +-1 tap shift)
  h_off1_lane same, dst lane-slice of a 384-lane wide buffer
  h_dynoff    src rows [j%3, ...)       (traced offset)
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


def _kernel(x_ref, out_ref, z_ref, sem, *, case: str, dt):
    j = pl.program_id(0)
    if case == "h_off0":
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, ROWS)], z_ref.at[0], sem.at[0])
    elif case == "h_off1":
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(1, ROWS)], z_ref.at[0], sem.at[0])
    elif case == "h_off1_lane":
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(1, ROWS)],
            z_ref.at[0, :, pl.ds(LANES, LANES)], sem.at[0])
    elif case == "h_dynoff":
        off = jax.lax.rem(j, 3)
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(off, ROWS)], z_ref.at[0], sem.at[0])
    dma.start()
    dma.wait()
    out_ref[...] = z_ref[0, 0:8, 0:LANES].astype(jnp.float32)


def build(case: str, dt, wide: bool):
    zlanes = 3 * LANES if wide else LANES
    kern = functools.partial(_kernel, case=case, dt=dt)
    return pl.pallas_call(
        kern,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, LANES), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, zlanes), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    for dt, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        if dt == jnp.int8:
            x = jax.random.randint(jax.random.PRNGKey(0),
                                   (ROWS + 16, LANES), -127, 127, jnp.int8)
        else:
            x = jax.random.normal(jax.random.PRNGKey(0),
                                  (ROWS + 16, LANES), dt)
        for case in ("h_off0", "h_off1", "h_off1_lane", "h_dynoff"):
            wide = case == "h_off1_lane"
            try:
                out = jax.jit(build(case, dt, wide))(x)
                out.block_until_ready()
                print(f"{tag} {case:12s}: OK")
            except Exception as e:  # noqa: BLE001
                print(f"{tag} {case:12s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}")


if __name__ == "__main__":
    main()
