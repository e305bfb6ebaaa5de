"""Pallas scan-fused BiGRU recurrence (serving forward path).

SURVEY §7 names the GRU recurrence as the anti-XLA part of the model
(250 sequential steps) and a Pallas scan fusion as the target design.
This kernel keeps the recurrent weights and both direction carries
resident in VMEM across a ``grid=(T,)`` sequential walk, so each step is
two ``[B, H] @ [H, 3H]`` MXU dots + VPU gates with no per-step weight
refetch or dynamic-update-slice traffic (the ``lax.scan`` cost XLA
pays).  The input projections stay in XLA — one big
``[B, T, D] @ [D, 3H]`` matmul per direction is already MXU-optimal
(models/layers.py GRUSeq hoisting).

Layout: time-major ``proj [T, 2B, 3H]`` (direction-0 rows then
direction-1 rows; direction 1 reads time-flipped projections, exactly
like the grouped ``lax.scan`` in models/layers.py BiGRU) -> output
``ys [T, 2B, H]``.  Forward/serving only — training keeps the XLA scan
(this kernel defines no VJP).

Reference recurrence: torch ``nn.GRU`` r/z/n gates,
``h' = (1-z) n + z h`` (reference models/audio_encoder.py:141).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["bigru_pallas"]


def _kernel(proj_ref, wh_ref, bn_ref, out_ref, h0_ref, h1_ref, *,
            b: int, h: int, dtype):
    import jax.experimental.pallas as pl

    jj = pl.program_id(0)

    @pl.when(jj == 0)
    def _():
        h0_ref[...] = jnp.zeros((b, h), dtype)
        h1_ref[...] = jnp.zeros((b, h), dtype)

    def step(hid_ref, g, rows):
        pp = proj_ref[0, rows:rows + b].astype(jnp.float32)
        rzn = jax.lax.dot_general(
            hid_ref[...], wh_ref[g * h:(g + 1) * h],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(pp[:, :h] + rzn[:, :h])
        z = jax.nn.sigmoid(pp[:, h:2 * h] + rzn[:, h:2 * h])
        n = jnp.tanh(pp[:, 2 * h:] + r * (rzn[:, 2 * h:]
                                          + bn_ref[g:g + 1]))
        hid = (1 - z) * n + z * hid_ref[...].astype(jnp.float32)
        hid_ref[...] = hid.astype(dtype)
        out_ref[0, rows:rows + b] = hid.astype(out_ref.dtype)

    step(h0_ref, 0, 0)
    step(h1_ref, 1, b)


def bigru_pallas(proj: jax.Array, wh: jax.Array, bn: jax.Array, *,
                 dtype=jnp.float32, interpret: bool = False) -> jax.Array:
    """proj ``[T, 2B, 3H]`` (hoisted input projections + bias, f32;
    direction 1 rows time-flipped), wh ``[2, H, 3H]``, bn ``[2, H]`` ->
    ys ``[T, 2B, H]`` f32 (direction 1 still time-flipped; caller
    unflips and concatenates, models/layers.py BiGRU)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, b2, h3 = proj.shape
    b, h = b2 // 2, h3 // 3
    kern = functools.partial(_kernel, b=b, h=h, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b2, h3), lambda j: (j, 0, 0)),
            pl.BlockSpec((2 * h, h3), lambda j: (0, 0)),
            pl.BlockSpec((2, h), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b2, h), lambda j: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, b2, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, h), dtype),
                        pltpu.VMEM((b, h), dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(proj, wh.reshape(2 * h, h3).astype(dtype), bn)
