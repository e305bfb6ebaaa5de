"""Fused avg+max 2x2 pool kernel (the PANNs dual pool, one HBM pass).

XLA lowers the reference's ``avg_pool + max_pool`` (reference
models/panns.py:53-57) as two ``reduce_window`` passes over the input —
at block1's [B, 1000, 64, 64] bf16 geometry that is ~2.1 GB of reads +
0.26 GB written, measured 4.1 ms on v5e (scripts/probe_block1_split.py;
a strided-slice rewrite XLA could fuse measures 15 ms — sublane-strided
slices relayout).  This kernel reads the map once and writes the pooled
output once (~1.3 GB total, DMA-bound): both reductions ride the VPU on
resident rows using the middle-dim reshape split trick (lane-axis
slicing and sublane strides are not Mosaic-lowerable — see
conv_block.py).  Grid in-specs are auto-pipelined by Mosaic, so DMA of
chunk j+1 overlaps the (trivial) compute of chunk j.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["dual_pool_2x2"]


def _kernel(x_ref, out_ref, *, tc: int, m: int, c: int):
    x = x_ref[0]                       # [tc*m, c]
    v = x.reshape(tc * m // 2, 2, c)   # mel pairs (middle-dim split)
    se = v[:, 0, :]
    so = v[:, 1, :]
    s1 = se + so
    m1 = jnp.maximum(se, so)
    mp = m // 2
    s1 = s1.reshape(tc // 2, 2, mp, c)  # time pairs
    m1 = m1.reshape(tc // 2, 2, mp, c)
    s2 = s1[:, 0] + s1[:, 1]
    m2 = jnp.maximum(m1[:, 0], m1[:, 1])
    out = s2 * 0.25 + m2
    out_ref[0] = out.reshape(tc // 2 * mp, c).astype(out_ref.dtype)


def dual_pool_2x2(x: jax.Array, *, tc: int | None = None,
                  interpret: bool = False) -> jax.Array:
    """``avg_pool2x2(x) + max_pool2x2(x)`` over NHWC ``[B, T, M, C]``
    with torch floor semantics (odd T/M: last row/col dropped).

    C must be a lane-friendly width (64 or a multiple of 128); M even
    after flooring is required only of the *used* region (M//2*2).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x.shape
    t2, m2 = t // 2 * 2, m // 2 * 2
    if m2 != m:
        # mel dim is never odd in the shipped models; slice is cheap
        # relative to kernel traffic only if unused, so keep it simple
        x = x[:, :, :m2]
        m = m2
    if tc is None:
        tc = _pick_tc_pool(t2, m)
    xf = x.reshape(b, t * m, c)

    kern = functools.partial(_kernel, tc=tc, m=m, c=c)
    out = pl.pallas_call(
        kern,
        grid=(b, t2 // tc),
        in_specs=[pl.BlockSpec((1, tc * m, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, tc // 2 * (m // 2), c),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t2 // 2 * (m // 2), c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xf)
    return out.reshape(b, t2 // 2, m // 2, c)


def _pick_tc_pool(t2: int, m: int, max_rows: int = 2000) -> int:
    """Largest even tc dividing t2 with tc*m <= max_rows."""
    best = 0
    for cand in range(2, t2 + 1, 2):
        if t2 % cand == 0 and cand * m <= max_rows:
            best = cand
    if best == 0:
        raise ValueError(f"no pool chunk for T={t2} M={m}")
    return best
