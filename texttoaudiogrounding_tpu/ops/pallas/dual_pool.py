"""Pallas relu -> dual (avg+max) pool with a mask-recompute backward.

Training probe finding (round 3, scripts/probe_pool_bwd.py): XLA
differentiates ``reduce_window(max)`` into a SelectAndScatter over the
full-resolution activation, which measures ~14x over the HBM floor at
block1's geometry (19.8 ms fwd+bwd at [128, 1001, 64, 64] — 45 ms
total over the four conv blocks, a third of the training step); every
XLA rewrite (reshape pools, argmax-one-hot custom VJPs) measured 2-3x
worse still.  This module replaces the pair with ONE Pallas forward
kernel (relu + the row-merge pool reshapes of conv_block._dual_pool)
and ONE backward kernel that recomputes the window masks from the
saved input — reading x and g once and writing dx once, in-register.

Semantics match the reference exactly (torch first-argmax routing for
the max gradient, grad 0 at relu(0) — models/panns.py:53-57 pools with
stride == window, the (dt, dm) window scan order):

    y = avg_pool(relu(x)) + max_pool(relu(x))      # window == stride

Layouts (all reshapes at the XLA boundary are contiguous merges, free):

- pt == 2, C >= 128 (block2): 4-D dx block ``[tc/2, 2*m2, 2C]`` —
  middle dim = (t parity, m2), lanes = (m parity, c).
- pt == 1, C >= 128 (blocks 3-4): flat 3-D dx ``[rows, 2C]`` (the 4-D
  form's sublane-4 block fails to lower at block4's m2=4).
- C == 64, M == 64, pool (2,2) (block1): mel-pair lane packing
  ``[B, T, 64, 64] -> [B, T, 32, 128]`` with lane = (m parity)*64 + c;
  window elements are t-row halves x lane halves.  64-lane math, but
  the refs stay 128-lane.

MOSAIC PITFALL (probe_dual_pool_micro.py): a SECOND lane-widening
reshape of the same loaded value fails to lower — the relu mask is
derived from the already-reshaped relu'd value (h > 0 iff x > 0),
never from a separate reshape of x.

VERDICT (round 4, on-chip, scripts/probe_pool_vjp.py +
probe_pool_chain.py): **CLOSED for the training default — OPT-IN
only** (``TTG_POOL_VJP="128,256,512"``).  Standalone the kernel beats
XLA at blocks 2-3 (8.94 vs 11.25 / 5.54 vs 7.02 ms fwd+bwd), but with
the real conv+BN(train) chain around it the step got SLOWER (155 vs
137.4 ms; +8.6/+2.2/+2.3 ms per block): XLA fuses BN+relu+pool forward
AND backward into the conv passes, so the in-chain pool marginal it
replaces is far below the standalone number.  PLAYBOOK RULE from this
closure: judge training kernels by CHAIN probes, never standalone op
probes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["dual_pool_relu"]


def _pick_tc(t: int, m: int, pt: int, max_rows: int = 1600) -> int:
    best = 0
    for c in range(pt, t + 1, pt):
        if (t % c == 0 and c * m <= max_rows
                and ((c // pt) * max(m // 2, 1)) % 8 == 0):
            best = c
    if best == 0:
        raise ValueError(f"no valid pool chunk for T={t} M={m}")
    return best


def _first_argmax_grads(elems, g, inv, out_dtype):
    """Per-window-element dx pieces: avg share + first-argmax max share,
    relu-masked (e > 0 iff x > 0 at that site)."""
    mx = elems[0]
    for e in elems[1:]:
        mx = jnp.maximum(mx, e)
    gavg = g * inv
    taken = jnp.zeros_like(mx, dtype=jnp.bool_)
    ds = []
    for e in elems:
        hit = (e == mx) & ~taken
        taken = taken | hit
        d = gavg + jnp.where(hit, g, 0.0)
        ds.append(jnp.where(e > 0, d, 0.0).astype(out_dtype))
    return ds


# ---------------------------------------------------------------- generic

def _fwd_kernel(x_ref, out_ref, *, tc, m, c, pt):
    from texttoaudiogrounding_tpu.ops.pallas.conv_block import _dual_pool

    # f32 accumulate (free on VPU, more accurate than XLA's bf16 path)
    h = jnp.maximum(x_ref[0].astype(jnp.float32), 0.0)
    out_ref[0] = _dual_pool(h, tc, m, c, pt, 2).astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dx_ref, *, tc, m, c, pt):
    m2 = m // 2
    g = g_ref[0].astype(jnp.float32)
    h = jnp.maximum(x_ref[0].astype(jnp.float32), 0.0)
    hr = h.reshape(tc * m2, 2 * c)
    if pt == 2:
        a3 = hr[:, :c].reshape(tc // 2, 2 * m2, c)
        b3 = hr[:, c:].reshape(tc // 2, 2 * m2, c)
        # torch window order (dt, dm), flattened to [out_rows, c]
        elems = (a3[:, :m2].reshape(-1, c), b3[:, :m2].reshape(-1, c),
                 a3[:, m2:].reshape(-1, c), b3[:, m2:].reshape(-1, c))
    else:
        elems = (hr[:, :c], hr[:, c:])
    ds = _first_argmax_grads(elems, g, 1.0 / (pt * 2), dx_ref.dtype)

    if pt == 2:
        # dx block [tc//2, 2*m2, 2c]: middle = t parity x m2, lanes =
        # (m parity, c); the caller's reshape back to [T, M, C] is free
        dx_ref[0, :, :m2, 0:c] = ds[0].reshape(tc // 2, m2, c)
        dx_ref[0, :, :m2, c:2 * c] = ds[1].reshape(tc // 2, m2, c)
        dx_ref[0, :, m2:, 0:c] = ds[2].reshape(tc // 2, m2, c)
        dx_ref[0, :, m2:, c:2 * c] = ds[3].reshape(tc // 2, m2, c)
    else:
        dx_ref[0, :, 0:c] = ds[0]
        dx_ref[0, :, c:2 * c] = ds[1]


def _run_fwd(x4, pt, tc, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape
    m2 = m // 2
    xf = x4.reshape(b, t * m, c)
    kern = functools.partial(_fwd_kernel, tc=tc, m=m, c=c, pt=pt)
    out = pl.pallas_call(
        kern,
        grid=(b, t // tc),
        in_specs=[pl.BlockSpec((1, tc * m, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, (tc // pt) * m2, c),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, (t // pt) * m2, c), x4.dtype),
        interpret=interpret,
    )(xf)
    return out.reshape(b, t // pt, m2, c)


def _run_bwd(x4, g4, pt, tc, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape
    m2 = m // 2
    xf = x4.reshape(b, t * m, c)
    gf = g4.reshape(b, (t // pt) * m2, c)
    kern = functools.partial(_bwd_kernel, tc=tc, m=m, c=c, pt=pt)
    in_specs = [
        pl.BlockSpec((1, tc * m, c), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, (tc // pt) * m2, c), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    if pt == 2:
        out_specs = pl.BlockSpec((1, tc // pt, pt * m2, 2 * c),
                                 lambda i, j: (i, j, 0, 0))
        out_shape = jax.ShapeDtypeStruct((b, t // pt, pt * m2, 2 * c),
                                         x4.dtype)
    else:
        out_specs = pl.BlockSpec((1, tc * m2, 2 * c),
                                 lambda i, j: (i, j, 0))
        out_shape = jax.ShapeDtypeStruct((b, t * m2, 2 * c), x4.dtype)
    dx = pl.pallas_call(
        kern, grid=(b, t // tc), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
    )(xf, gf)
    # [..., 2C] -> split lanes (m parity, c) then merge: free reshapes
    if pt == 2:
        return dx.reshape(b, t // pt, pt, m2, 2, c).reshape(b, t, m, c)
    return dx.reshape(b, t, m2, 2, c).reshape(b, t, m, c)


# ------------------------------------------------------- packed (block1)

def _fwd_kernel_packed(x_ref, out_ref, *, tc):
    # x block [tc*32, 128], lane = (m parity)*64 + c; pool (2, 2)
    h = jnp.maximum(x_ref[0].astype(jnp.float32), 0.0)
    v = h.reshape(tc // 2, 64, 128)
    te, to = v[:, :32], v[:, 32:]           # t even / odd rows
    s = (te + to).reshape(tc // 2 * 32, 128)
    mx = jnp.maximum(te, to).reshape(tc // 2 * 32, 128)
    sm = s[:, :64] + s[:, 64:]
    mm = jnp.maximum(mx[:, :64], mx[:, 64:])
    out_ref[0] = (sm * 0.25 + mm).astype(out_ref.dtype)


def _bwd_kernel_packed(x_ref, g_ref, dx_ref, *, tc):
    g = g_ref[0].astype(jnp.float32)
    h = jnp.maximum(x_ref[0].astype(jnp.float32), 0.0)
    v = h.reshape(tc // 2, 64, 128)
    rows = tc // 2 * 32
    te = v[:, :32].reshape(rows, 128)
    to = v[:, 32:].reshape(rows, 128)
    # torch window order (dt, dm): lane-low = m even
    elems = (te[:, :64], te[:, 64:], to[:, :64], to[:, 64:])
    ds = _first_argmax_grads(elems, g, 0.25, dx_ref.dtype)
    # dx block [tc//2, 64, 128]: middle = (t parity)*32 + m2
    dx_ref[0, :, :32, 0:64] = ds[0].reshape(tc // 2, 32, 64)
    dx_ref[0, :, :32, 64:128] = ds[1].reshape(tc // 2, 32, 64)
    dx_ref[0, :, 32:, 0:64] = ds[2].reshape(tc // 2, 32, 64)
    dx_ref[0, :, 32:, 64:128] = ds[3].reshape(tc // 2, 32, 64)


def _run_fwd_packed(x4, tc, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape              # m == 64, c == 64
    xf = x4.reshape(b, t * 32, 128)    # lane = (m parity)*64 + c: free
    kern = functools.partial(_fwd_kernel_packed, tc=tc)
    out = pl.pallas_call(
        kern,
        grid=(b, t // tc),
        in_specs=[pl.BlockSpec((1, tc * 32, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, (tc // 2) * 32, 64),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, (t // 2) * 32, 64), x4.dtype),
        interpret=interpret,
    )(xf)
    return out.reshape(b, t // 2, 32, 64)


def _run_bwd_packed(x4, g4, tc, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape
    xf = x4.reshape(b, t * 32, 128)
    gf = g4.reshape(b, (t // 2) * 32, 64)
    kern = functools.partial(_bwd_kernel_packed, tc=tc)
    dx = pl.pallas_call(
        kern,
        grid=(b, t // tc),
        in_specs=[
            pl.BlockSpec((1, tc * 32, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, (tc // 2) * 32, 64), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tc // 2, 64, 128),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t // 2, 64, 128), x4.dtype),
        interpret=interpret,
    )(xf, gf)
    # [t/2, (t par)*32+m2, (m par)*64+c] -> [t, 32, 128] -> [t, 64, 64]
    return dx.reshape(b, t, 32, 128).reshape(b, t, m, c)


def _is_packed(x, pool):
    return (x.shape[2] == 64 and x.shape[3] == 64
            and tuple(pool) == (2, 2))


# --------------------------------------------------------------- wrapper

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def dual_pool_relu(x, pool: tuple, tc: int | None = None,
                   interpret: bool = False):
    """``avg_pool(relu(x)) + max_pool(relu(x))`` with stride == window.

    x: ``[B, T, M, C]`` with C >= 128 (or the block1 geometry
    M == C == 64), pool = (pt, 2), pt in {1, 2}, M even.  Gradient
    matches torch semantics (first-argmax max routing, zero grad at
    relu(0)).  Odd T floor-pools (tail rows get zero gradient).
    """
    pt, pm = pool
    assert pm == 2 and pt in (1, 2)
    t2 = x.shape[1] // pt * pt           # torch floor pooling
    if _is_packed(x, pool):
        tc = tc or _pick_tc(t2, 32, pt)
        return _run_fwd_packed(x[:, :t2], tc, interpret)
    tc = tc or _pick_tc(t2, x.shape[2], pt)
    return _run_fwd(x[:, :t2], pt, tc, interpret)


def _vjp_fwd(x, pool, tc, interpret):
    return dual_pool_relu(x, pool, tc, interpret), x


def _vjp_bwd(pool, tc, interpret, x, g):
    pt, _ = pool
    t = x.shape[1]
    t2 = t // pt * pt
    if _is_packed(x, pool):
        tc = tc or _pick_tc(t2, 32, pt)
        dx = _run_bwd_packed(x[:, :t2], g, tc, interpret)
    else:
        tc = tc or _pick_tc(t2, x.shape[2], pt)
        dx = _run_bwd(x[:, :t2], g, pt, tc, interpret)
    if t2 != t:                           # dropped rows get zero grad
        dx = jnp.pad(dx, ((0, 0), (0, t - t2), (0, 0), (0, 0)))
    return (dx,)


dual_pool_relu.defvjp(_vjp_fwd, _vjp_bwd)
