"""Bisect: which part of ops/pallas/dual_pool.py fails Mosaic lowering.

The remote compile helper hides the error (HTTP 500) — test fwd and bwd
separately per block geometry, plus a 3-D-flat bwd variant for pt=1.

Usage: nohup python scripts/probe_dual_pool_bisect.py > /tmp/dpb.log 2>&1 &
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.pallas import dual_pool as dp

SHAPES = [
    ("block1", 1001, 64, 64, 2, 2),
    ("block2", 500, 32, 128, 2, 2),
    ("block3", 250, 16, 256, 1, 2),
    ("block4", 250, 8, 512, 1, 2),
]


def _bwd3_kernel(x_ref, g_ref, dx_ref, *, tc, m, c):
    """pt=1 backward with a flat 3-D [rows, 2c] out block."""
    m2 = m // 2
    inv = 0.5
    x = x_ref[0]
    g = g_ref[0].astype(jnp.float32)
    h = jnp.maximum(x.astype(jnp.float32), 0.0)
    hr = h.reshape(tc * m2, 2 * c)
    a, b = hr[:, :c], hr[:, c:]
    mx = jnp.maximum(a, b)
    gavg = g * inv
    hit0 = a == mx
    d0 = gavg + jnp.where(hit0, g, 0.0)
    d1 = gavg + jnp.where(~hit0 & (b == mx), g, 0.0)
    xr = x.reshape(tc * m2, 2 * c)
    dx_ref[0, :, 0:c] = jnp.where(xr[:, :c] > 0, d0, 0.0).astype(
        dx_ref.dtype)
    dx_ref[0, :, c:2 * c] = jnp.where(xr[:, c:] > 0, d1, 0.0).astype(
        dx_ref.dtype)


def run_bwd3(x4, g4, tc):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape
    m2 = m // 2
    xf = x4.reshape(b, t * m, c)
    gf = g4.reshape(b, t * m2, c)
    kern = functools.partial(_bwd3_kernel, tc=tc, m=m, c=c)
    dx = pl.pallas_call(
        kern,
        grid=(b, t // tc),
        in_specs=[
            pl.BlockSpec((1, tc * m, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc * m2, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tc * m2, 2 * c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t * m2, 2 * c), x4.dtype),
    )(xf, gf)
    return dx.reshape(b, t, m2, 2, c).reshape(b, t, m, c)


def attempt(label, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        val = float(jnp.sum(out[0].astype(jnp.float32)) * 1e-6)
        print(f"  {label}: OK ({time.time()-t0:.1f}s, chk {val:.3f})",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {label}: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return False


def main():
    b = 8  # tiny batch: compile check + smoke, not perf
    key = jax.random.PRNGKey(0)
    for name, t, m, c, pt, pm in SHAPES:
        t2 = t // pt * pt
        x = jax.random.normal(key, (b, t, m, c), jnp.bfloat16)
        tc = dp._pick_tc(t2, m, pt)
        g_shape = (b, t2 // pt, m // 2, c)
        g = jax.random.normal(key, g_shape, jnp.bfloat16)
        print(f"{name} [{t},{m},{c}] pt={pt} tc={tc}", flush=True)
        attempt("fwd ", lambda: dp._run_fwd(x[:, :t2], pt, tc, False))
        attempt("bwd4", lambda: dp._run_bwd(x[:, :t2], g, pt, tc, False))
        if pt == 1:
            attempt("bwd3", lambda: run_bwd3(x, g, tc))


if __name__ == "__main__":
    main()
