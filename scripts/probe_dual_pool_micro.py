"""Micro-bisect the dual-pool backward Mosaic failure at block3 geometry.

fwd (same reshapes + lane slices, one full store) compiles; bwd fails.
Variants isolate: partial-lane stores to out, bool mask chains, the
second (g) input, and combinations.

Usage: nohup python scripts/probe_dual_pool_micro.py > /tmp/dpm.log 2>&1 &
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, M, C = 8, 250, 16, 256
TC = 125
M2 = M // 2
ROWS_IN = TC * M
ROWS_OUT = TC * M2


def run(kern, n_in, out_lanes, full_rows_out=False):
    rows_out = ROWS_IN if full_rows_out else ROWS_OUT
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T * M, C),
                          jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(1), (B, T * M2, C),
                          jnp.bfloat16)
    ins = [x, g][:n_in]
    specs = [pl.BlockSpec((1, ROWS_IN, C), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, ROWS_OUT, C), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)][:n_in]
    out = pl.pallas_call(
        kern,
        grid=(B, T // TC),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, rows_out, out_lanes),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, (T // TC) * rows_out,
                                        out_lanes), jnp.bfloat16),
    )(*ins)
    return out


def v1_reshape_fullstore(x_ref, o_ref):
    # reshape [rows, C] -> [rows/2, 2C], one full store (fwd-like, no pool)
    h = x_ref[0].astype(jnp.float32)
    o_ref[0] = h.reshape(ROWS_OUT, 2 * C).astype(o_ref.dtype)


def v2_partial_lane_stores(x_ref, o_ref):
    # two half-lane stores into the out ref (no bools, no second input)
    h = x_ref[0].astype(jnp.float32).reshape(ROWS_OUT, 2 * C)
    o_ref[0, :, 0:C] = h[:, C:].astype(o_ref.dtype)
    o_ref[0, :, C:2 * C] = h[:, :C].astype(o_ref.dtype)


def v3_bool_chain(x_ref, o_ref):
    # bool mask chain + where, full store, no second input
    h = x_ref[0].astype(jnp.float32).reshape(ROWS_OUT, 2 * C)
    a, b = h[:, :C], h[:, C:]
    mx = jnp.maximum(a, b)
    hit = a == mx
    d = jnp.where(hit, a, 0.0) + jnp.where(~hit & (b == mx), b, 0.0)
    o_ref[0] = jnp.concatenate([d, d], axis=0).reshape(
        ROWS_OUT, 2 * C).astype(o_ref.dtype)


def v3b_bool_chain_128(x_ref, o_ref):
    # bool chain, out stays C lanes (no widening), full store
    h = x_ref[0].astype(jnp.float32).reshape(ROWS_OUT, 2 * C)
    a, b = h[:, :C], h[:, C:]
    mx = jnp.maximum(a, b)
    hit = a == mx
    d = jnp.where(hit, a, 0.0) + jnp.where(~hit & (b == mx), b, 0.0)
    o_ref[0] = d.astype(o_ref.dtype)


def v4_second_input(x_ref, g_ref, o_ref):
    # two inputs w/ different row counts, out C lanes, no bools
    h = x_ref[0].astype(jnp.float32).reshape(ROWS_OUT, 2 * C)
    g = g_ref[0].astype(jnp.float32)
    o_ref[0] = (h[:, :C] + g).astype(o_ref.dtype)


def v5_full_bwd_flat(x_ref, g_ref, o_ref):
    # the real bwd3 body
    x = x_ref[0]
    g = g_ref[0].astype(jnp.float32)
    h = jnp.maximum(x.astype(jnp.float32), 0.0)
    hr = h.reshape(ROWS_OUT, 2 * C)
    a, b = hr[:, :C], hr[:, C:]
    mx = jnp.maximum(a, b)
    gavg = g * 0.5
    hit0 = a == mx
    d0 = gavg + jnp.where(hit0, g, 0.0)
    d1 = gavg + jnp.where(~hit0 & (b == mx), g, 0.0)
    xr = x.reshape(ROWS_OUT, 2 * C)
    o_ref[0, :, 0:C] = jnp.where(xr[:, :C] > 0, d0, 0.0).astype(
        o_ref.dtype)
    o_ref[0, :, C:2 * C] = jnp.where(xr[:, C:] > 0, d1, 0.0).astype(
        o_ref.dtype)


def attempt(label, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"{label}: OK ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:100]}",
              flush=True)


def main():
    attempt("v1 reshape+fullstore 2C ", lambda: run(v1_reshape_fullstore, 1, 2 * C))
    attempt("v2 partial-lane stores  ", lambda: run(v2_partial_lane_stores, 1, 2 * C))
    attempt("v3b bool chain, C out   ", lambda: run(v3b_bool_chain_128, 1, C))
    attempt("v4 second input         ", lambda: run(v4_second_input, 2, C))
    attempt("v5 full bwd flat        ", lambda: run(v5_full_bwd_flat, 2, 2 * C))




def v5a_one_reshape(x_ref, g_ref, o_ref):
    # like v5 but relu mask from hr (h>0 iff x>0): one reshape of x
    g = g_ref[0].astype(jnp.float32)
    h = jnp.maximum(x_ref[0].astype(jnp.float32), 0.0)
    hr = h.reshape(ROWS_OUT, 2 * C)
    a, b = hr[:, :C], hr[:, C:]
    mx = jnp.maximum(a, b)
    gavg = g * 0.5
    hit0 = a == mx
    d0 = gavg + jnp.where(hit0, g, 0.0)
    d1 = gavg + jnp.where(~hit0 & (b == mx), g, 0.0)
    o_ref[0, :, 0:C] = jnp.where(a > 0, d0, 0.0).astype(o_ref.dtype)
    o_ref[0, :, C:2 * C] = jnp.where(b > 0, d1, 0.0).astype(o_ref.dtype)


def v5b_bool_partial(x_ref, o_ref):
    # bool chain + partial-lane stores, no second input
    h = x_ref[0].astype(jnp.float32).reshape(ROWS_OUT, 2 * C)
    a, b = h[:, :C], h[:, C:]
    mx = jnp.maximum(a, b)
    hit = a == mx
    d0 = jnp.where(hit, a, 0.0)
    d1 = jnp.where(~hit & (b == mx), b, 0.0)
    o_ref[0, :, 0:C] = d0.astype(o_ref.dtype)
    o_ref[0, :, C:2 * C] = d1.astype(o_ref.dtype)


def v5c_input_partial(x_ref, g_ref, o_ref):
    # second input + partial stores, no bools
    h = x_ref[0].astype(jnp.float32).reshape(ROWS_OUT, 2 * C)
    g = g_ref[0].astype(jnp.float32)
    o_ref[0, :, 0:C] = (h[:, :C] + g).astype(o_ref.dtype)
    o_ref[0, :, C:2 * C] = (h[:, C:] * g).astype(o_ref.dtype)


def main2():
    attempt("v5a one-reshape bwd     ", lambda: run(v5a_one_reshape, 2, 2 * C))
    attempt("v5b bool+partial        ", lambda: run(v5b_bool_partial, 1, 2 * C))
    attempt("v5c input+partial       ", lambda: run(v5c_input_partial, 2, 2 * C))

if __name__ == "__main__":
    main2() if len(sys.argv) > 1 else main()
