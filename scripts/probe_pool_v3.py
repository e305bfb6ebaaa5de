"""Pool kernel diagnosis: grouped 64-lane blocks + pure-copy control.

Isolates grid-step overhead (6400 tiny steps in v1) from sublane-gather
relayout cost (stride-1 mel pair split).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, args, iters=30):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            out, carry = fn(*args, carry)
        float(carry)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def kpool(x_ref, out_ref, *, tc, m, g, mode):
    for b in range(g):
        x = x_ref[b]
        if mode == "copy":
            out_ref[b] = x[: x.shape[0] // 2] * 1.0
            continue
        v = x.reshape(tc * m // 2, 2, 64)
        se = v[:, 0, :]
        so = v[:, 1, :]
        s1 = se + so
        m1 = jnp.maximum(se, so)
        mp = m // 2
        s1 = s1.reshape(tc // 2, 2, mp, 64)
        m1 = m1.reshape(tc // 2, 2, mp, 64)
        out = (s1[:, 0] + s1[:, 1]) * 0.25 + jnp.maximum(m1[:, 0], m1[:, 1])
        out_ref[b] = out.reshape(tc // 2 * mp, 64).astype(out_ref.dtype)


def pool(x, tc, g, mode="pool"):
    b, t, m, c = x.shape
    t2 = t // 2 * 2
    xf = x.reshape(b, t * m, c)
    kern = functools.partial(kpool, tc=tc, m=m, g=g, mode=mode)
    out_rows = tc * m // 2 if mode == "copy" else tc // 2 * (m // 2)
    tot_rows = t2 * m // 2 if mode == "copy" else t2 // 2 * (m // 2)
    out = pl.pallas_call(
        kern,
        grid=(b // g, t2 // tc),
        in_specs=[pl.BlockSpec((g, tc * m, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((g, out_rows, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tot_rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xf)
    return out


def main():
    b = 128
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (b, 1000, 64, 64), jnp.bfloat16)

    w = (1, 2, 2, 1)
    a = jax.lax.reduce_window(x0, jnp.bfloat16(0), jax.lax.add, w, w,
                              "VALID")
    mref = jax.lax.reduce_window(x0, jnp.bfloat16(-np.inf), jax.lax.max,
                                 w, w, "VALID")
    ref = (a / 4 + mref).astype(jnp.float32).reshape(b, -1, 64)

    for mode in ("copy", "pool"):
        for tc, g in [(20, 1), (20, 8), (20, 16), (8, 32), (4, 64)]:
            def pk(x, c, tc=tc, g=g, mode=mode):
                y = pool(x + c.astype(x.dtype), tc, g, mode)
                return y, jnp.sum(y[0, 0]).astype(jnp.float32)

            try:
                ms = timeit(jax.jit(pk), (x0,))
                msg = f"{mode} tc={tc:3d} g={g:2d}: {ms:6.2f} ms"
                if mode == "pool":
                    got = pk(x0, jnp.float32(0))[0]
                    d = float(jnp.max(jnp.abs(
                        ref - got.astype(jnp.float32))))
                    msg += f"  max|d| {d}"
                print(msg)
            except Exception as e:  # noqa: BLE001
                print(f"{mode} tc={tc:3d} g={g:2d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
