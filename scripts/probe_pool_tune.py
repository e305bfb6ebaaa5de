"""Tune the dual-pool kernels: chunk sizes, fwd/bwd split, DMA-vs-VPU.

Usage: nohup python scripts/probe_pool_tune.py > /tmp/pool_tune.log 2>&1 &
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.pallas import dual_pool as dp


def timeit(fn, *args):
    j = jax.jit(fn)
    out = j(*args)
    jax.block_until_ready(out)
    iters = 30
    ms = 0.0
    for _ in range(2):
        t0 = time.time()
        o = args[0]
        for _ in range(iters):
            o = j(*((o,) + args[1:])) if False else j(*args)
        jax.block_until_ready(o)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def chained(fn, x, iters=20):
    def step(x, carry):
        return carry + jnp.sum(fn(x).astype(jnp.float32)) * 1e-9
    cj = jax.jit(step)
    carry = cj(x, jnp.float32(0.0)); float(carry)
    ms = 0.0
    for _ in range(2):
        t0 = time.time()
        carry = jnp.float32(0.0)
        for _ in range(iters):
            carry = cj(x, carry)
        float(carry)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def bwd_stream_kernel(x_ref, g_ref, dx_ref, *, tc):
    """DMA-floor variant: same refs as packed bwd, no mask math."""
    h = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    v = h.reshape(tc // 2, 64, 128)
    rows = tc // 2 * 32
    te = v[:, :32].reshape(rows, 128)
    s = (te + g[:, :64].astype(jnp.float32).sum() * 0.0).astype(
        dx_ref.dtype)
    dx_ref[0, :, :32, :] = s.reshape(tc // 2, 32, 128)
    dx_ref[0, :, 32:, :] = s.reshape(tc // 2, 32, 128)


def run_bwd_stream(x4, g4, tc):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape
    xf = x4.reshape(b, t * 32, 128)
    gf = g4.reshape(b, (t // 2) * 32, 64)
    kern = functools.partial(bwd_stream_kernel, tc=tc)
    return pl.pallas_call(
        kern, grid=(b, t // tc),
        in_specs=[
            pl.BlockSpec((1, tc * 32, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, (tc // 2) * 32, 64), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tc // 2, 64, 128),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t // 2, 64, 128), x4.dtype),
    )(xf, gf)


def main():
    b = 128
    key = jax.random.PRNGKey(0)

    # ---- block1 packed: fwd / bwd split + DMA floor + tc sweep
    x1 = jax.random.normal(key, (b, 1000, 64, 64), jnp.bfloat16)
    g1 = jax.random.normal(key, (b, 500, 32, 64), jnp.bfloat16)
    for tc in (20, 40, 50, 100):
        if 1000 % tc:
            continue
        def _try(label, fn):
            try:
                return chained(fn, x1)
            except Exception as e:  # noqa: BLE001
                print(f"block1 {label} tc={tc}: FAIL {str(e)[:80]}",
                      flush=True)
                return float("nan")
        f = _try("fwd", lambda v, tc=tc: dp._run_fwd_packed(v, tc, False))
        bw = _try("bwd", lambda v, tc=tc: dp._run_bwd_packed(
            v, g1, tc, False))
        st = _try("stream", lambda v, tc=tc: run_bwd_stream(v, g1, tc))
        print(f"block1 packed tc={tc}: fwd {f:6.2f}  bwd {bw:6.2f}  "
              f"bwd-stream-floor {st:6.2f} ms", flush=True)

    # ---- block4: tc sweep on the flat bwd
    x4 = jax.random.normal(key, (b, 250, 8, 512), jnp.bfloat16)
    g4 = jax.random.normal(key, (b, 250, 4, 512), jnp.bfloat16)
    for tc in (50, 125, 250):
        if (tc * 4) % 8:
            print(f"block4 tc={tc}: skipped (8-row rule)", flush=True)
            continue
        try:
            f = chained(lambda v, tc=tc: dp._run_fwd(v, 1, tc, False), x4)
            bw = chained(lambda v, tc=tc: dp._run_bwd(v, g4, 1, tc,
                                                      False), x4)
            print(f"block4 tc={tc}: fwd {f:6.2f}  bwd {bw:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"block4 tc={tc}: FAIL {str(e)[:80]}", flush=True)

    # ---- blocks 2-3: tc sweep
    x2 = jax.random.normal(key, (b, 500, 32, 128), jnp.bfloat16)
    g2 = jax.random.normal(key, (b, 250, 16, 128), jnp.bfloat16)
    for tc in (10, 20, 50):
        try:
            f = chained(lambda v, tc=tc: dp._run_fwd(v, 2, tc, False), x2)
            bw = chained(lambda v, tc=tc: dp._run_bwd(v, g2, 2, tc,
                                                      False), x2)
            print(f"block2 tc={tc}: fwd {f:6.2f}  bwd {bw:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"block2 tc={tc}: FAIL {str(e)[:80]}", flush=True)

    x3 = jax.random.normal(key, (b, 250, 16, 256), jnp.bfloat16)
    g3 = jax.random.normal(key, (b, 250, 8, 256), jnp.bfloat16)
    for tc in (25, 50, 100):
        if 250 % tc or (tc * 8) % 8:
            continue
        try:
            f = chained(lambda v, tc=tc: dp._run_fwd(v, 1, tc, False), x3)
            bw = chained(lambda v, tc=tc: dp._run_bwd(v, g3, 1, tc,
                                                      False), x3)
            print(f"block3 tc={tc}: fwd {f:6.2f}  bwd {bw:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"block3 tc={tc}: FAIL {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
