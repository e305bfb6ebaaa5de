"""Fine bisection of the fused block1 pair kernel (perf only).

Rows: new-style XLA prep alone; conv1 dot only (stage 0); +epilogue
(stage 1); full minus XLA transpose (_raw_out); full; and a tc sweep of
stage 0/1 — separating the N=4096 dot cost from the VPU epilogue and
the handoff transpose.  int8 mode, serving geometry.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.pallas.conv_block1_pair import (
    fused_block1_pair, _quant_i8,
)

B, T, M, C = 128, 1001, 64, 64


def timeit(fn, args, iters=20):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    ms = 0.0
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            out, carry = fn(*args, carry)
        float(carry)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (B, T, M), jnp.float32)
    w1 = jax.random.normal(ks[1], (3, 3, 1, C), jnp.float32) * 0.3
    w2 = jax.random.normal(ks[2], (3, 3, C, C), jnp.float32) * 0.05
    ab1 = (jax.random.uniform(ks[3], (C,), jnp.float32, 0.5, 1.5),
           jax.random.normal(ks[4], (C,), jnp.float32) * 0.1)
    ab2 = (jax.random.uniform(ks[5], (C,), jnp.float32, 0.5, 1.5),
           jnp.zeros((C,), jnp.float32))

    def f_prep(x, cr, tc=48):
        tp = -(-T // tc) * tc
        xx = x + cr.astype(x.dtype)
        sx = jnp.maximum(jnp.max(jnp.abs(xx), axis=(1, 2), keepdims=True),
                         1e-6) / 127.0
        xq = _quant_i8(xx.astype(jnp.float32), 1.0 / sx)
        xz = jnp.pad(xq, ((0, 0), (2, tp - T + 4), (0, 0)))
        xw = jnp.concatenate(
            [xz[:, :tp + 2], xz[:, 1:tp + 3], xz[:, 2:tp + 4]], axis=-1)
        return xw, jnp.sum(xw[0, 0].astype(jnp.float32))

    print(f"prep (int8-early)        : "
          f"{timeit(jax.jit(f_prep), (x,)):6.2f} ms", flush=True)

    def run(tag, **kw):
        def f_k(x, cr):
            out = fused_block1_pair(
                x + cr.astype(x.dtype), w1, ab1, w2, ab2,
                quantize=True, **kw)
            return out, jnp.sum(
                (out[0, 0] if out.ndim == 4 else out[0]).astype(
                    jnp.float32))

        try:
            ms = timeit(jax.jit(f_k), (x,))
            print(f"{tag:25s}: {ms:6.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:25s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    for tc in (48, 64):
        run(f"dot-only tc={tc}", tc=tc, _stages=0)
        run(f"conv1+epi tc={tc}", tc=tc, _stages=1)
    run("full - transpose tc=48", tc=48, _raw_out=True)
    run("full tc=48", tc=48)
    run("full tc=64", tc=64)


if __name__ == "__main__":
    main()
