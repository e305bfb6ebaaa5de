"""Stage bisection of the fused block1 pair kernel (perf only).

Measures _stages = 0 (XLA-side prep only: xw pack + quantize, no
kernel), 1 (conv1 dots + epilogue), 2 (+ triple-store), 3 (+ conv2
dots + BN2), 4 (full: + pool + packed out stores + XLA transpose),
all at serving geometry (B=128, T=1001), int8 tc=48.
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

    tc = 48
    tp = -(-T // tc) * tc

    def f_prep(x, cr):
        xz = jnp.pad((x + cr.astype(x.dtype)).astype(jnp.float32),
                     ((0, 0), (2, tp - T + 3), (0, 0)))
        xw = jnp.concatenate([xz[:, :tp + 4], xz[:, 1:tp + 5]], axis=-1)
        sx = jnp.maximum(jnp.max(jnp.abs(xw), axis=(1, 2), keepdims=True),
                         1e-6) / 127.0
        xw = _quant_i8(xw, 1.0 / sx)
        return xw, jnp.sum(xw[0, 0].astype(jnp.float32))

    print(f"stage 0 (XLA prep only)   : "
          f"{timeit(jax.jit(f_prep), (x,)):6.2f} ms", flush=True)

    for st in (1, 2, 3, 4):
        def f_k(x, cr, st=st):
            out = fused_block1_pair(
                x + cr.astype(x.dtype), w1, ab1, w2, ab2,
                quantize=True, tc=tc, _stages=st)
            return out, jnp.sum(out[0, 0].astype(jnp.float32))

        try:
            ms = timeit(jax.jit(f_k), (x,))
            print(f"stage {st}                   : {ms:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"stage {st}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
