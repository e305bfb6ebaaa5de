"""On-chip sweep: per-block fused configs (tap modes x tc) vs XLA."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
    fused_double_conv_pool)


def timeit(fn, args, iters=30):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    t0 = time.time()
    for _ in range(iters):
        out, carry = fn(*args, carry)
    float(carry)
    return (time.time() - t0) / iters * 1000.0


def main():
    b = 128
    rng = jax.random.PRNGKey(0)
    blocks = [
        ("block2", 500, 32, 64, 128, (2, 2), [50, 100]),
        ("block3", 250, 16, 128, 256, (1, 2), [125]),
        ("block4", 250, 8, 256, 512, (1, 2), [125, 250]),
    ]
    for name, t, m, cin, cout, pool, tcs in blocks:
        x = jax.random.normal(rng, (b, t, m, cin), jnp.bfloat16)
        w1 = jax.random.normal(rng, (3, 3, cin, cout), jnp.float32) * 0.05
        w2 = jax.random.normal(rng, (3, 3, cout, cout), jnp.float32) * 0.05
        a = jnp.ones((cout,), jnp.float32)
        bb = jnp.zeros((cout,), jnp.float32)
        fl = 2 * 9 * t * m * cin * cout * b + 2 * 9 * t * m * cout * cout * b

        configs = []
        for tc in tcs:
            m1s = (False, True) if cin < 128 else (False,)
            for m1 in m1s:
                configs.append((False, m1, False, tc))
                configs.append((False, m1, True, tc))
            configs.append((True, True, False, tc))
            configs.append((True, True, True, tc))
        best = {}
        for quant, m1, m2, tc in configs:
            def fused(x, c, _q=quant, _m=(m1, m2), _tc=tc):
                y = fused_double_conv_pool(
                    x + c.astype(jnp.bfloat16), w1, (a, bb), w2, (a, bb),
                    pool, quantize=_q, mel3=_m, tc=_tc)
                return y, (y[0, 0, 0, 0] * 0).astype(jnp.float32)
            tag = f"{'int8' if quant else 'bf16'} m3={int(m1)}{int(m2)} tc={tc}"
            try:
                ms = timeit(jax.jit(fused), (x,))
                mark = ""
                key = "int8" if quant else "bf16"
                if ms < best.get(key, (1e9,))[0]:
                    best[key] = (ms, tag)
                    mark = " *"
                print(f"{name} {tag}: {ms:6.2f} ms "
                      f"({fl/ms/1e9:6.1f} TOP/s){mark}")
            except Exception as e:
                print(f"{name} {tag}: FAIL {str(e)[:60]}")
        for k, (ms, tag) in best.items():
            print(f"{name} BEST {k}: {ms:6.2f} ms  [{tag}]")


if __name__ == "__main__":
    main()
