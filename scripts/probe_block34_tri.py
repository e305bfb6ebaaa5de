"""On-chip probe: register-built im2col (tri) vs direct9 for blocks 3-4.

Serving geometry (B=128, 10 s): block3 [250, 16, 128]->256 pool (1,2),
block4 [250, 8, 256]->512 pool (1,2), int8.  tri converts conv dots
from 9 x K=C to 3 x K=3C (the mel3 K-rate gain) while building the
im2col buffer from registers (1 load + 3 stores) instead of the
ref->ref staging that made mel3 lose (STATUS.md round-3 table).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
    fused_double_conv_pool,
)

B = 128


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
    for name, (t, m, cin, cout) in (("block3", (250, 16, 128, 256)),
                                    ("block4", (250, 8, 256, 512))):
        ks = jax.random.split(jax.random.fold_in(rng, cout), 5)
        x = jax.random.normal(ks[0], (B, t, m, cin), jnp.bfloat16)
        w1 = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32) * .02
        w2 = jax.random.normal(ks[2], (3, 3, cout, cout), jnp.float32) * .02
        ab1 = (jax.random.uniform(ks[3], (cout,), jnp.float32, 0.5, 1.5),
               jnp.zeros((cout,), jnp.float32))
        ab2 = (jax.random.uniform(ks[4], (cout,), jnp.float32, 0.5, 1.5),
               jnp.zeros((cout,), jnp.float32))

        for tag, kw in (("direct9", {}),
                        ("tri(T,T)", {"tri": (True, True)}),
                        ("tri(F,T)", {"tri": (False, True)}),
                        ("tri(T,F)", {"tri": (True, False)})):
            def f(x, cr, kw=kw):
                out = fused_double_conv_pool(
                    x + cr.astype(x.dtype), w1, ab1, w2, ab2, (1, 2),
                    quantize=True, **kw)
                return out, jnp.sum(out[0, 0].astype(jnp.float32))

            try:
                ms = timeit(jax.jit(f), (x,))
                print(f"{name} int8 {tag:9s}: {ms:6.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} int8 {tag:9s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
