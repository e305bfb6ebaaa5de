"""On-chip probe: fused block1 pair kernel vs XLA at serving geometry.

B=128, T=1001 (10 s clips), M=64, C=64 — the Cnn8Rnn block1 that
measures ~11.1 ms in-model on XLA (conv1 2.7 + conv2 4.0 + pool 4.1 +
handoff).  Measures the new conv_block1_pair kernel (int8 / bf16, tc
sweep) against the standalone XLA block (bf16), including the kernel's
(quad, time) -> (time, quad) output transpose so the handoff is costed
honestly.  Run from /root/repo with no PYTHONPATH (axon).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.pallas.conv_block1_pair import (
    fused_block1_pair,
)

B, T, M, C = 128, 1001, 64, 64


def timeit(fn, args, iters=20):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    ms = 0.0
    for _ in range(2):  # second loop is the honest one (tunnel settle)
        t0 = time.time()
        for _ in range(iters):
            out, carry = fn(*args, carry)
        float(carry)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def xla_block(x, w1, ab1, w2, ab2):
    def conv(y, w, a, b):
        y = jax.lax.conv_general_dilated(
            y, w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y * a + b, 0.0).astype(jnp.bfloat16)

    y = conv(x[..., None].astype(jnp.bfloat16), w1, *ab1)
    y = conv(y, w2, *ab2)
    y = y[:, :T // 2 * 2]
    win = (1, 2, 2, 1)
    avg = jax.lax.reduce_window(y, jnp.bfloat16(0), jax.lax.add, win, win,
                                "VALID") * 0.25
    mx = jax.lax.reduce_window(y, jnp.bfloat16(-np.inf), jax.lax.max,
                               win, win, "VALID")
    return avg + mx


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

    def f_xla(x, cr):
        out = xla_block(x + cr.astype(x.dtype), w1, ab1, w2, ab2)
        return out, jnp.sum(out[0, 0].astype(jnp.float32))

    ref = np.asarray(jax.jit(f_xla)(x, jnp.float32(0))[0], np.float32)
    print(f"XLA bf16 block1 standalone: {timeit(jax.jit(f_xla), (x,)):6.2f} ms",
          flush=True)

    for quant, tcs in ((True, (48, 32, 16)), (False, (48, 32))):
        for tc in tcs:
            def f_k(x, cr, tc=tc, quant=quant):
                out = fused_block1_pair(
                    x + cr.astype(x.dtype), w1, ab1, w2, ab2,
                    quantize=quant, tc=tc)
                return out, jnp.sum(out[0, 0].astype(jnp.float32))

            tag = "int8" if quant else "bf16"
            try:
                got = np.asarray(jax.jit(f_k)(x, jnp.float32(0))[0],
                                 np.float32)
                rms = (np.sqrt(np.mean((got - ref) ** 2))
                       / np.sqrt(np.mean(ref ** 2)))
                ms = timeit(jax.jit(f_k), (x,))
                print(f"pair {tag} tc={tc:3d}: {ms:6.2f} ms  "
                      f"(rms vs XLA {rms:.4f})", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"pair {tag} tc={tc:3d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
