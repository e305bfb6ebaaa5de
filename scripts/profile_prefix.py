"""In-graph marginal cost per stage: time cumulative pipeline prefixes.

Each prefix is the real serving pipeline up to stage k, jitted as one
graph; successive differences give the in-graph marginal cost of each
stage (fusion-aware, no per-stage dispatch overhead).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = jax.random.PRNGKey(0)

    from texttoaudiogrounding_tpu.ops.frontend import (
        cnn8rnn_mel_config, log_mel_spectrogram)
    from texttoaudiogrounding_tpu.models.layers import BiGRU
    cfg = cnn8rnn_mel_config(32000)
    wav = jax.random.normal(rng, (b, 320000), jnp.float32) * 0.1

    # dummy folded-BN conv params, bf16
    def mk(cin, cout):
        return (jax.random.normal(rng, (3, 3, cin, cout), jnp.bfloat16) * .05,
                jax.random.normal(rng, (3, 3, cout, cout), jnp.bfloat16) * .05)

    params = [mk(1, 64), mk(64, 128), mk(128, 256), mk(256, 512)]
    pools = [(2, 2), (2, 2), (1, 2), (1, 2)]
    fck = jax.random.normal(rng, (512, 512), jnp.bfloat16) * 0.05
    gru = BiGRU(256)
    gvars = gru.init(rng, jnp.zeros((2, 4, 512), jnp.float32))

    def conv_bn_relu(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        return jax.nn.relu(y * 1.01 + 0.01)

    def dual_pool(x, pool):
        w = (1, pool[0], pool[1], 1)
        a = jax.lax.reduce_window(x, jnp.bfloat16(0), jax.lax.add, w, w,
                                  "VALID")
        m = jax.lax.reduce_window(x, jnp.bfloat16(-np.inf), jax.lax.max, w, w,
                                  "VALID")
        return a / (pool[0] * pool[1]) + m

    def pipeline(w, n_blocks, with_fc=False, with_gru=False):
        x = log_mel_spectrogram(w, cfg, compute_dtype=jnp.bfloat16)
        x = (x * 1.01 + 0.01)[..., None].astype(jnp.bfloat16)  # bn0 folded
        for i in range(n_blocks):
            k1, k2 = params[i]
            x = conv_bn_relu(x, k1)
            x = conv_bn_relu(x, k2)
            x = dual_pool(x, pools[i])
        if with_fc:
            x = jnp.mean(x, axis=2)
            x = jax.nn.relu(x @ fck)
        if with_gru:
            x = gru.apply(gvars, x.astype(jnp.float32))
        return x

    stages = [("frontend+bn0", 0, False, False),
              ("+block1", 1, False, False),
              ("+block2", 2, False, False),
              ("+block3", 3, False, False),
              ("+block4", 4, False, False),
              ("+mean/fc1", 4, True, False),
              ("+BiGRU", 4, True, True)]
    prev = 0.0
    for name, nb, fc, g in stages:
        def f(w, c, _nb=nb, _fc=fc, _g=g):
            y = pipeline(w + c, _nb, _fc, _g)
            return y, (y.reshape(-1)[0] * 0).astype(jnp.float32)
        ms = timeit(jax.jit(f), (wav,))
        print(f"{name:14s} cumulative {ms:7.2f} ms   marginal {ms-prev:6.2f}")
        prev = ms


if __name__ == "__main__":
    main()
