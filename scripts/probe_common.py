"""Shared harness for the block1 probe scripts.

``timeit`` is the chained-iteration idiom from CLAUDE.md: a settling
pass first (the FIRST steady-state timing loop in a process measures
~4x inflated through the axon tunnel), then report the second timed
loop; completion is forced by fetching ONE scalar (``float(carry)``)
because ``block_until_ready`` does not reliably block on axon.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

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


def make_block1_case(seed=0):
    """Serving-geometry random block1 case: x [B,T,M], HWIO weights,
    folded BN affines."""
    rng = jax.random.PRNGKey(seed)
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (B, T, M), jnp.float32)
    w1 = jax.random.normal(ks[1], (3, 3, 1, C), jnp.float32) * 0.3
    w2 = jax.random.normal(ks[2], (3, 3, C, C), jnp.float32) * 0.05
    ab1 = (jax.random.uniform(ks[3], (C,), jnp.float32, 0.5, 1.5),
           jax.random.normal(ks[4], (C,), jnp.float32) * 0.1)
    ab2 = (jax.random.uniform(ks[5], (C,), jnp.float32, 0.5, 1.5),
           jnp.zeros((C,), jnp.float32))
    return x, w1, ab1, w2, ab2
