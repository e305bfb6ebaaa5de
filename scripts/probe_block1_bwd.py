"""Bisect block1's 44.5 ms training fwd+bwd marginal (real chip).

profile_train_stages.py showed block1 (conv 1->64 -> BN -> relu ->
conv 64->64 -> BN -> relu -> 2x2 avg+max pool) costs 44.5 ms fwd+bwd
of the 137 ms bf16 train step — ~3x its forward, where the dX+dW SOL
is ~2x.  The block's INPUT is only [B,1001,64,1] (32 MB f32), so a
recompute-based fused backward is HBM-cheap; this probe bisects which
parts of XLA's backward carry the slack before building one.

Variants (standalone jax.grad, bf16 compute, chained timing):
  full      conv1-BN-relu-conv2-BN-relu-dualpool, train-mode BN
  evalbn    same, BN frozen (running stats; kills the batch-stat grads)
  nopool    train BN, mean over the unpooled output instead of pool
  noconv2   conv1-BN-relu-dualpool only
  convs     conv1 + conv2 only (no BN, no relu, no pool)
  conv2     conv2 (64->64) alone on the y1-shaped input

Usage: python scripts/probe_block1_bwd.py [variant ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


B, T, M = 128, 1001, 64
DT = jnp.bfloat16


class Block(nn.Module):
    variant: str

    @nn.compact
    def __call__(self, x, bn_train=True):
        v = self.variant
        conv = lambda c, name: nn.Conv(
            c, (3, 3), padding="SAME", use_bias=False, dtype=DT,
            name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not bn_train, momentum=0.9, epsilon=1e-5,
            dtype=DT, name=name)
        y = conv(64, "conv1")(x)
        if v == "convs":
            return conv(64, "conv2")(y)
        if v != "noconv2":
            y = nn.relu(bn("bn1")(y))
            if v == "conv2":
                return conv(64, "conv2")(y)
            y = nn.relu(bn("bn2")(conv(64, "conv2")(y)))
        else:
            y = nn.relu(bn("bn1")(y))
        if v == "nopool":
            return y
        a = nn.avg_pool(y, (2, 2), strides=(2, 2))
        m = nn.max_pool(y, (2, 2), strides=(2, 2))
        return a + m


def run(variant: str) -> float:
    bn_train = variant != "evalbn"
    v = "full" if variant == "evalbn" else variant
    model = Block(v)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, M, 1), DT)
    variables = model.init(jax.random.PRNGKey(1), x, bn_train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def loss(p, xx):
        kw = {} if v in ("convs", "conv2") else dict(bn_train=bn_train)
        out = model.apply({"params": p, "batch_stats": stats}, xx,
                          mutable=["batch_stats"] if bn_train and stats
                          else False, **kw)
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out.astype(jnp.float32) * 1e-6)

    grad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    def chain(xx, n):
        l_ = jnp.float32(0.0)
        for _ in range(n):
            l_, (_, gx) = grad(params, xx + l_ * 1e-9)
            l_ = l_ + jnp.sum(gx[0, 0, 0].astype(jnp.float32)) * 0.0
        return float(l_)

    chain(x, 1)                       # compile
    best = np.inf
    for _ in range(3):                # settle + 2 measured
        t0 = time.time()
        chain(x, 10)
        best = min(best, (time.time() - t0) / 10)
    return best * 1e3


def main():
    variants = sys.argv[1:] or ["full", "evalbn", "nopool", "noconv2",
                                "convs", "conv2"]
    for v in variants:
        ms = run(v)
        print(f"block1-bwd [{v:8s}]: {ms:7.2f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
