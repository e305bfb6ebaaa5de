"""Chain-probe block1's training fwd+bwd: XLA vs the Pallas pool VJPs.

Round-5 bisect (probe_block1_bwd.py): of block1's 46.6 ms standalone
fwd+bwd, the dual pool carries ~17 ms, train-BN stat grads ~8, BN+relu
~5 — the conv dots (21.7) are at SOL.  This probe measures, through
the REAL ConvBlock routing (bf16 compute, train-mode BN, B=128):

  xla       plain flax path (the shipped default)
  poolvjp   TTG_POOL_VJP=64  — round-4 relu+pool-only custom VJP
            (never chain-probed at block1; its round-4 losses were at
            blocks 2-4)
  bnpool    TTG_BN_POOL=64   — round-5 fused train-BN+relu+pool custom
            VJP (ops/pallas/bn_pool.py): one Pallas pass each way +
            closed-form BN backward

Usage: python scripts/probe_block1_chain.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B, T, M = 128, 1001, 64
DT = jnp.bfloat16

ENVS = {
    "xla": {},
    "poolvjp": {"TTG_POOL_VJP": "64"},
    "bnpool": {"TTG_BN_POOL": "64"},
}


def run(variant: str) -> float:
    for k in ("TTG_POOL_VJP", "TTG_BN_POOL"):
        os.environ.pop(k, None)
    os.environ.update(ENVS[variant])

    from texttoaudiogrounding_tpu.models.layers import ConvBlock
    model = ConvBlock(64, dtype=DT)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, M, 1), DT)
    v = model.init(jax.random.PRNGKey(1), x, bn_train=False)

    def loss(p, xx):
        out, _ = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, xx,
            bn_train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) * 1e-6)

    grad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    def chain(xx, n):
        l_ = jnp.float32(0.0)
        for _ in range(n):
            l_, (_, gx) = grad(v["params"], xx + l_ * 1e-9)
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
    variants = sys.argv[1:] or ["xla", "bnpool", "poolvjp"]
    for vn in variants:
        ms = run(vn)
        print(f"block1-chain [{vn:8s}]: {ms:7.2f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
