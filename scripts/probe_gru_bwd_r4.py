"""Round-4 GRU training-path probes (B=128, T=250, H=256, D=512).

Modes (argv[1]):
  cur    — shipped f32 custom-VJP Pallas BiGRU (bigru_pallas_trainable)
  xla    — grouped-scan XLA BiGRU fwd+bwd (models/layers.py path)
  v2     — redesigned backward: kernel emits dproj + drznn only
           (dWh/dbn via one XLA einsum over T afterwards), single
           K=3H dh dot from a dcols scratch, both directions' gate
           math batched on [2B, .] blocks
  bf16   — round-5 bf16-recurrence variant: bf16 operands on every
           dot (fwd carry, gate recompute, dh chain, dWh), f32 gate
           math + accumulators; the proj einsum operands cast bf16 too
Measures the einsum-proj + recurrence + loss-reduction fwd+bwd in
isolation (chained iterations, one scalar fetch).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

MODE = sys.argv[1] if len(sys.argv) > 1 else "cur"

import jax
import jax.numpy as jnp
import numpy as np

B, T, H, D = 128, 250, 256, 512


def main():
    from texttoaudiogrounding_tpu.ops.pallas import gru as gru_mod

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)) * 0.1, jnp.float32)
    wih = jnp.asarray(rng.normal(size=(2, D, 3 * H)) * 0.05, jnp.float32)
    bih = jnp.asarray(rng.normal(size=(2, 3 * H)) * 0.05, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(2, H, 3 * H)) * 0.05, jnp.float32)
    bn = jnp.asarray(rng.normal(size=(2, H)) * 0.05, jnp.float32)

    if MODE == "xla":
        import os
        os.environ["TTG_PALLAS_GRU"] = "0"
        from texttoaudiogrounding_tpu.models.layers import BiGRU
        mod = BiGRU(hidden=H)
        params = mod.init(jax.random.PRNGKey(0), x)

        def loss(p, x):
            return jnp.sum(mod.apply(p, x) ** 2)

        jf = jax.jit(jax.value_and_grad(loss))
        v, g = jf(params, x)
        arg = params
    else:
        entry = {"cur": gru_mod.bigru_pallas_trainable,
                 "v2": gru_mod.bigru_pallas_trainable_v2,
                 "v3": gru_mod.bigru_pallas_trainable_v3,
                 "bf16": gru_mod.bigru_pallas_trainable_bf16}[MODE]
        pdt = jnp.bfloat16 if MODE == "bf16" else jnp.float32

        def loss(wargs, x):
            wih, bih, wh, bn = wargs
            # hoisted input projections, both directions + flip (as in
            # models/layers.py BiGRU)
            xd = x.astype(pdt)
            wd = wih.astype(pdt)
            p0 = (xd @ wd[0]).astype(jnp.float32) + bih[0]
            p1 = (xd[:, ::-1] @ wd[1]).astype(jnp.float32) + bih[1]
            proj = jnp.concatenate(
                [p0.transpose(1, 0, 2), p1.transpose(1, 0, 2)], axis=1)
            ys = entry(proj, wh, bn)
            return jnp.sum(ys.astype(jnp.float32) ** 2)

        jf = jax.jit(jax.value_and_grad(loss))
        arg = (wih, bih, wh, bn)
        v, g = jf(arg, x)

    float(v)
    iters = 30
    for _ in range(2):
        t0 = time.time()
        acc = jnp.float32(0)
        for _ in range(iters):
            v, g = jf(arg, x)
            acc = acc + v * 0
        float(v + acc)
        ms = (time.time() - t0) / iters * 1000
    print(f"gru fwd+bwd [{MODE}]: {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
