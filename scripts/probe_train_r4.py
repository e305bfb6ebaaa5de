"""Round-4 training-step probes (bf16-mixed, B=128 x 10 s, real chip).

Modes (argv[1]):
  base     — baseline step time (same methodology as profile_train.py)
  rbg      — jax_default_prng_impl=rbg for the dropout/specaug keys
             (threefry mask generation is pure VPU work; rbg uses the
             hardware RNG)
  remat    — nn.remat around conv blocks 1+2 (checkpointing the 1 GB
             of inter-conv activations: block1-2 bwd is HBM-bound, so
             recomputing may beat re-reading)
  remat12  — remat around blocks 1-4
  pool     — rbg + Pallas relu+dual-pool custom VJP on blocks 2-4
  pool1    — rbg + pool VJP on ALL blocks (incl. packed block1)
  poolr    — pool + remat blocks 1+2
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

MODE = sys.argv[1] if len(sys.argv) > 1 else "base"

import jax

if MODE in ("rbg", "rr", "pool", "pool1", "poolr"):
    jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np
import optax


def main():
    from texttoaudiogrounding_tpu.losses import FrameBceLoss
    from texttoaudiogrounding_tpu.models import (BiEncoder, Cnn8Rnn,
                                                 EmbeddingAgg)
    from texttoaudiogrounding_tpu.models.match import DotProduct

    import os as _os
    b = int(_os.environ.get("TTG_PROBE_B", "128"))
    rng = np.random.default_rng(0)
    n = 320000
    n_frames = (n // 320 + 1) // 4
    batch = {
        "waveform": (rng.normal(size=(b, n)) * 0.1).astype(np.float32),
        "waveform_len": np.full((b,), n, np.int32),
        "text": rng.integers(1, 5000, size=(b, 8)).astype(np.int32),
        "text_len": np.full((b,), 8, np.int32),
        "label": (rng.uniform(size=(b, n_frames)) < 0.3).astype(
            np.float32),
    }
    loss_fn = FrameBceLoss()

    import os
    if MODE in ("remat", "rr"):
        os.environ["TTG_TRAIN_REMAT"] = "12"
    elif MODE == "remat12":
        os.environ["TTG_TRAIN_REMAT"] = "1234"
    if MODE in ("pool", "poolr"):
        os.environ["TTG_POOL_VJP"] = "128,256,512"
    elif MODE == "pool1":
        os.environ["TTG_POOL_VJP"] = "64,128,256,512"
    if MODE == "poolr":
        os.environ["TTG_TRAIN_REMAT"] = "12"

    model = BiEncoder(
        audio_encoder=Cnn8Rnn(sample_rate=32000, dtype=jnp.bfloat16),
        text_encoder=EmbeddingAgg(vocab_size=5000, embed_dim=512),
        match_fn=DotProduct(), shared_dim=512, add_proj=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = tx.init(params)

    def step(params, stats, opt_state, batch, c):
        bb = dict(batch)
        bb["waveform"] = bb["waveform"] + c

        def wrapped(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, bb, train=True,
                rngs={"dropout": jax.random.PRNGKey(1),
                      "specaug": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            out = dict(out)
            out["label"] = bb["label"]
            return loss_fn(out), mut
        (loss, mut), grads = jax.value_and_grad(wrapped,
                                                has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mut["batch_stats"], opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))
    jb = jax.device_put(batch)
    params, stats, opt_state, loss = jstep(params, stats, opt_state,
                                           jb, jnp.float32(0.0))
    float(loss)
    iters = 15
    ms = 0.0
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            params, stats, opt_state, loss = jstep(
                params, stats, opt_state, jb, loss * 1e-9)
        float(loss)
        ms = (time.time() - t0) / iters * 1000
    print(f"train step bf16 [{MODE}]: {ms:7.1f} ms -> "
          f"{b / ms * 1000:6.0f} clips/s", flush=True)


if __name__ == "__main__":
    main()
