"""Verify drive: f32 BiEncoder forward + short train on the real chip.

Exercises the NEW default routing (f32 GRU -> Pallas custom-VJP recurrence
on TPU, models/layers.py) end-to-end: forward contract, frame_sim range,
and 20 training steps with decreasing loss.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    print("backend:", jax.default_backend(), flush=True)

    from scripts.ab_gru_convergence import make_batch
    from texttoaudiogrounding_tpu.losses import FrameBceLoss
    from texttoaudiogrounding_tpu.models import (BiEncoder, Cnn8Rnn,
                                                 EmbeddingAgg)
    from texttoaudiogrounding_tpu.models.match import DotProduct

    rng = np.random.default_rng(3)
    batch = make_batch(rng, 16)
    model = BiEncoder(
        audio_encoder=Cnn8Rnn(sample_rate=32000),
        text_encoder=EmbeddingAgg(vocab_size=16, embed_dim=512),
        match_fn=DotProduct(), shared_dim=512, add_proj=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)

    # 1. forward contract on the f32 (Pallas GRU) path
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    fs = np.asarray(out["frame_sim"])
    assert fs.shape[0] == 16, fs.shape
    assert np.all(fs > 0) and np.all(fs <= 1), (fs.min(), fs.max())
    assert not np.any(np.isnan(fs))
    print("forward ok:", fs.shape, "range", float(fs.min()),
          float(fs.max()), flush=True)

    # 2. short training run: loss must decrease
    params, stats = variables["params"], variables.get("batch_stats", {})
    loss_fn = FrameBceLoss()
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
    opt_state = tx.init(params)

    def step(params, stats, opt_state, b):
        def wrapped(p):
            o, mut = model.apply(
                {"params": p, "batch_stats": stats}, b, train=True,
                rngs={"dropout": jax.random.PRNGKey(1),
                      "specaug": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            o = dict(o)
            o["label"] = b["label"]
            return loss_fn(o), mut
        (loss, mut), grads = jax.value_and_grad(wrapped, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), mut["batch_stats"],
                opt_state, loss)

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))
    batches = [make_batch(rng, 16) for _ in range(4)]
    jb = [jax.device_put(x) for x in batches]
    losses = []
    t0 = time.time()
    for i in range(20):
        params, stats, opt_state, loss = jstep(params, stats, opt_state,
                                               jb[i % 4])
        losses.append(float(loss))
    print(f"train 20 steps in {time.time() - t0:.0f}s  "
          f"first {losses[0]:.4f} last {losses[-1]:.4f}", flush=True)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    print("VERIFY-DRIVE OK", flush=True)


if __name__ == "__main__":
    main()
