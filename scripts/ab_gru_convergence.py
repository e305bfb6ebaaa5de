"""Convergence A/B: grouped-scan BiGRU vs the Pallas custom-VJP BiGRU.

Trains the flagship BiEncoder (f32 GRU path, as in all training configs)
for N steps on a learnable synthetic grounding task — tone bursts whose
frame labels mark the burst — from the SAME init, and prints the loss
trajectory.  Run once per arm (env is read at trace time; one chip = one
process):

    python scripts/ab_gru_convergence.py            # grouped scan
    TTG_PALLAS_GRU=1 python scripts/ab_gru_convergence.py

Adoption bar for making the Pallas recurrence the f32 default: both
trajectories converge and stay within a few % of each other step-for-step
(they are not bit-equal — f32 reduction order differs between the scan
and the kernel).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_batch(rng, b, n=160000, sr=32000, hop=320):
    """Noise clips with one tone burst each; labels mark the burst."""
    n_frames = (n // hop + 1) // 4
    wav = rng.normal(size=(b, n)).astype(np.float32) * 0.05
    label = np.zeros((b, n_frames), np.float32)
    text = np.zeros((b, 4), np.int32)
    for i in range(b):
        f = rng.integers(0, 2)                 # two event "types"
        start = rng.integers(0, n // 2)
        length = rng.integers(sr // 4, sr)     # 0.25-1 s
        t = np.arange(length) / sr
        tone = np.sin(2 * np.pi * (440 if f == 0 else 1760) * t)
        wav[i, start:start + length] += tone.astype(np.float32) * 0.15
        fr = max(1, hop * 4)
        s, e = start // fr, min(n_frames, (start + length) // fr + 1)
        label[i, s:e] = 1.0
        text[i, 0] = 1 + f                     # token per event type
    return {
        "waveform": wav,
        "waveform_len": np.full((b,), n, np.int32),
        "text": text,
        "text_len": np.full((b,), 1, np.int32),
        "label": label,
    }


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from texttoaudiogrounding_tpu.losses import FrameBceLoss
    from texttoaudiogrounding_tpu.models import (BiEncoder, Cnn8Rnn,
                                                 EmbeddingAgg)
    from texttoaudiogrounding_tpu.models.match import DotProduct

    arm = "pallas" if os.environ.get("TTG_PALLAS_GRU") == "1" else "scan"
    if os.environ.get("TTG_GRU_BWD") == "bf16":
        arm += "-bf16"   # bf16-recurrence trainable variant (round 5)
    b, steps = 32, 80
    rng = np.random.default_rng(7)
    batches = [make_batch(rng, b) for _ in range(8)]

    model = BiEncoder(
        audio_encoder=Cnn8Rnn(sample_rate=32000),
        text_encoder=EmbeddingAgg(vocab_size=16, embed_dim=512),
        match_fn=DotProduct(), shared_dim=512, add_proj=True)
    loss_fn = FrameBceLoss()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batches[0],
                           train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
    opt_state = tx.init(params)

    def step(params, stats, opt_state, batch):
        def wrapped(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, batch, train=True,
                rngs={"dropout": jax.random.PRNGKey(1),
                      "specaug": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            out = dict(out)
            out["label"] = batch["label"]
            return loss_fn(out), mut
        (loss, mut), grads = jax.value_and_grad(wrapped, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mut["batch_stats"], opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))
    jb = [jax.device_put(x) for x in batches]
    t0 = time.time()
    losses = []
    for i in range(steps):
        params, stats, opt_state, loss = jstep(params, stats, opt_state,
                                               jb[i % len(jb)])
        if (i + 1) % 10 == 0 or i == 0:
            losses.append(float(loss))
            print(f"[{arm}] step {i + 1:3d}  loss {losses[-1]:.5f}",
                  flush=True)
    print(f"[{arm}] {steps} steps in {time.time() - t0:.0f}s; "
          f"first {losses[0]:.5f} last {losses[-1]:.5f}")


if __name__ == "__main__":
    main()
