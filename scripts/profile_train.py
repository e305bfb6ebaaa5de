"""Training-step time on the real chip: where do the 214 ms go?

Times the jitted fwd+bwd+adam step at B=128 x 10 s in isolation (no input
pipeline) for: f32 model, bf16-conv model (f32 BN/GRU/optimizer), and
fwd-only — separating compute from pipeline and dtype effects.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from texttoaudiogrounding_tpu.losses import FrameBceLoss
    from texttoaudiogrounding_tpu.models import (BiEncoder, Cnn8Rnn,
                                                 EmbeddingAgg)
    from texttoaudiogrounding_tpu.models.match import DotProduct

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
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

    for tag, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        model = BiEncoder(
            audio_encoder=Cnn8Rnn(sample_rate=32000, dtype=dtype),
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
        c = jnp.float32(0.0)
        params, stats, opt_state, loss = jstep(params, stats, opt_state,
                                               jb, c)
        float(loss)
        # two timed passes, report the second: the FIRST steady-state
        # loop in a process measures ~4x inflated on the axon tunnel
        # (round-2's "908 ms f32" and this round's "838 ms bf16" were
        # both first-position artifacts — the settling pass kills them)
        iters = 15
        for attempt in range(2):
            t0 = time.time()
            for _ in range(iters):
                params, stats, opt_state, loss = jstep(
                    params, stats, opt_state, jb, loss * 1e-9)
            float(loss)
            ms = (time.time() - t0) / iters * 1000
        print(f"train step {tag}: {ms:7.1f} ms -> {b/ms*1000:6.0f} clips/s")

        # fwd-only for the same dtype
        def fwd(params, batch, c):
            bb = dict(batch)
            bb["waveform"] = bb["waveform"] + c
            out = model.apply({"params": params, "batch_stats": stats},
                              bb, train=False)
            return out["frame_sim"][0, 0] * 0.0
        jf = jax.jit(fwd)
        cc = jf(params, jb, jnp.float32(0)); float(cc)
        t0 = time.time()
        for _ in range(iters):
            cc = jf(params, jb, cc)
        float(cc)
        ms = (time.time() - t0) / iters * 1000
        print(f"fwd-only  {tag}: {ms:7.1f} ms -> {b/ms*1000:6.0f} clips/s")


if __name__ == "__main__":
    main()
