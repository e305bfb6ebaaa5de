"""Training fwd+bwd marginal cost per stage (real chip).

Times ``jax.grad`` of prefix losses of the REAL Cnn8Rnn in the training
configuration (bf16-mixed conv trunk, f32 Pallas BiGRU, dropout on,
batch BN): the loss is built from a captured intermediate (flax
``capture_intermediates``), so XLA dead-code-eliminates every later
stage and successive differences give each stage's fwd+bwd marginal.
This decomposes the 140.3 ms bf16 train step (scripts/profile_train.py)
the way profile_prefix.py decomposes serving.

Usage: python scripts/profile_train_stages.py [B]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    from texttoaudiogrounding_tpu.models import Cnn8Rnn

    model = Cnn8Rnn(sample_rate=32000, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    batch = {
        "waveform": jax.random.normal(rng, (b, 320000), jnp.float32) * 0.1,
        "waveform_len": jnp.full((b,), 320000, jnp.int32),
    }
    variables = model.init({"params": rng}, batch, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    # prefix markers, in pipeline order ("full" = the model output)
    stages = ["bn0", "conv_block1", "conv_block2", "conv_block3",
              "conv_block4", "full"]

    def make_loss(stage):
        def loss(params, batch):
            out, aux = model.apply(
                {"params": params, "batch_stats": stats}, batch,
                train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
                capture_intermediates=(stage != "full"),
                mutable=["batch_stats", "intermediates"])
            if stage == "full":
                x = out["embedding"]
            else:
                x = aux["intermediates"][stage]["__call__"][0]
            return jnp.sum(x.astype(jnp.float32) ** 2) * 1e-6
        return loss

    def timed(stage, iters=20):
        g = jax.jit(jax.grad(make_loss(stage)))
        # chain iterations through a scalar so the tunnel can't lie;
        # grads are consumed via a global sum
        def chained(params, batch, carry):
            grads = g(params, batch)
            total = sum(jnp.sum(v.astype(jnp.float32))
                        for v in jax.tree_util.tree_leaves(grads))
            return carry + total
        cj = jax.jit(chained)
        carry = cj(params, batch, jnp.float32(0.0))
        float(carry)
        for _ in range(2):                      # settle pass, then time
            t0 = time.time()
            carry = jnp.float32(0.0)
            for _ in range(iters):
                carry = cj(params, batch, carry)
            float(carry)
            ms = (time.time() - t0) / iters * 1000.0
        return ms

    prev = 0.0
    print(f"B={b}, bf16-mixed trunk, f32 Pallas GRU (training config)")
    for stage in stages:
        ms = timed(stage)
        print(f"{stage:>12}: prefix {ms:7.2f} ms   marginal "
              f"{ms - prev:7.2f} ms", flush=True)
        prev = ms

    gf = 37.7 * b  # fwd GFLOP for the batch
    print(f"\nfull fwd+bwd {prev:.1f} ms -> "
          f"{b / prev * 1000:.0f} clips/s; naive 3x-fwd FLOP bound = "
          f"{3 * gf / 197e3 * 1000:.1f} ms at bf16 peak")


if __name__ == "__main__":
    main()
