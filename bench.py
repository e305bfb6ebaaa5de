"""Benchmark: batched grounding inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "grounding_inference_clips_per_sec", "value": N,
   "unit": "clips/s/chip", "vs_baseline": N/10000}

Workload: the flagship BiEncoder (Cnn8Rnn audio tower + text encoder +
DotProduct match) on 10 s / 32 kHz clips, one phrase each — the
north-star target is 10,000 clips/s/chip (BASELINE.md).

Timing note: ``block_until_ready`` is unreliable through the axon tunnel,
so we time a chain of dependent steps and force one final host fetch.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import os

    # default serving mode: fused int8 Pallas conv blocks — measured
    # metric-identical to f32 on a trained checkpoint (PSDS/th-AUC equal
    # to 4 decimals, max frame-prob delta 0.028; scripts/verify_e2e_tpu.py)
    os.environ.setdefault("TTG_FUSED_CONV", "int8")

    import jax

    from __graft_entry__ import _example_batch, _flagship_model

    batch_size = int(os.environ.get("BENCH_BATCH", 128))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    model = _flagship_model(serving=True)
    batch = _example_batch(batch_size=batch_size)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)

    @jax.jit
    def fwd(variables, batch, carry):
        # the carry forces each iteration to depend on the previous one's
        # output, so timing N chained calls measures N sequential steps
        # even through the axon tunnel (no reliance on queue ordering)
        b = dict(batch)
        b["waveform"] = b["waveform"] + carry
        out = model.apply(variables, b, train=False)
        return out["frame_sim"], out["frame_sim"][0, 0] * 0.0

    jbatch = jax.device_put(batch)
    carry = jax.numpy.float32(0.0)
    # warm up (compile)
    out, carry = fwd(variables, jbatch, carry)
    float(carry)

    # two timed loops, report the second: the FIRST steady-state loop
    # in a process can measure inflated through the axon tunnel
    # (scripts/profile_train.py settling-pass finding)
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            out, carry = fwd(variables, jbatch, carry)
        _ = float(carry)  # one scalar fetch forces the whole chain
        dt = (time.time() - t0) / iters
    clips_per_sec = batch_size / dt

    print(json.dumps({
        "metric": "grounding_inference_clips_per_sec",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
