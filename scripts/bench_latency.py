"""Small-batch serving latency of the flagship grounding model.

Serving deployments care about tail latency at small batch as well as
peak throughput (bench.py).  This times the full jitted forward
(frontend -> Cnn8Rnn -> text tower -> match) at B in {1, 8, 32, 128}
(or a comma-separated list in argv[2]) on 10 s clips and prints
per-call latency + implied throughput per point.

Timing through the axon tunnel: chained iterations + one scalar fetch
(block_until_ready is unreliable), settling loop first — the bench.py
pattern.  Per-call numbers therefore EXCLUDE host->device transfer and
dispatch (in-graph latency); a production host adds its feed cost on
top (see parallel/mesh.device_feed).

Usage: python scripts/bench_latency.py [fused_mode]   (default int8)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

# an explicit CLI mode always wins; the env var only backs the default
if len(sys.argv) > 1:
    os.environ["TTG_FUSED_CONV"] = sys.argv[1]
else:
    os.environ.setdefault("TTG_FUSED_CONV", "int8")

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _example_batch, _flagship_model

    model = _flagship_model(serving=True)

    sizes = (1, 8, 32, 128)
    if len(sys.argv) > 2:
        sizes = tuple(int(s) for s in sys.argv[2].split(","))

    results = []
    for bs in sizes:
        batch = _example_batch(batch_size=bs)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)

        @jax.jit
        def fwd(variables, batch, carry):
            b = dict(batch)
            b["waveform"] = b["waveform"] + carry
            out = model.apply(variables, b, train=False)
            return out["frame_sim"], out["frame_sim"][0, 0] * 0.0

        jbatch = jax.device_put(batch)
        carry = jnp.float32(0.0)
        out, carry = fwd(variables, jbatch, carry)
        float(carry)

        iters = max(10, min(200, 4096 // bs))
        for _ in range(2):  # settle, then measure
            t0 = time.time()
            for _ in range(iters):
                out, carry = fwd(variables, jbatch, carry)
            float(carry)
            dt = (time.time() - t0) / iters
        results.append((bs, dt * 1000.0, bs / dt))
        print(f"B={bs:4d}  {dt * 1e3:7.2f} ms/call  "
              f"{bs / dt:8.1f} clips/s", flush=True)

    print("\nmode:", os.environ["TTG_FUSED_CONV"])
    print("batch, ms_per_call, clips_per_s")
    for bs, ms, cps in results:
        print(f"{bs}, {ms:.2f}, {cps:.1f}")


if __name__ == "__main__":
    main()
