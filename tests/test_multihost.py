"""Real multi-process feed test: ``global_batch_from_local`` under a
2-process ``jax.distributed`` CPU cluster (VERDICT r3 item 9 — the one
untested line between the single-process dryrun and a real pod).

Spawns two subprocesses that each hold HALF the global batch, assemble
it with ``jax.make_array_from_process_local_data`` through
``parallel.mesh.global_batch_from_local``, and take one data-parallel
gradient step.  Both processes must agree with the single-process
reference (CPU f32 matmul with fixed contraction shapes — results are
deterministic, so exact string equality on 6 decimals is expected).
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_global_batch_feed():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/multihost_worker.py", str(pid),
             str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"proc{pid} printed no RESULT:\n{out[-3000:]}"
        results.append(lines[-1])

    # both processes computed the same global loss/grad
    assert results[0] == results[1]

    # single-process reference over the full batch (same seed/math as
    # the worker)
    rng = np.random.default_rng(0)
    gx = rng.normal(size=(16, 12)).astype(np.float32)
    gy = rng.normal(size=(16,)).astype(np.float32)
    w = np.full((12,), 0.25, np.float32)

    import jax

    def loss_fn(w, x, y):
        return (((x @ w) - y) ** 2).mean()

    loss, grad = jax.jit(jax.value_and_grad(loss_fn))(w, gx, gy)
    expect = (f"RESULT {float(loss):.6f} "
              f"{float(np.abs(np.asarray(grad)).sum()):.6f}")
    assert results[0] == expect
