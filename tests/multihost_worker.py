"""Worker for tests/test_multihost.py — run as a subprocess, twice.

Forces the CPU backend with 4 local devices, joins a 2-process
``jax.distributed`` cluster (8 global devices), assembles a global batch
from this process's local shard via
``parallel.mesh.global_batch_from_local``, and runs one data-parallel
gradient step.  Prints ``RESULT <loss> <grad_checksum>`` — both
processes must print the same values, and they must equal the
single-process reference computed by the test.

Usage: python tests/multihost_worker.py <process_id> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)

import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from texttoaudiogrounding_tpu.parallel.mesh import (  # noqa: E402
    global_batch_from_local,
    replicate,
)

assert jax.process_count() == 2
assert len(jax.devices()) == 8

mesh = Mesh(np.array(jax.devices()), ("data",))

# deterministic global batch; each process feeds ONLY its half
rng = np.random.default_rng(0)
gx = rng.normal(size=(16, 12)).astype(np.float32)
gy = rng.normal(size=(16,)).astype(np.float32)
w = np.full((12,), 0.25, np.float32)

lo, hi = pid * 8, (pid + 1) * 8
batch = global_batch_from_local({"x": gx[lo:hi], "y": gy[lo:hi]}, mesh)
wg = jax.device_put(w, replicate(mesh))


def loss_fn(w, b):
    pred = b["x"] @ w
    return ((pred - b["y"]) ** 2).mean()


loss, grad = jax.jit(jax.value_and_grad(loss_fn))(wg, batch)
gsum = float(np.abs(np.asarray(grad)).sum())
print(f"RESULT {float(loss):.6f} {gsum:.6f}", flush=True)
