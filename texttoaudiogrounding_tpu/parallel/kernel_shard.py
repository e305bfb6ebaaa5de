"""Batch-sharded execution of the Pallas kernels under a device mesh.

A ``pallas_call`` carries no GSPMD sharding rule, so when it appears
inside ``jit`` over a sharded mesh XLA replicates its operands (an
all-gather per kernel) — multi-chip serving/training previously had to
disable the fused kernels (``TTG_FUSED_CONV=0 TTG_PALLAS_GRU=0``).
The fix is the documented distributed-Pallas pattern: wrap each kernel
in ``jax.shard_map`` over the mesh's batch axis, so every device runs
the kernel on its local batch shard with the weights replicated.

Mechanics: :class:`GroundingPredictor` and the runner step wrappers
activate a *kernel mesh* context around their jitted calls (the context
is read at trace time); each Pallas entry point then routes itself
through :func:`maybe_shard`, which falls back to the plain call whenever
no mesh is active or a batch dim doesn't divide the axis (e.g. ragged
last batches — the predictor pads those before they get here).

``check_vma=False`` is required (``pallas_call`` outputs carry no vma);
gradient flow through the wrapped custom-VJP GRU is still correct —
cotangents of the replicated weight operands are psummed over the axis
by the shard_map transpose (pinned by tests/test_kernel_shard.py).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Callable, Optional, Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P

_ACTIVE: contextvars.ContextVar = contextvars.ContextVar(
    "ttg_kernel_mesh", default=None)


def active_kernel_mesh() -> Optional[tuple]:
    """The (mesh, batch_axis) the Pallas entries should shard over."""
    return _ACTIVE.get()


@contextlib.contextmanager
def kernel_mesh(mesh: Optional[Mesh], axis: str = "data"):
    """Activate batch-sharded Pallas execution over ``mesh[axis]``.

    A ``None`` mesh or a size-1 axis is a no-op, so single-device code
    paths are untouched.
    """
    if mesh is None or axis not in mesh.shape \
            or int(mesh.shape[axis]) <= 1:
        yield
        return
    token = _ACTIVE.set((mesh, axis))
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def wrap_calls(fn: Callable, mesh: Optional[Mesh],
               axis: str = "data") -> Callable:
    """Return ``fn`` wrapped to run inside :func:`kernel_mesh`.

    Used around jitted steps: the context only matters during the
    trace, but entering a contextvar per call is cheap and keeps
    retraces (new shapes/buckets) consistent.
    """
    if mesh is None or axis not in mesh.shape \
            or int(mesh.shape[axis]) <= 1:
        return fn

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with kernel_mesh(mesh, axis):
            return fn(*args, **kwargs)

    return wrapped


def maybe_shard(fn: Callable, args: Sequence,
                in_dims: Sequence[Optional[int]],
                out_dim: int = 0,
                out_dims: Optional[Sequence[Optional[int]]] = None):
    """Run ``fn(*args)`` shard_mapped over the active kernel mesh.

    ``in_dims[i]`` is the batch-dim index of ``args[i]`` (``None`` =
    replicated operand, e.g. weights); ``out_dim`` the batch dim of the
    single array output — or pass ``out_dims`` when ``fn`` returns a
    tuple of arrays (one batch-dim index per output).  Falls back to
    the plain call when no mesh is active or any batch dim doesn't
    divide the axis size.  The context is cleared inside so the entry
    point doesn't re-wrap recursively.
    """
    ctx = _ACTIVE.get()

    def plain(*a):
        token = _ACTIVE.set(None)
        try:
            return fn(*a)
        finally:
            _ACTIVE.reset(token)

    if ctx is None:
        return plain(*args)
    mesh, axis = ctx
    n = int(mesh.shape[axis])
    if n <= 1:
        return plain(*args)
    for a, d in zip(args, in_dims):
        if d is not None and (a.shape[d] % n != 0 or a.shape[d] < n):
            return plain(*args)

    def spec(d):
        return P() if d is None else P(*([None] * d), axis)

    out_specs = (tuple(spec(d) for d in out_dims)
                 if out_dims is not None else spec(out_dim))
    return jax.shard_map(
        plain, mesh=mesh,
        in_specs=tuple(spec(d) for d in in_dims),
        out_specs=out_specs,
        check_vma=False,  # pallas outputs carry no vma; see module doc
    )(*args)
