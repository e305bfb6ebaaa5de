"""Device mesh + sharding helpers: data-parallel over ICI via GSPMD.

The reference is single-device (SURVEY §2 parallelism audit); here scaling
is a first-class component: a ``jax.sharding.Mesh`` with a ``data`` axis
(optionally ``model`` for tensor sharding of wide layers later), batches
sharded ``P("data")``, parameters replicated, and XLA inserting the gradient
all-reduce over ICI when the jitted train step runs (the pjit/GSPMD
data-parallel recipe — no NCCL analog needed).

Multi-host: each process feeds its local shard;
``jax.make_array_from_process_local_data`` assembles the global batch.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices: Optional[Sequence] = None,
             axis_names: tuple = ("data",),
             shape: Optional[tuple] = None) -> Mesh:
    """Build a mesh over the available devices (default: 1-D data axis)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def mesh_from_config(parallel_cfg: Optional[dict]) -> Mesh:
    """Mesh from a config ``parallel:`` block.

    ``parallel: {mesh: {data: N, model: M}}`` builds an N x M mesh over
    the first N*M devices (``data`` may be -1 = "all remaining").  No
    block (or no ``mesh`` key) keeps the default 1-D data mesh, so
    every shipped recipe runs unchanged on one device.
    """
    if not parallel_cfg or "mesh" not in parallel_cfg:
        return get_mesh()
    spec = dict(parallel_cfg["mesh"])
    axis_names = tuple(spec.keys())
    sizes = list(spec.values())
    n_dev = len(jax.devices())
    if -1 in sizes:
        rest = int(np.prod([s for s in sizes if s != -1]))
        sizes = [n_dev // rest if s == -1 else s for s in sizes]
    total = int(np.prod(sizes))
    if total > n_dev:
        raise ValueError(f"parallel.mesh {spec} needs {total} devices, "
                         f"have {n_dev}")
    return get_mesh(jax.devices()[:total], axis_names=axis_names,
                    shape=tuple(sizes))


def sharding_rules_fn(mesh: Mesh, rules: Optional[list]):
    """Path-based parameter sharding from config ``parallel.rules``.

    Each rule is ``{match: [tokens...], spec: [axis-or-null, ...]}``;
    a pytree leaf whose path contains ALL of the rule's tokens gets
    ``NamedSharding(mesh, P(*spec))`` (first rule wins), everything
    else is replicated.  The same function applies to the optimizer
    state: optax's adam mu/nu mirror the param tree, so their leaf
    paths contain the same name tokens and shard identically.
    """
    rep = NamedSharding(mesh, P())
    compiled = [(tuple(r["match"]),
                 P(*[None if s in (None, "null") else s
                     for s in r["spec"]])) for r in (rules or [])]

    def divisible(leaf, spec):
        for i, ax in enumerate(spec):
            if ax is None:
                continue
            size = int(np.prod([mesh.shape[a] for a in
                                (ax if isinstance(ax, tuple) else (ax,))]))
            if leaf.shape[i] % size != 0:
                return False
        return True

    def leaf_sharding(path, leaf):
        names = tuple(str(getattr(p, "key", getattr(p, "name", p)))
                      for p in path)
        if getattr(leaf, "ndim", 0) == 0:
            return rep
        for tokens, spec in compiled:
            if all(tok in names for tok in tokens):
                # un-shardable dims (not divisible by the axis) fall
                # back to replication instead of failing device_put
                if len(spec) <= leaf.ndim and divisible(leaf, spec):
                    return NamedSharding(mesh, spec)
        return rep

    return leaf_sharding


def tree_shardings(tree, mesh: Mesh, rules: Optional[list]):
    """Apply :func:`sharding_rules_fn` over a whole pytree."""
    fn = sharding_rules_fn(mesh, rules)
    return jax.tree_util.tree_map_with_path(fn, tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch pytree: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put array leaves of a batch dict with the data sharding.

    Non-array leaves (id lists, strings) are passed through untouched —
    they never enter jit.
    """
    sharding = batch_sharding(mesh, axis)
    rep = replicate(mesh)
    axis_size = int(np.prod([mesh.shape[a] for a in ([axis] if
                             isinstance(axis, str) else axis)]))
    out = {}
    for key, value in batch.items():
        if isinstance(value, (np.ndarray, jax.Array)) and np.ndim(value) > 0:
            # keys whose leading dim doesn't divide the mesh (e.g. flat
            # ragged phrase tensors [sum(N), L]) are replicated instead
            if value.shape[0] % axis_size == 0:
                out[key] = jax.device_put(value, sharding)
            else:
                out[key] = jax.device_put(value, rep)
        else:
            out[key] = value
    return out


def global_batch_from_local(batch: dict, mesh: Mesh,
                            axis: str = "data") -> dict:
    """Multi-host input feeding: assemble a global batch from this
    process's local shard (``jax.make_array_from_process_local_data``).

    Single-process meshes fall back to :func:`shard_batch`.  Each process
    must pass its slice of the global batch (DataLoader
    ``shard_index=jax.process_index(), num_shards=jax.process_count()``).
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    sharding = batch_sharding(mesh, axis)
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.ndim > 0:
            out[key] = jax.make_array_from_process_local_data(
                sharding, value)
        else:
            out[key] = value
    return out


def pad_batch_to_multiple(batch: dict, multiple: int) -> tuple[dict, int]:
    """Pad the batch dim so it divides the mesh (last partial batches).

    Returns (padded_batch, real_batch_size).  Padding repeats the last
    element; callers mask out padded rows on the host after the step.
    """
    leaves = [v for v in batch.values()
              if isinstance(v, np.ndarray) and v.ndim > 0]
    if not leaves:
        return batch, 0
    b = leaves[0].shape[0]
    target = -(-b // multiple) * multiple
    if target == b:
        return batch, b
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.ndim > 0 \
                and value.shape[0] == b:
            reps = np.concatenate(
                [value, np.repeat(value[-1:], target - b, axis=0)], axis=0)
            out[key] = reps
        else:
            out[key] = value
    return out, b


def device_feed(batches: Iterable, mesh: Mesh, multiple: int,
                prepare: Optional[Callable] = None,
                depth: int = 2) -> Iterator[tuple[dict, dict, int]]:
    """Asynchronous host→device feed pipeline.

    A background thread prepares (``prepare``, default identity →
    pad → ``shard_batch``/``global_batch_from_local``) and device-puts
    up to ``depth`` batches ahead, so the H2D transfer of batch j+1
    overlaps the accelerator compute of batch j.  ``jax.device_put``
    is thread-safe and enqueues an async copy; consuming the queue
    yields ``(device_batch, host_batch, real_batch_size)`` in order.

    The reference relies on torch DataLoader pinned-memory prefetch for
    the same overlap (SURVEY §2 data pipeline); on TPU the transfer
    rides the PCIe/host link and this pipeline hides it behind the step.
    Exceptions in the worker re-raise at the consuming ``next()``.
    """
    from texttoaudiogrounding_tpu.utils.prefetch import ProducerThread

    def produce():
        for host_batch in batches:
            arr = prepare(host_batch) if prepare else host_batch
            arr, real_bs = pad_batch_to_multiple(arr, multiple)
            dev = global_batch_from_local(arr, mesh)
            yield dev, host_batch, real_bs

    # ProducerThread forwards producer exceptions to the consumer and
    # reaps the thread when the consumer abandons iteration — a step
    # exception can't leave `depth` device batches parked in the queue
    yield from ProducerThread(produce, maxsize=depth)
