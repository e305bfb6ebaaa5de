"""Batching data loader with background prefetch and per-host sharding.

Replaces torch ``DataLoader`` (the reference's only multiprocess component,
SURVEY §2): samples are fetched by a thread pool (h5py/NumPy release the
GIL), collated host-side, and optionally sharded so each JAX process feeds
its slice of a global batch (``jax.make_array_from_process_local_data``
composition happens in the training layer).

``worker_type="process"`` switches to persistent forkserver worker
*processes* with shared-memory batch transport — the HDF5 library holds a
global lock, so threaded readers serialize no matter how many worker
threads run; process workers read truly in parallel (the role torch
DataLoader workers play for the reference).  Batches cross back as
``multiprocessing.shared_memory`` segments wrapped zero-copy into NumPy
views; the segment is unlinked when the consumer drops the batch.
Like torch DataLoader's spawn mode, user *scripts* driving a process
loader need the standard ``if __name__ == "__main__":`` guard (worker
bootstrap re-imports the main module); the shipped runners/CLI comply.
"""

from __future__ import annotations

import atexit
import pickle
import queue
import threading
import weakref
from typing import Callable, Iterator, Optional

import numpy as np

from texttoaudiogrounding_tpu.utils.registry import register

_SHM_ALIGN = 64

atexit.register(lambda: _reap_shm())


def _shm_pack(batch: dict):
    """Worker side: copy array values into one shared-memory segment."""
    from multiprocessing import shared_memory

    arrays, others = {}, {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray):
            arrays[key] = np.ascontiguousarray(value)
        else:
            others[key] = value
    meta, offset = [], 0
    for key, arr in arrays.items():
        offset = -(-offset // _SHM_ALIGN) * _SHM_ALIGN
        meta.append((key, arr.dtype.str, arr.shape, offset))
        offset += arr.nbytes
    shm = shared_memory.SharedMemory(create=True, size=max(offset, 1))
    for (key, _, _, off), arr in zip(meta, arrays.values()):
        dst = np.frombuffer(shm.buf, np.uint8, arr.nbytes, off)
        dst[:] = arr.reshape(-1).view(np.uint8)
        del dst  # drop the buffer export so close() below succeeds
    name, total = shm.name, max(offset, 1)
    shm.close()
    return name, total, meta, others


_pending_shm: list = []
_pending_lock = threading.Lock()


def _reap_shm():
    """Close segments whose consumer views have been collected.  The
    finalize callback fires while the base array's buffer export still
    exists (weakref callbacks run before dealloc completes), so close()
    is deferred here and retried on later unpacks / at exit."""
    with _pending_lock:
        items, _pending_shm[:] = _pending_shm[:], []
    keep = []
    for shm in items:
        try:
            shm.close()
        except BufferError:  # views still mid-dealloc
            keep.append(shm)
        except Exception:  # pragma: no cover
            pass
    with _pending_lock:
        _pending_shm.extend(keep)


def _shm_cleanup(shm):
    try:
        shm.unlink()  # name removal is safe while mappings exist
    except Exception:  # pragma: no cover - already unlinked
        pass
    with _pending_lock:
        _pending_shm.append(shm)


def _shm_discard(payload):
    """Unlink a stale segment without wrapping it."""
    from multiprocessing import shared_memory
    try:
        shm = shared_memory.SharedMemory(name=payload[0])
        shm.close()
        shm.unlink()
    except Exception:  # pragma: no cover - already gone
        pass


def _shm_unpack(payload) -> dict:
    """Consumer side: zero-copy NumPy views over the segment; the segment
    is unlinked when the views are garbage-collected (close deferred via
    :func:`_reap_shm`)."""
    from multiprocessing import shared_memory

    _reap_shm()
    name, total, meta, others = payload
    shm = shared_memory.SharedMemory(name=name)
    base = np.frombuffer(shm.buf, np.uint8, total)
    weakref.finalize(base, _shm_cleanup, shm)
    batch = dict(others)
    for key, dtype_str, shape, off in meta:
        dt = np.dtype(dtype_str)
        nbytes = int(np.prod(shape)) * dt.itemsize
        batch[key] = base[off:off + nbytes].view(dt).reshape(shape)
    return batch


def _identity_collate(items):
    return items


def _worker_loop(ds_pkl: bytes, collate_pkl: bytes, task_q, result_q):
    dataset = pickle.loads(ds_pkl)
    collate = pickle.loads(collate_pkl)
    while True:
        task = task_q.get()
        if task is None:
            break
        seq, reseed, idxs = task
        try:
            if reseed is not None and hasattr(dataset, "reseed"):
                dataset.reseed(reseed)
            batch = collate([dataset[int(i)] for i in idxs])
            if isinstance(batch, dict):
                result_q.put((seq, "ok", _shm_pack(batch)))
            else:  # non-dict batches ride the queue pickled
                result_q.put((seq, "pkl", batch))
        except BaseException as exc:  # noqa: BLE001 — re-raised by consumer
            import traceback
            result_q.put((seq, "error",
                          f"{type(exc).__name__}: {exc}\n"
                          f"{traceback.format_exc()}"))


@register("DataLoader")
class DataLoader:
    def __init__(self, dataset, batch_size: int,
                 collate_fn: Optional[Callable] = None,
                 shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, num_workers: int = 0,
                 prefetch: int = 2, worker_type: str = "thread",
                 shard_index: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn or _identity_collate
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        if worker_type not in ("thread", "process"):
            raise ValueError(f"bad worker_type {worker_type!r}")
        self.worker_type = worker_type
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0
        self._procs = None
        self._next_seq = 0

    def set_epoch(self, epoch: int) -> None:
        """Advance the shuffle (and dataset sampling) RNG per epoch."""
        self.epoch = epoch
        if hasattr(self.dataset, "reseed"):
            self.dataset.reseed(epoch)

    def _batch_indices(self) -> list[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        order = order[self.shard_index::self.num_shards]
        batches = []
        for i in range(0, len(order), self.batch_size):
            chunk = order[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)
        return batches

    def __len__(self) -> int:
        return len(self._batch_indices())

    def _make_batch(self, idxs: np.ndarray):
        return self.collate_fn([self.dataset[int(i)] for i in idxs])

    # ---- process workers (persistent, spawn context) ----

    def _start_procs(self):
        import multiprocessing as mp
        # forkserver: workers fork from a clean exec'd server process —
        # no unsafe fork of the (jax-threaded) parent AND no re-import
        # of the user's __main__ (the spawn context re-runs the calling
        # script, which deadlocks scripts without a __main__ guard)
        try:
            ctx = mp.get_context("forkserver")
            # the default preload list is ['__main__'] — importing the
            # user's script into the server re-executes unguarded code;
            # preload this module instead (numpy + package warm)
            ctx.set_forkserver_preload(
                ["texttoaudiogrounding_tpu.data.loader"])
        except ValueError:  # pragma: no cover - non-Linux fallback
            ctx = mp.get_context("spawn")
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        ds_pkl = pickle.dumps(self.dataset)
        collate_pkl = pickle.dumps(self.collate_fn)
        procs = [ctx.Process(target=_worker_loop,
                             args=(ds_pkl, collate_pkl, task_q, result_q),
                             daemon=True)
                 for _ in range(self.num_workers)]
        for p in procs:
            p.start()
        self._procs = (procs, task_q, result_q)
        weakref.finalize(self, _shutdown_procs, procs, task_q)

    def _iter_procs(self, batches) -> Iterator[dict]:
        if self._procs is None:
            self._start_procs()
        procs, task_q, result_q = self._procs
        window = self.num_workers + self.prefetch
        # absolute sequence numbers across iterations: an abandoned
        # iterator (break mid-epoch) leaves in-flight results behind,
        # which the next iteration must recognize as stale and drop
        base = self._next_seq
        next_submit = 0

        def submit(i):
            # per-task reseed keeps sampling datasets deterministic no
            # matter which worker picks the task up (thread mode draws
            # one shared per-epoch stream instead — same distribution,
            # different draws)
            task_q.put((base + i,
                        self.seed + self.epoch * 1000003 + i,
                        batches[i]))

        try:
            while next_submit < min(window, len(batches)):
                submit(next_submit)
                next_submit += 1
            pending: dict[int, dict] = {}
            next_yield = 0
            while next_yield < len(batches):
                while base + next_yield not in pending:
                    try:
                        seq, status, payload = result_q.get(timeout=5.0)
                    except queue.Empty:
                        # liveness: an OOM-killed/segfaulted worker
                        # (native pack, h5py) posts nothing — without
                        # this check the loader would wait forever
                        dead = [p for p in procs if not p.is_alive()]
                        if dead:
                            _shutdown_procs(procs, task_q)
                            _drain_results(result_q)
                            self._procs = None
                            raise RuntimeError(
                                "DataLoader worker process died "
                                f"(exitcode {dead[0].exitcode})")
                        continue
                    if seq < base:  # stale result from an abandoned epoch
                        if status == "ok":
                            _shm_discard(payload)
                        continue
                    if status == "error":
                        _shutdown_procs(procs, task_q)
                        _drain_results(result_q)
                        self._procs = None
                        raise RuntimeError(
                            f"DataLoader worker failed on batch "
                            f"{seq - base}:\n{payload}")
                    pending[seq] = (_shm_unpack(payload)
                                    if status == "ok" else payload)
                yield pending.pop(base + next_yield)
                next_yield += 1
                if next_submit < len(batches):
                    submit(next_submit)
                    next_submit += 1
        finally:
            self._next_seq = base + next_submit

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        if self.num_workers <= 0:
            for idxs in batches:
                yield self._make_batch(idxs)
            return
        if self.worker_type == "process":
            yield from self._iter_procs(batches)
            return

        from concurrent.futures import ThreadPoolExecutor

        from texttoaudiogrounding_tpu.utils.prefetch import ProducerThread

        def produce():
            window = self.num_workers + self.prefetch
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(self._make_batch, idxs)
                           for idxs in batches[:window]]
                next_idx = window
                for i in range(len(batches)):
                    # .result() re-raises dataset/collate errors; the
                    # ProducerThread forwards them to the consumer's
                    # next() (previously a missing sentinel hung it)
                    yield futures[i].result()
                    if next_idx < len(batches):
                        futures.append(
                            pool.submit(self._make_batch,
                                        batches[next_idx]))
                        next_idx += 1

        yield from ProducerThread(produce, maxsize=self.prefetch)


def _drain_results(result_q):
    """After a worker failure, in-flight "ok" results still in the
    queue hold /dev/shm segments that nobody will ever unpack — unlink
    them so repeated catch-and-retry doesn't exhaust /dev/shm.  Called
    after :func:`_shutdown_procs` (workers joined, no more publishes)."""
    while True:
        try:
            _, status, payload = result_q.get(timeout=0.5)
        except Exception:  # queue.Empty or a torn-down queue
            return
        if status == "ok":
            _shm_discard(payload)


def _shutdown_procs(procs, task_q):
    for _ in procs:
        try:
            task_q.put(None)
        except Exception:  # pragma: no cover - queue torn down at exit
            return
    for p in procs:
        p.join(timeout=5)
        if p.is_alive():  # pragma: no cover - stuck worker
            p.terminate()
