"""Abandon-safe producer thread: the one prefetch bridge used by both
the thread-mode DataLoader and ``parallel.mesh.device_feed``.

Semantics (each previously hand-rolled, now in one place):

- the producer runs in a daemon thread filling a bounded queue;
- producer exceptions (dataset errors, device_put failures) are
  forwarded and re-raised at the consumer's ``next()`` — never a silent
  hang on a missing sentinel;
- when the consumer abandons iteration (break, exception, generator
  close), the producer is signalled and unblocked — it cannot stay
  parked in ``q.put`` holding prefetched batches/device buffers — and
  the thread is joined before control returns.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class ProducerThread:
    """Iterate ``produce()``'s items through a bounded background queue.

    ``produce`` is called once on the worker thread and must return an
    iterator/generator.  If the consumer stops early, the generator is
    dropped mid-iteration, so its ``finally`` blocks (e.g. a
    ``ThreadPoolExecutor`` context) still run on the worker thread.
    """

    def __init__(self, produce: Callable[[], Iterator], maxsize: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(maxsize, 1))
        self._stop = threading.Event()
        self._sentinel = object()
        self._produce = produce
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _run(self):
        try:
            for item in self._produce():
                if not self._put(item):
                    return
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            self._put(exc)
            return
        self._put(self._sentinel)

    def __iter__(self) -> Iterator:
        try:
            while True:
                item = self._q.get()
                if item is self._sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            self._stop.set()
            while not self._q.empty():
                try:
                    self._q.get_nowait()
                except queue.Empty:  # pragma: no cover - race with worker
                    break
            self._thread.join()
