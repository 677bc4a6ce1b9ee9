"""Host -> device prefetching input pipeline.

The reference's data path is synchronous per-image JPEG decode inside the
training loop (dataset.lua:148-151, train.lua:214-216, a hot host loop,
SURVEY.md §3.1). Here, a background thread decodes the *next* epoch's batch
while the device trains on the current one, and ``jax.device_put`` overlaps
the transfer — the TPU never waits on the host for synthetic pipelines and
rarely for disk ones.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class _WorkerError:
    """Wraps an exception raised on the prefetch thread for re-raise in
    the consumer (fail-fast instead of a hung q.get())."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_to_device(batch_fn: Callable[[int], object], n_batches: int,
                       *, sharding=None, depth: int = 2,
                       host_only: bool = False) -> Iterator:
    """Yield ``n_batches`` device arrays, producing ``batch_fn(i)`` on a
    background thread ``depth`` steps ahead. ``n_batches < 0`` = infinite.

    ``sharding``: optional jax.sharding.Sharding for device placement
    (e.g. batch sharded over the 'data' mesh axis).
    ``host_only``: skip device placement and yield the host arrays — for
    multi-process pipelines where the consumer assembles a global array
    itself (device_put-then-fetch would round-trip HBM for nothing).
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        # Any batch_fn/device_put failure (bad --dataset path, corrupt
        # JPEG — path scanning happens lazily in this thread) is enqueued
        # and re-raised in the consumer; without this the consumer would
        # block forever on q.get() after the worker died.
        i = 0
        try:
            while not stop.is_set() and (n_batches < 0 or i < n_batches):
                host = batch_fn(i)
                q.put(host if host_only else jax.device_put(host, sharding))
                i += 1
        except BaseException as e:  # noqa: BLE001 — forwarded, not swallowed
            q.put(_WorkerError(e))
        finally:
            q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, _WorkerError):
                raise item.exc
            yield item
    finally:
        stop.set()
        # drain so the worker can exit
        while not q.empty():
            q.get_nowait()
