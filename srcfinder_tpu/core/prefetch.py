"""Async host->device prefetching with double buffering.

The reference streams flightlines through numpy memmaps synchronously
inside its hot loops (robust_mf.py:297-298 column reads;
cnn_pred_pipeline.py DataLoader with num_workers=0). Here host I/O
(memmap reads, transposes, dtype casts) overlaps device compute: a
background thread stages the next ``depth`` batches onto the device while
the current one computes — the BASELINE.json "async prefetch + double
buffering" north star.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

__all__ = ["prefetch_to_device", "BlockPrefetcher"]

_SENTINEL = object()


def prefetch_to_device(iterator: Iterable, depth: int = 2,
                       device=None) -> Iterator:
    """Yield items from ``iterator`` staged onto the device ahead of use.

    Each item is passed through ``jax.device_put`` (pytrees fine) by a
    background thread; up to ``depth`` items are in flight. Exceptions in
    the producer propagate to the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    # jax.enable_x64 is thread-local; capture the caller's setting so the
    # producer thread does not silently demote f64 blocks to f32
    x64 = bool(jax.config.jax_enable_x64)

    def producer():
        try:
            with jax.enable_x64(x64):
                for item in iterator:
                    q.put(jax.device_put(item, device))
            q.put(_SENTINEL)
        except BaseException as e:  # propagate to consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


class BlockPrefetcher:
    """Double-buffered block reader for big rasters.

    read_fn(i) -> host array for block i (e.g. a memmap slice +
    transpose); blocks [0, n) are staged to the device ``depth`` ahead.

    Usage::

        pf = BlockPrefetcher(read_fn, nblocks)
        for i, xj in pf:
            out = jitted(xj)
    """

    def __init__(self, read_fn: Callable[[int], object], nblocks: int,
                 depth: int = 2, device=None):
        self._gen = prefetch_to_device(
            (read_fn(i) for i in range(nblocks)), depth=depth,
            device=device)
        self._n = nblocks

    def __iter__(self):
        return enumerate(self._gen)

    def __len__(self):
        return self._n
