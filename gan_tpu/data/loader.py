"""Host→device input streaming for datasets that exceed device HBM.

The flagship path keeps the whole uint8 cache device-resident
(train/loop.py); reference-scale data (≈4.2 GB at 256², SURVEY §6) fits a
v5e's 16 GB. When it doesn't (512², C=3, or bigger corpora), this module
streams: background threads decode/preprocess files into pinned host batches
while the device trains on the previous ones — the grain-style prefetch that
replaces ``tf.data`` map/batch/prefetch AUTOTUNE (pix2pix.py:155-163).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence

import numpy as np


def device_cache_fits(nbytes: int, mesh, *, fraction: float = 0.4) -> bool:
    """True when a cache of ``nbytes`` (sharded over the mesh) fits within
    ``fraction`` of per-device memory. Falls back to a 12 GB estimate when the
    backend doesn't report limits (CPU)."""
    per_dev = nbytes / max(1, mesh.size)
    dev = mesh.devices.flat[0]
    try:
        limit = dev.memory_stats()["bytes_limit"]
    except Exception:
        limit = 12 << 30
    return per_dev <= fraction * limit


class StreamingLoader:
    """Iterate uint8 host batches assembled by a thread pool, ``prefetch``
    batches ahead of the consumer.

    preprocess(path) -> (sample_shape) uint8 — the deterministic per-file work
    (decode, split, resize) from gan_tpu.data.pipeline; the random augment
    still runs fused on device per batch.
    """

    def __init__(self, paths: Sequence[str], preprocess: Callable[[str], np.ndarray],
                 batch_size: int, *, drop_remainder: bool = False,
                 prefetch: int = 4, workers: int = 16):
        self.paths = list(paths)
        self.preprocess = preprocess
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self) -> int:
        n = len(self.paths)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def epoch(self, order: np.ndarray | None = None):
        """Yield (B, ...) uint8 batches; ``order`` permutes the file list."""
        idx = np.arange(len(self.paths)) if order is None else np.asarray(order)
        if self.drop_remainder:
            idx = idx[: (len(idx) // self.batch_size) * self.batch_size]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        n_batches = -(-len(idx) // self.batch_size)

        def producer():
            try:
                for b in range(n_batches):
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    samples = list(self._pool.map(
                        lambda i: self.preprocess(self.paths[int(i)]), sel))
                    q.put(np.stack(samples))
                q.put(None)
            except BaseException as e:  # surface decode errors to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self) -> None:
        self._pool.shutdown(wait=False)
