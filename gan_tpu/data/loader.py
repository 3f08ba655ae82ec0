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
import weakref
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence

import numpy as np


def host_ram_available() -> int:
    """MemAvailable from /proc/meminfo (bytes); 32 GB fallback."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 32 << 30


def host_cache_fits(nbytes: int, mode: str = "auto", *,
                    fraction: float = 0.5) -> bool:
    """Decide decode-everything-up-front (host uint8 cache) vs file
    streaming. ``mode``: on/off force it; auto compares against ``fraction``
    of MemAvailable (the decode itself needs headroom for threads + the
    training process)."""
    if mode in ("on", "off"):
        return mode == "on"
    return nbytes <= fraction * host_ram_available()


# Empirical per-device ceiling for TOTAL resident cache bytes (tile-padded):
# on the v5e/axon stack, epoch programs with >= ~4.4 GB of cache arguments
# crash the TPU worker outright (bracketed round 2: 3.54 GB total always runs
# at full speed, 4.43 GB+ always faults — independent of batch size and
# chunking). Stay well below; bigger corpora move to FLAT storage (below) or
# host streaming. Override with GAN_TPU_DEVICE_CACHE_MAX (bytes).
DEVICE_CACHE_SAFE_BYTES = 3_500_000_000

# FLAT storage (loop.FlatCache) ceiling: rows stored as (N, row_bytes) carry
# no image-tile padding, so more corpus fits under the same argument-bytes
# fault boundary — 4.167 GB (the full 25,472-pair reference corpus) measured
# to train repeatedly at full speed on v5e round 3, consistent with the
# round-2 fault bracket (4.43 GB bad) being a ~4 GiB argument-bytes limit.
# Budget 2× when sizing HBM: XLA keeps an in-program repack of the flat
# cache (measured: temp ≈ cache size), which is why the ceiling stays below
# the bracket rather than at it. 0 on non-TPU platforms (the fault — and the
# padding it guards against — is TPU-specific; tiled always wins there).
# Override with GAN_TPU_FLAT_CACHE_MAX (bytes).
FLAT_CACHE_SAFE_BYTES = 4_200_000_000


def device_cache_fits(nbytes: int, mesh, *, fraction: float = 0.4) -> bool:
    """True when a cache of ``nbytes`` tile-padded bytes (sharded over the
    mesh) fits within ``fraction`` of per-device memory AND under the
    empirical runtime-fault ceiling (DEVICE_CACHE_SAFE_BYTES). Falls back to
    a 12 GB limit estimate when the backend doesn't report one (CPU)."""
    import os

    per_dev = nbytes / max(1, mesh.size)
    dev = mesh.devices.flat[0]
    try:
        limit = dev.memory_stats()["bytes_limit"]
    except Exception:
        limit = 12 << 30
    safe = int(os.environ.get("GAN_TPU_DEVICE_CACHE_MAX",
                              DEVICE_CACHE_SAFE_BYTES))
    if dev.platform != "tpu":
        safe = fraction * limit  # the fault is TPU-stack-specific
    return per_dev <= min(fraction * limit, safe)


# CycleGAN's flat ceiling equals Pix2Pix's. Round 3 first bracketed it LOWER
# (3.3 GB: the 25,446/domain corpus, 4.16 GB flat args, crashed the worker
# where Pix2Pix's 4.17 GB ran) — but that fault was the LONG-PROGRAM limit
# (CycleGAN's small-batch epochs scan 3,000+ steps; programs past ~82 s
# execution fault, XLA memory_analysis cleared them of OOM), not a bytes
# boundary. With epochs segmented into bounded programs (loop.
# run_epoch_segments) the full 4.16 GB dual-domain corpus trains flat at
# full speed (measured r3, batch 4 AND 32). Kept as a named knob because
# CycleGAN's epoch state (2 G + 2 D + 4 Adams) is the first thing to squeeze
# if a future stack shifts the argument-bytes bracket. Override with
# GAN_TPU_FLAT_CACHE_MAX (applies to both models).
CYCLEGAN_FLAT_SAFE_BYTES = FLAT_CACHE_SAFE_BYTES


def flat_cache_budget(mesh, *, fraction: float = 0.27,
                      safe_bytes: int | None = None) -> int:
    """Per-device byte budget for FLAT-stored caches (``safe_bytes``
    defaults to FLAT_CACHE_SAFE_BYTES — see its comment; CycleGAN passes
    CYCLEGAN_FLAT_SAFE_BYTES, today the same value; env-overridable via
    GAN_TPU_FLAT_CACHE_MAX; 0 off-TPU where there is no fault ceiling and
    tiled storage always wins). The ``fraction`` cap (applied only when the
    backend reports a memory limit) reflects flat storage's ~2× HBM
    footprint: cache arguments plus the while-state buffer."""
    import os

    env = os.environ.get("GAN_TPU_FLAT_CACHE_MAX")
    if env is not None:
        return int(env)
    dev = mesh.devices.flat[0]
    if dev.platform != "tpu":
        return 0
    safe = FLAT_CACHE_SAFE_BYTES if safe_bytes is None else safe_bytes
    try:
        stats = dev.memory_stats()
        if stats and "bytes_limit" in stats:
            safe = min(safe, int(fraction * stats["bytes_limit"]))
    except Exception:
        pass
    return safe


def flat_cache_fits(nbytes: int, mesh, *, fraction: float = 0.27,
                    safe_bytes: int | None = None) -> bool:
    """True when a FLAT-stored cache of ``nbytes`` raw bytes (sharded over
    the mesh) stays under the per-device flat budget (flat_cache_budget)."""
    return nbytes / max(1, mesh.size) <= flat_cache_budget(
        mesh, fraction=fraction, safe_bytes=safe_bytes)


def plan_cache_storage(groups, mesh, mode: str = "auto",
                       flat_safe_bytes: int | None = None) -> list[str]:
    """Per-group device-cache storage plan: ``'tiled' | 'flat' | 'stream'``.

    ``groups``: one entry per cache group that must share a decision (a
    CycleGAN epoch zips train_x with train_y, so they cache or stream
    together); each entry is a list of array shapes, or ``None`` to force
    streaming (FileCache corpora are never device-resident whole).

    Tiers (``mode`` = --device-cache auto|on|off):
      * tiled — fastest (no per-batch reshape); taken when every group fits
        tile-padded under the round-2 fault ceiling (device_cache_fits).
      * flat  — ~8% slower epochs, ~35% more rows per byte (no tile
        padding); taken when raw bytes fit under FLAT_CACHE_SAFE_BYTES.
        ``mode='on'`` forces at least this tier for every array group.
      * stream — host-streamed epochs, throughput bound by host→device
        bandwidth (65 MB/s over the axon tunnel — benchmarks/transfer_bench
        .py); when only some groups fit, the LARGEST groups take the flat
        budget first (caching the train set matters most).
    """
    from gan_tpu.train import loop

    n = len(groups)
    if mode == "off":
        return ["stream"] * n
    tiled = [None if g is None else
             sum(loop.padded_cache_nbytes(s) for s in g) for g in groups]
    flat = [None if g is None else
            sum(loop.flat_cache_nbytes(s) for s in g) for g in groups]
    cacheable = [i for i in range(n) if groups[i] is not None]
    plan = ["stream"] * n
    if cacheable:
        if device_cache_fits(sum(tiled[i] for i in cacheable), mesh):
            tier = "tiled"
        elif mode == "on" or flat_cache_fits(
                sum(flat[i] for i in cacheable), mesh,
                safe_bytes=flat_safe_bytes):
            tier = "flat"
        else:
            total = 0
            for i in sorted(cacheable, key=lambda i: -flat[i]):
                if flat_cache_fits(total + flat[i], mesh,
                                   safe_bytes=flat_safe_bytes):
                    plan[i] = "flat"
                    total += flat[i]
            # groups the flat budget couldn't take (e.g. the val cache once
            # the train set claims it) still cache TILED when they fit on
            # their own: the worker-fault bracket binds on per-epoch-PROGRAM
            # argument bytes, and each group runs its own epoch program.
            # (HBM headroom: the fraction caps on both budgets keep
            # flat + tiled + the in-program flat repack well under device
            # memory.)
            t_total = 0
            for i in sorted(cacheable, key=lambda i: -tiled[i]):
                if plan[i] == "stream" and device_cache_fits(
                        t_total + tiled[i], mesh):
                    plan[i] = "tiled"
                    t_total += tiled[i]
            return plan
        for i in cacheable:
            plan[i] = tier
    return plan


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

    def rows(self, idxs) -> np.ndarray:
        """Decode specific files synchronously (remainder batches)."""
        return np.stack(list(self._pool.map(
            lambda i: self.preprocess(self.paths[int(i)]), idxs)))


class FileCache:
    """Array-like facade over :class:`StreamingLoader` for corpora whose
    decoded form exceeds host RAM: exposes ``shape``/``nbytes``/``len`` like
    the uint8 ndarray caches from gan_tpu.data.pipeline, but materializes
    batches lazily from files (background decode threads). Trainers accept
    either an ndarray or a FileCache; a FileCache always takes the
    host-streaming epoch path. Replaces tf.data's per-step disk streaming
    (reference pix2pix.py:155-163) for bigger-than-RAM datasets."""

    def __init__(self, paths: Sequence[str], preprocess: Callable[[str], np.ndarray],
                 sample_shape: tuple, batch_size: int, *, prefetch: int = 4,
                 workers: int = 16):
        self._loader = StreamingLoader(paths, preprocess, batch_size,
                                       prefetch=prefetch, workers=workers)
        self.batch_size = batch_size
        self.shape = (len(paths),) + tuple(sample_shape)
        self.dtype = np.uint8
        self.nbytes = int(np.prod(self.shape))

    def __len__(self) -> int:
        return self.shape[0]

    def epoch(self, order: np.ndarray | None = None):
        """Yield (B, *sample_shape) uint8 batches in ``order``."""
        return self._loader.epoch(order)

    def rows(self, idxs) -> np.ndarray:
        return self._loader.rows(idxs)

    def close(self) -> None:
        self._loader.close()


_DONE = object()


def prefetch_iter(it, depth: int = 2):
    """Drain ``it`` in a background thread, ``depth`` items ahead of the
    consumer — the host→device double-buffer for streamed epochs: the
    producer assembles the NEXT batch (slice/decode, stripe reorder,
    ``device_put`` — all GIL-releasing numpy/transfer work) while the main
    thread dispatches the current train step, so host input work overlaps
    device compute instead of serializing with it (the role tf.data's
    ``prefetch(AUTOTUNE)`` plays in the reference, pix2pix.py:155-163).
    Exceptions in the producer re-raise at the consumer. ``depth=0`` (or
    GAN_TPU_PREFETCH_DEPTH=0) degrades to synchronous passthrough — the
    measurement baseline for the prefetch gain.

    The producer thread starts at CALL time, not first iteration — hybrid
    epochs (trainer ``_run_epoch_hybrid``) rely on this to overlap the
    streamed tail's host→device transfers with the resident scan's device
    compute (transfers proceed during kernel execution on the axon stack —
    measured in benchmarks/transfer_bench.py)."""
    import os

    depth = int(os.environ.get("GAN_TPU_PREFETCH_DEPTH", depth))
    if depth <= 0:
        return iter(it)
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(obj) -> bool:
        # bounded put that gives up once the consumer is gone — otherwise an
        # abandoned epoch (step raised, caller dropped the iterator) leaves
        # the producer blocked forever holding `depth` device-resident
        # batches of HBM
        while not stop.is_set():
            try:
                q.put(obj, timeout=0.2)
                return True
            except queue.Full:
                pass
        return False

    def run():
        try:
            for item in it:
                if not _put(item):
                    return
            _put(_DONE)
        except BaseException as e:
            _put(e)

    threading.Thread(target=run, daemon=True).start()

    def release():
        stop.set()
        try:                          # drop queued device refs promptly
            while True:
                q.get_nowait()
        except queue.Empty:
            pass

    def drain():
        try:
            while True:
                item = q.get()
                if item is _DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            release()

    gen = drain()
    # A generator dropped before its FIRST next() never enters the body, so
    # drain()'s finally never runs (gen.close() on an unstarted generator is
    # a no-op too) — e.g. a hybrid epoch whose resident scan raises before
    # consuming the pre-started tail stream. The finalizer releases the
    # producer (and its up-to-`depth` queued device batches) in that case;
    # it's idempotent with the normal finally path.
    weakref.finalize(gen, release)
    return gen


def pipelined_map(it, fn, *, workers: int = 3, inflight: int = 6):
    """Apply ``fn`` to each item of ``it`` on a small thread pool, yielding
    results IN ORDER with up to ``inflight`` applications in flight.

    The streamed/hybrid epochs use this to run ``device_put`` on several
    tunnel streams at once: a single h2d stream moves 26-65 MB/s on the axon
    stack but 2-4 concurrent streams aggregate ~1.9× (72 MB/s peak,
    degrading at 8 — benchmarks/transfer_bench.py), so parallel puts nearly
    double streaming throughput when transfers are the bottleneck. Items are
    pulled from ``it`` in the consumer thread — compose with
    :func:`prefetch_iter` to move the assembly work off-thread too.
    GAN_TPU_PUT_STREAMS overrides ``workers`` (1 ≈ the serial baseline for
    A/B measurements)."""
    import os
    from collections import deque

    workers = max(1, int(os.environ.get("GAN_TPU_PUT_STREAMS", workers)))
    inflight = min(inflight, 2 * workers)
    pool = ThreadPoolExecutor(max_workers=workers)
    dq: deque = deque()
    it = iter(it)
    try:
        exhausted = False
        while True:
            while not exhausted and len(dq) < inflight:
                try:
                    dq.append(pool.submit(fn, next(it)))
                except StopIteration:
                    exhausted = True
            if not dq:
                return
            yield dq.popleft().result()
    finally:
        pool.shutdown(wait=False)


def prefetched_put_stream(assemble_it, put_one, *, depth: int = 2,
                          assemble_depth: int = 4):
    """The streamed-epoch overlap stack, in one place for both trainers:
    ``assemble_it`` (host batch assembly) drains into a prefetch thread,
    its items flow through :func:`pipelined_map` (``put_one`` =
    ``device_put`` on parallel tunnel streams), and the placed batches
    buffer in a second prefetch layer ``depth`` deep. Both prefetch layers
    start their threads at CALL time, so the parallel puts run while the
    consumer is still blocked on a resident scan (hybrid epochs) or the
    current step; the outer depth bounds device-resident prefetched
    batches."""
    inner = prefetch_iter(assemble_it, depth=assemble_depth)
    return prefetch_iter(pipelined_map(inner, put_one), depth=depth)


def val_stream_depth(n_rows: int, batch_size: int, row_bytes: int) -> int:
    """Device-side prefetch depth for a PRE-STARTED streamed-val epoch
    (trainers start the val producer before dispatching the train epoch, so
    val h2d transfers ride the tunnel during train compute instead of
    serializing after it). Depth bounds how many device_put val batches may
    sit in HBM at once: enough to drain the whole val set under the byte cap
    (GAN_TPU_VAL_PREFETCH_BYTES, default 256 MB — comfortably inside the
    20% headroom the hybrid tiers reserve), never fewer than the normal
    double-buffer."""
    import os

    cap = int(os.environ.get("GAN_TPU_VAL_PREFETCH_BYTES", 256_000_000))
    n_batches = -(-max(n_rows, 1) // batch_size)
    return max(2, min(n_batches, cap // max(1, batch_size * row_bytes)))


def _rebatch(batches, batch_size: int):
    """Re-chunk a stream of (b, ...) arrays into (batch_size, ...) batches
    (last one partial). Holds at most one source batch plus one output batch
    in flight — host memory stays bounded."""
    pending = None
    for b in batches:
        b = b if pending is None else np.concatenate([pending, b])
        pending = None
        lo = 0
        while b.shape[0] - lo >= batch_size:
            yield b[lo:lo + batch_size]
            lo += batch_size
        if lo < b.shape[0]:
            pending = b[lo:]
    if pending is not None and pending.shape[0]:
        yield pending


def iter_uint8_batches(cache, batch_size: int, order: np.ndarray | None = None):
    """Uniform batch iterator over an ndarray cache or a FileCache; always
    yields ``batch_size`` rows per batch (last one partial) — FileCache
    output is re-chunked when its construction-time batch size differs (e.g.
    predict()'s 64-image chunks over a train-batch-sized loader)."""
    if isinstance(cache, FileCache):
        it = cache.epoch(order)
        if batch_size != cache.batch_size:
            it = _rebatch(it, batch_size)
        yield from it
        return
    idx = np.arange(cache.shape[0]) if order is None else np.asarray(order)
    for lo in range(0, len(idx), batch_size):
        sel = idx[lo:lo + batch_size]
        contig = len(sel) and sel[0] + len(sel) - 1 == sel[-1] and (
            np.all(np.diff(sel) == 1) if len(sel) > 1 else True)
        yield cache[sel[0]:sel[0] + len(sel)] if contig else cache[sel]
