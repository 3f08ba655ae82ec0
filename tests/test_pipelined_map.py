"""loader.pipelined_map and loader.prefetch_iter — the host pipeline stages
under streamed/hybrid batch producers and put_cache. pipelined_map must yield
results IN ORDER with bounded in-flight work (streamed-epoch RNG pairing and
cache striping depend on the ordering guarantee); prefetch_iter must surface
producer exceptions and release its producer thread when the consumer
abandons the epoch (otherwise it blocks forever holding device-resident
prefetched batches)."""

import threading
import time

import pytest

from gan_tpu.data.loader import pipelined_map, prefetch_iter


def test_order_preserved_under_unequal_latency():
    """Items finishing out of order still yield in input order."""
    def fn(i):
        time.sleep(0.05 if i % 3 == 0 else 0.0)
        return i * 10
    assert list(pipelined_map(iter(range(20)), fn, workers=4)) == [
        i * 10 for i in range(20)]


def test_inflight_bound():
    """At most min(inflight, 2*workers) applications run before the consumer
    drains — the memory bound the device-put stages rely on."""
    lock = threading.Lock()
    started = []

    def fn(i):
        with lock:
            started.append(i)
        return i

    gen = pipelined_map(iter(range(100)), fn, workers=3, inflight=6)
    next(gen)
    time.sleep(0.2)  # let the pool run ahead as far as it is allowed
    # 1 consumed + up to 6 in flight
    assert len(started) <= 7
    assert list(gen) == list(range(1, 100))


def test_exception_propagates():
    def fn(i):
        if i == 3:
            raise ValueError("boom")
        return i

    gen = pipelined_map(iter(range(6)), fn, workers=2)
    assert [next(gen) for _ in range(3)] == [0, 1, 2]
    with pytest.raises(ValueError, match="boom"):
        next(gen)


def test_put_streams_env_override(monkeypatch):
    """GAN_TPU_PUT_STREAMS=1 serializes (the A/B baseline)."""
    monkeypatch.setenv("GAN_TPU_PUT_STREAMS", "1")
    running = []
    peak = []

    def fn(i):
        running.append(i)
        peak.append(len(running))
        time.sleep(0.01)
        running.remove(i)
        return i

    assert list(pipelined_map(iter(range(8)), fn, workers=4)) == list(range(8))
    assert max(peak) == 1


def test_empty_and_short_iterables():
    assert list(pipelined_map(iter([]), lambda x: x)) == []
    assert list(pipelined_map(iter([42]), lambda x: x + 1)) == [43]


def test_prefetch_iter_order_and_exception():
    def src():
        yield from range(5)
        raise ValueError("decode failed")

    g = prefetch_iter(src(), depth=2)
    assert [next(g) for _ in range(5)] == list(range(5))
    with pytest.raises(ValueError, match="decode failed"):
        next(g)


def test_prefetch_iter_depth_zero_is_passthrough(monkeypatch):
    monkeypatch.setenv("GAN_TPU_PREFETCH_DEPTH", "0")
    before = set(threading.enumerate())
    assert list(prefetch_iter(iter(range(4)))) == [0, 1, 2, 3]
    assert set(threading.enumerate()) == before  # no producer thread


def test_prefetch_iter_abandon_unblocks_producer():
    """Closing the drain generator mid-epoch (a step raised, the caller
    dropped the iterator) must terminate the producer thread — otherwise it
    blocks forever on the full queue, pinning `depth` prefetched
    device-resident batches of HBM for the rest of the process."""
    def src():
        i = 0
        while True:
            yield i
            i += 1

    before = set(threading.enumerate())
    g = prefetch_iter(src(), depth=1)
    (producer,) = [t for t in threading.enumerate() if t not in before]
    assert next(g) == 0
    g.close()  # consumer abandons the epoch
    producer.join(timeout=5.0)
    assert not producer.is_alive()


def test_prefetch_iter_dropped_unstarted_releases_producer():
    """Dropping the iterator before its FIRST next() must also terminate the
    producer (drain()'s finally never runs for an unstarted generator, and
    gen.close() is a no-op there) — e.g. a hybrid epoch whose resident scan
    raises before consuming the pre-started tail stream. Without the
    finalizer the producer spins forever holding `depth` queued batches."""
    import gc

    def src():
        i = 0
        while True:
            yield i
            i += 1

    before = set(threading.enumerate())
    g = prefetch_iter(src(), depth=1)
    (producer,) = [t for t in threading.enumerate() if t not in before]
    del g          # never iterated
    gc.collect()   # finalizer fires -> stop set -> producer exits
    producer.join(timeout=5.0)
    assert not producer.is_alive()
