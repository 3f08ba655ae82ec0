"""loader.pipelined_map — the parallel-transfer stage under streamed/hybrid
batch producers and put_cache. It must yield results IN ORDER with bounded
in-flight work; streamed-epoch RNG pairing and cache striping both depend on
the ordering guarantee."""

import threading
import time

import pytest

from gan_tpu.data.loader import pipelined_map


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
