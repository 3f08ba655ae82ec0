"""Host→device transfer micro-benchmark — the streamed path's speed limit.

Measures (a) single-put bandwidth vs transfer size, (b) aggregate bandwidth
vs concurrency, and (c) whether transfers overlap device compute (they must,
for prefetch/hybrid epochs to hide them).

Round-3 numbers on the v5e axon tunnel (the published bottleneck analysis
for why streamed epochs cannot approach cached ones on THIS stack):

    put   32 MB        26 MB/s          1 thread x 64 MB   37 MB/s
    put  128 MB        46 MB/s          2 threads          67 MB/s
    put  512 MB        65 MB/s          4 threads          72 MB/s   (peak)
    put_cache 4.17 GB  167 MB/s (chunks of 1.39 GB)        8 threads 50 MB/s
    overlap: 909 ms compute + 1259 ms put ran in 1289 ms total (~full overlap)

At 163,592 B per 256² pair, 72 MB/s caps streaming at ~440 img/s — far under
the ~1,500 img/s compute rate, hence the flat/hybrid device caches
(train/loop.py FlatCache, trainer _run_epoch_hybrid). A real TPU host NIC/PCIe
does multiple GB/s; on such hosts streaming is compute-bound instead and the
same code simply stops being transfer-limited.

Usage: python benchmarks/transfer_bench.py [--quick]
"""

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks._bench_util import hard_sync


def put(dev, x):
    a = jax.device_put(x, dev)
    a.block_until_ready()
    return a


def bench_sizes(dev, sizes_mb):
    put(dev, np.zeros(1 << 20, np.uint8))  # warm the path
    out = []
    for mb in sizes_mb:
        x = np.random.randint(0, 255, size=(mb << 20,), dtype=np.uint8)
        t0 = time.perf_counter()
        a = put(dev, x)
        hard_sync(a)
        dt = time.perf_counter() - t0
        out.append({"metric": f"h2d_put_{mb}mb_mb_per_sec",
                    "value": round(mb / dt, 1), "unit": "MB/s"})
        print(out[-1], flush=True)
        del a
    return out


def bench_concurrency(dev, threads_list, mb=64):
    base = np.random.randint(0, 255, size=(mb << 20,), dtype=np.uint8)
    out = []
    for nt in threads_list:
        xs = [base.copy() for _ in range(nt)]
        t0 = time.perf_counter()
        with ThreadPoolExecutor(nt) as ex:
            arrs = list(ex.map(lambda x: put(dev, x), xs))
        hard_sync(arrs[0])
        dt = time.perf_counter() - t0
        out.append({"metric": f"h2d_put_{nt}x{mb}mb_aggregate_mb_per_sec",
                    "value": round(nt * mb / dt, 1), "unit": "MB/s"})
        print(out[-1], flush=True)
        del arrs
    return out


def bench_overlap(dev, mb=64):
    """Launch a long compute kernel, then time a put issued during it: the
    combined wall-clock vs the serial sum shows whether DMA rides alongside
    execution (prerequisite for prefetch/hybrid epochs to hide transfers)."""
    @jax.jit
    def burn(a):
        def body(c, _):
            return jnp.tanh(c @ a), 0
        c, _ = jax.lax.scan(body, a, None, length=600)
        return c

    a = jnp.ones((4096, 4096), jnp.bfloat16)
    hard_sync(burn(a))  # compile
    t0 = time.perf_counter(); r = burn(a); hard_sync(r)
    burn_t = time.perf_counter() - t0
    x = np.random.randint(0, 255, size=(mb << 20,), dtype=np.uint8)
    t0 = time.perf_counter(); b = put(dev, x); hard_sync(b)
    idle_put = time.perf_counter() - t0

    t0 = time.perf_counter()
    r = burn(a)
    b = put(dev, x)
    hard_sync(r)
    hard_sync(b)   # put() only soft-blocks; without this the clock can stop
    both = time.perf_counter() - t0  # while the transfer DMA is in flight
    res = {"metric": "h2d_overlap_efficiency",
           "value": round((burn_t + idle_put - both) / min(burn_t, idle_put), 2),
           "unit": "fraction of the shorter op hidden",
           "detail": {"burn_ms": round(burn_t * 1e3), "put_ms": round(idle_put * 1e3),
                      "concurrent_ms": round(both * 1e3)}}
    print(res, flush=True)
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    bench_sizes(dev, [32, 128] if args.quick else [32, 128, 512])
    bench_concurrency(dev, [1, 2, 4] if args.quick else [1, 2, 4, 8])
    bench_overlap(dev)
