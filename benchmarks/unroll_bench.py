#!/usr/bin/env python3
"""A/B the epoch scan's unroll factor on the real chip, in ONE process.

The epoch runner is a single ``jax.lax.scan`` over train steps
(gan_tpu/train/loop.py make_cached_epoch). Unrolling the scan body gives
XLA's scheduler visibility across step boundaries — it can overlap the next
step's cache gather/augment with the current step's conv stack — at the cost
of a proportionally larger program. This probe builds the SAME Pix2Pix
trainer under unroll factors {1, 2, 4} by patching ``jax.lax.scan``'s default
before each epoch-runner build, then times steady-state epochs back to back
on the same chip (cross-process chip/tunnel drift makes separate-process A/B
meaningless — STATUS.md timing methodology).

Usage: python benchmarks/unroll_bench.py [unroll_factors...]
Prints one JSON line per factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from gan_tpu.config import Pix2PixConfig
from gan_tpu.data.augment import JITTER_PAD
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

from benchmarks._bench_util import hard_sync

_ORIG_SCAN = jax.lax.scan


def _patched_scan(unroll: int):
    def scan(body, init, xs=None, **kw):
        kw.setdefault("unroll", unroll)
        return _ORIG_SCAN(body, init, xs, **kw)
    return scan


def run_factor(unroll: int, cache, cache_dev, mesh, cfg, reps: int) -> dict:
    jax.lax.scan = _patched_scan(unroll) if unroll != 1 else _ORIG_SCAN
    try:
        trainer = Pix2PixTrainer(cfg, mesh=mesh)  # rebuilds the epoch runner
    finally:
        jax.lax.scan = _ORIG_SCAN
    key = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)

    def sync():
        hard_sync(trainer.params)

    for w in range(2):  # compile + steady-state warmup
        trainer._run_epoch(cache_dev, cache, jax.random.fold_in(key, 900 + w),
                           training=True, fixed_order=True, rng=host_rng)
    sync()
    t0 = time.perf_counter()
    sync()
    t_sync = time.perf_counter() - t0

    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        trainer._run_epoch(cache_dev, cache, jax.random.fold_in(key, r),
                           training=True, fixed_order=True, rng=host_rng)
        sync()
        times.append(max(time.perf_counter() - t0 - t_sync, 1e-9))
    n_imgs = cache.shape[0]
    ips = (n_imgs // cfg.batch_size * cfg.batch_size) / float(np.median(times))
    return {"unroll": unroll, "images_per_sec_per_chip": round(ips, 2),
            "epoch_times_s": [round(t, 3) for t in times]}


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 1]
    img_size = int(os.environ.get("BENCH_IMG_SIZE", "256"))
    per_dev_batch = int(os.environ.get("BENCH_PER_DEV_BATCH", "128"))
    n_dev = len(jax.devices())
    batch = per_dev_batch * n_dev
    n_imgs = batch * int(os.environ.get("BENCH_STEPS", "32"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    cfg = Pix2PixConfig(data="", output="", img_size=img_size,
                        batch_size=batch, train=True, epochs=1, dtype="bf16",
                        num_devices=n_dev)
    cfg.validate()
    mesh = make_mesh(n_dev)
    src = img_size + JITTER_PAD
    cache = np.random.default_rng(0).integers(
        0, 255, (n_imgs, 2, src, src, 1), dtype=np.uint8)
    cache_dev = loop.put_cache(cache, mesh)

    for f in factors:
        print(json.dumps(run_factor(f, cache, cache_dev, mesh, cfg, reps)),
              flush=True)


if __name__ == "__main__":
    main()
