#!/usr/bin/env python3
"""Headline benchmark: Pix2Pix 256² training throughput (images/sec/chip).

Runs the flagship path — device-resident uint8 cache, fused augment, fused
single-backward G/D train step, lax.scan epochs — on all available devices
(one real TPU chip under the driver) in bf16, and prints ONE JSON line:

    {"metric": "pix2pix_train_images_per_sec_per_chip_256", "value": N,
     "unit": "images/sec/chip", "vs_baseline": N/250}

Baseline: BASELINE.json's north star is 2,000 img/s on a v5e-8 → 250
images/sec/chip. (The TF reference itself derives to ≈17.5 img/s at 512² on a
2080 Ti — BASELINE.md.)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import numpy as np

from gan_tpu.config import Pix2PixConfig
from gan_tpu.data.augment import JITTER_PAD
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

BASELINE_PER_CHIP = 250.0  # north star 2000 img/s on 8 chips


def main() -> None:
    img_size = int(os.environ.get("BENCH_IMG_SIZE", "256"))
    n_dev = len(jax.devices())
    per_dev_batch = int(os.environ.get("BENCH_PER_DEV_BATCH", "128"))
    batch = per_dev_batch * n_dev
    n_imgs = batch * int(os.environ.get("BENCH_STEPS", "32"))

    cfg = Pix2PixConfig(data="", output="", img_size=img_size, batch_size=batch,
                        train=True, epochs=1, dtype="bf16", num_devices=n_dev)
    cfg.validate()
    mesh = make_mesh(n_dev)
    trainer = Pix2PixTrainer(cfg, mesh=mesh)

    rng = np.random.default_rng(0)
    src = img_size + JITTER_PAD
    cache = rng.integers(0, 255, (n_imgs, 2, src, src, 1), dtype=np.uint8)
    cache_dev = loop.put_cache(cache, mesh)
    key = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)

    # warmup (compile)
    from benchmarks._bench_util import hard_sync

    def sync():
        # hard barrier: block_until_ready alone is a soft barrier on the
        # axon tunnel — see benchmarks/_bench_util.hard_sync
        hard_sync(trainer.params)

    # warmup: compile + one steady-state epoch (the first post-compile epoch
    # runs ~15% slow while the runtime warms; measured in round 3)
    for w in range(2):
        trainer._run_epoch(cache_dev, cache, jax.random.fold_in(key, 900 + w),
                           training=True, fixed_order=True, rng=host_rng)
    sync()

    # cost of the sync barrier itself (pure tunnel round trip, work already
    # done) — subtracted from each epoch measurement
    t0 = time.perf_counter()
    sync()
    t_sync = time.perf_counter() - t0

    reps = int(os.environ.get("BENCH_REPS", "4"))
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        trainer._run_epoch(cache_dev, cache, jax.random.fold_in(key, r),
                           training=True, fixed_order=True, rng=host_rng)
        sync()
        times.append(max(time.perf_counter() - t0 - t_sync, 1e-9))

    # median epoch: robust to transient tunnel/host hiccups between epochs
    total_images = (n_imgs // batch) * batch
    ips = total_images / float(np.median(times))
    ips_chip = ips / n_dev
    print(json.dumps({
        "metric": f"pix2pix_train_images_per_sec_per_chip_{img_size}",
        "value": round(ips_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_chip / BASELINE_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
