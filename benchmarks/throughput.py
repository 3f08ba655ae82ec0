#!/usr/bin/env python3
"""Multi-config training-throughput benchmark (SURVEY §7 skeleton).

Covers the BASELINE.json config list beyond the headline bench.py metric:
Pix2Pix and CycleGAN at 256²/512², bf16, all local devices.

Usage: python benchmarks/throughput.py [pix2pix|cyclegan] [img_size] [per_dev_batch]
Prints one JSON line per run (same schema as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import numpy as np

from gan_tpu.data.augment import JITTER_PAD
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop


def run(model: str, img_size: int, per_dev_batch: int, steps: int = 32,
        reps: int = 2) -> dict:
    n_dev = len(jax.devices())
    batch = per_dev_batch * n_dev
    n_imgs = batch * steps
    mesh = make_mesh(n_dev)
    src = img_size + JITTER_PAD
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)

    if model == "pix2pix":
        from gan_tpu.config import Pix2PixConfig
        from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer
        cfg = Pix2PixConfig(data="", output="", img_size=img_size,
                            batch_size=batch, train=True, epochs=1,
                            dtype="bf16", num_devices=n_dev)
        cfg.validate()
        trainer = Pix2PixTrainer(cfg, mesh=mesh)
        cache_np = rng.integers(0, 255, (n_imgs, 2, src, src, 1), np.uint8)
        cache = loop.put_cache(cache_np, mesh)

        def epoch(i):
            trainer._run_epoch(cache, cache_np, jax.random.fold_in(key, i),
                               training=True, fixed_order=True, rng=host_rng)
    else:
        from gan_tpu.config import CycleGANConfig
        from gan_tpu.train.cyclegan_trainer import CycleGANTrainer
        cfg = CycleGANConfig(input_images="", output="", img_size=img_size,
                             batch_size=batch, train=True, epochs=1,
                             dtype="bf16", num_devices=n_dev)
        cfg.validate()
        trainer = CycleGANTrainer(cfg, mesh=mesh)
        x_np = rng.integers(0, 255, (n_imgs, src, src, 1), np.uint8)
        y_np = rng.integers(0, 255, (n_imgs, src, src, 1), np.uint8)
        caches = {"x": loop.put_cache(x_np, mesh),
                  "y": loop.put_cache(y_np, mesh)}

        def epoch(i):
            trainer._run_epoch(caches, x_np, y_np, jax.random.fold_in(key, i),
                               training=True, rng=host_rng)

    from benchmarks._bench_util import hard_sync
    epoch(0)  # compile
    hard_sync(trainer.params)
    t0 = time.perf_counter()
    for r in range(reps):
        epoch(r + 1)
    hard_sync(trainer.params)
    dt = time.perf_counter() - t0  # incl. the hard fence: one ~0.15 s
    # tunnel round trip ensures execution really finished (axon's
    # block_until_ready is a soft barrier for some result kinds)
    ips = reps * steps * batch / dt
    unit = "images/sec/chip" if model == "pix2pix" else "image-pairs/sec/chip"
    return {
        "metric": f"{model}_train_{'images' if model == 'pix2pix' else 'pairs'}"
                  f"_per_sec_per_chip_{img_size}",
        "value": round(ips / n_dev, 2),
        "unit": unit,
        "vs_baseline": round(ips / n_dev / 250.0, 4),
    }


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "pix2pix"
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    pdb = int(sys.argv[3]) if len(sys.argv) > 3 else (32 if img <= 256 else 8)
    print(json.dumps(run(model, img, pdb)))
