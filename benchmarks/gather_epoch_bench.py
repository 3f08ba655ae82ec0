"""Real-epoch gather benchmark: CycleGAN train epochs at reference scale.

Runs the actual shard_map epoch program (trainer._run_epoch) on synthetic
caches of 4,096 and 25,600 rows per domain, forcing each fetch_rows mode, and
reports pairs/sec. This is the decisive measurement for the gather-mode
policy (eager per-dispatch gathers measure meaninglessly over the axon
tunnel; this is whole scanned epochs)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from gan_tpu.config import CycleGANConfig
from gan_tpu.data.augment import JITTER_PAD
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop
from gan_tpu.train.cyclegan_trainer import CycleGANTrainer

IMG = 256
BATCH = 64


def run(n_rows: int, mode: str, epochs: int = 2) -> float:
    cfg = CycleGANConfig(input_images="", target_images="", output="",
                         img_size=IMG, batch_size=BATCH, train=True, epochs=1,
                         dtype="bf16", num_devices=1)
    cfg.validate()
    trainer = CycleGANTrainer(cfg, mesh=make_mesh(1))
    orig = loop.gather_mode
    loop.gather_mode = lambda *a, **k: mode
    try:
        rng = np.random.default_rng(0)
        s = IMG + JITTER_PAD
        x = rng.integers(0, 255, (n_rows, s, s, 1), dtype=np.uint8)
        y = rng.integers(0, 255, (n_rows, s, s, 1), dtype=np.uint8)
        caches = {"x": loop.put_cache(x, trainer.mesh),
                  "y": loop.put_cache(y, trainer.mesh)}
        key = jax.random.PRNGKey(0)
        # warmup/compile epoch
        trainer._run_epoch(caches, x, y, key, training=True, rng=rng)
        t0 = time.perf_counter()
        for e in range(epochs):
            losses = trainer._run_epoch(caches, x, y,
                                        jax.random.fold_in(key, e),
                                        training=True, rng=rng)
        dt = time.perf_counter() - t0
        pairs = epochs * (n_rows // BATCH) * BATCH + epochs * (n_rows % BATCH)
        return pairs / dt
    finally:
        loop.gather_mode = orig


if __name__ == "__main__":
    for n in (4096, 25600):
        for mode in (["onehot"] if n <= 4096 else []) + ["take"]:
            ips = run(n, mode)
            print(f"n={n:6d} mode={mode:7s}: {ips:7.1f} pairs/s", flush=True)
