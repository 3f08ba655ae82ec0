"""Reference-scale CycleGAN epoch benchmark (VERDICT #2 done-criterion).

Runs real trainer epochs (shard_map scan, shuffled take-gathers, the
put_cache device-side relayout) on synthetic caches of 4,096 and 25,600 rows
per domain and reports pairs/sec — the 25.6k number must be within ~10% of
the 4.1k number for the gather/caching design to count as cliff-free at the
reference's corpus size (~25.4k images, SURVEY §6).

Whole scanned epochs only; eager per-dispatch timing over the axon tunnel is
meaningless (CLAUDE.md).
"""

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
BATCH = int(os.environ.get("BENCH_BATCH", "64"))


def run(n_rows: int, epochs: int = 2) -> float:
    if os.environ.get("BENCH_CHUNK_LIMIT"):
        loop.CHUNK_LIMIT_BYTES = int(os.environ["BENCH_CHUNK_LIMIT"])
    cfg = CycleGANConfig(input_images="", target_images="", output="",
                         img_size=IMG, batch_size=BATCH, train=True, epochs=1,
                         dtype="bf16", num_devices=1)
    cfg.validate()
    trainer = CycleGANTrainer(cfg, mesh=make_mesh(1))
    rng = np.random.default_rng(0)
    s = IMG + JITTER_PAD
    x = rng.integers(0, 255, (n_rows, s, s, 1), dtype=np.uint8)
    y = rng.integers(0, 255, (n_rows, s, s, 1), dtype=np.uint8)
    caches = {"x": loop.put_cache(x, trainer.mesh),
              "y": loop.put_cache(y, trainer.mesh)}
    jax.block_until_ready(caches)
    try:
        stats = jax.devices()[0].memory_stats()
        print(f"  [mem] after caches: {stats.get('bytes_in_use', 0)/1e9:.2f} GB"
              f" in use / limit {stats.get('bytes_limit', 0)/1e9:.2f} GB",
              flush=True)
    except Exception as e:
        print("  [mem] stats unavailable:", e, flush=True)
    key = jax.random.PRNGKey(0)
    # warmup/compile epoch
    trainer._run_epoch(caches, x, y, key, training=True, rng=rng)
    t0 = time.perf_counter()
    for e in range(epochs):
        trainer._run_epoch(caches, x, y, jax.random.fold_in(key, e + 1),
                           training=True, rng=rng)
    dt = time.perf_counter() - t0
    return epochs * n_rows / dt


if __name__ == "__main__":
    rows = os.environ.get("BENCH_ROWS")
    sizes = [int(rows)] if rows else [4096, 25_600]
    for n in sizes:
        ips = run(n)
        print(f"n={n:6d} batch={BATCH}: {ips:7.1f} pairs/s", flush=True)
