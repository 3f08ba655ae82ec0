#!/usr/bin/env python3
"""Per-component timing breakdown on the current backend.

Times each piece of the Pix2Pix step (augment, G fwd, D fwd, fused loss fwd,
full train step) so kernel work targets the real bottleneck rather than a
guess. Run on the TPU: `python benchmarks/breakdown.py [batch] [img_size]`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from gan_tpu.config import Pix2PixConfig
from gan_tpu.data.augment import JITTER_PAD, paired_jitter_batch
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = Pix2PixConfig(data="", output="", img_size=img, batch_size=batch,
                        train=True, epochs=1, dtype="bf16", num_devices=1)
    cfg.validate()
    t = Pix2PixTrainer(cfg, mesh=make_mesh(1))
    key = jax.random.PRNGKey(0)
    dt = cfg.compute_dtype

    src = img + JITTER_PAD
    pair_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, 2, src, src, 1), np.uint8))
    x = jax.random.uniform(key, (batch, img, img, 1), dtype=dt, minval=-1, maxval=1)
    y = jax.random.uniform(key, (batch, img, img, 1), dtype=dt, minval=-1, maxval=1)

    aug = jax.jit(lambda p, k: paired_jitter_batch(p, k, img_size=img, dtype=dt))
    g_fwd = jax.jit(lambda p, x, k: t.gen.apply(p, x, rng=k, compute_dtype=dt))
    d_fwd = jax.jit(lambda p, x, y: t.disc.apply(p, x, y, compute_dtype=dt))
    loss_fwd = jax.jit(lambda p, x, y, k: t._losses(p, x, y, k)[0])
    step = jax.jit(lambda p, o, b, k: t._train_step(p, o, b, k))

    results = {
        "augment": timeit(aug, pair_u8, key),
        "gen_fwd": timeit(g_fwd, t.params["gen"], x, key),
        "disc_fwd": timeit(d_fwd, t.params["disc"], x, y),
        "losses_fwd": timeit(loss_fwd, t.params, x, y, key),
        "train_step": timeit(step, t.params, t.opt_states, (x, y), key, reps=10),
    }
    print(f"batch={batch} img={img} dtype=bf16  (ms, images/sec)")
    for k, v in results.items():
        print(f"  {k:12s} {v * 1e3:8.2f} ms   {batch / v:9.1f} img/s")


if __name__ == "__main__":
    main()
