#!/usr/bin/env python3
"""Compile-time memory probe for CycleGAN/Pix2Pix FLAT-cache epoch programs.

Round 3 found CycleGAN flat epochs crashing the axon worker at dual-cache
sizes (1.96 GB) far below both the committed CYCLEGAN_FLAT_SAFE_BYTES
bracket and Pix2Pix's passing 4.17 GB — with the crash surviving a serial-
put A/B (GAN_TPU_PUT_STREAMS=1), so it is a property of the EPOCH PROGRAM,
not the transfer path. The structural difference vs the passing Pix2Pix
runs is the gather mode: CycleGAN's per-epoch reshuffles use `take`
gathers over the flat strips, Pix2Pix's fixed-order epochs use `contig`
slices.

This probe AOT-compiles the exact epoch executable with ABSTRACT cache
leaves (jax.ShapeDtypeStruct — no GB-scale transfers, nothing resident)
and prints XLA's memory_analysis, so crash sizes can be compared against
the compiler's own HBM accounting: if peak ≈ HBM at the crash sizes the
fault is deterministic OOM (fix: budget); if peak is small the fault is a
worker/runtime defect at execution time (fix: bracket empirically).

Usage: python benchmarks/cg_hbm_probe.py MODEL N [BATCH] [IMG]
  MODEL: cyclegan | pix2pix       N: rows (per domain for cyclegan)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import numpy as np

from gan_tpu.data.augment import JITTER_PAD
from gan_tpu.parallel.mesh import batch_sharding
from gan_tpu.train import loop


def abstract_flat_cache(n: int, sample_shape, mesh) -> loop.FlatCache:
    """ShapeDtypeStruct mirror of put_cache(storage='flat') output (single
    chunk; strips of FLAT_STRIP_BYTES columns)."""
    row = int(np.prod(sample_shape))
    sh = batch_sharding(mesh)
    strips = [jax.ShapeDtypeStruct(
        (max(1, n // mesh.size) * mesh.size,
         min(loop.FLAT_STRIP_BYTES, row - lo)), np.uint8, sharding=sh)
        for lo in range(0, row, loop.FLAT_STRIP_BYTES)]
    return loop.FlatCache(strips, sample_shape)


def analyze(compiled) -> dict:
    ma = compiled.memory_analysis()
    if ma is None:
        return {"peak_hbm_gb": None}
    args = getattr(ma, "argument_size_in_bytes", 0)
    outs = getattr(ma, "output_size_in_bytes", 0)
    temp = getattr(ma, "temp_size_in_bytes", 0)
    alias = getattr(ma, "alias_size_in_bytes", 0)
    return {
        "peak_hbm_gb": round((args + outs + temp - alias) / 1e9, 3),
        "hbm_breakdown_gb": {
            "arguments": round(args / 1e9, 3),
            "outputs": round(outs / 1e9, 3),
            "temps": round(temp / 1e9, 3),
            "aliased": round(alias / 1e9, 3),
        },
    }


def probe_cyclegan(n: int, batch: int, img: int) -> dict:
    from gan_tpu.config import CycleGANConfig
    from gan_tpu.train.cyclegan_trainer import CycleGANTrainer

    n_dev = len(jax.devices())
    cfg = CycleGANConfig(input_images="", target_images="", output="",
                         img_size=img, batch_size=batch, train=True,
                         epochs=1, dtype="bf16", num_devices=n_dev)
    cfg.validate()
    trainer = CycleGANTrainer(cfg)
    src = img + JITTER_PAD
    n_steps, b_loc, _ = loop.epoch_plan(n, batch, n_dev)
    rng = np.random.default_rng(0)
    if n_dev == 1:
        perm = lambda: (loop.epoch_perm(n, cfg.buffer_size, rng)
                        [: n_steps * batch].reshape(n_steps, batch)
                        .astype(np.int32))
        perms = {"x": perm(), "y": perm()}
    else:
        px, _ = loop.shuffled_stripe_perm(n, ndev=n_dev, n_steps=n_steps,
                                          per_dev_batch=b_loc,
                                          buffer_size=cfg.buffer_size, rng=rng)
        py, _ = loop.shuffled_stripe_perm(n, ndev=n_dev, n_steps=n_steps,
                                          per_dev_batch=b_loc,
                                          buffer_size=cfg.buffer_size, rng=rng)
        perms = {"x": px, "y": py}
    caches = {"x": abstract_flat_cache(n, (src, src, 1), trainer.mesh),
              "y": abstract_flat_cache(n, (src, src, 1), trainer.mesh)}
    fn = trainer._get_epoch_fn(True, "take")
    compiled = fn.lower(trainer.params, trainer.opt_states, caches, perms,
                        jax.random.PRNGKey(0)).compile()
    out = {"model": "cyclegan", "rows_per_domain": n, "batch": batch,
           "img": img, "gather": "take",
           "cache_gb_total": round(2 * n * src * src / 1e9, 3)}
    out.update(analyze(compiled))
    return out


def probe_pix2pix(n: int, batch: int, img: int) -> dict:
    from gan_tpu.config import Pix2PixConfig
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    n_dev = len(jax.devices())
    cfg = Pix2PixConfig(data="", output="", img_size=img, batch_size=batch,
                        train=True, epochs=1, dtype="bf16", num_devices=n_dev)
    cfg.validate()
    trainer = Pix2PixTrainer(cfg)
    src = img + JITTER_PAD
    n_steps, b_loc, _ = loop.epoch_plan(n, batch, n_dev)
    perm = loop.local_perm(n, ndev=n_dev, n_steps=n_steps,
                           per_dev_batch=b_loc)
    cache = abstract_flat_cache(n, (2, src, src, 1), trainer.mesh)
    fn = trainer._get_epoch_fn(True, "contig")
    compiled = fn.lower(trainer.params, trainer.opt_states, cache, perm,
                        jax.random.PRNGKey(0)).compile()
    out = {"model": "pix2pix", "rows": n, "batch": batch, "img": img,
           "gather": "contig",
           "cache_gb_total": round(n * 2 * src * src / 1e9, 3)}
    out.update(analyze(compiled))
    return out


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "cyclegan"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else (4 if model == "cyclegan" else 128)
    img = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    fn = {"cyclegan": probe_cyclegan, "pix2pix": probe_pix2pix}[model]
    print(json.dumps(fn(n, batch, img)), flush=True)
