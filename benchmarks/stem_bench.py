#!/usr/bin/env python3
"""Stem-conv A/B: std k=4 s=2 'same' vs space-to-depth rewrite.

The U-Net stem conv reads a C_in=1 grayscale activation and the PatchGAN
stem a C_in=2 concat — tiny channel counts that waste the tiled layout's
lane dim and make the stem bandwidth-bound on padding (mfu_breakdown.py
marks both stems "bandwidth"). ops/conv.py conv2d_down_s2d packs 4 real
channels per pixel via space-to-depth before ONE 2x2 stride-1 conv,
numerically identical (tests/test_ops.py). This measures fwd and fwd+bwd
for both lowerings at the stem shapes, plus one fused train step e2e via
GAN_TPU_DOWN, and decides the 'auto' policy documented in _down_impl.

Usage: python benchmarks/stem_bench.py [micro|e2e] [batch] [img]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.convt_bench import _time_scanned
from gan_tpu.ops.conv import conv2d_down_s2d, conv2d_same


def micro(batch: int = 128, img: int = 256):
    rng = np.random.default_rng(0)
    rows = []
    # (name, H, C_in, C_out): G stem (grayscale), D stem (input||target),
    # plus the first wide layer as a control where s2d should NOT win
    shapes = [("G.stem", img, 1, 64), ("D.stem", img, 2, 64),
              ("control", img // 2, 64, 128)]
    std = lambda x, w: conv2d_same(x, w, 2)
    for name, h, ci, co in shapes:
        x = jnp.asarray(rng.standard_normal((batch, h, h, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((4, 4, ci, co)), jnp.bfloat16)
        row = {"layer": name, "h": h, "cin": ci, "cout": co}
        for label, fn in (("std", std), ("s2d", conv2d_down_s2d)):
            row[f"{label}_fwd_ms"] = round(
                _time_scanned(fn, (x, w)) * 1e3, 3)

            def fb(x, w, _fn=fn):
                # squared sum: a linear loss's input-grad is x-independent
                # and XLA hoists it out of the timing scan
                return jax.grad(
                    lambda xx, ww: jnp.sum(_fn(xx, ww).astype(jnp.float32)
                                           ** 2),
                    argnums=(0, 1))(x, w)[0]

            row[f"{label}_fwdbwd_ms"] = round(
                _time_scanned(fb, (x, w)) * 1e3, 3)
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


def e2e(batch: int = 128, img: int = 256):
    """Fused Pix2Pix train-step epochs under each GAN_TPU_DOWN setting."""
    import time

    from benchmarks._bench_util import hard_sync as _sync
    from gan_tpu.config import Pix2PixConfig
    from gan_tpu.data.augment import JITTER_PAD
    from gan_tpu.parallel.mesh import make_mesh
    from gan_tpu.train import loop
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    out = {}
    for impl in ("std", "s2d"):
        os.environ["GAN_TPU_DOWN"] = impl
        mesh = make_mesh(len(jax.devices()))
        gbatch = batch * mesh.size
        steps = 24
        cfg = Pix2PixConfig(data="", output="", img_size=img,
                            batch_size=gbatch, train=True, epochs=1,
                            dtype="bf16", num_devices=mesh.size)
        cfg.validate()
        trainer = Pix2PixTrainer(cfg, mesh=mesh)
        n = gbatch * steps
        cache_np = np.random.default_rng(0).integers(
            0, 255, (n, 2, img + JITTER_PAD, img + JITTER_PAD, 1), np.uint8)
        cache = loop.put_cache(cache_np, mesh)
        key = jax.random.PRNGKey(0)
        host_rng = np.random.default_rng(0)
        trainer._run_epoch(cache, cache_np, key, training=True,
                           fixed_order=True, rng=host_rng)  # compile
        _sync(trainer.params)
        t0 = time.perf_counter()
        for r in range(2):
            trainer._run_epoch(cache, cache_np, jax.random.fold_in(key, r + 1),
                               training=True, fixed_order=True, rng=host_rng)
        _sync(trainer.params)
        ips = 2 * n / (time.perf_counter() - t0)
        out[impl] = round(ips / mesh.size, 2)
        print(json.dumps({"impl": impl, "imgs_per_sec_per_chip": out[impl]}),
              flush=True)
    return out


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "micro"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    img = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    {"micro": micro, "e2e": e2e}[mode](batch, img)
