#!/usr/bin/env python3
"""ConvT implementation A/B: lhs-dilated vs phase-decomposed (sub-pixel).

The lhs-dilated transposed conv feeds the MXU a 75%-zero input (4 of 16
kernel taps useful per output at k=4/s=2) — IF XLA:TPU lowers it naively.
The phased rewrite (ops/conv.py conv2d_transpose_up_phased) computes exactly
the useful taps as one 2×2 conv with 4·C_out channels + phase-slice
interleave. This measures both per U-Net decoder layer shape and one fused
Pix2Pix train step end-to-end, deciding GAN_TPU_CONVT's 'auto'.

Usage: python benchmarks/convt_bench.py [micro|e2e]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from gan_tpu.ops.conv import conv2d_transpose_up, conv2d_transpose_up_phased



from benchmarks._bench_util import hard_sync as _sync

def _time_scanned(fn, args, iters: int = 50) -> float:
    """Per-call seconds via a scanned loop (per-dispatch timing over the axon
    tunnel is meaningless — CLAUDE.md)."""

    def run_impl(x, *rest):
        def body(c, _):
            # perturb the input by the (data-dependent, ~0) carry so the conv
            # depends on the previous iteration — otherwise XLA hoists the
            # loop-invariant conv out of the scan and times ~2 µs/iter
            out = fn(x + c.astype(x.dtype), *rest)
            return (jnp.float32(out.mean()) * jnp.float32(1e-20)).astype(
                jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    # args as jit PARAMETERS, not closures — closed-over arrays become HLO
    # constants and the axon remote-compile endpoint rejects big bodies (413)
    run = jax.jit(run_impl)
    float(run(*args))  # compile; value fetch is the only reliable barrier
    t0 = time.perf_counter()
    float(run(*args))  # device->host read forces completion (axon tunnel:
    t1 = time.perf_counter()  # block_until_ready returns early)
    float(run(*args))
    t2 = time.perf_counter()
    return min(t1 - t0, t2 - t1) / iters


def micro():
    """Decoder-layer shapes of the 256² U-Net at batch 128 (fwd only)."""
    rng = np.random.default_rng(0)
    rows = []
    # (H, C_in, C_out): up blocks 1..7 + final (input ch incl. skip concat)
    shapes = [(1, 512, 512), (2, 1024, 512), (4, 1024, 512), (8, 1024, 512),
              (16, 1024, 256), (32, 512, 128), (64, 256, 64), (128, 128, 1)]
    n = 128
    for h, ci, co in shapes:
        x = jnp.asarray(rng.standard_normal((n, h, h, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((4, 4, co, ci)), jnp.bfloat16)
        td = _time_scanned(conv2d_transpose_up, (x, w))
        tp = _time_scanned(conv2d_transpose_up_phased, (x, w))
        # 4 of the 16 kernel taps land on real (non-dilation-zero) inputs
        # per output pixel — this is the USEFUL work; a naive dilated
        # lowering would do 4x this
        useful_tflops = n * (2 * h) ** 2 * co * 4 * ci * 2 / 1e12
        rows.append({"h": h, "cin": ci, "cout": co,
                     "dilated_ms": round(td * 1e3, 3),
                     "phased_ms": round(tp * 1e3, 3),
                     "dilated_tflops": round(useful_tflops / td, 1),
                     "phased_tflops": round(useful_tflops / tp, 1)})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def e2e():
    """Full fused Pix2Pix train step, both impls, via GAN_TPU_CONVT."""
    from gan_tpu.config import Pix2PixConfig
    from gan_tpu.data.augment import JITTER_PAD
    from gan_tpu.parallel.mesh import make_mesh
    from gan_tpu.train import loop
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    out = {}
    for impl in ("dilated", "phased", "auto"):
        os.environ["GAN_TPU_CONVT"] = impl
        mesh = make_mesh(len(jax.devices()))
        batch = 128 * mesh.size
        steps = 24
        cfg = Pix2PixConfig(data="", output="", img_size=256, batch_size=batch,
                            train=True, epochs=1, dtype="bf16",
                            num_devices=mesh.size)
        cfg.validate()
        trainer = Pix2PixTrainer(cfg, mesh=mesh)
        n = batch * steps
        cache_np = np.random.default_rng(0).integers(
            0, 255, (n, 2, 256 + JITTER_PAD, 256 + JITTER_PAD, 1), np.uint8)
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
    {"micro": micro, "e2e": e2e}[mode]()
