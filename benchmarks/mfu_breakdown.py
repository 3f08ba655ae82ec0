#!/usr/bin/env python3
"""Per-layer MFU attribution: where the other 53% goes.

bench.py's headline (~1,470 img/s/chip at 256²) works out to ~47% of v5e
bf16 peak (STATUS.md "corrected MFU accounting"). This pins the remaining
gap to specific layers instead of asserting "honest plateau": every U-Net
down/up block and every PatchGAN stage is timed on device (scanned, hard
fence — per-dispatch timing is meaningless over the axon tunnel), forward
and forward+backward, and compared against BOTH machine roofs:

  * MXU roof: useful conv FLOPs / bf16 peak (197 TFLOP/s on v5e);
  * HBM roof: activation bytes moved / peak bandwidth (819 GB/s on v5e)

so each layer lands in "compute-bound at X% of peak" or "bandwidth-bound"
territory. A closing section reconciles the sum of per-layer times against
the measured fused train step (fwd ≈ 1×, bwd ≈ 2× fwd for convs) so the
overhead outside the layers (augment, loss ops, Adam, scheduling) is
explicit.

The reference has no analog — its profiling story is nvidia-smi
(README.md:236-246); this is the committed evidence behind the MFU plateau
claim (round-2 VERDICT weak #3).

Usage: python benchmarks/mfu_breakdown.py [batch] [img_size] [K] [--save]
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

from benchmarks.breakdown import scan_time
from gan_tpu.config import Pix2PixConfig
from gan_tpu.models import blocks
from gan_tpu.ops.conv import conv2d_valid, conv2d_transpose_up
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

# v5e per-chip peaks; override for other generations.
PEAK_TFLOPS = float(os.environ.get("GAN_TPU_PEAK_TFLOPS", 197.0))
PEAK_HBM_GBPS = float(os.environ.get("GAN_TPU_PEAK_HBM_GBPS", 819.0))


def _cell(name, fwd_fn, x0, params, gflops_fwd, gbytes, key, k):
    """Time fwd and fwd+bwd of one block (scanned device time) and score
    against the rooflines. ``fwd_fn(params, x, rng)`` must accept any input
    shaped like x0 and return any-shaped output."""

    def fwd_cell(c, i):
        y = fwd_fn(params, c, jax.random.fold_in(key, i))
        # fold the output back into the input-shaped carry to chain steps
        return c + jnp.mean(y).astype(c.dtype)

    t_fwd = scan_time(fwd_cell, x0, k)

    def fb_cell(c, i):
        def scalar(xx):
            return jnp.sum(fwd_fn(params, xx, jax.random.fold_in(key, i))
                           .astype(jnp.float32))
        gx = jax.grad(scalar)(c)
        # 1e-8·g is a bf16 no-op on the carry but keeps the VJP live
        return c + (1e-8 * gx).astype(c.dtype)

    t_fb = scan_time(fb_cell, x0, k)
    roof_mxu_ms = gflops_fwd / PEAK_TFLOPS  # 1e9 FLOP / 1e12 FLOP/s = 1e-3 s
    roof_hbm_ms = gbytes / PEAK_HBM_GBPS * 1e3
    row = {
        "layer": name,
        "fwd_ms": round(t_fwd * 1e3, 3),
        "fwdbwd_ms": round(t_fb * 1e3, 3),
        "gflops_fwd": round(gflops_fwd, 2),
        "act_mbytes": round(gbytes * 1e3, 1),
        "tflops_fwd": round(gflops_fwd / t_fwd / 1e3, 1),
        "pct_mxu_peak_fwd": round(100 * gflops_fwd / 1e3 / (t_fwd * PEAK_TFLOPS), 1),
        "roofline_ms": round(max(roof_mxu_ms, roof_hbm_ms), 3),
        "bound": "compute" if roof_mxu_ms >= roof_hbm_ms else "bandwidth",
    }
    return row


def main():
    args = [a for a in sys.argv[1:] if a != "--save"]
    save = "--save" in sys.argv
    batch = int(args[0]) if len(args) > 0 else 128
    img = int(args[1]) if len(args) > 1 else 256
    k = int(args[2]) if len(args) > 2 else 32

    cfg = Pix2PixConfig(data="", output="", img_size=img, batch_size=batch,
                        train=True, epochs=1, dtype="bf16", num_devices=1)
    cfg.validate()
    t = Pix2PixTrainer(cfg, mesh=make_mesh(1))
    dt = cfg.compute_dtype
    esize = jnp.dtype(dt).itemsize
    key = jax.random.PRNGKey(0)
    gen, gp = t.gen, t.params["gen"]
    rows = []

    # ---------------------------------------------------------- G down stack
    h, c_in = img, 1
    for i, f in enumerate(gen.down_filters):
        x0 = jax.random.normal(jax.random.fold_in(key, 100 + i),
                               (batch, h, h, c_in), dt)
        p = gp[f"down_{i}"]
        fn = lambda pp, xx, rr: blocks.apply_downsample(
            pp, xx, norm=gen.norm, compute_dtype=dt)
        gfl = 2 * batch * (h // 2) ** 2 * f * 16 * c_in / 1e9
        gby = (batch * h * h * c_in + batch * (h // 2) ** 2 * f) * esize / 1e9
        rows.append(_cell(f"G.down_{i} {h}x{h}x{c_in}->{f}", fn, x0, p,
                          gfl, gby, key, k))
        h, c_in = h // 2, f

    # ------------------------------------------------------------ G up stack
    skip_channels = list(gen.down_filters[:-1])[::-1]
    for i, (f, use_drop) in enumerate(gen.up_specs):
        x0 = jax.random.normal(jax.random.fold_in(key, 200 + i),
                               (batch, h, h, c_in), dt)
        p = gp[f"up_{i}"]

        def fn(pp, xx, rr, _drop=use_drop):
            return blocks.apply_upsample(pp, xx, norm=gen.norm,
                                         drop_rng=rr if _drop else None,
                                         compute_dtype=dt)
        gfl = 2 * batch * h * h * 16 * c_in * f / 1e9
        gby = (batch * h * h * c_in + batch * 4 * h * h * f) * esize / 1e9
        rows.append(_cell(f"G.up_{i} {h}x{h}x{c_in}->{f}"
                          + ("+drop" if use_drop else ""), fn, x0, p,
                          gfl, gby, key, k))
        h, c_in = h * 2, f + skip_channels[i]

    # ----------------------------------------------------------- G last+tanh
    x0 = jax.random.normal(jax.random.fold_in(key, 300), (batch, h, h, c_in), dt)

    def last_fn(pp, xx, rr):
        out = conv2d_transpose_up(xx, pp["conv"], compute_dtype=dt)
        return jnp.tanh((out + pp["bias"].astype(out.dtype)).astype(jnp.float32))
    gfl = 2 * batch * h * h * 16 * c_in * gen.out_channels / 1e9
    gby = (batch * h * h * c_in * esize
           + batch * 4 * h * h * gen.out_channels * 4) / 1e9
    rows.append(_cell(f"G.last {h}x{h}x{c_in}->{gen.out_channels}+tanh",
                      last_fn, x0, gp["last"], gfl, gby, key, k))

    # -------------------------------------------------------------- D stages
    dp = t.params["disc"]
    dh, dc = img, 2 * cfg.n_channels  # concat(input, target)
    d_stages = [("down_0", 64), ("down_1", 128), ("down_2", 256)]
    for name, f in d_stages:
        x0 = jax.random.normal(jax.random.fold_in(key, 400), (batch, dh, dh, dc), dt)
        fn = lambda pp, xx, rr: blocks.apply_downsample(
            pp, xx, norm=t.disc.norm, compute_dtype=dt)
        gfl = 2 * batch * (dh // 2) ** 2 * f * 16 * dc / 1e9
        gby = (batch * dh * dh * dc + batch * (dh // 2) ** 2 * f) * esize / 1e9
        rows.append(_cell(f"D.{name} {dh}x{dh}x{dc}->{f}", fn, x0, dp[name],
                          gfl, gby, key, k))
        dh, dc = dh // 2, f

    def d_head(pp, xx, rr):
        hh = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
        hh = conv2d_valid(hh, pp["conv512"], compute_dtype=dt)
        hh = blocks.apply_norm(pp["norm512"], hh, t.disc.norm)
        hh = blocks.leaky_relu(hh)
        hh = jnp.pad(hh, ((0, 0), (1, 1), (1, 1), (0, 0)))
        hh = conv2d_valid(hh, pp["last"]["conv"], compute_dtype=dt)
        return hh + pp["last"]["bias"].astype(hh.dtype)
    x0 = jax.random.normal(jax.random.fold_in(key, 500), (batch, dh, dh, dc), dt)
    so = dh - 1  # two VALID k4 s1 convs with 1-pad: H -> H-1 -> H-2... per conv
    gfl = (2 * batch * so * so * 512 * 16 * dc
           + 2 * batch * (so - 1) * (so - 1) * 1 * 16 * 512) / 1e9
    gby = (batch * dh * dh * dc + batch * so * so * 512) * esize / 1e9
    rows.append(_cell(f"D.head {dh}x{dh}x{dc}->512->1", d_head, x0, dp, gfl,
                      gby, key, k))

    # ---------------------------------------------------- whole-step account
    x0 = jax.random.uniform(key, (batch, img, img, cfg.n_channels), dtype=dt,
                            minval=-1, maxval=1)
    y0 = jax.random.uniform(jax.random.fold_in(key, 1),
                            (batch, img, img, cfg.n_channels), dtype=dt,
                            minval=-1, maxval=1)

    def step(carry, i):
        params, opt = carry
        params, opt, _ = t._train_step(params, opt, (x0, y0),
                                       jax.random.fold_in(key, i))
        return (params, opt)
    t_step = scan_time(step, (t.params, t.opt_states), max(4, k // 4))

    g_rows = [r for r in rows if r["layer"].startswith("G.")]
    d_rows = [r for r in rows if r["layer"].startswith("D.")]
    sum_g_fb = sum(r["fwdbwd_ms"] for r in g_rows)
    sum_d_fb = sum(r["fwdbwd_ms"] for r in d_rows)
    sum_d_fwd = sum(r["fwd_ms"] for r in d_rows)
    # fused step ≈ G fwd+bwd + D(real) fwd + D(gen) fwd+bwd (+loss/Adam/misc)
    expected_ms = sum_g_fb + sum_d_fb + sum_d_fwd
    total_gflops_fwd = sum(r["gflops_fwd"] for r in rows)
    account = {
        "train_step_ms": round(t_step * 1e3, 3),
        "imgs_per_sec": round(batch / t_step, 1),
        "sum_layers_expected_ms": round(expected_ms, 3),
        "residual_ms_loss_adam_sched": round(t_step * 1e3 - expected_ms, 3),
        "total_fwd_gflops_per_batch": round(total_gflops_fwd, 1),
        "note": ("expected = G fwd+bwd + D fwd+bwd + D fwd: the step's three "
                 "D applications CSE to two forwards (CLAUDE.md), the fused "
                 "backward covers G and both D branches; residual = loss ops "
                 "+ Adam + anything the estimate misattributes"),
    }

    report = {"batch": batch, "img_size": img, "dtype": "bf16",
              "peak_tflops": PEAK_TFLOPS, "peak_hbm_gbps": PEAK_HBM_GBPS,
              "layers": rows, "step_accounting": account}
    hdr = (f"{'layer':38s} {'fwd ms':>8s} {'f+b ms':>8s} {'TF/s':>6s} "
           f"{'%MXU':>6s} {'roof ms':>8s} bound")
    print(hdr)
    for r in rows:
        print(f"{r['layer']:38s} {r['fwd_ms']:8.3f} {r['fwdbwd_ms']:8.3f} "
              f"{r['tflops_fwd']:6.1f} {r['pct_mxu_peak_fwd']:6.1f} "
              f"{r['roofline_ms']:8.3f} {r['bound']}")
    print(json.dumps(account, indent=2))
    if save:
        out = os.path.join(os.path.dirname(__file__), "results",
                           "mfu_breakdown.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
