#!/usr/bin/env python3
"""Per-fusion attribution + achievable-bound study of the fused Pix2Pix
train step (VERDICT r4 next #1).

Round 4's step_attribution.json showed the fused forward at ~1.8× its
layer-roofline sum and the backward at ~2× the 2×-FLOP ideal, and closed
with "the compiler's conv stack is the plateau" — asserted from one convT
microbenchmark. This benchmark replaces that assertion with evidence, two
ways:

1. **Real per-fusion profile** of the fused scanned train step: a
   ``jax.profiler.trace`` around the exact jitted scan program, parsed from
   the xplane proto (xprof is in the image) — top device ops by total time.
   Degrades gracefully (recorded as unavailable) if the axon TPU plugin
   emits no device plane.

2. **Honest achievable bounds per hot conv**: the theoretical roofline
   (FLOPs / 197 TFLOP/s) is NOT achievable for a k4s2 conv — the honest
   bound is what the MXU actually sustains on this chip for a GEMM with the
   conv's own logical dimensions (M = B·Ho·Wo, K = taps·C_in, N = C_out).
   For each of the step's top time-consuming convs (mfu_breakdown.json),
   measure under lax.scan:
     * the shipped lowering (ops/conv.py),
     * an im2col+dot rewrite (patches → one GEMM) — a potential win,
     * the bare equivalent GEMM (the achievable bound),
     * the fused forward+backward, vs 3× the GEMM bound (fwd + input-grad +
       filter-grad move the same FLOPs each).
   ``bound_ratio`` = measured / achievable; ≤ ~1.2 means the lowering is
   within 20% of what the hardware can do for that shape and the remaining
   roofline gap is k4s2-conv physics (im2col bandwidth + partial-tile
   waste), not a missed optimization.

Usage: python benchmarks/step_hlo_attribution.py [batch] [img] [--save]
Env: BENCH_BUDGET_S (watchdog, default 540), GAN_TPU_PEAK_TFLOPS.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._bench_util import (heartbeat, install_watchdog, set_phase)
from benchmarks.breakdown import scan_time
from gan_tpu.ops.conv import conv2d_down, conv2d_transpose_up, \
    conv2d_transpose_up_phased

PEAK_TFLOPS = float(os.environ.get("GAN_TPU_PEAK_TFLOPS", 197.0))
DT = jnp.bfloat16


# --------------------------------------------------------------- profiling
def profile_fused_step(batch: int, img: int, steps: int = 8):
    """Trace the real fused train-step scan; return top device ops by total
    time (or a reason string when the backend emits no device events)."""
    from gan_tpu.config import Pix2PixConfig
    from gan_tpu.parallel.mesh import make_mesh
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    cfg = Pix2PixConfig(data="", output="", img_size=img, batch_size=batch,
                        train=True, epochs=1, dtype="bf16", num_devices=1)
    cfg.validate()
    t = Pix2PixTrainer(cfg, mesh=make_mesh(1))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, img, img, 1), DT, -1, 1)
    y = jax.random.uniform(jax.random.fold_in(key, 1),
                           (batch, img, img, 1), DT, -1, 1)

    @jax.jit
    def run(params, opt):
        def body(c, i):
            p, o = c
            p, o, _ = t._train_step(p, o, (x, y), jax.random.fold_in(key, i))
            return (p, o), ()
        c, _ = jax.lax.scan(body, (params, opt), jnp.arange(steps))
        return c

    out = run(t.params, t.opt_states)      # compile + warm
    jax.block_until_ready(out)
    logdir = tempfile.mkdtemp(prefix="step_prof_")
    with jax.profiler.trace(logdir):
        out = run(t.params, t.opt_states)
        jax.block_until_ready(out)
    heartbeat(f"trace written to {logdir}")
    return parse_xplane_top_ops(logdir, steps)


def parse_xplane_top_ops(logdir: str, steps: int, top: int = 30):
    """Aggregate device-plane event durations by op name from the xplane."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return {"available": False, "reason": "no xplane.pb produced"}
    try:
        from xprof.protobuf import xplane_pb2
    except Exception:
        try:
            from tensorboard_plugin_profile.protobuf import xplane_pb2
        except Exception as e:
            return {"available": False, "reason": f"no xplane proto: {e}"}
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())
    device_planes = [p for p in space.planes
                     if "TPU" in p.name or "/device:" in p.name
                     or "Device" in p.name]
    if not device_planes:
        return {"available": False,
                "reason": f"no device plane (planes: {[p.name for p in space.planes][:8]})"}
    agg: dict = {}
    for plane in device_planes:
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                d = agg.setdefault((plane.name, line.name, name),
                                   {"total_ps": 0, "count": 0})
                d["total_ps"] += ev.duration_ps
                d["count"] += ev.occurrences if hasattr(ev, "occurrences") \
                    and ev.occurrences else 1
    rows = [{"plane": k[0], "line": k[1], "op": k[2],
             "total_ms": round(v["total_ps"] / 1e9, 3),
             "per_step_ms": round(v["total_ps"] / 1e9 / steps, 4),
             "count": v["count"]}
            for k, v in agg.items()]
    rows.sort(key=lambda r: -r["total_ms"])
    return {"available": True, "steps": steps, "top_ops": rows[:top],
            "lines": sorted({(r["plane"], r["line"]) for r in rows})}


# ------------------------------------------------------------- conv studies
def _t(fn, x0, k):
    return scan_time(fn, x0, k) * 1e3  # ms


def _gemm_bound_ms(m, kk, n, k_iters):
    a = jax.random.normal(jax.random.PRNGKey(0), (m, kk), DT)
    b = jax.random.normal(jax.random.PRNGKey(1), (kk, n), DT)

    def cell(c, i):
        z = jax.lax.dot(c, b, preferred_element_type=DT)
        return c + jnp.mean(z).astype(c.dtype)
    return _t(cell, a, k_iters)


def _im2col_down(x, w):
    """k4s2 TF-'same' conv as patches → one GEMM (even H/W: pad (1,1))."""
    n, h, wd, c = x.shape
    f = w.shape[3]
    patches = jax.lax.conv_general_dilated_patches(
        x, (4, 4), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches feature dim is C*kh*kw (channel-major); reorder w to match
    wr = w.transpose(2, 0, 1, 3).reshape(16 * c, f)
    out = jax.lax.dot(patches.reshape(-1, c * 16), wr,
                      preferred_element_type=x.dtype)
    return out.reshape(n, h // 2, wd // 2, f)


def study_down_conv(name, batch, h, c_in, c_out, k_iters):
    key = jax.random.PRNGKey(7)
    x0 = jax.random.normal(key, (batch, h, h, c_in), DT)
    w = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, c_in, c_out),
                          DT) * 0.02
    gflops = 2 * batch * (h // 2) ** 2 * c_out * 16 * c_in / 1e9

    def base(c, i):
        yz = conv2d_down(c, w, compute_dtype=DT)
        return c + jnp.mean(yz).astype(c.dtype)

    def im2col(c, i):
        yz = _im2col_down(c, w)
        return c + jnp.mean(yz).astype(c.dtype)

    def fb(c, i):
        def scalar(xx):
            return jnp.sum(conv2d_down(xx, w, compute_dtype=DT)
                           .astype(jnp.float32))
        g = jax.grad(scalar)(c)
        return c + (1e-8 * g).astype(c.dtype)

    t_base = _t(base, x0, k_iters)
    t_im2col = _t(im2col, x0, k_iters)
    t_fb = _t(fb, x0, k_iters)
    m, kk, n = batch * (h // 2) ** 2, 16 * c_in, c_out
    t_gemm = _gemm_bound_ms(m, kk, n, k_iters)
    return {
        "op": name, "kind": "conv_k4s2",
        "shape": f"B{batch} {h}x{h}x{c_in}->{c_out}",
        "gflops": round(gflops, 1),
        "base_ms": round(t_base, 3),
        "im2col_ms": round(t_im2col, 3),
        "gemm_bound_ms": round(t_gemm, 3),
        "roofline_ms": round(gflops / PEAK_TFLOPS, 3),
        "bound_ratio_fwd": round(min(t_base, t_im2col) / t_gemm, 2),
        "fwdbwd_ms": round(t_fb, 3),
        "bound_ratio_fwdbwd": round(t_fb / (3 * t_gemm), 2),
        "gemm_pct_peak": round(100 * gflops / PEAK_TFLOPS / t_gemm, 1),
        "best": "im2col" if t_im2col < t_base * 0.97 else "base",
    }


def study_up_conv(name, batch, h, c_in, c_out, k_iters):
    key = jax.random.PRNGKey(9)
    x0 = jax.random.normal(key, (batch, h, h, c_in), DT)
    w = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, c_out, c_in),
                          DT) * 0.02
    gflops = 2 * batch * h * h * 16 * c_in * c_out / 1e9

    def base(c, i):
        yz = conv2d_transpose_up(c, w, compute_dtype=DT)
        return c + jnp.mean(yz).astype(c.dtype)

    def phased(c, i):
        yz = conv2d_transpose_up_phased(c, w, compute_dtype=DT)
        return c + jnp.mean(yz).astype(c.dtype)

    def fb(c, i):
        def scalar(xx):
            return jnp.sum(conv2d_transpose_up(xx, w, compute_dtype=DT)
                           .astype(jnp.float32))
        g = jax.grad(scalar)(c)
        return c + (1e-8 * g).astype(c.dtype)

    t_base = _t(base, x0, k_iters)
    t_phased = _t(phased, x0, k_iters)
    t_fb = _t(fb, x0, k_iters)
    # phase form: every output pixel is a 2x2xC_in window x (4*C_out) GEMM
    m, kk, n = batch * h * h, 4 * c_in, 4 * c_out
    t_gemm = _gemm_bound_ms(m, kk, n, k_iters)
    return {
        "op": name, "kind": "convT_k4s2",
        "shape": f"B{batch} {h}x{h}x{c_in}->{c_out}",
        "gflops": round(gflops, 1),
        "base_ms": round(t_base, 3),
        "phased_ms": round(t_phased, 3),
        "gemm_bound_ms": round(t_gemm, 3),
        "roofline_ms": round(gflops / PEAK_TFLOPS, 3),
        "bound_ratio_fwd": round(min(t_base, t_phased) / t_gemm, 2),
        "fwdbwd_ms": round(t_fb, 3),
        "bound_ratio_fwdbwd": round(t_fb / (3 * t_gemm), 2),
        "gemm_pct_peak": round(100 * gflops / PEAK_TFLOPS / t_gemm, 1),
        "best": "phased" if t_phased < t_base * 0.97 else "base",
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    save = "--save" in sys.argv
    batch = int(args[0]) if args else 128
    img = int(args[1]) if len(args) > 1 else 256
    k_iters = int(os.environ.get("BENCH_STEPS", 16))
    install_watchdog(float(os.environ.get("BENCH_BUDGET_S", 540)))

    set_phase("profile-fused-step")
    prof = profile_fused_step(batch, img)
    heartbeat(f"profile available={prof.get('available')}")

    rows = []
    # the top fwd-time k4s2 convs from mfu_breakdown.json (G.down_1/2/3 ≡
    # D.down_1/2 shapes) and the top convT decoders
    for spec in [("down_1(G+D)", img // 2, 64, 128),
                 ("down_2(G+D)", img // 4, 128, 256),
                 ("down_3", img // 8, 256, 512)]:
        set_phase(f"study-{spec[0]}")
        rows.append(study_down_conv(spec[0], batch, spec[1], spec[2],
                                    spec[3], k_iters))
        heartbeat(json.dumps(rows[-1]))
    for spec in [("up_4", img // 16, 1024, 256),
                 ("up_5", img // 8, 512, 128),
                 ("up_6", img // 4, 256, 64)]:
        set_phase(f"study-{spec[0]}")
        rows.append(study_up_conv(spec[0], batch, spec[1], spec[2],
                                  spec[3], k_iters))
        heartbeat(json.dumps(rows[-1]))

    report = {
        "description": __doc__.split("\n\n")[0],
        "batch": batch, "img_size": img, "dtype": "bf16",
        "peak_tflops": PEAK_TFLOPS,
        "fused_step_profile": prof,
        "conv_bounds": rows,
        "reading": ("bound_ratio_* = measured / same-shape-GEMM time; the "
                    "GEMM is what this chip's MXU actually sustains at the "
                    "conv's logical M/K/N (gemm_pct_peak shows THAT "
                    "ceiling), so ratios near 1 mean the conv lowering is "
                    "at the hardware's achievable rate and the remaining "
                    "distance to the FLOP roofline is shape physics "
                    "(im2col traffic + partial tiles), not compiler slack."),
    }
    print(json.dumps(report, indent=1))
    if save:
        out = os.path.join(os.path.dirname(__file__), "results",
                           "step_hlo_attribution.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
