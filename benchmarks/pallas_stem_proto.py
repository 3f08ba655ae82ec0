#!/usr/bin/env python3
"""Prototype A/B for a fused Pallas STEM conv (VERDICT r3 #4).

Target: the bandwidth-bound small-C_in stem convs mfu_breakdown.json puts
4-6x off roofline at batch 128 / 256² / bf16:
  G.down_0 (128,256,256,1)->(128,128,128,64)+LeakyReLU  1.40 ms vs 0.348
  D.down_0 (128,256,256,2)->(...64)+LeakyReLU           1.62 ms vs 0.369

RESULT: NEGATIVE — see benchmarks/results/pallas_stem_study.json. Best
variant lands 8-20% BEHIND XLA's own lowering; the lane<->sublane relayout
the stem needs (spatial W on lanes in, filters on lanes out) is exactly what
Mosaic cannot express (no minor-dim reshape, no rank-3 dot, no value
dynamic_slice, lane-offset-matched concat only). Kept as the measurement
harness behind that artifact.

Design: the padded small-C input is split in XLA into 8 shifted parity
planes per channel (plane[c,di,dj,cc][i,j] = xp[2i+di, 2(j+cc)+dj]) so all
taps are ALIGNED slices in VMEM; W stays on lanes end-to-end and the kernel
writes NHCW. STEM_VARIANT=1: VPU broadcast-accumulate (filters on the middle
dim). STEM_VARIANT=2: per-output-row tap matrices by sublane-concat of
two-row plane slices, lane-batched R rows per wT @ rhs MXU matmul.

Usage: python benchmarks/pallas_stem_proto.py [check|bench]
  check: interpret-mode numerics vs conv2d_down on CPU
  bench: on-chip A/B vs the XLA lowering (run alone — one TPU process rule)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 16  # output rows per inner iteration (32 OOMd VMEM by 2.14M on v5e)


def _stem_kernel(ph_ref, w_ref, out_ref, *, h_out, w_out, c_in, alpha):
    for s in range(ph_ref.shape[0]):
        _stem_sample(ph_ref, w_ref, out_ref, s, h_out=h_out, w_out=w_out,
                     c_in=c_in, alpha=alpha)


def _stem_sample(ph_ref, w_ref, out_ref, s, *, h_out, w_out, c_in, alpha):
    chunk = min(CHUNK, h_out)
    # ph_ref: (nb, C_in*8, h_out+1, w_out) bf16 — shifted parity phases
    #         plane[c,di,dj,cc][i,j] = xp[2i+di, 2(j+cc)+dj], prepacked in
    #         XLA (Mosaic cannot deinterleave the lane dim in-kernel, and
    #         its concat rejects mismatched lane offsets)
    # w_ref:  (c_in*16, 64, 1) fp32 — taps-major kernel, filter COLUMNS so
    #         the per-tap weight broadcasts from sublanes (a (64,) lane
    #         vector can't relayout onto the filter/sublane dim in Mosaic)
    # out_ref:(nb, h_out, 64, w_out) bf16 — NHCW: W stays on lanes end-to-end
    def plane(c, di, dj, cc):
        return ph_ref[s, 8 * c + 4 * di + 2 * dj + cc]

    f = w_ref.shape[1]
    variant = int(os.environ.get("STEM_VARIANT", "2"))
    if variant == 2:
        # MXU per-row-group: for each output row i build the tap matrix
        # T_i (16·C taps ↓, W →) by SUBLANE-concat of single tap rows (all
        # aligned slices), lane-batch R rows into one rhs (16·C, R·W), and
        # do ONE matmul wT (F, 16·C) @ rhs -> (F, R·W); slice columns back
        # per row (lane slices at reg boundaries — free) and write (F, W)
        # row blocks. No relayout anywhere: taps keep W on lanes, the
        # matmul contracts the tap/sublane dim, F lands on sublanes of the
        # NHCW output row. R bounds the live rhs size.
        wT = w_ref[:, :, 0].transpose(1, 0).astype(jnp.bfloat16)  # (F, 16C)
        R = int(os.environ.get("STEM_R", "8"))
        # tap order is (c, di, cc, dj, r) — r LAST, so each plane donates a
        # contiguous [i, i+2) two-row slice (8 concats/row instead of 16)
        planes = [plane(c, di, dj, cc)
                  for c in range(c_in) for di in (0, 1)
                  for cc in (0, 1) for dj in (0, 1)]
        for i0 in range(0, h_out, R):
            cols = []
            for k in range(R):
                i = i0 + k
                rows = [p[i:i + 2, :] for p in planes]
                cols.append(jnp.concatenate(rows, axis=0))   # (16C, W)
            rhs = jnp.concatenate(cols, axis=1)              # (16C, R*W)
            y = jax.lax.dot_general(
                wT, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (F, R*W)
            y = jnp.where(y >= 0, y, alpha * y).astype(out_ref.dtype)
            for k in range(R):
                out_ref[s, i0 + k] = y[:, k * w_out:(k + 1) * w_out]
        return
    # Python-unrolled chunk loop: Mosaic has no dynamic_slice on VALUES, so
    # every tap slice must be static (h_out/chunk = 4 chunks at 256²)
    for ch in range(h_out // chunk):
        row0 = ch * chunk
        taps = []
        for c in range(c_in):
            for di in (0, 1):
                for cc in (0, 1):
                    for dj in (0, 1):
                        for r in (0, 1):
                            taps.append(plane(c, di, dj, cc)
                                        [row0 + r:row0 + r + chunk, :])
        # VPU accumulate into (chunk, F, W) — W stays on LANES throughout (a
        # new minor dim is the one thing Mosaic cannot create: reshape/
        # broadcast (A,B)->(A,B,1) is unimplemented), filters live on the
        # middle (sublane-group) dim, weights broadcast from (F, 1) columns
        y = jnp.zeros((chunk, f, w_out), jnp.float32)
        for t_i, tp in enumerate(taps):
            b = jax.lax.broadcast_in_dim(tp, (chunk, f, w_out), (0, 2))
            wcol = jax.lax.broadcast_in_dim(
                w_ref[t_i].astype(jnp.bfloat16), (chunk, f, w_out), (1, 2))
            y = y + (b * wcol).astype(jnp.float32)
        y = jnp.where(y >= 0, y, alpha * y)
        out_ref[s, row0:row0 + chunk] = y.astype(out_ref.dtype)


def _pack_weights(w):
    """(4,4,C_in,64) -> (C_in*16, 64) in the kernel's tap order
    [c, di, cc, dj, r] where a = 2r+di, b = 2cc+dj (r last so the MXU
    variant reads contiguous two-row plane slices)."""
    k = w.astype(jnp.float32)
    rows = []
    for c in range(w.shape[2]):
        for di in (0, 1):
            for cc in (0, 1):
                for dj in (0, 1):
                    for r in (0, 1):
                        rows.append(k[2 * r + di, 2 * cc + dj, c])
    return jnp.stack(rows)                                 # (C*16, 64)


def stem_conv_pallas(x, w, *, alpha=0.3, interpret=False):
    """conv2d_down (k4 s2 TF-'same', even H/W) + LeakyReLU, C_in in {1,2}."""
    n, h, wd, c_in = x.shape
    f = w.shape[3]
    assert f == 64 and h % 2 == 0 and wd % 2 == 0
    h_out, w_out = h // 2, wd // 2
    xp = jnp.pad(x.astype(jnp.bfloat16).transpose(0, 3, 1, 2),
                 ((0, 0), (0, 0), (1, 1), (1, 1)))
    # phase prep in XLA (one pass over the tiny small-C input):
    # plane[c, 4di+2dj+cc][i, j] = xp[2i+di, 2(j+cc)+dj]
    ph4 = (xp.reshape(n, c_in, h_out + 1, 2, w_out + 1, 2)
           .transpose(0, 1, 3, 5, 2, 4))       # (n, c, di, dj, H'+1, W'+1)
    ph = jnp.stack(
        [ph4[:, :, di, dj, :, cc:cc + w_out]
         for di in (0, 1) for dj in (0, 1) for cc in (0, 1)],
        axis=2).reshape(n, c_in * 8, h_out + 1, w_out)
    wt = _pack_weights(w)[:, :, None]                      # (C*16, 64, 1)
    nb = int(os.environ.get("STEM_NB", "1"))               # samples per block
    while n % nb:
        nb //= 2
    kern = functools.partial(_stem_kernel, h_out=h_out, w_out=w_out,
                             c_in=c_in, alpha=alpha)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h_out, f, w_out), jnp.bfloat16),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, c_in * 8, h_out + 1, w_out),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in * 16, f, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, h_out, f, w_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(ph, wt)
    return out  # NHCW — transpose to NHWC is the caller's (measured) choice


def _ref(x, w, alpha=0.3):
    from gan_tpu.ops.conv import conv2d_same
    y = conv2d_same(x, w, 2, compute_dtype=jnp.bfloat16)
    return jnp.where(y >= 0, y, alpha * y)


def check():
    rng = np.random.default_rng(0)
    for c_in, b, s in ((1, 2, 64), (2, 2, 64), (1, 1, 32)):
        x = jnp.asarray(rng.normal(size=(b, s, s, c_in)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(4, 4, c_in, 64)) * 0.02, jnp.float32)
        got = np.asarray(stem_conv_pallas(x, w, interpret=True),
                         np.float32).transpose(0, 1, 3, 2)   # NHCW -> NHWC
        want = np.asarray(_ref(x, w), np.float32)
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        print(f"C_in={c_in} {b}x{s}²: rel max err {err:.2e}")
        assert err < 2e-2, err  # bf16 taps
    print("check OK")


def bench():
    sys.path.insert(0, ".")
    from benchmarks._bench_util import hard_sync
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.default_rng(0)
    for c_in in (1, 2):
        x = jnp.asarray(rng.normal(size=(b, 256, 256, c_in)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(4, 4, c_in, 64)) * 0.02, jnp.float32)
        for name, fn in (
                ("xla", jax.jit(_ref)),
                ("pallas_nhcw", jax.jit(stem_conv_pallas)),
                ("pallas_nhwc", jax.jit(lambda x, w: jnp.transpose(
                    stem_conv_pallas(x, w), (0, 1, 3, 2))))):
            # scan to amortize dispatch (per-dispatch timing over the tunnel
            # is meaningless — CLAUDE.md)
            @jax.jit
            def many(x, w, fn=fn):
                def body(s, _):
                    # single-element consumer: the conv itself cannot be
                    # partially computed, so this keeps the op live without
                    # adding a full-output reduction to every iteration
                    return s + 1, fn(x, w)[0, 0, 0, 0].astype(jnp.float32)
                return jax.lax.scan(body, 0, None, length=20)[1]
            r = many(x, w)
            hard_sync(r)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = many(x, w)
                hard_sync(r)
                best = min(best, (time.perf_counter() - t0) / 20 * 1000)
            print(f"C_in={c_in} {name}: {best:.3f} ms/iter (min of 3)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    (check if mode == "check" else bench)()
