#!/usr/bin/env python3
"""Is XLA's lhs-dilated transposed conv paying for the inserted zeros?

FINDING (v5e, 2026-08): a *standalone* scanned lhs-dilated conv measures
~2000x slower than its dense-FLOPs baseline (≈46 GFLOP/s — it appears to hit
a non-MXU fallback when compiled in isolation over the axon tunnel), yet the
SAME op inside the full U-Net forward runs fine (whole G fwd ≈ 67 TF/s at
batch 16, and the full train step is 19 ms — impossible if convT cost
seconds). Treat this tool's absolute numbers as unrepresentative of in-graph
behavior; end-to-end throughput (bench.py) is the criterion.

Compares device time of:
  a) conv2d_transpose_up: stride-2 k4 lhs-dilated conv (H→2H), and
  b) an equal-output-FLOPs dense stride-1 conv at the OUTPUT resolution
     with a k2 kernel (what a perfect subpixel decomposition would cost).

If (a) ≫ (b), a subpixel (space-to-depth) decomposition of the U-Net
upsample path is worth implementing.

Run: python benchmarks/convt_check.py [batch] [hw] [c]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gan_tpu.ops.conv import conv2d_transpose_up, conv2d_same


def scan_time(fn, x, w, k=16):
    @jax.jit
    def run(x, w):
        def body(c, i):
            y = fn(c, w)
            # chain via a scalar fold — slicing y back to x's shape perturbs
            # XLA's conv fusion and gives wildly unrepresentative times
            return c + jnp.mean(y).astype(x.dtype), ()
        c, _ = jax.lax.scan(body, x, jnp.arange(k))
        return jnp.sum(c.astype(jnp.float32))

    out = run(x, w)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x, w)
    jax.block_until_ready(jax.device_get(out))
    return (time.perf_counter() - t0) / k


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)
    w_t = 0.02 * jax.random.normal(key, (4, 4, c, c), jnp.bfloat16)  # (k,k,out,in)

    t_a = scan_time(lambda x, w: conv2d_transpose_up(x, w), x, w_t)

    # equal-FLOPs dense baseline: k2 stride-1 conv at output resolution
    x_big = jax.random.normal(key, (b, 2 * hw, 2 * hw, c), jnp.bfloat16)
    w_d = 0.02 * jax.random.normal(key, (2, 2, c, c), jnp.bfloat16)
    t_b = scan_time(lambda x, w: conv2d_same(x, w, 1), x_big, w_d)

    flops = 2 * b * (2 * hw) ** 2 * c * c * 4  # both cases
    print(f"convT lhs-dilated: {t_a*1e3:7.3f} ms  ({flops/t_a/1e12:6.1f} TF/s)")
    print(f"dense k2 baseline: {t_b*1e3:7.3f} ms  ({flops/t_b/1e12:6.1f} TF/s)")
    print(f"ratio: {t_a/t_b:.2f}x")


if __name__ == "__main__":
    main()
