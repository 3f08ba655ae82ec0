#!/usr/bin/env python3
"""512² hybrid-epoch roofline closure (VERDICT r3 #9).

The 512² reference corpus (25,472 pairs, 14.97 GB decoded) exceeds the flat
device budget, so epochs run hybrid: a resident flat prefix scans on device
while the remaining ~72% of rows stream from host, transfers overlapped
under the scan (pix2pix_trainer._run_epoch_hybrid). Prior rounds measured
66-95 img/s/chip and attributed the spread to tunnel drift; this study
CLOSES the number by bracketing one timed epoch between tunnel-bandwidth
snapshots and comparing the measured epoch time against the transfer
roofline:

    predicted_epoch_s = tail_bytes / measured_aggregate_h2d_bw

If measured ≈ predicted, the hybrid path is running at the environment's
speed of light and the number is tunnel-bound, not code-bound. (A real TPU
host does multiple GB/s over PCIe — transfer_bench.py — where the same code
is compute-bound instead.)

Usage: python benchmarks/hybrid512_roofline.py [n_imgs] [batch]
Writes benchmarks/results/hybrid512_roofline.json. Run ALONE (one TPU
process; a quiet host CPU — host feeding shares the single core).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GAN_TPU_ALLOW_ANY_SIZE", "1")

import jax
import numpy as np

from benchmarks._bench_util import hard_sync

OUT = os.path.join(os.path.dirname(__file__), "results",
                   "hybrid512_roofline.json")


def snapshot(dev) -> dict:
    """1-thread and 4-thread aggregate h2d bandwidth, 64 MB puts."""
    from concurrent.futures import ThreadPoolExecutor
    buf = np.random.default_rng(0).integers(0, 255, 64 << 20, np.uint8)
    hard_sync(jax.device_put(buf[:1 << 20], dev))      # session wakeup
    out = {}
    for threads in (1, 4):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(threads) as ex:
            futs = [ex.submit(lambda: hard_sync(jax.device_put(buf, dev)))
                    for _ in range(threads)]
            for f in futs:
                f.result()
        dt = time.perf_counter() - t0
        out[f"{threads}x64mb_mb_per_s"] = round(threads * 64 / dt, 1)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25472
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    img_size = 512
    from benchmarks.streaming import run_hybrid

    dev = jax.devices()[0]
    pre = snapshot(dev)
    print(f"[roofline] tunnel pre: {pre}", flush=True)

    t0 = time.time()
    res = run_hybrid(n, batch, img_size, epochs=1)
    wall = time.time() - t0
    print(f"[roofline] hybrid run: {res} ({wall / 60:.1f} min incl. "
          "synth/put/compile)", flush=True)

    post = snapshot(dev)
    print(f"[roofline] tunnel post: {post}", flush=True)

    n_res = res["resident_rows"]
    row_bytes = 2 * (img_size + 30) ** 2          # uint8 pair, jitter-padded
    tail_bytes = (n - n_res) * row_bytes
    bw = np.mean([pre["4x64mb_mb_per_s"], post["4x64mb_mb_per_s"]]) * 1e6
    predicted_s = tail_bytes / bw
    measured_s = n / res["value"] / 1.0           # value = img/s/chip, 1 chip
    out = {
        "description": "512^2 hybrid epoch vs transfer roofline "
                       "(benchmarks/hybrid512_roofline.py). predicted = "
                       "tail_bytes / mean 4-stream h2d bandwidth measured "
                       "immediately before+after the run; measured = "
                       "corpus / (img/s). ratio ~1 => the epoch runs at the "
                       "tunnel's speed of light (environment-bound).",
        "config": {"n": n, "batch": batch, "img_size": img_size,
                   "resident_rows": n_res,
                   "resident_fraction": round(n_res / n, 3)},
        "tunnel_pre": pre, "tunnel_post": post,
        "imgs_per_sec_per_chip": res["value"],
        "tail_gb": round(tail_bytes / 1e9, 2),
        "predicted_epoch_s": round(predicted_s, 1),
        "measured_epoch_s": round(measured_s, 1),
        "measured_over_predicted": round(measured_s / predicted_s, 3),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
