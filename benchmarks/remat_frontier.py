#!/usr/bin/env python3
"""512² remat/memory frontier (round-2 VERDICT item 8).

Measures img/s + peak HBM for 512² Pix2Pix training across batch × remat
on/off — the data behind the `--remat auto` threshold
(pix2pix_trainer.use_remat: remat only beyond 256 "256²-image equivalents"
per device). The reference's flagship config is 512² (README.md:236-246).

Usage: python benchmarks/remat_frontier.py [batch ...]   (default 8 16 32 64)
Emits one JSON line per (batch, remat) cell; OOM cells are reported as
{"oom": true} instead of crashing the sweep (a fresh process per cell would
be cleaner, but the axon runtime tolerates allocator-level OOM).
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

from gan_tpu.data.augment import JITTER_PAD
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop



from benchmarks._bench_util import hard_sync as _sync

def peak_hbm() -> int:
    try:
        return jax.devices()[0].memory_stats().get("peak_bytes_in_use", -1)
    except Exception:
        return -1


def cell(batch: int, remat: str, steps: int = 16) -> dict:
    from gan_tpu.config import Pix2PixConfig
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    mesh = make_mesh(len(jax.devices()))
    b = batch * mesh.size
    cfg = Pix2PixConfig(data="", output="", img_size=512, batch_size=b,
                        train=True, epochs=1, dtype="bf16",
                        num_devices=mesh.size, remat=remat)
    cfg.validate()
    n = b * steps
    src = 512 + JITTER_PAD
    cache_np = np.random.default_rng(0).integers(0, 255, (n, 2, src, src, 1),
                                                 np.uint8)
    out = {"batch_per_chip": batch, "remat": remat}
    try:
        trainer = Pix2PixTrainer(cfg, mesh=mesh)
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
        out["imgs_per_sec_per_chip"] = round(ips / mesh.size, 2)
        out["peak_hbm_gb"] = round(peak_hbm() / 1e9, 2)
    except Exception as e:  # XLA OOM raises RuntimeError
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower():
            out["oom"] = True
        else:
            raise
    return out


if __name__ == "__main__":
    save = "--save" in sys.argv
    batches = [int(a) for a in sys.argv[1:] if a != "--save"] or [8, 16, 32, 64]
    results = []
    for batch in batches:
        for remat in ("off", "on"):
            r = cell(batch, remat)
            results.append(r)
            print(json.dumps(r), flush=True)
    report = {"remat_frontier_512": results}
    print(json.dumps(report))
    if save:
        out = os.path.join(os.path.dirname(__file__), "results",
                           "remat_frontier.json")
        # merge by (batch, remat) so incremental cells extend the committed
        # table instead of clobbering it (and keep any peak_hbm_gb columns
        # hbm_probe.py merged in for untouched rows)
        if os.path.exists(out):
            with open(out) as f:
                prev = json.load(f)
            rows = {(r["batch_per_chip"], r["remat"]): r
                    for r in prev.get("remat_frontier_512", [])}
            rows.update({(r["batch_per_chip"], r["remat"]): r
                         for r in results})
            prev["remat_frontier_512"] = sorted(
                rows.values(), key=lambda r: (r["batch_per_chip"], r["remat"]))
            report = prev
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {out}")
