#!/usr/bin/env python3
"""Streamed-val overlap A/B (VERDICT r4 next #5): wall-clock of one
train-epoch + streamed-val-epoch sequence with the val producer pre-started
BEFORE the train scan (the shipped behavior) vs serial consumption after it
(GAN_TPU_VAL_OVERLAP=0 order).

The val stream's transfers are pure added time in the serial order; with
pre-start they ride the tunnel while the train scan computes, so the
sequence should approach max(train_compute, val_transfer) + val_compute.
Val metrics are bit-equal either way (tests/test_streaming.py pins this);
this benchmark measures only the time.

Usage: python benchmarks/val_overlap_bench.py [n_train] [n_val] [batch] [--save]
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

from benchmarks._bench_util import hard_sync, heartbeat, install_watchdog, set_phase
from gan_tpu.config import Pix2PixConfig
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    save = "--save" in sys.argv
    n_train = int(args[0]) if args else 4096
    n_val = int(args[1]) if len(args) > 1 else 1024
    batch = int(args[2]) if len(args) > 2 else 128
    install_watchdog(float(os.environ.get("BENCH_BUDGET_S", 840)))

    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    cfg = Pix2PixConfig(data="", output="", img_size=256, batch_size=batch,
                        train=True, epochs=1, dtype="bf16", num_devices=1)
    cfg.validate()
    tr = Pix2PixTrainer(cfg, mesh=make_mesh(1))
    rng = np.random.default_rng(0)
    set_phase("make-data")
    train = rng.integers(0, 255, (n_train, 2, 286, 286, 1), np.uint8)
    val = rng.integers(0, 255, (n_val, 2, 256, 256, 1), np.uint8)

    set_phase("put-train-cache")
    train_dev = loop.put_cache(train, tr.mesh)
    hard_sync(tr.params)

    def one_pass(overlap: bool, key_i: int) -> float:
        key = jax.random.PRNGKey(key_i)
        hard_sync(tr.params)
        t0 = time.perf_counter()
        vs = tr._val_stream(val) if overlap else None
        tr._run_epoch(train_dev, train, jax.random.fold_in(key, 0),
                      training=True, fixed_order=True, rng=rng)
        tr._run_epoch_streaming(val, jax.random.fold_in(key, 1),
                                training=False, batches=vs)
        hard_sync(tr.params)
        return time.perf_counter() - t0

    set_phase("warmup-compile")
    one_pass(False, 0)
    one_pass(True, 1)

    results = {}
    for name, ov in (("serial", False), ("overlap", True)):
        set_phase(f"measure-{name}")
        ts = [one_pass(ov, 10 + i) for i in range(3)]
        results[name] = {"runs_s": [round(t, 2) for t in ts],
                         "median_s": round(sorted(ts)[1], 2)}
        heartbeat(f"{name}: {results[name]}")

    gain = results["serial"]["median_s"] - results["overlap"]["median_s"]
    report = {
        "description": __doc__.split("\n\n")[0],
        "n_train": n_train, "n_val": n_val, "batch": batch,
        "img_size": 256, "dtype": "bf16",
        "val_stream_mb": round(val.nbytes / 1e6, 1),
        "results": results,
        "overlap_gain_s": round(gain, 2),
        "gain_pct_of_serial": round(100 * gain / results["serial"]["median_s"], 1),
    }
    print(json.dumps(report, indent=1))
    if save:
        out = os.path.join(os.path.dirname(__file__), "results",
                           "val_overlap_bench.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
