#!/usr/bin/env python3
"""Predict-mode batch-inference throughput (BASELINE.json config #5).

The reference's predict path runs ONE eager generator forward per image
(pix2pix.py:337) and writes a matplotlib 3-panel grid per image — entirely
host-bound. Ours batches the forwards (``Pix2PixTrainer.generate_batched``:
a vmap over size-1 sub-batches so every image keeps its OWN BatchNorm stats,
matching the reference's per-image eager semantics, pix2pix_trainer.py) and
writes raw PNGs with PIL. This measures:

  * ``device`` — pure generator-forward throughput vs vmap chunk size
    (the serving ceiling: what a downstream pipeline like the MERGEN YOLOv5
    handoff could consume if it took device arrays).
  * ``e2e`` — the real `predict --raw-predictions` path: decoded uint8 in,
    PNGs out (device forwards + host PNG encode; the host side bounds it).

Usage: python benchmarks/infer_bench.py [n_images] [img_size] [--save]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from benchmarks._bench_util import hard_sync


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--save"]
    save = "--save" in sys.argv
    n = int(args[0]) if len(args) > 0 else 1024
    img = int(args[1]) if len(args) > 1 else 256

    from gan_tpu.config import Pix2PixConfig
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    cfg = Pix2PixConfig(data="", output="", img_size=img, batch_size=32,
                        predict=True, weights="", dtype="bf16", num_devices=1)
    trainer = Pix2PixTrainer(cfg)
    rng = np.random.default_rng(0)
    inputs = rng.integers(0, 255, (n, img, img, 1), np.uint8)

    report = {"n_images": n, "img_size": img, "device": {}, "chips": 1}
    for chunk in (16, 64, 128):
        trainer.generate_batched(inputs[:chunk], chunk=chunk)  # compile
        hard_sync(trainer.params)
        t0 = time.perf_counter()
        trainer.generate_batched(inputs, chunk=chunk)
        dt = time.perf_counter() - t0
        report["device"][f"chunk_{chunk}"] = round(n / dt, 2)
        print(json.dumps({"mode": "device", "chunk": chunk,
                          "imgs_per_sec": report["device"][f"chunk_{chunk}"]}),
              flush=True)

    # e2e: the predict() contract — paired uint8 rows in, grid + raw PNGs out
    pairs = rng.integers(0, 255, (min(n, 256), 2, img, img, 1), np.uint8)
    out_dir = "/tmp/gan_tpu_infer_bench"
    os.makedirs(out_dir, exist_ok=True)
    trainer.predict(pairs[:8], out_dir, raw=True)  # compile + warm caches
    t0 = time.perf_counter()
    trainer.predict(pairs, out_dir, raw=True)
    dt = time.perf_counter() - t0
    report["e2e_predict_imgs_per_sec"] = round(pairs.shape[0] / dt, 2)
    print(json.dumps({"mode": "e2e_predict",
                      "imgs_per_sec": report["e2e_predict_imgs_per_sec"],
                      "note": "incl. 3-panel grid + raw PNG writes (host)"}),
          flush=True)

    if save:
        out = os.path.join(os.path.dirname(__file__), "results",
                           "infer_bench.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
