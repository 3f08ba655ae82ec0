#!/usr/bin/env python3
"""Predict-mode batch-inference throughput (BASELINE.json config #5).

The reference's predict path runs ONE eager generator forward per image
(pix2pix.py:337) and writes a matplotlib 3-panel grid per image — entirely
host-bound. Ours batches the forwards (``Pix2PixTrainer.generate_batched``:
a vmap over size-1 sub-batches so every image keeps its OWN BatchNorm stats,
matching the reference's per-image eager semantics, pix2pix_trainer.py) and
writes raw PNGs with PIL. This measures three altitudes:

  * ``device_resident_scan`` — the true serving ceiling: inputs resident on
    device, a lax.scan of vmapped per-image forwards, outputs LEFT on
    device. What a co-located serving pipeline (downstream model reading
    device arrays, e.g. the MERGEN YOLOv5 handoff) could consume.
  * ``roundtrip`` — ``generate_batched``: host uint8 in, host float32 out,
    chunks pipelined on parallel tunnel streams. Over the axon tunnel this
    is TRANSFER-bound (tens of MB/s h2d/d2h), not a chip number — on a
    directly-attached host PCIe would raise the bound ~100×.
  * ``e2e`` — the real `predict --raw-predictions` path: decoded uint8 in,
    3-panel grids + raw PNGs out. Matplotlib rasterization dominates; the
    prefetch thread hides the device+tunnel time behind it.

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


def device_resident_scan(trainer, inputs: np.ndarray, chunk: int = 64,
                         reps: int = 3) -> float:
    """imgs/s for scanned on-device forwards, outputs left on device."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gan_tpu.data.augment import normalize_batch

    cfg = trainer.config
    base = jax.random.PRNGKey(cfg.seed + 2)
    n = inputs.shape[0] // chunk * chunk

    def one(p, x1, k):
        return trainer.gen.apply(p, x1[None], rng=k,
                                 compute_dtype=cfg.compute_dtype)[0]

    @jax.jit
    def serve(p, x_u8):
        xs = x_u8.reshape(-1, chunk, *x_u8.shape[1:])
        idx = jnp.arange(xs.shape[0] * chunk).reshape(xs.shape[0], chunk)
        def body(c, xi):
            x, i = xi
            xb = normalize_batch(x, cfg.compute_dtype)
            keys = jax.vmap(lambda j: jax.random.fold_in(base, j))(i)
            return c, jax.vmap(one, in_axes=(None, 0, 0))(p, xb, keys)
        _, outs = lax.scan(body, 0, (xs, idx))
        return outs

    x_dev = jax.device_put(inputs[:n])
    outs = serve(trainer.params["gen"], x_dev)  # compile + warm
    hard_sync(outs)
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = serve(trainer.params["gen"], x_dev)
    hard_sync(outs)
    dt = time.perf_counter() - t0
    return round(reps * n / dt, 2)


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

    report = {"n_images": n, "img_size": img, "chips": 1}

    ceiling = device_resident_scan(trainer, inputs)
    report["device_resident_scan_imgs_per_sec"] = ceiling
    print(json.dumps({"mode": "device_resident_scan",
                      "imgs_per_sec": ceiling,
                      "note": "inputs resident, outputs left on device"}),
          flush=True)

    report["roundtrip"] = {}
    for chunk in (16, 64, 128):
        trainer.generate_batched(inputs[:chunk], chunk=chunk)  # compile
        hard_sync(trainer.params)
        t0 = time.perf_counter()
        trainer.generate_batched(inputs, chunk=chunk)
        dt = time.perf_counter() - t0
        report["roundtrip"][f"chunk_{chunk}"] = round(n / dt, 2)
        print(json.dumps({"mode": "roundtrip", "chunk": chunk,
                          "imgs_per_sec": report["roundtrip"][f"chunk_{chunk}"]}),
              flush=True)
    report["roundtrip"]["note"] = (
        "host uint8 in / host float32 out; tunnel-transfer-bound on the axon "
        "stack (single-stream h2d drifts 15-72 MB/s; pipelined chunks ride "
        "2-4 parallel streams — benchmarks/transfer_bench.py), NOT a chip "
        "limit: device_resident_scan is the chip's serving rate")

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
