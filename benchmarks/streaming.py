#!/usr/bin/env python3
"""Beyond-tiled-ceiling throughput at reference scale (round-2 VERDICT #1).

The tile-padded device-cache ceiling is 3.5 GB/device (data/loader.py:
DEVICE_CACHE_SAFE_BYTES), which the REAL reference corpus (25,472 Pix2Pix
pairs ≈ 5.63 GB tile-padded at 286²) exceeds. Round 3 resolved that tier by
tier — measure each here:

  * ``flatcache``  — the full corpus device-resident in FLAT storage
    (train/loop.py FlatCache, 4.17 GB raw — fits under the argument-bytes
    fault boundary). The configuration the reference corpus now actually
    hits on one chip: measured 1,356 img/s/chip round 3.
  * ``hybrid``     — resident flat prefix + streamed tail
    (trainer._run_epoch_hybrid) for corpora beyond even flat storage (512²,
    C=3). Tail transfers overlap the prefix scan. Pass the flat budget via
    GAN_TPU_FLAT_CACHE_MAX to emulate any resident fraction.
  * ``hostarray``  — pure streaming from a decoded host uint8 cache
    (--device-cache off): bound by host→device bandwidth — 65-72 MB/s over
    the axon tunnel ⇒ ~400 img/s ceiling at 256²
    (benchmarks/transfer_bench.py has the full bottleneck analysis).
  * ``filecache``  — per-step file decode (FileCache background threads),
    for corpora beyond host RAM. On this 1-core host it is decode-bound —
    see ``decode`` for the ceiling.
  * ``decode``     — standalone native C++ decoder throughput (pairs/s) on
    the same files: the upper bound any file-streaming path can sustain.
  * ``cyclegan``   — CycleGAN dual-domain host-array streaming.
  * ``cyclegan_flat`` — CycleGAN reference scale (25.4k/domain, 4.16 GB
    total) fully device-resident flat: the tier the reference corpus hits
    since epoch segmentation lifted the long-program fault (310 pairs/s at
    batch 32 — no flat penalty vs 16k tiled; 146 at the reference batch-4
    config).
  * ``cyclegan_hybrid`` — CycleGAN resident-prefix + streamed-tail, for
    corpora beyond even the flat ceiling (loader.CYCLEGAN_FLAT_SAFE_BYTES).

Usage: python benchmarks/streaming.py MODE [n_imgs] [batch] [img_size]
Prints one JSON line per run (same schema as bench.py).
GAN_TPU_PREFETCH_DEPTH=0 disables the double-buffer (A/B baseline).
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



from benchmarks._bench_util import hard_sync as _sync

def synth_corpus_files(root: str, n: int, *, img_size: int, pair: bool,
                       channels: int = 1) -> list[str]:
    """Write n synthetic pair/single PNGs (reference layout: pairs are
    horizontally concatenated input|target). Random noise — the pessimistic
    (least-compressible) case for PNG decode. Reused across runs."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    w = img_size * (2 if pair else 1)
    paths = [os.path.join(root, f"img_{i:06d}.png") for i in range(n)]
    todo = [p for p in paths if not os.path.exists(p)]
    if todo:
        rng = np.random.default_rng(0)
        t0 = time.time()
        for k, p in enumerate(todo):
            arr = rng.integers(0, 255, (img_size, w), np.uint8)
            Image.fromarray(arr, "L").save(p, compress_level=1)
            if k and k % 5000 == 0:
                print(f"  wrote {k}/{len(todo)} ({time.time()-t0:.0f}s)",
                      file=sys.stderr, flush=True)
    return paths


def _pix2pix_trainer(batch: int, img_size: int):
    from gan_tpu.config import Pix2PixConfig
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    n_dev = len(jax.devices())
    cfg = Pix2PixConfig(data="", output="", img_size=img_size,
                        batch_size=batch, train=True, epochs=1, dtype="bf16",
                        num_devices=n_dev)
    cfg.validate()
    return Pix2PixTrainer(cfg), n_dev


def run_hostarray(n: int, batch: int, img_size: int, epochs: int = 2) -> dict:
    trainer, n_dev = _pix2pix_trainer(batch, img_size)
    src = img_size + JITTER_PAD
    rng = np.random.default_rng(0)
    cache = rng.integers(0, 255, (n, 2, src, src, 1), np.uint8)
    print(f"host cache: {cache.nbytes/1e9:.2f} GB ({n} pairs)",
          file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    trainer._run_epoch_streaming(cache, key, training=True)  # compile+warm
    _sync(trainer.params)
    t0 = time.perf_counter()
    for e in range(epochs):
        trainer._run_epoch_streaming(cache, jax.random.fold_in(key, e + 1),
                                     training=True)
    _sync(trainer.params)
    ips = epochs * n / (time.perf_counter() - t0)
    return {"metric": f"pix2pix_stream_hostarray_imgs_per_sec_per_chip_{img_size}",
            "value": round(ips / n_dev, 2), "unit": "images/sec/chip",
            "vs_baseline": round(ips / n_dev / 250.0, 4)}


def run_flatcache(n: int, batch: int, img_size: int, epochs: int = 3) -> dict:
    """Full corpus device-resident in FLAT storage — scanned epochs."""
    from gan_tpu.train import loop

    trainer, n_dev = _pix2pix_trainer(batch, img_size)
    src = img_size + JITTER_PAD
    rng = np.random.default_rng(0)
    cache = rng.integers(0, 255, (n, 2, src, src, 1), np.uint8)
    print(f"host cache: {cache.nbytes/1e9:.2f} GB ({n} pairs)",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    dev = loop.put_cache(cache, trainer.mesh, storage="flat")
    jax.block_until_ready(dev.strips)
    print(f"put_cache(flat): {time.perf_counter()-t0:.1f} s "
          f"({len(dev.strips)} strips)", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)
    trainer._run_epoch(dev, cache, key, training=True, fixed_order=True,
                       rng=host_rng)  # compile+warm
    _sync(trainer.params)
    times = []
    for e in range(epochs):
        t0 = time.perf_counter()
        trainer._run_epoch(dev, cache, jax.random.fold_in(key, e + 1),
                           training=True, fixed_order=True, rng=host_rng)
        _sync(trainer.params)
        times.append(time.perf_counter() - t0)
    ips = n / float(np.median(times))
    return {"metric": f"pix2pix_flatcache_imgs_per_sec_per_chip_{img_size}",
            "value": round(ips / n_dev, 2), "unit": "images/sec/chip",
            "vs_baseline": round(ips / n_dev / 250.0, 4)}


def run_hybrid(n: int, batch: int, img_size: int, epochs: int = 2) -> dict:
    """Resident flat prefix + streamed tail; budget via GAN_TPU_FLAT_CACHE_MAX
    (defaults to the production FLAT_CACHE_SAFE_BYTES on TPU)."""
    from gan_tpu.train import loop

    trainer, n_dev = _pix2pix_trainer(batch, img_size)
    src = img_size + JITTER_PAD
    rng = np.random.default_rng(0)
    cache = rng.integers(0, 255, (n, 2, src, src, 1), np.uint8)
    n_res = trainer._hybrid_resident_rows(cache)
    print(f"host cache: {cache.nbytes/1e9:.2f} GB ({n} pairs); resident "
          f"prefix {n_res} rows ({n_res/max(n,1):.0%})",
          file=sys.stderr, flush=True)
    if not (0 < n_res < n):
        raise SystemExit("hybrid needs 0 < resident < n; set "
                         "GAN_TPU_FLAT_CACHE_MAX or sizes accordingly")
    res_host = cache[:n_res]
    dev = loop.put_cache(res_host, trainer.mesh, storage="flat")
    key = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)
    trainer._run_epoch_hybrid(dev, res_host, cache, key, training=True,
                              rng=host_rng)  # compile+warm
    _sync(trainer.params)
    t0 = time.perf_counter()
    for e in range(epochs):
        trainer._run_epoch_hybrid(dev, res_host, cache,
                                  jax.random.fold_in(key, e + 1),
                                  training=True, rng=host_rng)
    _sync(trainer.params)
    ips = epochs * n / (time.perf_counter() - t0)
    return {"metric": f"pix2pix_hybrid_imgs_per_sec_per_chip_{img_size}",
            "value": round(ips / n_dev, 2), "unit": "images/sec/chip",
            "vs_baseline": round(ips / n_dev / 250.0, 4),
            "resident_rows": n_res, "total_rows": n}


def run_filecache(n: int, batch: int, img_size: int, epochs: int = 1) -> dict:
    from gan_tpu.data.loader import FileCache
    from gan_tpu.data.pipeline import build_pix2pix_cache

    paths = synth_corpus_files(f"/tmp/gan_tpu_streambench/pair{img_size}", n,
                               img_size=286 if img_size == 256 else img_size + JITTER_PAD,
                               pair=True)
    trainer, n_dev = _pix2pix_trainer(batch, img_size)
    src = img_size + JITTER_PAD
    fc = FileCache(paths,
                   lambda p: build_pix2pix_cache([p], img_size=img_size,
                                                 channels=1, orient="left",
                                                 train=True)[0],
                   (2, src, src, 1), batch)
    key = jax.random.PRNGKey(0)
    trainer._run_epoch_streaming(fc, key, training=True)  # compile+warm
    _sync(trainer.params)
    t0 = time.perf_counter()
    for e in range(epochs):
        trainer._run_epoch_streaming(fc, jax.random.fold_in(key, e + 1),
                                     training=True)
    _sync(trainer.params)
    ips = epochs * n / (time.perf_counter() - t0)
    return {"metric": f"pix2pix_stream_filecache_imgs_per_sec_per_chip_{img_size}",
            "value": round(ips / n_dev, 2), "unit": "images/sec/chip",
            "vs_baseline": round(ips / n_dev / 250.0, 4)}


def run_decode(n: int, batch: int, img_size: int) -> dict:
    """Standalone decoder ceiling: native C++ loader over the same files."""
    from gan_tpu.data.pipeline import build_pix2pix_cache, _use_native

    paths = synth_corpus_files(f"/tmp/gan_tpu_streambench/pair{img_size}", n,
                               img_size=286 if img_size == 256 else img_size + JITTER_PAD,
                               pair=True)
    build_pix2pix_cache(paths[:64], img_size=img_size, channels=1,
                        orient="left", train=True)  # warm
    t0 = time.perf_counter()
    build_pix2pix_cache(paths, img_size=img_size, channels=1, orient="left",
                        train=True)
    ips = n / (time.perf_counter() - t0)
    return {"metric": f"native_decode_pairs_per_sec_{img_size}"
            if _use_native() else f"python_decode_pairs_per_sec_{img_size}",
            "value": round(ips, 2), "unit": "pairs/sec (host, 1 core)",
            "vs_baseline": round(ips / 250.0, 4)}


def _cyclegan_trainer(batch: int, img_size: int):
    from gan_tpu.config import CycleGANConfig
    from gan_tpu.train.cyclegan_trainer import CycleGANTrainer

    n_dev = len(jax.devices())
    cfg = CycleGANConfig(input_images="", target_images="", output="",
                         img_size=img_size, batch_size=batch, train=True,
                         epochs=1, dtype="bf16", num_devices=n_dev)
    cfg.validate()
    return CycleGANTrainer(cfg), n_dev


def run_cyclegan_flat(n: int, batch: int, img_size: int, epochs: int = 2) -> dict:
    """CycleGAN reference scale fully device-resident flat (both domains)."""
    from gan_tpu.train import loop

    trainer, n_dev = _cyclegan_trainer(batch, img_size)
    src = img_size + JITTER_PAD
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (n, src, src, 1), np.uint8)
    y = rng.integers(0, 255, (n, src, src, 1), np.uint8)
    print(f"host caches: {2*x.nbytes/1e9:.2f} GB ({n}/domain)",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    caches = {"x": loop.put_cache(x, trainer.mesh, storage="flat"),
              "y": loop.put_cache(y, trainer.mesh, storage="flat")}
    jax.block_until_ready([c.strips for c in caches.values()])
    print(f"put_cache(flat) x2: {time.perf_counter()-t0:.1f} s",
          file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)
    trainer._run_epoch(caches, x, y, key, training=True, rng=host_rng)
    _sync(trainer.params)
    t0 = time.perf_counter()
    for e in range(epochs):
        trainer._run_epoch(caches, x, y, jax.random.fold_in(key, e + 1),
                           training=True, rng=host_rng)
    _sync(trainer.params)
    pps = epochs * n / (time.perf_counter() - t0)
    return {"metric": f"cyclegan_flatcache_pairs_per_sec_per_chip_{img_size}",
            "value": round(pps / n_dev, 2), "unit": "image-pairs/sec/chip",
            "vs_baseline": round(pps / n_dev / 250.0, 4)}


def run_cyclegan_hybrid(n: int, batch: int, img_size: int,
                        epochs: int = 2) -> dict:
    """CycleGAN resident-flat-prefix + streamed-tail epochs — for corpora
    beyond the flat ceiling (the 25.4k/domain reference corpus itself fits
    flat since epoch segmentation; emulate any resident fraction via
    GAN_TPU_FLAT_CACHE_MAX)."""
    from gan_tpu.train import loop

    trainer, n_dev = _cyclegan_trainer(batch, img_size)
    src = img_size + JITTER_PAD
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (n, src, src, 1), np.uint8)
    y = rng.integers(0, 255, (n, src, src, 1), np.uint8)
    n_res = trainer._hybrid_resident_rows(x, y)
    print(f"host caches: {2*x.nbytes/1e9:.2f} GB ({n}/domain); resident "
          f"prefix {n_res}/domain ({n_res/max(n,1):.0%})",
          file=sys.stderr, flush=True)
    if not (0 < n_res < n):
        raise SystemExit("hybrid needs 0 < resident < n; set "
                         "GAN_TPU_FLAT_CACHE_MAX or sizes accordingly")
    res_x, res_y = x[:n_res], y[:n_res]
    caches = {"x": loop.put_cache(res_x, trainer.mesh, storage="flat"),
              "y": loop.put_cache(res_y, trainer.mesh, storage="flat")}
    jax.block_until_ready([c.strips for c in caches.values()])
    key = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)
    trainer._run_epoch_hybrid(caches, res_x, res_y, x, y, key,
                              training=True, rng=host_rng)  # compile+warm
    _sync(trainer.params)
    t0 = time.perf_counter()
    for e in range(epochs):
        trainer._run_epoch_hybrid(caches, res_x, res_y, x, y,
                                  jax.random.fold_in(key, e + 1),
                                  training=True, rng=host_rng)
    _sync(trainer.params)
    pps = epochs * n / (time.perf_counter() - t0)
    return {"metric": f"cyclegan_hybrid_pairs_per_sec_per_chip_{img_size}",
            "value": round(pps / n_dev, 2), "unit": "image-pairs/sec/chip",
            "vs_baseline": round(pps / n_dev / 250.0, 4),
            "resident_rows_per_domain": n_res, "total_rows_per_domain": n}


def run_cyclegan(n: int, batch: int, img_size: int, epochs: int = 1) -> dict:
    from gan_tpu.config import CycleGANConfig
    from gan_tpu.train.cyclegan_trainer import CycleGANTrainer

    n_dev = len(jax.devices())
    cfg = CycleGANConfig(input_images="", target_images="", output="",
                         img_size=img_size, batch_size=batch, train=True,
                         epochs=1, dtype="bf16", num_devices=n_dev)
    cfg.validate()
    trainer = CycleGANTrainer(cfg)
    src = img_size + JITTER_PAD
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (n, src, src, 1), np.uint8)
    y = rng.integers(0, 255, (n, src, src, 1), np.uint8)
    print(f"host caches: {2*x.nbytes/1e9:.2f} GB ({n}/domain)",
          file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)
    trainer._run_epoch_streaming(x, y, key, training=True, rng=host_rng)
    _sync(trainer.params)
    t0 = time.perf_counter()
    for e in range(epochs):
        trainer._run_epoch_streaming(x, y, jax.random.fold_in(key, e + 1),
                                     training=True, rng=host_rng)
    _sync(trainer.params)
    pps = epochs * n / (time.perf_counter() - t0)
    return {"metric": f"cyclegan_stream_hostarray_pairs_per_sec_per_chip_{img_size}",
            "value": round(pps / n_dev, 2), "unit": "image-pairs/sec/chip",
            "vs_baseline": round(pps / n_dev / 250.0, 4)}


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "hostarray"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 25_472
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    img = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    fn = {"hostarray": run_hostarray, "filecache": run_filecache,
          "decode": run_decode, "cyclegan": run_cyclegan,
          "flatcache": run_flatcache, "hybrid": run_hybrid,
          "cyclegan_flat": run_cyclegan_flat,
          "cyclegan_hybrid": run_cyclegan_hybrid}[mode]
    print(json.dumps(fn(n, batch, img)))
