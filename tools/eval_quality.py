#!/usr/bin/env python3
"""Quality evaluation: L1 / SSIM / PSNR / Fréchet distance between generated
and ground-truth images.

The reference publishes no quantitative quality numbers ("per-pixel error
fails to evaluate joint distributions", README.md:206) — this tool supplies
the L1/FID-style parity check the rebuild targets (BASELINE.json metric).

Fréchet distance machinery (activation mean/cov + sqrtm) is feature-extractor
pluggable. True FID needs InceptionV3 weights, unavailable offline; the
default extractor is a fixed random-projection conv net (seeded, documented —
a distribution-sensitive proxy comparable across runs of THIS tool, not
against published FID numbers).

Usage:
  python tools/eval_quality.py --generated DIR_A --target DIR_B [--channels 1]
  # or compare a trainer's predictions against the paired test halves:
  python tools/eval_quality.py --pairs DATA_DIR --generated PRED_DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gan_tpu.data.decode import decode_image  # noqa: E402
from gan_tpu.ops.resize import resize_nearest_np  # noqa: E402


def _load_dir(d: str, channels: int, size: int) -> np.ndarray:
    names = sorted(n for n in os.listdir(d) if "png" in n or "jpg" in n)
    imgs = [resize_nearest_np(decode_image(os.path.join(d, n), channels), size, size)
            for n in names]
    return np.stack(imgs).astype(np.float32) / 127.5 - 1.0


def l1(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean(np.abs(a - b)))


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 2.0) -> float:
    mse = np.mean((a - b) ** 2)
    return float(10.0 * np.log10(max_val**2 / max(mse, 1e-12)))


def ssim_np(a: np.ndarray, b: np.ndarray) -> float:
    import jax.numpy as jnp
    from gan_tpu.ops.ssim import ssim
    return float(np.mean(np.asarray(ssim(jnp.asarray(a), jnp.asarray(b),
                                         max_val=2.0))))


def _random_features(x: np.ndarray, dim: int = 256, seed: int = 0) -> np.ndarray:
    """Fixed random strided-conv feature extractor (proxy for Inception)."""
    rng = np.random.default_rng(seed)
    import jax
    import jax.numpy as jnp
    from jax import lax

    h = jnp.asarray(x)
    c_in = h.shape[-1]
    for c_out in (16, 32, 64):
        w = jnp.asarray(rng.normal(0, (2.0 / (9 * c_in)) ** 0.5,
                                   (3, 3, c_in, c_out)).astype(np.float32))
        h = lax.conv_general_dilated(h, w, (2, 2), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jnp.maximum(h, 0.0)
        c_in = c_out
    pooled = jnp.mean(h, axis=(1, 2))
    proj = jnp.asarray(rng.normal(0, 1.0 / np.sqrt(pooled.shape[-1]),
                                  (pooled.shape[-1], dim)).astype(np.float32))
    return np.asarray(pooled @ proj)


def frechet_distance(fa: np.ndarray, fb: np.ndarray) -> float:
    """Fréchet distance between Gaussians fit to two activation sets."""
    from scipy import linalg

    mu_a, mu_b = fa.mean(0), fb.mean(0)
    ca = np.cov(fa, rowvar=False)
    cb = np.cov(fb, rowvar=False)
    # sqrtm's `disp` is deprecated (removal: SciPy 1.18); errors now raise
    # through LinAlgError instead of the old (result, errest) tuple
    covmean = linalg.sqrtm(ca @ cb)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(np.sum((mu_a - mu_b) ** 2) + np.trace(ca + cb - 2.0 * covmean))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("eval_quality")
    ap.add_argument("--generated", required=True, help="dir of generated images")
    ap.add_argument("--target", default=None, help="dir of ground-truth images")
    ap.add_argument("--pairs", default=None,
                    help="dir of concatenated pairs; right half is the target")
    ap.add_argument("--channels", type=int, default=1, choices=[1, 3])
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--orient", default="left", choices=["left", "right"])
    ap.add_argument("--fid-weights", default=None,
                    help="InceptionV3 .npz from tools/import_inception_weights"
                         ".py — computes TRUE FID over pool3 features "
                         "(random-init exports yield a structured proxy only)")
    args = ap.parse_args(argv)

    gen_names = sorted(n for n in os.listdir(args.generated)
                       if "png" in n or "jpg" in n)
    gen = np.stack([
        resize_nearest_np(decode_image(os.path.join(args.generated, n),
                                       args.channels),
                          args.img_size, args.img_size)
        for n in gen_names]).astype(np.float32) / 127.5 - 1.0

    if args.pairs:
        # match generated files to pair files by stem (predictions written
        # with --raw-predictions carry their source filenames)
        from gan_tpu.data.pipeline import build_pix2pix_cache
        by_stem = {os.path.splitext(n)[0]: n
                   for n in os.listdir(args.pairs) if "png" in n or "jpg" in n}
        matched = [(g, by_stem[os.path.splitext(g)[0]])
                   for g in gen_names if os.path.splitext(g)[0] in by_stem]
        assert matched, "no generated files share a stem with --pairs files"
        gen = gen[[gen_names.index(g) for g, _ in matched]]
        cache = build_pix2pix_cache(
            [os.path.join(args.pairs, p) for _, p in matched],
            img_size=args.img_size, channels=args.channels,
            orient=args.orient, train=False)
        tar = cache[:, 1].astype(np.float32) / 127.5 - 1.0
    else:
        assert args.target, "--target or --pairs required"
        tar = _load_dir(args.target, args.channels, args.img_size)

    n = min(len(gen), len(tar))
    gen, tar = gen[:n], tar[:n]
    feats_g = _random_features(gen)
    feats_t = _random_features(tar)
    report = {
        "n_images": n,
        "l1": l1(gen, tar),
        "ssim": ssim_np(gen, tar),
        "psnr_db": psnr(gen, tar),
        "frechet_proxy": frechet_distance(feats_g, feats_t),
    }
    if args.fid_weights:
        # true FID over InceptionV3 pool3 features (gan_tpu/models/
        # inception.py — extractor parity vs keras is unit-tested); only a
        # PRETRAINED weight export yields numbers comparable to the
        # literature, a --random export is a structured proxy
        from gan_tpu.models.inception import extract_features, load_params
        iv3 = load_params(args.fid_weights)
        report["fid"] = frechet_distance(extract_features(iv3, gen),
                                         extract_features(iv3, tar))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
