#!/usr/bin/env python3
"""Offline FLIR curation: register thermal/visible pairs → concatenated PNGs.

Functional equivalent of the reference's offline curation
(create_training_imgs/curate_FLIR_data.py:14-91), rebuilt as a reusable CLI
(the reference hard-codes workstation paths, :96-101). Algorithm: grayscale +
CLAHE equalization on both frames; Canny edges on the thermal; multi-scale
(20 scales, 0.2→1.0) Canny template search of the thermal inside the
wider-FOV visible (TM_CCOEFF); crop the visible to the best match; resize
both to (512, 640); Gaussian-blur (σ=0.5) + 3×3 sharpen the thermal;
horizontally concatenate [thermal | visible] and write a PNG — producing the
512×1280 pairs the Pix2Pix pipeline consumes (README.md:219-221).

Pairing modes:
  --pairs-json  thermal→visible crosswalk (the FLIR-Europe layout)
  default       filename-matched files in --thermal-dir / --visible-dir

Usage:
  python tools/curate_flir.py --thermal-dir T --visible-dir V --output OUT
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the build image
    cv2 = None

OUT_DIMS = (512, 640)  # (height, width) per half
CANNY_LO, CANNY_HI = 100, 200
CLAHE_CLIP, CLAHE_TILES = 1.0, (15, 15)
N_SCALES, SCALE_LO, SCALE_HI = 20, 0.2, 1.0


def _to_gray_clahe(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    clahe = cv2.createCLAHE(clipLimit=CLAHE_CLIP, tileGridSize=CLAHE_TILES)
    return clahe.apply(img)


def _resize_width(img: np.ndarray, width: int) -> np.ndarray:
    h, w = img.shape[:2]
    return cv2.resize(img, (width, max(1, int(round(h * width / w)))))


def locate_thermal_in_visible(therm_gray: np.ndarray, vis_gray: np.ndarray):
    """Best-scoring (startX, startY, endX, endY) of the thermal FOV inside
    the visible frame via multi-scale Canny template matching."""
    t_edges = cv2.Canny(therm_gray, CANNY_LO, CANNY_HI)
    th, tw = therm_gray.shape[:2]
    best = None
    for scale in np.linspace(SCALE_LO, SCALE_HI, N_SCALES)[::-1]:
        resized = _resize_width(vis_gray, int(vis_gray.shape[1] * scale))
        if resized.shape[0] < th or resized.shape[1] < tw:
            break
        ratio = vis_gray.shape[1] / float(resized.shape[1])
        scores = cv2.matchTemplate(cv2.Canny(resized, CANNY_LO, CANNY_HI),
                                   t_edges, cv2.TM_CCOEFF)
        _, max_val, _, max_loc = cv2.minMaxLoc(scores)
        if best is None or max_val > best[0]:
            best = (max_val, max_loc, ratio)
    if best is None:
        return None
    _, (mx, my), r = best
    return int(mx * r), int(my * r), int((mx + tw) * r), int((my + th) * r)


def _enhance_thermal(therm: np.ndarray) -> np.ndarray:
    """Gaussian blur (σ=0.5) then 3×3 sharpen (curate_FLIR_data.py:80-88)."""
    blurred = cv2.GaussianBlur(therm, (0, 0), sigmaX=0.5, sigmaY=0.5)
    sharpen = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]])
    return cv2.filter2D(src=blurred, ddepth=-1, kernel=sharpen)


def align_pair(therm: np.ndarray, vis: np.ndarray,
               dims: tuple[int, int] = OUT_DIMS) -> np.ndarray | None:
    """Register one pair; returns the (dims[0], 2*dims[1]) concatenated gray
    image, or None when no match region was found."""
    therm_g = _to_gray_clahe(therm)
    vis_g = _to_gray_clahe(vis)
    box = locate_thermal_in_visible(therm_g, vis_g)
    if box is None:
        return None
    sx, sy, ex, ey = box
    vis_crop = vis_g[sy:ey, sx:ex]
    if vis_crop.size == 0:
        return None
    h, w = dims
    therm_out = _enhance_thermal(cv2.resize(therm_g, (w, h)))
    vis_out = cv2.resize(vis_crop, (w, h))
    return cv2.hconcat([therm_out, vis_out])


def iter_pairs(args) -> list[tuple[str, str, str]]:
    """[(thermal_path, visible_path, out_name)]."""
    if args.pairs_json:
        with open(args.pairs_json) as f:
            crosswalk = json.load(f)
        return [(os.path.join(args.thermal_dir, t),
                 os.path.join(args.visible_dir, v),
                 os.path.splitext(os.path.basename(t))[0] + ".png")
                for t, v in crosswalk.items()]
    vis_by_stem = {os.path.splitext(n)[0]: n for n in os.listdir(args.visible_dir)}
    pairs = []
    for name in sorted(os.listdir(args.thermal_dir)):
        stem = os.path.splitext(name)[0]
        if stem in vis_by_stem:
            pairs.append((os.path.join(args.thermal_dir, name),
                          os.path.join(args.visible_dir, vis_by_stem[stem]),
                          stem + ".png"))
    return pairs


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("curate_flir")
    parser.add_argument("--thermal-dir", required=True)
    parser.add_argument("--visible-dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--pairs-json", default=None,
                        help="optional thermal→visible filename crosswalk JSON")
    parser.add_argument("--height", type=int, default=OUT_DIMS[0])
    parser.add_argument("--width", type=int, default=OUT_DIMS[1])
    args = parser.parse_args(argv)

    if cv2 is None:
        print("curate_flir requires OpenCV (cv2)", file=sys.stderr)
        return 1
    os.makedirs(args.output, exist_ok=True)
    n_ok = n_skip = 0
    for t_path, v_path, out_name in iter_pairs(args):
        therm, vis = cv2.imread(t_path), cv2.imread(v_path)
        if therm is None or vis is None:
            n_skip += 1
            continue
        merged = align_pair(therm, vis, (args.height, args.width))
        if merged is None:
            n_skip += 1
            continue
        cv2.imwrite(os.path.join(args.output, out_name), merged)
        n_ok += 1
    print(f"curated {n_ok} pairs ({n_skip} skipped)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
