#!/usr/bin/env python3
"""Split concatenated [thermal | visible] images into two directories.

Functional equivalent of create_training_imgs/separate_FLIR_data.py:4-32:
each image in --data splits at w//2 into <data>/therm/<name> and
<data>/vis/<name> — the unpaired layout CycleGAN consumes.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def separate(data_dir: str, therm_name: str = "therm", vis_name: str = "vis") -> int:
    therm_dir = os.path.join(data_dir, therm_name)
    vis_dir = os.path.join(data_dir, vis_name)
    os.makedirs(therm_dir, exist_ok=True)
    os.makedirs(vis_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(data_dir)):
        path = os.path.join(data_dir, name)
        if not os.path.isfile(path) or not ("png" in name or "jpg" in name):
            continue
        with Image.open(path) as im:
            arr = np.asarray(im)
        w = arr.shape[1] // 2
        Image.fromarray(arr[:, :w]).save(os.path.join(therm_dir, name))
        Image.fromarray(arr[:, w:]).save(os.path.join(vis_dir, name))
        n += 1
    return n


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("separate_flir")
    parser.add_argument("--data", required=True,
                        help="directory of concatenated pair images")
    args = parser.parse_args(argv)
    n = separate(args.data)
    print(f"separated {n} images")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
