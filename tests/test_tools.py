"""Offline curation tools (ref create_training_imgs/, SURVEY §2.5)."""

import os

import numpy as np
import pytest
from PIL import Image


def test_separate_flir(tmp_path):
    from tools.separate_flir import separate

    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (16, 40), np.uint8), "L").save(
            str(tmp_path / f"pair_{i}.png"))
    n = separate(str(tmp_path))
    assert n == 3
    for i in range(3):
        t = np.asarray(Image.open(tmp_path / "therm" / f"pair_{i}.png"))
        v = np.asarray(Image.open(tmp_path / "vis" / f"pair_{i}.png"))
        full = np.asarray(Image.open(tmp_path / f"pair_{i}.png"))
        np.testing.assert_array_equal(t, full[:, :20])
        np.testing.assert_array_equal(v, full[:, 20:])


def test_curate_align_pair():
    cv2 = pytest.importorskip("cv2")
    from tools.curate_flir import align_pair

    rng = np.random.default_rng(1)
    # visible frame with the "thermal" content embedded at a known offset
    vis = rng.integers(0, 255, (256, 320), np.uint8)
    therm = vis[64:192, 80:240].copy()  # 128×160 subregion
    merged = align_pair(cv2.cvtColor(therm, cv2.COLOR_GRAY2BGR),
                        cv2.cvtColor(vis, cv2.COLOR_GRAY2BGR), dims=(64, 80))
    assert merged is not None
    assert merged.shape == (64, 160)  # [thermal | visible] at (64, 80) each
