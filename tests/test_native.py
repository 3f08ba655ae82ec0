"""Native C++ loader: bit-parity with the PIL/NumPy preprocessing path."""

import numpy as np
import pytest
from PIL import Image

from gan_tpu.data import native, pipeline


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader not built")


@pytest.fixture()
def imgs(tmp_path):
    rng = np.random.default_rng(3)
    gray, rgb = [], []
    for i in range(4):
        p = str(tmp_path / f"g_{i}.png")
        Image.fromarray(rng.integers(0, 255, (48, 96), np.uint8), "L").save(p)
        gray.append(p)
        p = str(tmp_path / f"c_{i}.png")
        Image.fromarray(rng.integers(0, 255, (48, 96, 3), np.uint8), "RGB").save(p)
        rgb.append(p)
    # one jpeg (decode itself must succeed; lossy so only shape-checked)
    pj = str(tmp_path / "j_0.jpg")
    Image.fromarray(rng.integers(0, 255, (48, 96), np.uint8), "L").save(pj)
    return gray, rgb, [pj]


def test_pair_batch_matches_python(imgs):
    gray, rgb, _ = imgs
    for paths, c in ((gray, 1), (rgb, 3), (rgb, 1), (gray, 3)):
        for orient in ("left", "right"):
            for train in (True, False):
                size = 32 + (30 if train else 0)
                ref = pipeline.build_pix2pix_cache(
                    paths, img_size=32, channels=c, orient=orient, train=train)
                got = native.load_pair_batch(paths, channels=c, orient=orient,
                                             size=size)
                np.testing.assert_array_equal(got, ref)


def test_single_batch_matches_python(imgs):
    gray, rgb, _ = imgs
    for paths, c in ((gray, 1), (rgb, 3), (rgb, 1)):
        for train in (True, False):
            out_size = 32 + (30 if train else 0)
            ref = pipeline.build_cyclegan_cache(paths, img_size=32, channels=c,
                                                train=train)
            got = native.load_single_batch(paths, channels=c, img_size=32,
                                           out_size=out_size)
            np.testing.assert_array_equal(got, ref)


def test_jpeg_decodes(imgs):
    _, _, jpg = imgs
    got = native.load_single_batch(jpg, channels=1, img_size=32, out_size=32)
    assert got.shape == (1, 32, 32, 1)
