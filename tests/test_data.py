"""Data pipeline: seeded splits (reference stdlib-random parity), decode,
host caches, and the fused device augment."""

import math
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from gan_tpu.data import augment, decode, pipeline, split


# ---------------------------------------------------------------- splits
def test_pix2pix_split_matches_reference_semantics():
    contents = [f"img_{i}.png" for i in range(100)]
    train, val, test = split.pix2pix_split(contents, seed=123, test_img=5,
                                           validation_size=0.1)
    # replay the reference's exact call sequence (pix2pix.py:136-147)
    random.seed(123)
    ref_test = random.sample(contents, 5)
    val_obs = math.ceil((100 - 5) * 0.1)
    ref_val = random.sample([i for i in contents if i not in ref_test], int(val_obs))
    ref_train = [i for i in contents if i not in ref_test and i not in ref_val]
    ref_train = random.sample(ref_train, len(ref_train))
    assert test == ref_test and val == ref_val and train == ref_train
    assert len(set(train) | set(val) | set(test)) == 100


def test_cyclegan_split_counts():
    cx = [f"x_{i}.png" for i in range(50)]
    cy = [f"y_{i}.png" for i in range(64)]
    tx, ty, vx, vy, te = split.cyclegan_split(cx, cy, seed=7, test_img=3,
                                              validation_size=0.1)
    assert len(te) == 3
    assert len(vx) == math.ceil((50 - 3) * 0.1)
    assert len(vy) == math.ceil(64 * 0.1)
    assert len(tx) == 50 - 3 - len(vx)
    assert len(ty) == 64 - len(vy)


def test_list_images_substring_match(tmp_path):
    for name in ("a.png", "b.jpg", "c.jpeg", "d.txt", "png_weird.bin"):
        (tmp_path / name).write_bytes(b"x")
    got = sorted(split.list_images(str(tmp_path)))
    # substring match like the reference (pix2pix.py:125): 'png'/'jpg' anywhere
    # — so 'c.jpeg' is EXCLUDED ('jpg' is not a substring of 'jpeg') while
    # 'png_weird.bin' is included; reference quirk preserved.
    assert got == ["a.png", "b.jpg", "png_weird.bin"]


# ---------------------------------------------------------------- decode
def test_decode_roundtrip(tmp_path):
    arr = np.random.default_rng(0).integers(0, 255, (20, 30), np.uint8)
    p = str(tmp_path / "g.png")
    Image.fromarray(arr, "L").save(p)
    out = decode.decode_image(p, channels=1)
    assert out.shape == (20, 30, 1)
    np.testing.assert_array_equal(out[..., 0], arr)
    out3 = decode.decode_image(p, channels=3)
    assert out3.shape == (20, 30, 3)


# --------------------------------------------------------------- pipeline
@pytest.fixture()
def pair_dir(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(4):
        arr = rng.integers(0, 255, (48, 96), np.uint8)
        p = str(tmp_path / f"pair_{i}.png")
        Image.fromarray(arr, "L").save(p)
        paths.append(p)
    return paths


def test_pix2pix_cache_shapes(pair_dir):
    train = pipeline.build_pix2pix_cache(pair_dir, img_size=32, channels=1,
                                         orient="left", train=True)
    assert train.shape == (4, 2, 62, 62, 1) and train.dtype == np.uint8
    ev = pipeline.build_pix2pix_cache(pair_dir, img_size=32, channels=1,
                                      orient="left", train=False)
    assert ev.shape == (4, 2, 32, 32, 1)


def test_pix2pix_split_orient(pair_dir):
    left = pipeline.build_pix2pix_cache(pair_dir[:1], img_size=32, channels=1,
                                        orient="left", train=False)
    right = pipeline.build_pix2pix_cache(pair_dir[:1], img_size=32, channels=1,
                                         orient="right", train=False)
    # orient swaps which half is input vs target (pix2pix.py:45-52)
    np.testing.assert_array_equal(left[0, 0], right[0, 1])
    np.testing.assert_array_equal(left[0, 1], right[0, 0])


def test_cyclegan_cache_shapes(pair_dir):
    train = pipeline.build_cyclegan_cache(pair_dir, img_size=32, channels=1, train=True)
    assert train.shape == (4, 62, 62, 1)
    ev = pipeline.build_cyclegan_cache(pair_dir, img_size=32, channels=1, train=False)
    assert ev.shape == (4, 32, 32, 1)


# ---------------------------------------------------------------- augment
def test_paired_jitter_same_crop_and_flip():
    """Input and target must receive the identical crop offset and mirror
    decision (tf.image.random_crop over the stacked pair, pix2pix.py:56-67)."""
    s = 16
    src = s + augment.JITTER_PAD
    base = np.arange(src * src, dtype=np.uint8).reshape(1, src, src, 1) % 251
    batch = np.stack([np.concatenate([base, base], axis=0)] * 3)  # (3,2,src,src,1)
    x, y = augment.paired_jitter_batch(jnp.asarray(batch), jax.random.PRNGKey(0),
                                       img_size=s, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert x.shape == (3, s, s, 1)
    assert float(jnp.min(x)) >= -1.0 and float(jnp.max(x)) <= 1.0


def test_paired_jitter_values_come_from_source():
    s = 8
    src = s + augment.JITTER_PAD
    img = np.random.default_rng(0).integers(0, 255, (1, 2, src, src, 1), np.uint8)
    x, y = augment.paired_jitter_batch(jnp.asarray(img), jax.random.PRNGKey(1),
                                       img_size=s, dtype=jnp.float32)
    restored = np.round((np.asarray(x) + 1.0) * 127.5).astype(np.uint8)
    src_vals = set(img[0, 0].flatten().tolist())
    assert set(restored.flatten().tolist()) <= src_vals


def test_single_jitter_shapes_and_range():
    s = 16
    src = s + augment.JITTER_PAD
    img = np.random.default_rng(2).integers(0, 255, (5, src, src, 1), np.uint8)
    out = augment.single_jitter_batch(jnp.asarray(img), jax.random.PRNGKey(2),
                                      img_size=s, dtype=jnp.float32)
    assert out.shape == (5, s, s, 1)
    assert float(jnp.min(out)) >= -1.0 and float(jnp.max(out)) <= 1.0


def test_crops_vary_across_batch():
    s = 8
    src = s + augment.JITTER_PAD
    img = np.tile(np.arange(src, dtype=np.uint8)[None, :, None, None], (8, 1, src, 1))
    out = augment.single_jitter_batch(jnp.asarray(img), jax.random.PRNGKey(3),
                                      img_size=s, dtype=jnp.float32)
    first_rows = np.asarray(out)[:, 0, 0, 0]
    assert len(np.unique(first_rows)) > 1  # different offsets drawn per sample


def test_matmul_crop_matches_direct_gather():
    """The MXU one-hot-selector crop must be EXACTLY the gather it replaces:
    same offsets/flips (via the shared _draw_params) applied by plain numpy
    slicing must reproduce the kernel's output bit-for-bit (uint8 values are
    exact in fp32/bf16 and each selector row has a single 1)."""
    s, b = 16, 6
    src = s + augment.JITTER_PAD
    img = np.random.default_rng(7).integers(0, 255, (b, 2, src, src, 1), np.uint8)
    key = jax.random.PRNGKey(9)
    x, y = augment.paired_jitter_batch(jnp.asarray(img), key,
                                       img_size=s, dtype=jnp.float32)
    oh, ow, flip = jax.tree_util.tree_map(
        np.asarray, augment._draw_params(key, b, src - s + 1))
    for i in range(b):
        crop = img[i, :, oh[i]:oh[i] + s, ow[i]:ow[i] + s, :].astype(np.float32)
        if flip[i]:
            crop = crop[:, :, ::-1, :]
        want = crop / 127.5 - 1.0
        # selection is bit-exact; the only deviation is XLA folding the
        # /127.5 into a reciprocal multiply (1 ulp, same as the old path)
        np.testing.assert_allclose(np.asarray(x)[i], want[0], atol=3e-7, rtol=0)
        np.testing.assert_allclose(np.asarray(y)[i], want[1], atol=3e-7, rtol=0)


def test_normalize_batch():
    u8 = np.array([[0, 127, 255]], np.uint8).reshape(1, 1, 3, 1)
    out = np.asarray(augment.normalize_batch(jnp.asarray(u8)))
    np.testing.assert_allclose(out.flatten(), [-1.0, 127 / 127.5 - 1, 1.0], atol=1e-6)
