"""Host-side preprocessing: decode + deterministic resize into uint8 caches.

Everything deterministic in the reference's per-sample pipeline is hoisted
here and executed once per run (multi-threaded), producing packed uint8
arrays. The random remainder (crop/mirror/normalize) runs fused on device
(gan_tpu.data.augment) every step.

Reference mapping:
  * Pix2Pix train  — split_img (pix2pix.py:34-54) + the deterministic resize
    to img_size+30 inside random_jitter (pix2pix.py:75-77)
        → cache (N, 2, S+30, S+30, C), axis 1 = (input, target).
  * Pix2Pix val/test/pred — process_images_pred (pix2pix.py:101-112): split +
    resize to img_size → cache (N, 2, S, S, C).
  * CycleGAN train — load(resize=True→S) (cycle_gan.py:71) + jitter's resize
    to S+30 (cycle_gan.py:55) → cache (N, S+30, S+30, C).
  * CycleGAN val/test/pred — load(resize=True→S) + resize(S) (cycle_gan.py:82-84)
    → cache (N, S, S, C).

uint8 is safe: every deterministic op up to normalize is a nearest-neighbor
gather, bit-exact in uint8; the fp32 cast (base_gan.py:41) commutes with it.
Caches at reference scale (25k imgs × 286² × 1B × 2 ≈ 4.2 GB) fit v5e HBM —
the loader decides device-resident vs host-streamed.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from gan_tpu.data.decode import decode_image
from gan_tpu.ops.resize import resize_nearest_np
from gan_tpu.data.augment import JITTER_PAD


def split_pair(image: np.ndarray, orient: str) -> tuple[np.ndarray, np.ndarray]:
    """Split a horizontally-concatenated pair at w//2 (pix2pix.py:34-54)."""
    w = image.shape[1] // 2
    left, right = image[:, :w, :], image[:, w:, :]
    return (left, right) if orient == "left" else (right, left)


def _pmap(fn, paths, workers: int = 16):
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(fn, paths))


def _use_native() -> bool:
    """Native C++ loader (gan_tpu.data.native) unless GAN_TPU_NATIVE=0; it is
    bit-identical to this module's Python path (tests/test_native.py)."""
    import os
    if os.environ.get("GAN_TPU_NATIVE") == "0":
        return False
    from gan_tpu.data import native
    return native.available()


def build_pix2pix_cache(paths: list[str], *, img_size: int, channels: int,
                        orient: str, train: bool, workers: int = 16) -> np.ndarray:
    """(N, 2, S', S', C) uint8; S' = img_size+30 for train, img_size otherwise."""
    size = img_size + JITTER_PAD if train else img_size
    if paths and _use_native():
        from gan_tpu.data import native
        return native.load_pair_batch(paths, channels=channels, orient=orient,
                                      size=size)

    def one(path):
        inp, tar = split_pair(decode_image(path, channels), orient)
        return np.stack([resize_nearest_np(inp, size, size),
                         resize_nearest_np(tar, size, size)])

    if not paths:
        return np.zeros((0, 2, size, size, channels), np.uint8)
    return np.stack(_pmap(one, paths, workers))


def build_cyclegan_cache(paths: list[str], *, img_size: int, channels: int,
                         train: bool, workers: int = 16) -> np.ndarray:
    """(N, S', S', C) uint8; S' = img_size+30 for train, img_size otherwise.

    Train chains the reference's two resizes: load→img_size then
    jitter→img_size+30 (cycle_gan.py:55,71) — both applied here so the device
    augment only crops/flips.
    """
    size = img_size + JITTER_PAD if train else img_size
    if paths and _use_native():
        from gan_tpu.data import native
        return native.load_single_batch(paths, channels=channels,
                                        img_size=img_size, out_size=size)

    def one(path):
        img = decode_image(path, channels)
        img = resize_nearest_np(img, img_size, img_size)  # load(resize=True)
        if train:
            img = resize_nearest_np(img, size, size)       # jitter pre-resize
        return img

    if not paths:
        return np.zeros((0, size, size, channels), np.uint8)
    return np.stack(_pmap(one, paths, workers))
