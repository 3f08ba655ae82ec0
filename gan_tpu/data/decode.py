"""Host-side image decode (PNG/JPEG → uint8 numpy).

Replaces ``tf.io.read_file`` + ``tf.image.decode_png(channels=c)``
(base_gan.py:32-38). Decoding is a host CPU job in either design; the device
never sees encoded bytes. PIL is the default decoder; a native C++ decoder
(``gan_tpu.data.native``) can swap in underneath for multi-core throughput.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def decode_image(path: str, channels: int) -> np.ndarray:
    """Decode an image file to uint8 (H, W, C).

    ``channels`` ∈ {1, 3}, matching ``decode_png(channels=int(channels))``:
    1 → grayscale (luma conversion if the source is RGB), 3 → RGB.
    """
    with Image.open(path) as im:
        im = im.convert("L" if channels == 1 else "RGB")
        arr = np.asarray(im, dtype=np.uint8)
    if channels == 1:
        arr = arr[:, :, None]
    return arr


def load_image(path: str, channels: int, *, resize_to: int | None = None) -> np.ndarray:
    """Decode and optionally nearest-resize to (resize_to, resize_to).

    Mirrors ``GAN.load(image_file, resize=...)`` (base_gan.py:26-44): decode →
    [resize to img_size, NEAREST]. The fp32 cast happens later on device; the
    nearest resize is a pure gather so uint8 vs fp32 order is irrelevant.
    """
    from gan_tpu.ops.resize import resize_nearest_np

    arr = decode_image(path, channels)
    if resize_to is not None:
        arr = resize_nearest_np(arr, resize_to, resize_to)
    return arr
