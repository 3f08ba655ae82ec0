"""Nearest-neighbor resize matching TF2 ``tf.image.resize(..., NEAREST)``.

The reference resizes with NEAREST_NEIGHBOR everywhere (base_gan.py:46-53):
at load, in random_jitter (to img_size+30), and in the predict path. TF2's
nearest resize uses half-pixel centers: ``src = floor((dst + 0.5) * in/out)``
clamped to ``in - 1``. Implemented as a static gather so it fuses under jit
(the device-side half of the fused augment stage), plus a NumPy twin used by
the host-side cache pre-resize so both paths are bit-identical.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    scale = in_size / out_size
    idx = np.floor((np.arange(out_size) + 0.5) * scale).astype(np.int32)
    return np.minimum(idx, in_size - 1)


def resize_nearest(image, height: int, width: int):
    """Resize (..., H, W, C) to (..., height, width, C); static shapes only."""
    in_h, in_w = image.shape[-3], image.shape[-2]
    if (in_h, in_w) == (height, width):
        return image
    rows = jnp.asarray(_nearest_indices(in_h, height))
    cols = jnp.asarray(_nearest_indices(in_w, width))
    return image[..., rows[:, None], cols[None, :], :]


def resize_nearest_np(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """NumPy twin of :func:`resize_nearest` for host-side preprocessing."""
    in_h, in_w = image.shape[-3], image.shape[-2]
    if (in_h, in_w) == (height, width):
        return image
    rows = _nearest_indices(in_h, height)
    cols = _nearest_indices(in_w, width)
    return image[..., rows[:, None], cols[None, :], :]
