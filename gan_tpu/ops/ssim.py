"""SSIM matching ``tf.image.ssim`` (Gaussian window, Wang et al. 2004).

The reference exposes an ``--generator-loss ssim`` mode (pix2pix.py:184) but
its implementation is broken (SURVEY §2.10-Q1): it compares *input* to target
(generator output not involved), uses max_val=255 on [-1,1] data, and adds
similarity to the loss. Here SSIM is implemented faithfully to tf.image.ssim
(filter_size=11, filter_sigma=1.5, k1=0.01, k2=0.03) and the trainer uses the
*corrected* loss ``1 - ssim(gen_output, target, max_val=2.0)``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def _filter2d(x, win):
    """Depthwise separable Gaussian filter, VALID padding. x: (N,H,W,C)."""
    c = x.shape[-1]
    row = jnp.asarray(win).reshape(1, -1, 1, 1)
    col = jnp.asarray(win).reshape(-1, 1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    # depthwise: feature_group_count = C with per-channel (k,1,1,1) kernels
    row_k = jnp.tile(row, (1, 1, 1, c))
    col_k = jnp.tile(col, (1, 1, 1, c))
    x = lax.conv_general_dilated(x, row_k, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c)
    x = lax.conv_general_dilated(x, col_k, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c)
    return x


def ssim(a, b, *, max_val: float, filter_size: int = 11, filter_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03):
    """Per-image SSIM of a vs b, shape (N,H,W,C) -> (N,). fp32 math."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    win = _gaussian_kernel(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_a = _filter2d(a, win)
    mu_b = _filter2d(b, win)
    mu_aa = _filter2d(a * a, win)
    mu_bb = _filter2d(b * b, win)
    mu_ab = _filter2d(a * b, win)

    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b

    luminance = (2.0 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
    cs = (2.0 * cov + c2) / (var_a + var_b + c2)
    return jnp.mean(luminance * cs, axis=(1, 2, 3))


def ssim_loss(gen_output, target, *, max_val: float = 2.0):
    """Corrected SSIM generator loss: ``1 - mean SSIM(G(x), y)``.

    Replaces the reference's broken secondary loss (pix2pix.py:184); images
    are in [-1, 1] so the dynamic range is 2.
    """
    return 1.0 - jnp.mean(ssim(gen_output, target, max_val=max_val))
