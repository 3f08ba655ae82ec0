"""Convolution primitives (NHWC / HWIO), TF-'same' parity.

Replaces the reference's ``tf.keras.layers.Conv2D(strides=2, padding='same')``
and ``Conv2DTranspose(strides=2, padding='same')`` (base_gan.py:78, 107, 146,
159, 201). All convs ride the MXU via ``lax.conv_general_dilated``; inputs and
kernels are cast to the compute dtype (bf16 by default) with fp32 accumulation
handled by the MXU, and outputs stay in the compute dtype so activations in
HBM are half-width.

Kernel layouts:
  * forward conv: HWIO ``(k, k, c_in, c_out)``
  * transposed conv: TF layout ``(k, k, c_out, c_in)`` (matches
    ``tf.keras.layers.Conv2DTranspose.kernel`` so checkpoints are comparable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _same_pad(in_size: int, stride: int, k: int) -> tuple[int, int]:
    """TF 'SAME' padding (lo, hi) for one spatial dim."""
    out = -(-in_size // stride)  # ceil
    total = max((out - 1) * stride + k - in_size, 0)
    lo = total // 2
    return lo, total - lo


def conv2d_same(x, w, stride: int = 2, *, compute_dtype=None):
    """Stride-``s`` 'same' convolution, the reference downsample conv.

    x: (N, H, W, C_in); w: (k, k, C_in, C_out). Output (N, ceil(H/s), ceil(W/s), C_out).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    k = w.shape[0]
    pad = [_same_pad(x.shape[1], stride, k), _same_pad(x.shape[2], stride, k)]
    return lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )


def conv2d_down(x, w, *, compute_dtype=None):
    """Stride-2 'same' conv — the U-Net / PatchGAN downsample conv (base_gan.py:78)."""
    return conv2d_same(x, w, 2, compute_dtype=compute_dtype)


def conv2d_valid(x, w, *, compute_dtype=None):
    """Stride-1 VALID conv — PatchGAN post-ZeroPad convs (base_gan.py:146, 159)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )


def conv2d_transpose_up(x, w_tf, stride: int = 2, *, compute_dtype=None):
    """Stride-2 'same' transposed conv — the U-Net upsample conv (base_gan.py:107).

    Exact adjoint of ``conv2d_same(stride)`` (TF ``Conv2DTranspose`` semantics:
    the gradient of the forward conv). Implemented as an lhs-dilated conv so
    XLA lowers it onto the MXU directly rather than via scatter.

    x: (N, H, W, C_in); w_tf: (k, k, C_out, C_in) (TF ConvTranspose layout).
    Output: (N, H*stride, W*stride, C_out).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w_tf = w_tf.astype(compute_dtype)
    k = w_tf.shape[0]
    # Adjoint of correlation = correlation with spatially-flipped, IO-swapped kernel.
    w = jnp.flip(w_tf, (0, 1)).transpose(0, 1, 3, 2)  # -> HWIO (k,k,C_in,C_out)
    # Transposed-conv padding: forward 'SAME' pad (lo, hi) per dim inverts to
    # (k - 1 - hi, k - 1 - lo) around the dilated input.
    out_h, out_w = x.shape[1] * stride, x.shape[2] * stride
    lo_h, hi_h = _same_pad(out_h, stride, k)
    lo_w, hi_w = _same_pad(out_w, stride, k)
    pad = [(k - 1 - hi_h, k - 1 - lo_h), (k - 1 - hi_w, k - 1 - lo_w)]
    return lax.conv_general_dilated(
        x, w, (1, 1), pad, lhs_dilation=(stride, stride),
        dimension_numbers=_DN, preferred_element_type=x.dtype,
    )
