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


def _down_impl() -> str:
    """GAN_TPU_DOWN: 'std' | 's2d' | 'auto' — stem-conv lowering selector.

    's2d' rewrites the k=4 s=2 downsample conv as space-to-depth + one 2×2
    stride-1 conv (``conv2d_down_s2d``). The candidate win was the C_in∈{1,2}
    STEM convs (G reads grayscale, D reads a 2-channel concat): a 1-channel
    NHWC activation pads its lane dim heavily in the tiled layout, so the
    stem is bandwidth-bound on padding; space-to-depth packs 4 real channels
    per pixel before the conv. Measured on the v5e chip it LOSES 2.9% e2e
    (benchmarks/results/stem_study.json), so 'auto' resolves to the measured
    winner 'std'; 's2d' remains available to force the rewrite for study."""
    import os
    return os.environ.get("GAN_TPU_DOWN", "std")


def conv2d_down(x, w, *, compute_dtype=None):
    """Stride-2 'same' conv — the U-Net / PatchGAN downsample conv (base_gan.py:78)."""
    if (_down_impl() == "s2d" and w.shape[0] == 4 and w.shape[1] == 4
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        return conv2d_down_s2d(x, w, compute_dtype=compute_dtype)
    return conv2d_same(x, w, 2, compute_dtype=compute_dtype)


def conv2d_down_s2d(x, w, *, compute_dtype=None):
    """``conv2d_down`` (k=4, s=2, TF-'same', even H/W) rewritten as
    space-to-depth + ONE 2×2 stride-1 VALID conv — numerically identical
    (same 16·C_in taps per output; tested) but with the input packed 4
    channels per pixel before it reaches the conv.

    Derivation: for even H the TF-'same' pad is (1, 1), so
    ``out[i,j] = Σ_{a,b∈[0,4)} x_pad[2i+a, 2j+b] · w[a,b]`` with
    ``x_pad = pad(x, 1)``. Writing ``a = 2r + di`` (r, di ∈ {0,1}) and
    space-to-depth'ing the padded input — ``x_sd[i', j', (di,dj,c)] =
    x_pad[2i'+di, 2j'+dj, c]`` — makes it a 2×2 VALID conv over ``x_sd``
    with the kernel re-indexed ``w_sd[r, c', (di,dj,c), f] =
    w[2r+di, 2c'+dj, c, f]``. Output (H+2)/2 − 1 = H/2 per dim. The
    backward pass is the plain adjoint of pad/reshape/conv — no dilated
    small-C conv anywhere.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    n, h, wd, c = x.shape
    f = w.shape[3]
    assert h % 2 == 0 and wd % 2 == 0, "s2d stem needs even H, W"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x_sd = (xp.reshape(n, (h + 2) // 2, 2, (wd + 2) // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, (h + 2) // 2, (wd + 2) // 2, 4 * c))
    # (4,4,C,F) -> (r, di, c', dj, C, F) -> (r, c', di, dj, C, F) -> (2,2,4C,F)
    w_sd = (w.reshape(2, 2, 2, 2, c, f)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(2, 2, 4 * c, f))
    return lax.conv_general_dilated(
        x_sd, w_sd, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=x_sd.dtype,
    )


def conv2d_valid(x, w, *, compute_dtype=None):
    """Stride-1 VALID conv — PatchGAN post-ZeroPad convs (base_gan.py:146, 159)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )


def _convt_impl() -> str:
    """GAN_TPU_CONVT: 'dilated' | 'phased' | 'auto'.

    Measured on the v5e chip (benchmarks/convt_bench.py micro, batch 128,
    bf16): XLA:TPU's lhs-dilated lowering is already phase-specialized — its
    useful-FLOPs rate (~140 TFLOP/s at the big decoder layers) exceeds the
    25%-useful ceiling a naive dilated compute would be capped at, so the
    hand phase decomposition LOSES 1.3-2x wherever the MXU is busy (extra
    phase-interleave data movement). The one win is the narrow tanh HEAD
    (C_out=1: 3.40 -> 1.53 ms, 2.2x — 1 output channel wastes the MXU lane
    dim and the dilated form is bandwidth-bound on the padded lanes).
    'auto' therefore dispatches phased only when C_out < 8."""
    import os
    return os.environ.get("GAN_TPU_CONVT", "auto")


def conv2d_transpose_up(x, w_tf, stride: int = 2, *, compute_dtype=None):
    """Stride-2 'same' transposed conv — the U-Net upsample conv (base_gan.py:107).

    Exact adjoint of ``conv2d_same(stride)`` (TF ``Conv2DTranspose`` semantics:
    the gradient of the forward conv). Implemented as an lhs-dilated conv so
    XLA lowers it onto the MXU directly rather than via scatter; the
    phase-decomposed rewrite (``conv2d_transpose_up_phased``) is selectable
    via GAN_TPU_CONVT — see ``_convt_impl`` for the measured default.

    x: (N, H, W, C_in); w_tf: (k, k, C_out, C_in) (TF ConvTranspose layout).
    Output: (N, H*stride, W*stride, C_out).
    """
    impl = _convt_impl()
    if stride == 2 and w_tf.shape[0] == 4 and (
            impl == "phased" or (impl == "auto" and w_tf.shape[2] < 8)):
        return conv2d_transpose_up_phased(x, w_tf, compute_dtype=compute_dtype)
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


def _phase_kernel(w_tf):
    """Pack the k=4 TF ConvTranspose kernel into one (2, 2, C_in, 4·C_out)
    stride-1 kernel whose output channels are the 4 output phases
    (ry, rx) ∈ {0,1}² (see conv2d_transpose_up_phased).

    Derivation (per spatial dim, k=4, s=2, TF-'same' → dilated-conv pad 2):
    output row u = 2i+ry sums taps a with (u + a - 2) even, i.e. a ≡ ry
    (mod 2): phase 0 reads x[i-1], x[i] with adjoint taps a = 0, 2; phase 1
    reads x[i], x[i+1] with taps a = 1, 3 — each phase a 2-tap stride-1 conv.
    """
    # adjoint (flipped, IO-swapped) kernel in HWIO
    w = jnp.flip(w_tf, (0, 1)).transpose(0, 1, 3, 2)  # (4,4,C_in,C_out)
    c_in, c_out = w.shape[2], w.shape[3]
    parts = []
    for ry in (0, 1):
        for rx in (0, 1):
            # tap order must match the padded-x window [i-1+t] for t=0,1:
            # phase 0: x[i-1](a=0), x[i](a=2); phase 1: x[i](a=1), x[i+1](a=3)
            ah = (0, 2) if ry == 0 else (1, 3)
            aw = (0, 2) if rx == 0 else (1, 3)
            parts.append(w[jnp.array(ah)][:, jnp.array(aw)])
    return (jnp.stack(parts, axis=3)              # (2,2,C_in,4,C_out)
            .reshape(2, 2, c_in, 4 * c_out))


def conv2d_transpose_up_phased(x, w_tf, *, compute_dtype=None):
    """``conv2d_transpose_up`` (stride 2, k=4) as ONE stride-1 2×2 conv with
    4·C_out output channels + depth-to-space, numerically identical to the
    lhs-dilated form (tested) but with ZERO wasted MXU work: lhs dilation
    feeds the systolic array a 75%-zero input (4 of 16 taps useful per
    output), while the phase decomposition computes exactly the 4 useful
    taps per output pixel. The classic sub-pixel/deconv-phase rewrite,
    expressed in XLA ops so the backward pass (a plain strided conv per
    phase) is derived automatically."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w_tf = w_tf.astype(compute_dtype)
    assert w_tf.shape[0] == w_tf.shape[1] == 4, "phased path is k=4, s=2 only"
    n, h, wd, _ = x.shape
    c_out = w_tf.shape[2]
    wp = _phase_kernel(w_tf)
    # One 2×2 conv over pad-(1,1) input → (H+1, W+1) positions: position u
    # computes x[u-1]·w[0] + x[u]·w[1]. Phase 0 at output row i reads
    # position u=i (taps a=0,2 on x[i-1], x[i]); phase 1 reads u=i+1
    # (taps a=1,3 on x[i], x[i+1]) — so each phase is an offset slice.
    y = lax.conv_general_dilated(
        x, wp, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )                                             # (N, H+1, W+1, 4*C_out)
    y = y.reshape(n, h + 1, wd + 1, 2, 2, c_out)  # (..., ry, rx, C)
    # out[2i+ry, 2j+rx] = y[i+ry, j+rx, ry, rx]
    rows = [[y[:, ry:h + ry, rx:wd + rx, ry, rx] for rx in (0, 1)]
            for ry in (0, 1)]
    y = jnp.stack([jnp.stack(r, axis=3) for r in rows], axis=2)
    #                                              (N, H, ry, W, rx, C)
    return y.reshape(n, 2 * h, 2 * wd, c_out)
