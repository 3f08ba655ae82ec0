"""TPU compute primitives with TF-parity semantics.

Each op here replaces a TF C++/cuDNN kernel the reference delegated to
(SURVEY.md §2.9): stride-2 'same' conv / transposed conv, batch & instance
norm, nearest-neighbor resize, SSIM, and sigmoid BCE. XLA implementations are
the source of truth; fused Pallas kernels (``gan_tpu.ops.pallas``) swap in
underneath via the same call signatures.
"""

from gan_tpu.ops.conv import conv2d_down, conv2d_same, conv2d_transpose_up, conv2d_valid
from gan_tpu.ops.norm import batch_norm, instance_norm
from gan_tpu.ops.resize import resize_nearest, resize_nearest_np
from gan_tpu.ops.ssim import ssim
from gan_tpu.ops.loss_ops import bce_with_logits, l1_loss

__all__ = [
    "conv2d_down", "conv2d_same", "conv2d_transpose_up", "conv2d_valid",
    "batch_norm", "instance_norm",
    "resize_nearest", "resize_nearest_np",
    "ssim", "bce_with_logits", "l1_loss",
]
