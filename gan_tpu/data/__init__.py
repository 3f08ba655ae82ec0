"""Data pipeline: host-side decode/split + fused on-device augmentation.

The reference pipes everything through ``tf.data`` worker threads
(pix2pix.py:114-165, cycle_gan.py:87-152). Here the deterministic
preprocessing (decode, pair split, nearest resize) runs once on the host into
a uint8 cache; the per-step randomness (random crop, mirror, [-1,1] normalize)
runs as one fused jitted stage on device, keyed by ``jax.random`` (strictly
deterministic from ``--seed``, unlike the reference's unseeded TF augment RNG
— SURVEY §2.10-Q7).
"""

from gan_tpu.data.split import list_images, pix2pix_split, cyclegan_split
from gan_tpu.data.decode import decode_image, load_image
from gan_tpu.data.augment import paired_jitter_batch, single_jitter_batch, normalize_batch

__all__ = [
    "list_images", "pix2pix_split", "cyclegan_split",
    "decode_image", "load_image",
    "paired_jitter_batch", "single_jitter_batch", "normalize_batch",
]
