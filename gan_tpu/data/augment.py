"""Fused on-device augmentation (the jitted half of the input pipeline).

Replaces the reference's per-sample tf.data augment graph with one fused XLA
stage over a whole batch:

* ``paired_jitter_batch`` — Pix2Pix ``random_jitter`` (pix2pix.py:56-87):
  paired random crop from the (img_size+30)² pre-resize back to img_size²
  (same offsets for input and target — `tf.image.random_crop` over the
  stacked pair), 50% paired left-right mirror (one uniform gate per sample,
  pix2pix.py:83), then [-1,1] normalize (base_gan.py:56-61).
* ``single_jitter_batch`` — CycleGAN ``random_jitter`` (cycle_gan.py:49-63):
  independent crop + ``random_flip_left_right`` per image, then normalize.
* ``normalize_batch`` — the deterministic val/test/pred path (resize happened
  host-side): uint8 → (x/127.5 − 1).

The deterministic nearest pre-resize to img_size+30 (pix2pix.py:75-77) is
hoisted into the host cache (gan_tpu.data.pipeline) since it has no
randomness; what remains here is exactly the per-step random work, fused into
one kernel per batch and keyed by ``jax.random`` so augmentation is
reproducible from ``--seed`` (fixing SURVEY §2.10-Q7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

JITTER_PAD = 30  # reference resizes to img_size + 30 (pix2pix.py:75, cycle_gan.py:55)


def _normalize(x, dtype):
    """uint8 → [-1, 1] float (base_gan.py:56-61)."""
    return x.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)


def normalize_batch(batch_u8, dtype=jnp.float32):
    return _normalize(batch_u8, dtype)


@functools.partial(jax.jit, static_argnames=("img_size", "dtype"))
def paired_jitter_batch(batch_u8, key, *, img_size: int, dtype=jnp.float32):
    """Paired crop+mirror+normalize for Pix2Pix.

    batch_u8: (B, 2, S+J, S+J, C) uint8, axis 1 = (input, target).
    Returns (input, target), each (B, S, S, C) in ``dtype``.
    """
    b, _, src, _, c = batch_u8.shape
    limit = src - img_size + 1  # tf.image.random_crop offset ∈ [0, limit)
    keys = jax.random.split(key, b)

    def one(pair, k):
        k_h, k_w, k_f = jax.random.split(k, 3)
        oh = jax.random.randint(k_h, (), 0, limit)
        ow = jax.random.randint(k_w, (), 0, limit)
        cropped = lax.dynamic_slice(pair, (0, oh, ow, 0), (2, img_size, img_size, c))
        flip = jax.random.uniform(k_f, ()) > 0.5  # pix2pix.py:83
        return jnp.where(flip, cropped[:, :, ::-1, :], cropped)

    cropped = jax.vmap(one)(batch_u8, keys)
    out = _normalize(cropped, dtype)
    return out[:, 0], out[:, 1]


@functools.partial(jax.jit, static_argnames=("img_size", "dtype"))
def single_jitter_batch(batch_u8, key, *, img_size: int, dtype=jnp.float32):
    """Independent crop+flip+normalize for CycleGAN. batch_u8: (B, S+J, S+J, C)."""
    b, src, _, c = batch_u8.shape
    limit = src - img_size + 1
    keys = jax.random.split(key, b)

    def one(img, k):
        k_h, k_w, k_f = jax.random.split(k, 3)
        oh = jax.random.randint(k_h, (), 0, limit)
        ow = jax.random.randint(k_w, (), 0, limit)
        cropped = lax.dynamic_slice(img, (oh, ow, 0), (img_size, img_size, c))
        flip = jax.random.uniform(k_f, ()) > 0.5  # tf.image.random_flip_left_right
        return jnp.where(flip, cropped[:, ::-1, :], cropped)

    cropped = jax.vmap(one)(batch_u8, keys)
    return _normalize(cropped, dtype)
