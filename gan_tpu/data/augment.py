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

TPU implementation: per-sample crop+flip is expressed as two one-hot selector
matmuls per image, ``out = R · X · Cᵀ``, where R selects the cropped rows and
C the (optionally reversed) cropped columns — so the whole batch augment
rides the MXU instead of lowering to per-sample dynamic-slice gathers, which
measured ~25× slower (48 ms vs <2 ms for a 128×286² batch; the gather path
ran at ~0.5 GB/s). The selection is numerically EXACT: one nonzero per
selector row, uint8 values ≤255 are exactly representable in bf16, and
normalization applies the same elementwise op afterwards.

The deterministic nearest pre-resize to img_size+30 (pix2pix.py:75-77) is
hoisted into the host cache (gan_tpu.data.pipeline); what remains here is
exactly the per-step random work, keyed by ``jax.random`` so augmentation is
reproducible from ``--seed`` (fixing SURVEY §2.10-Q7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

JITTER_PAD = 30  # reference resizes to img_size + 30 (pix2pix.py:75, cycle_gan.py:55)


def _normalize(x, dtype):
    """uint8-valued → [-1, 1] float (base_gan.py:56-61)."""
    return x.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)


def normalize_batch(batch_u8, dtype=jnp.float32):
    return _normalize(batch_u8, dtype)


def _draw_params(key, b: int, limit: int):
    """Per-sample (row_offset, col_offset, flip) draws.

    Matches the reference's random structure: crop offsets uniform in
    [0, limit) (tf.image.random_crop) and a 50% mirror gate per sample
    (``uniform(()) > 0.5``, pix2pix.py:83)."""
    keys = jax.random.split(key, b)

    def draws(k):
        a, b_, c = jax.random.split(k, 3)
        oh = jax.random.randint(a, (), 0, limit)
        ow = jax.random.randint(b_, (), 0, limit)
        flip = jax.random.uniform(c, ()) > 0.5
        return oh, ow, flip

    return jax.vmap(draws)(keys)


def _selectors(oh, ow, flip, *, src: int, size: int, dtype):
    """One-hot crop selectors. R: (B, size, src) rows; C: (B, size, src)
    columns with the mirror folded in (output col k reads source col
    ow + (size-1-k) when flipped)."""
    i = jnp.arange(size)
    j = jnp.arange(src)
    rows = (oh[:, None] + i[None, :])[:, :, None] == j[None, None, :]
    k_idx = jnp.where(flip[:, None], size - 1 - i[None, :], i[None, :])
    cols = (ow[:, None] + k_idx)[:, :, None] == j[None, None, :]
    return rows.astype(dtype), cols.astype(dtype)


def _crop_matmul(batch_u8, rows, cols, dtype):
    """out[b, ..., i, k, c] = Σ_{j,l} R[b,i,j] · x[b,...,j,l,c] · C[b,k,l].

    batch_u8: (B, ..., src, src, C) uint8; rows/cols: (B, size, src).
    Exact one-hot selection on the MXU."""
    x = batch_u8.astype(dtype)
    if x.ndim == 5:  # (B, P, H, W, C) — paired
        out = jnp.einsum("bij,bpjlc,bkl->bpikc", rows, x, cols,
                         preferred_element_type=dtype)
    else:            # (B, H, W, C)
        out = jnp.einsum("bij,bjlc,bkl->bikc", rows, x, cols,
                         preferred_element_type=dtype)
    return _normalize(out, dtype)


@functools.partial(jax.jit, static_argnames=("img_size", "dtype"))
def paired_jitter_batch(batch_u8, key, *, img_size: int, dtype=jnp.float32):
    """Paired crop+mirror+normalize for Pix2Pix.

    batch_u8: (B, 2, S+J, S+J, C) uint8, axis 1 = (input, target).
    Returns (input, target), each (B, S, S, C) in ``dtype``.
    """
    b, _, src, _, _ = batch_u8.shape
    limit = src - img_size + 1  # tf.image.random_crop offset ∈ [0, limit)
    oh, ow, flip = _draw_params(key, b, limit)
    rows, cols = _selectors(oh, ow, flip, src=src, size=img_size, dtype=dtype)
    out = _crop_matmul(batch_u8, rows, cols, dtype)
    return out[:, 0], out[:, 1]


@functools.partial(jax.jit, static_argnames=("img_size", "dtype"))
def single_jitter_batch(batch_u8, key, *, img_size: int, dtype=jnp.float32):
    """Independent crop+flip+normalize for CycleGAN. batch_u8: (B, S+J, S+J, C)."""
    b, src, _, _ = batch_u8.shape
    limit = src - img_size + 1
    oh, ow, flip = _draw_params(key, b, limit)
    rows, cols = _selectors(oh, ow, flip, src=src, size=img_size, dtype=dtype)
    return _crop_matmul(batch_u8, rows, cols, dtype)
