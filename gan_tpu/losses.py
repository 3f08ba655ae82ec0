"""Composite GAN losses with reference-parity semantics.

Replaces the reference's loss layer:

* ``discriminator_loss`` — ``(BCE(1, real) + BCE(0, generated)) * factor``,
  called with factor=0.5 (base_gan.py:233-245).
* ``generator_adversarial_loss`` — ``BCE(1, D(fake))`` (pix2pix.py:177,
  cycle_gan.py:154-159).
* ``pix2pix_secondary_loss`` — L1 ``mean|target - gen|`` (pix2pix.py:181) or
  *corrected* SSIM ``1 - ssim(gen, target, max_val=2)``; the reference's SSIM
  branch is broken (compares input to target with max_val=255 and the wrong
  sign — SURVEY §2.10-Q1), so the fixed form is used under the same flag.
* ``cycle_loss`` — ``λ · mean|real − cycled|`` (cycle_gan.py:161-168).
* ``identity_loss`` — ``λ · 0.5 · mean|real − same|`` (cycle_gan.py:170-177).

Also exposes the loss-dictionary key sets (utils.py:32-53) used for metrics
JSONs/figures, and ``sg_tree`` — the stop-gradient partitioning helper that
lets one fused backward pass reproduce the reference's independent
GradientTape-per-network gradients (see train/ docstrings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_tpu.ops.loss_ops import bce_with_logits, l1_loss
from gan_tpu.ops.ssim import ssim_loss

# Loss-dict keys — must match reference utils.py:32-53 byte-for-byte (they
# name the metrics JSON entries and the figure PNG files).
PIX2PIX_LOSS_KEYS = (
    "Generator Total Loss",
    "Generator Loss (Primary)",
    "Generator Loss (Secondary)",
    "Discriminator Loss",
)
CYCLEGAN_LOSS_KEYS = (
    "X->Y Generator Loss",
    "Y->X Generator Loss",
    "Total Cycle Loss",
    "Total X->Y Generator Loss",
    "Total Y->X Generator Loss",
    "Discriminator X Loss",
    "Discriminator Y Loss",
)


def empty_losses(keys) -> dict:
    """Empty loss-accumulator dict (ref utils.py:32-53)."""
    return {k: [] for k in keys}


def sg_tree(tree):
    """stop_gradient every leaf of a param pytree.

    Applying a network with ``sg_tree(params)`` keeps the primal values
    identical (XLA CSEs the duplicate forward) while cutting that network's
    parameters out of the backward — the mechanism that lets a single
    combined-scalar backward reproduce the reference's per-tape gradients
    (pix2pix.py:199-218, cycle_gan.py:216-276) in one fused pass.
    """
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


def discriminator_loss(disc_real_logits, disc_generated_logits, factor: float = 0.5):
    """(BCE(ones, real) + BCE(zeros, generated)) * factor — base_gan.py:233-245."""
    real = bce_with_logits(jnp.ones_like(disc_real_logits), disc_real_logits)
    gen = bce_with_logits(jnp.zeros_like(disc_generated_logits), disc_generated_logits)
    return (real + gen) * factor


def generator_adversarial_loss(disc_generated_logits):
    """BCE(ones, D(G(x))) — pix2pix.py:177, cycle_gan.py:154-159."""
    return bce_with_logits(jnp.ones_like(disc_generated_logits), disc_generated_logits)


def pix2pix_secondary_loss(gen_output, target, kind: str):
    """The λ-weighted secondary generator loss (pix2pix.py:179-184)."""
    if kind == "l1":
        return l1_loss(target, gen_output)
    elif kind == "ssim":
        return ssim_loss(gen_output, target)
    raise ValueError(f"unknown generator loss {kind!r}")


def pix2pix_generator_loss(disc_generated_logits, gen_output, target, *,
                           lam: float, kind: str = "l1"):
    """total, gan, secondary — pix2pix.py:167-188."""
    gan = generator_adversarial_loss(disc_generated_logits)
    secondary = pix2pix_secondary_loss(gen_output, target, kind)
    return gan + lam * secondary, gan, secondary


def cycle_loss(real, cycled, lam: float):
    """λ · mean|real − cycled| — cycle_gan.py:161-168."""
    return lam * l1_loss(real, cycled)


def identity_loss(real, same, lam: float):
    """λ · 0.5 · mean|real − same| — cycle_gan.py:170-177."""
    return lam * 0.5 * l1_loss(real, same)
