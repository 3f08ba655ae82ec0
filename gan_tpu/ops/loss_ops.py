"""Elementary loss ops.

* ``bce_with_logits`` replaces ``tf.keras.losses.BinaryCrossentropy(
  from_logits=True)`` (base_gan.py:227-231): numerically-stable sigmoid
  cross-entropy, mean-reduced over all elements. Computed in fp32.
* ``l1_loss`` is the mean absolute error used as the Pix2Pix secondary loss
  (pix2pix.py:181) and the CycleGAN cycle/identity losses (cycle_gan.py:167,176).
"""

from __future__ import annotations

import jax.numpy as jnp


def bce_with_logits(labels, logits):
    """mean(max(z,0) - z*t + log1p(exp(-|z|))) over all elements."""
    z = logits.astype(jnp.float32)
    t = jnp.asarray(labels, jnp.float32)
    per = jnp.maximum(z, 0.0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return jnp.mean(per)


def l1_loss(a, b):
    """mean |a - b| in fp32."""
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
