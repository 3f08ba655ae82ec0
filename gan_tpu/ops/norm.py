"""Batch / instance normalization with TF-parity semantics.

* ``batch_norm`` replaces ``tf.keras.layers.BatchNormalization`` in training
  mode (base_gan.py:83, 113, 151). The reference calls every network with
  ``training=True`` everywhere — including validation and inference
  (SURVEY §2.10 Q2/Q3) — so batch statistics are *always* used and the Keras
  moving averages are never consumed; we therefore keep no running stats.
  Keras epsilon: 1e-3.

* ``instance_norm`` replaces the custom Keras layer (utils.py:6-30):
  per-sample moments over (H, W), epsilon 1e-5, trainable per-channel
  scale/offset.

Statistics are always computed in fp32 regardless of the compute dtype; the
normalized output is cast back to the input dtype so activation buffers stay
bf16. Under data parallelism, batch stats are per-replica by default (exactly
the reference's single-device semantics at equal per-replica batch); pass
``axis_name`` to psum them into true global-batch statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-3   # Keras BatchNormalization default
IN_EPS = 1e-5   # reference InstanceNormalization (utils.py:9)


def batch_norm(x, gamma, beta, *, eps: float = BN_EPS, axis_name: str | None = None):
    """Normalize over (N, H, W) per channel using batch statistics.

    gamma/beta: (C,). If ``axis_name`` is given (inside shard_map), the
    moments are averaged across that mesh axis (cross-replica batch norm).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    out = xf * inv + (beta.astype(jnp.float32) - mean * inv)
    return out.astype(x.dtype)


def instance_norm(x, scale, offset, *, eps: float = IN_EPS):
    """Per-sample, per-channel normalization over (H, W) (utils.py:26-30)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    out = (xf - mean) * inv * scale.astype(jnp.float32) + offset.astype(jnp.float32)
    return out.astype(x.dtype)
