"""Down/up-sample blocks shared by the generator and discriminator.

TF-parity replacements for ``GAN.downsample`` (Conv→norm→LeakyReLU,
base_gan.py:63-89) and ``GAN.upsample`` (ConvT→norm→Dropout→ReLU,
base_gan.py:91-122):

* all conv kernels init N(0, 0.02) (base_gan.py:74,103,132,200);
* LeakyReLU negative slope 0.3 (Keras default — base_gan.py:87 passes no alpha);
* Dropout rate 0.5, *always active* — the reference calls every model with
  ``training=True`` even for validation and inference (SURVEY §2.10 Q2/Q3);
* batch norm γ=1 β=0 (Keras default), instance norm scale N(1, 0.02)
  (utils.py:17), offset zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_tpu.ops.conv import conv2d_down, conv2d_transpose_up
from gan_tpu.ops.norm import batch_norm, instance_norm

LEAKY_SLOPE = 0.3   # tf.keras.layers.LeakyReLU default alpha
DROP_RATE = 0.5


def conv_kernel_init(key, shape, stddev: float = 0.02):
    """N(0, 0.02) initializer used for every conv in the reference."""
    return (stddev * jax.random.normal(key, shape)).astype(jnp.float32)


def init_norm_params(key, norm: str, c: int):
    if norm == "batch":
        return {"gamma": jnp.ones((c,), jnp.float32),
                "beta": jnp.zeros((c,), jnp.float32)}
    elif norm == "instance":
        return {"scale": (1.0 + 0.02 * jax.random.normal(key, (c,))).astype(jnp.float32),
                "offset": jnp.zeros((c,), jnp.float32)}
    raise ValueError(f"unknown norm {norm!r}")


def apply_norm(params, x, norm: str, *, bn_axis_name=None):
    if norm == "batch":
        return batch_norm(x, params["gamma"], params["beta"], axis_name=bn_axis_name)
    # instance norm: fused Pallas kernel on TPU for shapes whose blocks fit
    # VMEM (one pass vs reduce+broadcast), XLA fallback otherwise
    from gan_tpu.ops import pallas_kernels
    if pallas_kernels.enabled() and pallas_kernels.supported(x.shape, x.dtype):
        return pallas_kernels.instance_norm(x, params["scale"], params["offset"])
    return instance_norm(x, params["scale"], params["offset"])


def leaky_relu(x):
    return jnp.where(x >= 0, x, (LEAKY_SLOPE * x).astype(x.dtype))


def dropout(x, rate: float, rng):
    """Inverted dropout (TF semantics); no-op when rng is None."""
    if rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros((), x.dtype))


# ----------------------------------------------------------------------------
# Downsample: Conv(k4 s2 same, no bias) -> [norm] -> LeakyReLU
# ----------------------------------------------------------------------------

def init_downsample(key, c_in: int, c_out: int, *, k: int = 4, norm: str = "batch",
                    apply_norm_flag: bool = True):
    k_conv, k_norm = jax.random.split(key)
    p = {"conv": conv_kernel_init(k_conv, (k, k, c_in, c_out))}
    if apply_norm_flag:
        p["norm"] = init_norm_params(k_norm, norm, c_out)
    return p


def apply_downsample(params, x, *, norm: str = "batch", compute_dtype=None,
                     bn_axis_name=None):
    x = conv2d_down(x, params["conv"], compute_dtype=compute_dtype)
    if "norm" in params:
        x = apply_norm(params["norm"], x, norm, bn_axis_name=bn_axis_name)
    return leaky_relu(x)


# ----------------------------------------------------------------------------
# Upsample: ConvT(k4 s2 same, no bias) -> norm -> [Dropout(0.5)] -> ReLU
# ----------------------------------------------------------------------------

def init_upsample(key, c_in: int, c_out: int, *, k: int = 4, norm: str = "batch"):
    k_conv, k_norm = jax.random.split(key)
    # TF ConvTranspose kernel layout (k, k, c_out, c_in)
    return {"conv": conv_kernel_init(k_conv, (k, k, c_out, c_in)),
            "norm": init_norm_params(k_norm, norm, c_out)}


def apply_upsample(params, x, *, norm: str = "batch", drop_rng=None,
                   compute_dtype=None, bn_axis_name=None):
    x = conv2d_transpose_up(x, params["conv"], compute_dtype=compute_dtype)
    x = apply_norm(params["norm"], x, norm, bn_axis_name=bn_axis_name)
    if drop_rng is not None:
        x = dropout(x, DROP_RATE, drop_rng)
    return jax.nn.relu(x)
