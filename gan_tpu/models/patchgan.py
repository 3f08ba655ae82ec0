"""70×70 PatchGAN discriminator — ref base_gan.py:124-166.

Pipeline (256² input → 30×30×1 logits; 512² → 62×62):

    [concat(input, target) if target]            (base_gan.py:137-139)
    downsample 64  (no norm) → 128 → 256         (base_gan.py:141-143)
    ZeroPad(1) → Conv 512 k4 s1 VALID no-bias    (base_gan.py:145-148)
    norm → LeakyReLU                              (base_gan.py:150-155)
    ZeroPad(1) → Conv 1 k4 s1 VALID with bias     (base_gan.py:157-161)

``target=True`` for Pix2Pix (conditional pair), ``False`` for CycleGAN.
Fully convolutional — works at any spatial size.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gan_tpu.models import blocks
from gan_tpu.ops.conv import conv2d_valid


@dataclasses.dataclass(frozen=True)
class PatchGANDiscriminator:
    norm: str = "batch"
    target: bool = True   # concat (input, target) along channels

    def init(self, key, in_channels: int):
        c_in = in_channels * 2 if self.target else in_channels
        keys = jax.random.split(key, 6)
        params = {
            "down_0": blocks.init_downsample(keys[0], c_in, 64, norm=self.norm,
                                             apply_norm_flag=False),
            "down_1": blocks.init_downsample(keys[1], 64, 128, norm=self.norm),
            "down_2": blocks.init_downsample(keys[2], 128, 256, norm=self.norm),
            "conv512": blocks.conv_kernel_init(keys[3], (4, 4, 256, 512)),
            "norm512": blocks.init_norm_params(keys[4], self.norm, 512),
            "last": {
                "conv": blocks.conv_kernel_init(keys[5], (4, 4, 512, 1)),
                "bias": jnp.zeros((1,), jnp.float32),
            },
        }
        return params

    def apply(self, params, x, y=None, *, compute_dtype=None, bn_axis_name=None):
        """x: input image; y: target image (required iff ``self.target``).
        Returns patch logits in fp32."""
        if self.target:
            assert y is not None
            x = jnp.concatenate([x, y], axis=-1)  # (inp, tar) order, base_gan.py:139
        if compute_dtype is not None:
            x = x.astype(compute_dtype)

        h = blocks.apply_downsample(params["down_0"], x, norm=self.norm,
                                    compute_dtype=compute_dtype, bn_axis_name=bn_axis_name)
        h = blocks.apply_downsample(params["down_1"], h, norm=self.norm,
                                    compute_dtype=compute_dtype, bn_axis_name=bn_axis_name)
        h = blocks.apply_downsample(params["down_2"], h, norm=self.norm,
                                    compute_dtype=compute_dtype, bn_axis_name=bn_axis_name)

        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h = conv2d_valid(h, params["conv512"], compute_dtype=compute_dtype)
        h = blocks.apply_norm(params["norm512"], h, self.norm, bn_axis_name=bn_axis_name)
        h = blocks.leaky_relu(h)

        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h = conv2d_valid(h, params["last"]["conv"], compute_dtype=compute_dtype)
        h = h + params["last"]["bias"].astype(h.dtype)
        return h.astype(jnp.float32)
