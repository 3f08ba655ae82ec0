"""U-Net generator (pix2pix architecture) — ref base_gan.py:168-225.

Architecture at 256²: 8 downsample blocks (64, 128, 256, 512×5; first without
norm) to a 1×1×512 bottleneck, then 7 upsample blocks (512×3 with dropout,
512, 256, 128, 64) with skip connections ``concat([up(x), skip])``
(base_gan.py:219-221, upsampled features first), and a final stride-2
transposed conv (with bias, N(0,0.02) kernel) to ``out_channels`` + tanh
(base_gan.py:201-204).

``depth`` generalizes the fixed 8-block stack so small test images work; at
the reference sizes (256/512) ``depth=8`` reproduces the reference exactly.

TPU notes: all convs ride the MXU in the compute dtype (bf16 default); an
optional ``remat`` flag wraps each down/up block in ``jax.checkpoint`` for
512² training (SURVEY §7, "512² + gradient checkpointing").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gan_tpu.models import blocks
from gan_tpu.ops.conv import conv2d_transpose_up

# filters per down block, index 0 first (base_gan.py:179-188)
_DOWN_FILTERS = (64, 128, 256, 512, 512, 512, 512, 512)
# (filters, apply_dropout) per up block (base_gan.py:190-198)
_UP_SPECS = ((512, True), (512, True), (512, True), (512, False),
             (256, False), (128, False), (64, False))


@dataclasses.dataclass(frozen=True)
class UNetGenerator:
    out_channels: int
    norm: str = "batch"          # 'batch' (Pix2Pix) or 'instance' (CycleGAN)
    depth: int = 8               # number of downsample blocks (reference: 8)
    remat: bool = False          # jax.checkpoint each block (512² memory saver)

    @property
    def down_filters(self):
        return _DOWN_FILTERS[: self.depth]

    @property
    def up_specs(self):
        # keep the *last* depth-1 up specs so the tail (…256,128,64) is preserved
        return _UP_SPECS[len(_UP_SPECS) - (self.depth - 1):]

    def init(self, key, in_channels: int):
        keys = jax.random.split(key, 2 * self.depth + 1)
        params = {}
        c = in_channels
        for i, f in enumerate(self.down_filters):
            params[f"down_{i}"] = blocks.init_downsample(
                keys[i], c, f, norm=self.norm, apply_norm_flag=(i != 0))
            c = f
        # up blocks: input channels = prev output + skip channels
        skip_channels = list(self.down_filters[:-1])[::-1]  # skips, deepest first
        for i, (f, _drop) in enumerate(self.up_specs):
            params[f"up_{i}"] = blocks.init_upsample(
                keys[self.depth + i], c, f, norm=self.norm)
            c = f + skip_channels[i]
        k_last, k_bias = jax.random.split(keys[-1])
        params["last"] = {
            "conv": blocks.conv_kernel_init(k_last, (4, 4, self.out_channels, c)),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
        }
        return params

    def apply(self, params, x, *, rng=None, compute_dtype=None, bn_axis_name=None):
        """Forward pass. ``rng`` drives dropout; the reference runs dropout in
        every mode (training=True at val/test — SURVEY §2.10 Q2/Q3), so pass an
        rng everywhere for parity; rng=None disables dropout (deterministic
        inference, an extension)."""
        if compute_dtype is not None:
            x = x.astype(compute_dtype)

        def down_fn(p, h):
            return blocks.apply_downsample(
                p, h, norm=self.norm, compute_dtype=compute_dtype,
                bn_axis_name=bn_axis_name)

        def up_fn(p, h, drop_rng):
            return blocks.apply_upsample(
                p, h, norm=self.norm, drop_rng=drop_rng,
                compute_dtype=compute_dtype, bn_axis_name=bn_axis_name)

        if self.remat:
            down_fn = jax.checkpoint(down_fn)
            up_fn = jax.checkpoint(up_fn)

        skips = []
        h = x
        for i in range(self.depth):
            h = down_fn(params[f"down_{i}"], h)
            skips.append(h)
        skips = skips[:-1][::-1]

        n_up = self.depth - 1
        drop_keys = jax.random.split(rng, n_up) if rng is not None else [None] * n_up
        for i, (f, use_drop) in enumerate(self.up_specs):
            dk = drop_keys[i] if use_drop else None
            h = up_fn(params[f"up_{i}"], h, dk)
            h = jnp.concatenate([h, skips[i]], axis=-1)

        out = conv2d_transpose_up(h, params["last"]["conv"], compute_dtype=compute_dtype)
        out = out + params["last"]["bias"].astype(out.dtype)
        return jnp.tanh(out.astype(jnp.float32))
