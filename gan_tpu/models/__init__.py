"""Model zoo: U-Net generator + 70×70 PatchGAN discriminator.

Functional param-pytree modules — each model is a frozen dataclass of static
architecture config with ``init(key, ...) -> params`` and
``apply(params, x, ...) -> y`` methods, jit/shard_map/vmap friendly.
"""

from gan_tpu.models.unet import UNetGenerator
from gan_tpu.models.patchgan import PatchGANDiscriminator

__all__ = ["UNetGenerator", "PatchGANDiscriminator"]
