"""gan_tpu — TPU-native Pix2Pix / CycleGAN framework (JAX / XLA / Pallas / shard_map).

A from-scratch, TPU-first rebuild of the capabilities of the reference TensorFlow
repo ``kingjosephm/GAN`` (thermal→visible conditional GANs):

* ``gan_tpu.models``   — U-Net generator + 70×70 PatchGAN discriminator as
  functional param-pytree modules (ref: base_gan.py:124-225).
* ``gan_tpu.ops``      — conv / transposed-conv / batch+instance norm / SSIM /
  nearest resize primitives with TF-parity semantics, XLA + Pallas paths.
* ``gan_tpu.data``     — seeded splits, PNG decode, device-resident uint8 cache,
  fused on-device jitter/augment (ref: pix2pix.py:34-165, cycle_gan.py:40-152).
* ``gan_tpu.parallel`` — data-parallel mesh / shard_map utilities (new component;
  the reference is single-device, base_gan.py:18-19).
* ``gan_tpu.train``    — jitted alternating G/D train steps, epoch loops,
  Orbax checkpointing (ref: pix2pix.py:190-323, cycle_gan.py:206-358).
* ``gan_tpu.utils``    — output-directory contract, metrics JSON, loss figures,
  prediction image grids (ref: pix2pix.py:379-456, utils.py:32-74).
"""

__version__ = "0.1.0"
