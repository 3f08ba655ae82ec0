"""Trainers: jitted alternating G/D steps, device-side epoch scans, Orbax
checkpointing, and the reference's fit/predict surface
(ref: pix2pix.py:190-339, cycle_gan.py:206-376)."""

from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer
from gan_tpu.train.cyclegan_trainer import CycleGANTrainer

__all__ = ["Pix2PixTrainer", "CycleGANTrainer"]
