"""Typed configuration for the Pix2Pix / CycleGAN CLIs.

Mirrors the reference argparse surfaces exactly (pix2pix.py:341-377,
cycle_gan.py:379-414): same flag names, defaults, choices, and asserts, plus
TPU-specific extensions (dtype, device cache, cross-replica batch-norm,
train-resume) that default to values preserving reference behavior.

The parsed config serializes to the same ``config.json`` the reference writes
(pix2pix.py:406-407).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import Optional


def _env_true(name: str) -> bool:
    return os.environ.get(name, "").lower() in ("1", "true", "yes")


@dataclasses.dataclass
class BaseConfig:
    """Flags shared by both CLIs (ref: pix2pix.py:341-377, cycle_gan.py:379-414)."""

    output: str = ""
    img_size: int = 256
    batch_size: int = 1
    buffer_size: int = 99999
    channels: str = "1"          # string on purpose — reference quirk (SURVEY §2.10-Q9)
    logging: str = "true"
    seed: int = 123
    train: bool = False
    predict: bool = False
    save_weights: str = "true"
    epochs: int = 5
    validation_size: float = 0.1
    test_img: int = 5
    learning_rate: float = 2e-4
    beta_1: float = 0.5
    beta_2: float = 0.999
    weights: Optional[str] = None

    # --- TPU-native extensions (not in the reference) ---
    dtype: str = "bf16"              # compute dtype: bf16 | fp32 (params always fp32)
    device_cache: str = "auto"       # auto | on | off — keep train set in HBM
    bn_cross_replica: str = "false"  # psum batch-norm stats across the data mesh
    resume: Optional[str] = None     # checkpoint dir to resume training from
    num_devices: int = 0             # 0 = all local devices
    use_pallas: str = "auto"         # auto | on | off — fused Pallas kernels
    raw_predictions: str = "false"   # also write bare generated PNGs in predict
    remat: str = "auto"              # auto | on | off — jax.checkpoint U-Net blocks
    host_cache: str = "auto"         # auto | on | off — decode corpus into host RAM
                                     # (off/too-big: stream batches from files)
    checkpoint_every: int = 0        # extra save cadence for fault recovery
                                     # (0 = reference 5-epoch cadence only)

    def validate(self) -> None:
        """Reference asserts (pix2pix.py:373-375, cycle_gan.py:410-412).

        Set GAN_TPU_ALLOW_ANY_SIZE=1 to allow any power-of-two size ≥ 32
        (used by fast tests); the public CLI keeps the reference contract.
        """
        if _env_true("GAN_TPU_ALLOW_ANY_SIZE"):
            assert self.img_size >= 32 and (self.img_size & (self.img_size - 1)) == 0, \
                "img-size must be a power of two >= 32"
        else:
            assert self.img_size in (256, 512), \
                "img-size currently only supported for 256 x 256 or 512 x 512 pixels!"
        assert 0.0 < self.validation_size <= 0.3, \
            "validation size is a proportion and bounded between 0-0.3!"
        assert self.test_img >= 1, "test-img is an integer and must be >=1!"
        assert self.channels in ("1", "3")
        assert self.dtype in ("bf16", "fp32")

    # Convenience accessors -------------------------------------------------
    @property
    def n_channels(self) -> int:
        return int(self.channels)

    @property
    def compute_dtype(self):
        import jax.numpy as jnp
        return jnp.bfloat16 if self.dtype == "bf16" else jnp.float32

    def to_json(self) -> str:
        # The reference dumps ``vars(opt)`` whose argparse dest for --lambda
        # is "lambda" (pix2pix.py:406-407, flag at :361) — serialize our
        # ``lam`` field under that key so downstream consumers of the
        # reference's config.json keep working; TPU extension keys ride along.
        d = dataclasses.asdict(self)
        return json.dumps({("lambda" if k == "lam" else k): v
                           for k, v in d.items()})

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())


@dataclasses.dataclass
class Pix2PixConfig(BaseConfig):
    """Pix2Pix flags (ref: pix2pix.py:341-377)."""

    data: str = ""
    generator_loss: str = "l1"       # l1 | ssim (ssim corrected vs ref bug, SURVEY §2.10-Q1)
    input_img_orient: str = "left"
    lam: int = 100                   # ref flag name: --lambda (pix2pix.py:361)

    def validate(self) -> None:
        super().validate()
        assert self.generator_loss in ("l1", "ssim")
        assert self.input_img_orient in ("left", "right")


@dataclasses.dataclass
class CycleGANConfig(BaseConfig):
    """CycleGAN flags (ref: cycle_gan.py:379-414)."""

    input_images: str = ""
    target_images: Optional[str] = None
    lam: int = 10                    # ref default 10 (cycle_gan.py:400)


def _add_common(parser: argparse.ArgumentParser, argv) -> None:
    parser.add_argument("--output", type=str, required=True, help="path to output results")
    parser.add_argument("--img-size", type=int, default=256, help="image size h,w")
    parser.add_argument("--batch-size", type=int, default=1, help="global batch size")
    parser.add_argument("--buffer-size", type=int, default=99999, help="buffer size")
    parser.add_argument("--channels", type=str, default="1", choices=["1", "3"],
                        help="number of color channels to read in and output")
    parser.add_argument("--logging", type=str, default="true", choices=["true", "false"],
                        help="turn on/off script logging, e.g. for CLI debugging")
    parser.add_argument("--seed", type=int, default=123, help="seed value for random number generator")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--train", action="store_true", help="train model using data")
    group.add_argument("--predict", action="store_true",
                       help="use pretrained weights to make predictions on data")
    parser.add_argument("--save-weights", type=str, default="true", choices=["true", "false"],
                        help="save model checkpoints and weights")
    parser.add_argument("--epochs", type=int, default=5, required="--train" in argv,
                        help="number of epochs to train")
    parser.add_argument("--validation-size", type=float, default=0.1,
                        help="validation set size as share of number of training images")
    parser.add_argument("--test-img", type=int, default=5, help="number of test images to sample")
    parser.add_argument("--learning-rate", type=float, default=2e-4,
                        help="learning rate for Adam optimizer for generator and discriminator")
    parser.add_argument("--beta-1", type=float, default=0.5,
                        help="exponential decay rate for 1st moment of Adam optimizer")
    parser.add_argument("--beta-2", type=float, default=0.999,
                        help="exponential decay rate for 2nd moment of Adam optimizer")
    parser.add_argument("--weights", type=str, required="--predict" in argv,
                        help="path to pretrained model weights for prediction")
    # TPU extensions
    parser.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "fp32"],
                        help="compute dtype on device (params stay fp32)")
    parser.add_argument("--device-cache", type=str, default="auto", choices=["auto", "on", "off"],
                        help="keep the decoded training set resident in device HBM "
                             "(auto picks tiled/flat/hybrid/stream per cache size — "
                             "see RUNBOOK.md Memory)")
    parser.add_argument("--bn-cross-replica", type=str, default="false", choices=["true", "false"],
                        help="psum batch-norm statistics across the data-parallel mesh")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint directory to resume training from")
    parser.add_argument("--num-devices", type=int, default=0,
                        help="number of devices for data parallelism (0 = all)")
    parser.add_argument("--use-pallas", type=str, default="auto", choices=["auto", "on", "off"],
                        help="use fused Pallas TPU kernels where available")
    parser.add_argument("--raw-predictions", type=str, default="false",
                        choices=["true", "false"],
                        help="in predict mode, also write bare generated images "
                             "(prediction_images_raw/) for downstream pipelines")
    parser.add_argument("--remat", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="gradient-checkpoint U-Net blocks; auto follows "
                             "the measured frontier: on for 512+ images at "
                             "per-device batch <=8 (remat measured FASTER "
                             "there) and for activation footprints beyond "
                             "the no-remat HBM ceiling, off otherwise")
    parser.add_argument("--host-cache", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="decode the whole corpus into host RAM up front; "
                             "off (or auto when it would not fit) streams "
                             "batches from files via background decode threads")
    parser.add_argument("--checkpoint-every", type=int, default=0,
                        help="save a checkpoint every N epochs in addition to "
                             "the reference's 5-epoch cadence, bounding fault "
                             "loss to <=N epochs (0 = off)")


def parse_pix2pix(argv=None) -> Pix2PixConfig:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser("pix2pix")
    parser.add_argument("--data", type=str, required=True, help="path to data")
    parser.add_argument("--generator-loss", type=str, default="l1", choices=["l1", "ssim"],
                        help="combined generator loss function")
    parser.add_argument("--input-img-orient", type=str, default="left", choices=["left", "right"],
                        help="whether input image is on left (i.e. target right) or vice-versa")
    parser.add_argument("--lambda", dest="lam", type=int, default=100,
                        help="lambda value for secondary generator loss (L1)")
    _add_common(parser, argv)
    ns = parser.parse_args(argv)
    cfg = Pix2PixConfig(**vars(ns))
    cfg.validate()
    return cfg


def parse_cyclegan(argv=None) -> CycleGANConfig:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser("cycle_gan")
    parser.add_argument("--input-images", type=str, required=True, help="path to input images")
    parser.add_argument("--target-images", type=str, required="--train" in argv,
                        help="path to target images")
    parser.add_argument("--lambda", dest="lam", type=int, default=10, help="lambda parameter value")
    _add_common(parser, argv)
    ns = parser.parse_args(argv)
    cfg = CycleGANConfig(**vars(ns))
    cfg.validate()
    return cfg
