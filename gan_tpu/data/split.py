"""Directory listing and seeded train/val/test splits.

Reproduces the reference's split semantics exactly — same stdlib
``random.seed`` / ``random.sample`` call sequence on the same ``os.listdir``
ordering, so given an identical directory the file→subset assignment is
bit-identical to the TF reference:

* Pix2Pix: pix2pix.py:125-147 — one dir of concatenated pairs; ``test_img``
  test files, ``ceil((N−test)·validation_size)`` val, remainder train
  (shuffled via ``random.sample`` "in lieu of tf.data.shuffle").
* CycleGAN: cycle_gan.py:98-125 — X and Y dirs; test drawn from X only;
  ``ceil((|X|−test)·val_size)`` val_X, ``ceil(|Y|·val_size)`` val_Y.
"""

from __future__ import annotations

import math
import os
import random


def list_images(directory: str) -> list[str]:
    """Filenames containing 'png' or 'jpg' — ref pix2pix.py:125 (substring
    match, not extension match, on purpose)."""
    return [i for i in os.listdir(directory) if "png" in i or "jpg" in i]


def pix2pix_split(contents: list[str], *, seed: int, test_img: int,
                  validation_size: float) -> tuple[list[str], list[str], list[str]]:
    """(train, val, test) filename lists — ref pix2pix.py:136-147."""
    random.seed(seed)
    test = random.sample(contents, test_img)
    val_obs = math.ceil((len(contents) - test_img) * validation_size)
    val = random.sample([i for i in contents if i not in test], int(val_obs))
    train = [i for i in contents if i not in test and i not in val]
    train = random.sample(train, len(train))  # shuffle in lieu of tf.data.shuffle
    return train, val, test


def cyclegan_split(contents_x: list[str], contents_y: list[str], *, seed: int,
                   test_img: int, validation_size: float):
    """(train_X, train_Y, val_X, val_Y, test) — ref cycle_gan.py:114-125."""
    random.seed(seed)
    test = random.sample(contents_x, test_img)
    val_obs_x = math.ceil((len(contents_x) - test_img) * validation_size)
    val_obs_y = math.ceil(len(contents_y) * validation_size)
    val_x = random.sample([i for i in contents_x if i not in test], int(val_obs_x))
    val_y = random.sample(list(contents_y), int(val_obs_y))
    train_x = [i for i in contents_x if i not in test and i not in val_x]
    train_y = [i for i in contents_y if i not in val_y]
    return train_x, train_y, val_x, val_y, test
