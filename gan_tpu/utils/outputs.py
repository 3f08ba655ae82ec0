"""Run-directory layout and logging redirect.

Reproduces the reference's output contract (SURVEY §2.8; pix2pix.py:384-395):

    <output>/YYYY-MM-DD-HHhMM/
        logs/Log.txt            (stdout+stderr redirect when --logging true)
        logs/config.json
        logs/train_metrics.json, logs/val_metrics.json   (train mode)
        figs/<title>.png        (one per loss key)
        test_images/epoch_{N}.png
        final_test_imgs/img{N}.png
        training_checkpoints/
        prediction_images/img{N}.png                     (predict mode)

Same-minute reruns don't crash (the reference's logs/ makedirs with
exist_ok=False did — SURVEY §2.10-Q11; kept tolerant here on purpose).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from datetime import datetime


@dataclasses.dataclass(frozen=True)
class RunDirs:
    root: str        # <output>/<timestamp>
    logs: str

    @property
    def checkpoints(self) -> str:
        return os.path.join(self.root, "training_checkpoints")

    @property
    def figs(self) -> str:
        return os.path.join(self.root, "figs")

    @property
    def test_images(self) -> str:
        return os.path.join(self.root, "test_images")

    @property
    def final_test_imgs(self) -> str:
        return os.path.join(self.root, "final_test_imgs")

    @property
    def prediction_images(self) -> str:
        return os.path.join(self.root, "prediction_images")


def make_run_dirs(output: str, *, timestamp: str | None = None) -> RunDirs:
    """<output>/YYYY-MM-DD-HHhMM (pix2pix.py:386-392)."""
    os.makedirs(output, exist_ok=True)
    ts = timestamp or datetime.now().strftime("%Y-%m-%d-%Hh%M")
    root = os.path.join(output, ts)
    os.makedirs(root, exist_ok=True)
    logs = os.path.join(root, "logs")
    os.makedirs(logs, exist_ok=True)
    return RunDirs(root=root, logs=logs)


def redirect_logging(dirs: RunDirs) -> None:
    """stdout+stderr → logs/Log.txt (pix2pix.py:393-395). Line-buffered so
    tail -f works during long TPU runs (an improvement over the reference's
    fully-buffered redirect)."""
    f = open(os.path.join(dirs.logs, "Log.txt"), "w", buffering=1)
    sys.stdout = f
    sys.stderr = f


def dump_json(obj, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f)
