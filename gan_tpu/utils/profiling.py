"""Tracing / profiling hooks (SURVEY §5.1 — absent in the reference, which
only prints per-epoch wall-clock; the rebuild's north-star metric is
images/sec/chip so it's reported first-class).

* ``trace(logdir)`` — context manager around ``jax.profiler.trace`` for
  TensorBoard-viewable device traces (enable with --profile-dir or
  GAN_TPU_PROFILE_DIR).
* ``Throughput`` — epoch-level images/sec[/chip] accounting.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """Device+host profiler trace when ``logdir`` is set; no-op otherwise."""
    if not logdir:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


def profile_dir_from_env() -> str | None:
    return os.environ.get("GAN_TPU_PROFILE_DIR") or None


class Throughput:
    """Accumulates (images, seconds) and reports images/sec/chip."""

    def __init__(self, n_devices: int):
        self.n_devices = max(1, n_devices)
        self.images = 0
        self.seconds = 0.0
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, images: int) -> float:
        """Returns this interval's images/sec."""
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.images += images
        self.seconds += dt
        return images / dt if dt > 0 else float("inf")

    @property
    def images_per_sec(self) -> float:
        return self.images / self.seconds if self.seconds else 0.0

    @property
    def images_per_sec_per_chip(self) -> float:
        return self.images_per_sec / self.n_devices

    def summary(self) -> str:
        return (f"{self.images_per_sec:.1f} images/sec "
                f"({self.images_per_sec_per_chip:.1f}/chip over "
                f"{self.n_devices} devices)")
