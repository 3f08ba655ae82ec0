"""Automatic fault recovery for training runs (SURVEY §5.3).

The reference has no failure handling at all — checkpoints restore only in
predict mode (/root/reference/pix2pix.py:411) and a crash at epoch 120/150
loses everything since the last manual save. On TPU, preemption handling is
table stakes, and this environment's axon worker demonstrably faults
(long-program kills at ~82 s, tunnel-era hangs — RUNBOOK.md Memory), so both
trainers' ``fit()`` loops run every epoch through a :class:`FaultFence`:

* A device fault (``RuntimeError``/``XlaRuntimeError``/connection errors —
  never logic errors like ``ValueError``/``AssertionError``, which propagate
  unchanged) triggers an in-process REWIND: restore the last checkpoint of
  this run and re-run from there. Epoch programs are deterministic functions
  of (state, epoch index), so the re-run reproduces exactly the epochs the
  fault destroyed; the caller truncates its metric lists to match.
* ``fit()`` saves an epoch-``start_epoch`` checkpoint before the first epoch
  so a rewind target always exists, and ``--checkpoint-every N`` adds saves
  between the reference's 5-epoch cadence so long runs lose ≤N epochs of
  work to any single fault.
* If the rewind itself fails (worker fully dead: restore's device_put
  faults), the fence makes a last-resort EMERGENCY snapshot of whatever
  device state is still fetchable and raises :class:`TrainingFault`; the CLI
  prints a resume-ready ``--resume`` command and exits nonzero (exit 17).
  Note an emergency snapshot taken mid-epoch on the host-streaming path
  (per-step updates) is a batch-boundary state, not an epoch boundary —
  resuming from it is sound training but not bit-equal to an uninterrupted
  run; periodic checkpoints (the normal rewind path) are always
  epoch-boundary exact.
* ``GAN_TPU_FAULT_RETRIES`` bounds recoveries per run (default 3; 0 disables
  the fence entirely — faults propagate like any other exception).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


class TrainingFault(RuntimeError):
    """Unrecoverable device fault; carries the resume point (if any)."""

    def __init__(self, epoch: int, checkpoint_epoch: Optional[int],
                 checkpoint_dir: Optional[str], cause: BaseException):
        self.epoch = epoch
        self.checkpoint_epoch = checkpoint_epoch
        self.checkpoint_dir = checkpoint_dir
        self.cause = cause
        where = (f"state for epoch {checkpoint_epoch} saved in {checkpoint_dir}"
                 if checkpoint_epoch is not None else "no checkpoint available")
        super().__init__(
            f"device fault during epoch {epoch + 1} "
            f"({type(cause).__name__}: {cause}); {where}")


def is_device_fault(exc: BaseException) -> bool:
    """Faults worth recovering from: runtime/transport failures. Logic errors
    (ValueError, TypeError, AssertionError, …) and KeyboardInterrupt are NOT
    device faults and must propagate unchanged. Filesystem OSErrors
    (missing/forbidden paths raised by the epoch body's host-side PNG and
    checkpoint writes) are config/logic errors too — retrying them 3× and
    surfacing a TrainingFault would mask the real problem."""
    if isinstance(exc, (FileNotFoundError, PermissionError, NotADirectoryError,
                        IsADirectoryError, FileExistsError)):
        return False
    return isinstance(exc, (RuntimeError, OSError, ConnectionError))


def max_recoveries() -> int:
    return int(os.environ.get("GAN_TPU_FAULT_RETRIES", "3"))


class FaultFence:
    """Per-``fit()`` recovery driver. Usage::

        fence = FaultFence(trainer, manager)
        epoch = start_epoch
        while epoch < cfg.epochs:
            try:
                <epoch body>
            except Exception as e:
                epoch = fence.recover(epoch, e)   # rewound epoch, or raises
                <truncate metric lists to epoch - start_epoch entries>
                continue
            epoch += 1
    """

    def __init__(self, trainer, manager):
        self.trainer = trainer
        self.manager = manager
        self.used = 0
        self.limit = max_recoveries()

    def recover(self, epoch: int, exc: BaseException) -> int:
        if self.limit <= 0 or not is_device_fault(exc):
            raise exc
        self.used += 1
        print(f"\n[recovery] device fault during epoch {epoch + 1} "
              f"({type(exc).__name__}: {exc}) — attempt "
              f"{self.used}/{self.limit}", flush=True)
        if self.used > self.limit:
            self._emergency(epoch, exc)
        latest = self.manager.latest_epoch() if self.manager is not None else None
        if latest is None:
            self._emergency(epoch, exc)
        try:
            # target only supplies shapes/dtypes — aval metadata stays
            # readable even when the fault poisoned the buffers
            self.trainer.load_state(self.manager.restore(self.trainer.state()))
        except Exception:
            self._emergency(epoch, exc)
        print(f"[recovery] rewound to checkpoint at epoch {latest}; "
              "re-running from there", flush=True)
        return latest

    def _emergency(self, epoch: int, exc: BaseException):
        """Last resort: snapshot whatever device state is still fetchable,
        then raise TrainingFault (never returns)."""
        saved_epoch, saved_dir = None, None
        if self.manager is not None:
            saved_epoch, saved_dir = (self.manager.latest_epoch(),
                                      self.manager.directory)
            try:
                host = jax.tree_util.tree_map(np.asarray, self.trainer.state())
                if self.manager.latest_epoch() != epoch:
                    self.manager.save(epoch, host)
                saved_epoch = epoch
                print(f"[recovery] emergency checkpoint saved at epoch "
                      f"{epoch} in {saved_dir}", flush=True)
            except Exception:
                print("[recovery] device state unfetchable; last periodic "
                      f"checkpoint is epoch {saved_epoch}", flush=True)
        raise TrainingFault(epoch, saved_epoch, saved_dir, exc) from exc
