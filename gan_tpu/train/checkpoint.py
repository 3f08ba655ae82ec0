"""Orbax checkpointing — params + optimizer-state pytrees.

Replaces ``tf.train.Checkpoint`` / ``CheckpointManager`` (pix2pix.py:400-420,
cycle_gan.py:437-461): bundles every network's params and its optimizer slots,
saves every 5 epochs and at the final epoch, honors ``max_to_keep`` (1 for
Pix2Pix, 3 for CycleGAN), and restores the latest step. Unlike the reference
(restore only in predict mode — SURVEY §5.3), restore also powers
``--resume`` train continuation.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper: save(epoch, state_tree) / latest() / restore()."""

    def __init__(self, directory: str, *, max_to_keep: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self._anchor: Optional[int] = None

    def save(self, epoch: int, state: Any, *, anchor: bool = False) -> None:
        """state: arbitrary pytree (params + opt states). Blocking save.

        ``anchor=True`` marks a fault-fence rewind target saved at epoch
        start (recovery.py) that is NOT part of the reference's output
        contract (5-epoch cadence + final only, pix2pix.py:308-317): it is
        deleted automatically once a later real save lands, so short runs
        with ``max_to_keep`` > 1 don't leave a stray epoch-0 checkpoint in
        ``training_checkpoints/``."""
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if anchor:
            self._anchor = epoch
        elif self._anchor is not None and epoch != self._anchor:
            if self._anchor in self._mgr.all_steps():
                self._mgr.delete(self._anchor)
            self._anchor = None

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: Any, epoch: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of ``target`` (a concrete or
        ShapeDtypeStruct pytree). Restores the latest epoch if not given."""
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return self._mgr.restore(epoch, args=ocp.args.StandardRestore(abstract))

    def close(self) -> None:
        self._mgr.close()


def latest_checkpoint_dir(weights_path: str) -> str:
    """Resolve ``--weights`` like ``tf.train.latest_checkpoint`` (pix2pix.py:411):
    accepts either a checkpoint root (``training_checkpoints/``) or a run dir
    containing one."""
    cand = os.path.join(weights_path, "training_checkpoints")
    return cand if os.path.isdir(cand) else weights_path
