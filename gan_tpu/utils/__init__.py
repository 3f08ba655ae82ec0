"""Output contract: timestamped run dirs, Log.txt redirect, metrics JSONs,
loss figures, and prediction image grids (ref: pix2pix.py:379-456,
cycle_gan.py:416-497, utils.py:32-74)."""

from gan_tpu.utils.outputs import RunDirs, make_run_dirs, redirect_logging, dump_json
from gan_tpu.utils.figs import make_fig, write_loss_figs
from gan_tpu.utils.grids import save_image_grid

__all__ = [
    "RunDirs", "make_run_dirs", "redirect_logging", "dump_json",
    "make_fig", "write_loss_figs", "save_image_grid",
]
