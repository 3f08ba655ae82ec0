"""Sample / prediction image grids.

Replaces ``generate_images`` (pix2pix.py:220-246 — 3-panel Input / Ground
Truth / Predicted; cycle_gan.py:179-204 — 2-panel Input / Predicted). Pixels
rescaled ``·0.5 + 0.5``; gray colormap when channels == '1'; savefig dpi 200.
The model forward itself happens in the trainer (training-mode semantics,
SURVEY §2.10-Q3); this module is pure host-side plotting.
"""

from __future__ import annotations

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

_TITLES_3 = ("Input Image", "Ground Truth", "Predicted Image")
_TITLES_2 = ("Input Image", "Predicted Image")


def save_image_grid(images, path_filename: str, *, channels: str) -> None:
    """images: sequence of 2 or 3 (H, W, C) arrays in [-1, 1]."""
    images = [np.asarray(im, dtype=np.float32) for im in images]
    titles = _TITLES_3 if len(images) == 3 else _TITLES_2
    plt.figure(figsize=(15, 6) if len(images) == 3 else (12, 6))
    for i, (im, title) in enumerate(zip(images, titles)):
        plt.subplot(1, len(images), i + 1)
        plt.title(title)
        disp = np.clip(im * 0.5 + 0.5, 0.0, 1.0)
        if channels == "1":
            plt.imshow(disp[..., 0], cmap=plt.get_cmap("gray"))
        else:
            plt.imshow(disp)
        plt.axis("off")
        plt.tight_layout()
    plt.savefig(path_filename, dpi=200)
    plt.close()
