"""Loss figures — matplotlib train/val line plots (ref utils.py:55-74,
pix2pix.py:443-454)."""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def make_fig(train_values, val_values, title: str, output_path: str) -> None:
    """Train/val loss-vs-epoch figure saved as ``<output_path>/<title>.png``
    at dpi 200 with a 1-based epoch x-axis (ref utils.py:55-74 +
    pix2pix.py:445-452's reindexing)."""
    epochs = range(1, len(train_values) + 1)
    plt.figure(figsize=(10, 8), dpi=80)
    plt.plot(epochs, train_values, alpha=0.7, label="Training")
    plt.plot(range(1, len(val_values) + 1), val_values, alpha=0.7, label="Validation")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.legend()
    plt.title(f"{title}")
    plt.tight_layout()
    os.makedirs(output_path, exist_ok=True)
    plt.savefig(os.path.join(output_path, f"{title}.png"), dpi=200)
    plt.close()


def write_loss_figs(train_metrics: dict, val_metrics: dict, *, prefix: str,
                    output_path: str) -> None:
    """One figure per loss key, title-prefixed 'Pix2Pix ' / 'CycleGAN '
    (pix2pix.py:443-454, cycle_gan.py:484-495)."""
    for key in train_metrics:
        make_fig(train_metrics[key], val_metrics.get(key, []),
                 title=prefix + key, output_path=output_path)
