"""Long CycleGAN stability run (VERDICT round-1 item 10).

The reference README reports CycleGAN quality collapsing after ~epoch 35
(256², batch 4 — README.md:273). This drives the real CLI for 40+ epochs on
a generated synthetic unpaired corpus and summarizes the loss trajectory so
the stability claim is backed by data: a collapse shows up as a generator
loss explosion / discriminator loss → 0 in the final epochs.

Usage: python benchmarks/longrun_cyclegan.py [epochs] [n_per_domain]
Writes the corpus under /tmp/gan_tpu_longrun and prints a JSON summary.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image, ImageFilter


def make_corpus(root: str, n: int, size: int = 286, seed: int = 0) -> None:
    """Unpaired domains with a learnable, non-trivial cross-domain
    relationship: X = dark-biased smooth blob fields, Y = inverted fields of
    (different) dark-biased blobs, i.e. bright-biased. The brightness
    asymmetry makes the domains distinguishable, so identity is NOT a valid
    generator solution (a symmetric-noise corpus would make inverted ≡
    original in distribution and the GAN rightly learns identity)."""
    rng = np.random.default_rng(seed)
    for dom, invert in (("X", False), ("Y", True)):
        d = os.path.join(root, dom)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            noise = rng.normal(95, 55, (size // 8, size // 8))
            img = Image.fromarray(np.clip(noise, 0, 255).astype(np.uint8), "L")
            img = img.resize((size, size), Image.BILINEAR)
            img = img.filter(ImageFilter.GaussianBlur(3))
            arr = np.asarray(img)
            if invert:
                arr = 255 - arr
            Image.fromarray(arr, "L").save(os.path.join(d, f"{dom}_{i:04d}.png"))


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    root = "/tmp/gan_tpu_longrun"
    out = os.path.join(root, "out")
    if not glob.glob(os.path.join(root, "X", "*.png")):
        print(f"generating {n}/domain corpus…", flush=True)
        make_corpus(root, n)

    import cycle_gan
    from gan_tpu.config import parse_cyclegan

    os.environ["GAN_TPU_PERF"] = "1"
    cfg = parse_cyclegan([
        "--input-images", os.path.join(root, "X"),
        "--target-images", os.path.join(root, "Y"),
        "--output", out, "--train", "--epochs", str(epochs),
        "--img-size", "256", "--batch-size", "4", "--test-img", "2",
        "--logging", "false", "--save-weights", "false"])
    cycle_gan.main(cfg)

    run = sorted(glob.glob(os.path.join(out, "*")))[-1]
    metrics = json.load(open(os.path.join(run, "logs", "train_metrics.json")))
    summary = {"run": run, "epochs": epochs, "n_per_domain": n}
    for k, v in metrics.items():
        tail = v[-5:]
        summary[k] = {"first": round(v[0], 3), "min": round(min(v), 3),
                      "max": round(max(v), 3),
                      "last5_mean": round(sum(tail) / len(tail), 3)}
    finite = all(np.isfinite(v).all() for v in metrics.values())
    last5_disc = (summary["Discriminator X Loss"]["last5_mean"],
                  summary["Discriminator Y Loss"]["last5_mean"])
    summary["all_finite"] = bool(finite)
    # collapse heuristics: disc loss pinned at ~0 (generators gave up) or
    # generator totals exploding above their early-epoch maximum
    summary["collapse_signature"] = bool(
        min(last5_disc) < 0.02
        or summary["Total X->Y Generator Loss"]["last5_mean"]
        > 3 * summary["Total X->Y Generator Loss"]["first"])
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
