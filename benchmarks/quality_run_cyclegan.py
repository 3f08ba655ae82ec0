#!/usr/bin/env python3
"""Train CycleGAN on a synthetic UNPAIRED corpus and commit quality numbers
(the CycleGAN counterpart of benchmarks/quality_run.py: instantiate the
L1/SSIM/PSNR/Fréchet-proxy capability on a real trained model, in-repo).

Corpus: domain X = smooth dark-biased blob fields; domain Y = the
deterministic inverted + edge-mixed rendering of DIFFERENT blob fields
(disjoint seeds) — the domains share a true underlying mapping but the
training set carries no pairs, the honest unpaired setting the reference's
CycleGAN targets (cycle_gan.py:379-502). Ground truth for scoring exists by
construction: render_target(x_i) for every X image, used ONLY at eval.

Drives the REAL CLI end to end (train → predict --raw-predictions), then
tools/eval_quality.py on G(x) vs render_target(x). Also reports the
input-vs-truth identity baseline — the floor any translation must beat
(unpaired translation is not expected to reach Pix2Pix's paired numbers;
the artifact shows HOW CLOSE it gets).

Usage: python benchmarks/quality_run_cyclegan.py [epochs] [n_per_domain] [out_json]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from PIL import Image

from quality_run import blob_field, eval_dirs, render_target

ROOT = "/tmp/gan_tpu_quality_cg"


def make_domains(root: str, n: int, size: int = 256, seed: int = 0) -> None:
    """x/ = blob fields (seeds 0..n-1); y/ = rendered targets of DISJOINT
    fields (seeds n..2n-1); gt/ = rendered truth for each x image (eval
    only, never read by training)."""
    rng = np.random.default_rng(seed)
    for sub in ("x", "y", "gt"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    fields = [blob_field(rng, size) for _ in range(2 * n)]
    for i in range(n):
        name = f"img_{i:05d}.png"
        fields[i].save(os.path.join(root, "x", name))
        Image.fromarray(render_target(fields[i]), "L").save(
            os.path.join(root, "gt", name))
        Image.fromarray(render_target(fields[n + i]), "L").save(
            os.path.join(root, "y", name))


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    out_json = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(__file__), "results", "cyclegan_quality_eval.json")

    if len(glob.glob(os.path.join(ROOT, "x", "img_*.png"))) < n:
        print(f"generating {n}/domain unpaired corpus…", flush=True)
        make_domains(ROOT, n)

    import cycle_gan
    from gan_tpu.config import parse_cyclegan

    os.environ["GAN_TPU_PERF"] = "1"
    train_out = os.path.join(ROOT, "train_out")
    # Reuse a finished training run if one exists (the train leg is ~30 min
    # on-chip; predict/eval legs can then be re-run idempotently).
    done = [r for r in sorted(glob.glob(os.path.join(train_out, "*")))
            if os.path.isdir(os.path.join(r, "training_checkpoints",
                                          str(epochs)))]
    if done:
        run = done[-1]
        print(f"reusing trained run {run}", flush=True)
    else:
        cfg = parse_cyclegan([
            "--input-images", os.path.join(ROOT, "x"),
            "--target-images", os.path.join(ROOT, "y"),
            "--output", train_out, "--train", "--epochs", str(epochs),
            "--img-size", "256", "--batch-size", "8", "--logging", "false",
            "--save-weights", "true", "--test-img", "2"])
        cycle_gan.main(cfg)
        run = sorted(glob.glob(os.path.join(train_out, "*")))[-1]

    pred_out = os.path.join(ROOT, "pred_out")
    cfg2 = parse_cyclegan([
        "--input-images", os.path.join(ROOT, "x"),
        "--output", pred_out, "--predict",
        "--weights", os.path.join(run, "training_checkpoints"),
        "--img-size", "256", "--batch-size", "8", "--logging", "false",
        "--raw-predictions", "true"])
    cycle_gan.main(cfg2)
    run2 = sorted(glob.glob(os.path.join(pred_out, "*")))[-1]
    raw = os.path.join(run2, "prediction_images_raw")

    report = {
        "config": {"epochs": epochs, "n_per_domain": n, "img_size": 256,
                   "batch_size": 8, "dtype": "bf16",
                   "corpus": "unpaired: blob fields (X) vs inverted+edge "
                             "renders of disjoint fields (Y); truth = "
                             "render_target(x), eval-only"},
        "trained_vs_truth": eval_dirs(raw, os.path.join(ROOT, "gt")),
        "identity_baseline_input_vs_truth": eval_dirs(
            os.path.join(ROOT, "x"), os.path.join(ROOT, "gt")),
        "train_metrics_json": os.path.join(run, "logs", "train_metrics.json"),
    }
    with open(report["train_metrics_json"]) as f:
        m = json.load(f)
    report["final_epoch_train_losses"] = {k: v[-1] for k, v in m.items()}
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["trained_vs_truth"]))
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
