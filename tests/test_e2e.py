"""End-to-end CLI smoke tests on tiny synthetic data (SURVEY §4's designed
test strategy): train → full output-directory contract (§2.8) → predict mode
restoring the checkpoint. Runs on the 8-device virtual CPU mesh from
conftest; img_size=32 keeps compiles fast."""

import glob
import os

import numpy as np
import pytest
from PIL import Image


def _write_pairs(d, n, rng, hw=(48, 96)):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, hw, np.uint8), "L").save(
            os.path.join(d, f"img_{i}.png"))


def _write_singles(d, n, rng, hw=(48, 48)):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, hw, np.uint8), "L").save(
            os.path.join(d, f"img_{i}.png"))


@pytest.mark.slow
def test_pix2pix_train_then_predict(tmp_path):
    from pix2pix import main
    from gan_tpu.config import parse_pix2pix

    rng = np.random.default_rng(0)
    data = str(tmp_path / "data")
    out = str(tmp_path / "out")
    _write_pairs(data, 12, rng)

    cfg = parse_pix2pix([
        "--data", data, "--output", out, "--train", "--epochs", "6",
        "--img-size", "32", "--batch-size", "4", "--test-img", "2",
        "--logging", "false", "--dtype", "fp32", "--num-devices", "1"])
    main(cfg)

    run = sorted(glob.glob(out + "/*"))[0]
    # output contract (SURVEY §2.8)
    assert os.path.exists(f"{run}/logs/config.json")
    import json
    with open(f"{run}/logs/config.json") as f:
        cfg_json = json.load(f)
    # reference serializes vars(opt): key is "lambda", not "lam"
    # (/root/reference/pix2pix.py:361,406-407)
    assert "lambda" in cfg_json and "lam" not in cfg_json
    ref_keys = {"data", "output", "img_size", "batch_size", "buffer_size",
                "channels", "logging", "generator_loss", "input_img_orient",
                "seed", "train", "predict", "save_weights", "epochs",
                "lambda", "validation_size", "test_img", "learning_rate",
                "beta_1", "beta_2", "weights"}
    assert ref_keys <= set(cfg_json)
    assert os.path.exists(f"{run}/logs/train_metrics.json")
    assert os.path.exists(f"{run}/logs/val_metrics.json")
    assert os.path.exists(f"{run}/test_images/epoch_5.png")  # 5-epoch cadence
    assert len(glob.glob(f"{run}/final_test_imgs/img*.png")) == 2
    assert len(glob.glob(f"{run}/figs/Pix2Pix *.png")) == 4
    assert glob.glob(f"{run}/training_checkpoints/*")

    import json
    with open(f"{run}/logs/train_metrics.json") as f:
        metrics = json.load(f)
    assert sorted(metrics) == sorted([
        "Generator Total Loss", "Generator Loss (Primary)",
        "Generator Loss (Secondary)", "Discriminator Loss"])
    assert all(len(v) == 6 and all(np.isfinite(x) for x in v)
               for v in metrics.values())

    # separate --output: timestamped run dirs collide within the same minute
    # (reference quirk, SURVEY §2.10-Q11) and training is now fast enough
    # that train+predict can share a minute
    out2 = str(tmp_path / "out_pred")
    cfg2 = parse_pix2pix([
        "--data", data, "--output", out2, "--predict", "--weights", run,
        "--img-size", "32", "--logging", "false", "--dtype", "fp32",
        "--num-devices", "1"])
    main(cfg2)
    run2 = sorted(glob.glob(out2 + "/*"))[-1]
    assert len(glob.glob(f"{run2}/prediction_images/img*.png")) == 12


@pytest.mark.slow
def test_cyclegan_train_then_predict(tmp_path):
    from cycle_gan import main
    from gan_tpu.config import parse_cyclegan

    rng = np.random.default_rng(1)
    dx, dy = str(tmp_path / "x"), str(tmp_path / "y")
    out = str(tmp_path / "out")
    _write_singles(dx, 8, rng)
    _write_singles(dy, 11, rng)  # unequal domains: zip length = shorter

    cfg = parse_cyclegan([
        "--input-images", dx, "--target-images", dy, "--output", out,
        "--train", "--epochs", "2", "--img-size", "32", "--batch-size", "3",
        "--test-img", "2", "--logging", "false", "--dtype", "fp32",
        "--num-devices", "1"])
    main(cfg)

    run = sorted(glob.glob(out + "/*"))[0]
    import json
    with open(f"{run}/logs/train_metrics.json") as f:
        metrics = json.load(f)
    assert len(metrics) == 7 and all(len(v) == 2 for v in metrics.values())
    assert len(glob.glob(f"{run}/figs/CycleGAN *.png")) == 7
    assert len(glob.glob(f"{run}/final_test_imgs/img*.png")) == 2

    out2 = str(tmp_path / "out_pred")  # avoid same-minute dir collision (Q11)
    cfg2 = parse_cyclegan([
        "--input-images", dx, "--output", out2, "--predict", "--weights", run,
        "--img-size", "32", "--logging", "false", "--dtype", "fp32",
        "--num-devices", "1"])
    main(cfg2)
    run2 = sorted(glob.glob(out2 + "/*"))[-1]
    assert len(glob.glob(f"{run2}/prediction_images/img*.png")) == 8


@pytest.mark.slow
def test_pix2pix_data_parallel_8dev(tmp_path):
    """DP over the 8-device CPU mesh: global batch 8 sharded 1/device,
    psum'd grads, sharded cache."""
    from pix2pix import main
    from gan_tpu.config import parse_pix2pix

    rng = np.random.default_rng(2)
    data = str(tmp_path / "data")
    out = str(tmp_path / "out")
    _write_pairs(data, 20, rng)

    cfg = parse_pix2pix([
        "--data", data, "--output", out, "--train", "--epochs", "2",
        "--img-size", "32", "--batch-size", "8", "--test-img", "2",
        "--logging", "false", "--dtype", "fp32", "--num-devices", "8"])
    main(cfg)
    run = sorted(glob.glob(out + "/*"))[0]
    import json
    with open(f"{run}/logs/train_metrics.json") as f:
        metrics = json.load(f)
    assert all(all(np.isfinite(x) for x in v) for v in metrics.values())


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)


def test_graft_entry_lowers():
    """entry() must return a jittable fn + args (driver compile-checks it);
    lowering (no compile) is enough to catch trace-time breakage fast."""
    import jax
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jax.jit(fn).lower(*args)
