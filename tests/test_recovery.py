"""Fault recovery (SURVEY §5.3, gan_tpu/train/recovery.py): in-process rewind
on injected device faults, resume-ready exit when recovery is exhausted, and
logic-error passthrough. The reference has no failure handling at all
(restore only at predict, /root/reference/pix2pix.py:411)."""

import glob
import json
import os

import numpy as np
import pytest
from PIL import Image

from gan_tpu.train.recovery import TrainingFault, is_device_fault


def test_is_device_fault_classification():
    assert is_device_fault(RuntimeError("worker unavailable"))
    assert is_device_fault(OSError("tunnel reset"))
    assert is_device_fault(ConnectionError("grpc"))
    # logic errors must propagate unchanged — never swallowed by recovery
    assert not is_device_fault(ValueError("bad shape"))
    assert not is_device_fault(TypeError("bad arg"))
    assert not is_device_fault(AssertionError("contract"))
    # filesystem errors from the epoch body's host-side writes are config
    # bugs, not transport faults — retrying them would mask the real problem
    assert not is_device_fault(FileNotFoundError("no such dir"))
    assert not is_device_fault(PermissionError("read-only output"))
    assert not is_device_fault(NotADirectoryError("file in the way"))
    assert not is_device_fault(IsADirectoryError("dir in the way"))
    assert not is_device_fault(FileExistsError("collision"))


def _png_bytes(run_dir, sub):
    """{relative name: bytes} for every PNG under ``run_dir/sub``."""
    out = {}
    for p in sorted(glob.glob(os.path.join(run_dir, sub, "*.png"))):
        with open(p, "rb") as f:
            out[os.path.basename(p)] = f.read()
    return out


def _write_pairs(d, n, rng, hw=(48, 96)):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, hw, np.uint8), "L").save(
            os.path.join(d, f"img_{i}.png"))


def _base_args(data, out):
    return ["--data", data, "--output", out, "--train", "--epochs", "6",
            "--img-size", "32", "--batch-size", "2", "--test-img", "2",
            "--logging", "false", "--dtype", "fp32", "--num-devices", "1",
            "--checkpoint-every", "2"]


def _run(args):
    from pix2pix import main
    from gan_tpu.config import parse_pix2pix
    main(parse_pix2pix(args))


def _inject_fault(monkeypatch, fail_when):
    """Monkeypatch Pix2PixTrainer._run_epoch to raise a device-fault-shaped
    RuntimeError when ``fail_when(train_call_index)`` (0-based over TRAINING
    epoch calls only) is true."""
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer
    orig = Pix2PixTrainer._run_epoch
    seen = {"n": 0}

    def faulty(self, *a, **kw):
        if kw.get("training"):
            i = seen["n"]
            seen["n"] += 1
            if fail_when(i):
                raise RuntimeError("injected axon worker fault")
        return orig(self, *a, **kw)

    monkeypatch.setattr(Pix2PixTrainer, "_run_epoch", faulty)


@pytest.mark.slow
def test_fault_rewind_matches_clean_run(tmp_path, monkeypatch):
    """One mid-run fault → fence rewinds to the last checkpoint and the
    deterministic re-run reproduces the clean run's metrics EXACTLY."""
    rng = np.random.default_rng(7)
    data = str(tmp_path / "data")
    _write_pairs(data, 10, rng)

    clean_out = str(tmp_path / "clean")
    _run(_base_args(data, clean_out))
    clean_run = sorted(glob.glob(clean_out + "/*"))[0]
    with open(clean_run + "/logs/train_metrics.json") as f:
        clean_metrics = json.load(f)

    # fault on the 4th training-epoch dispatch (epoch index 3; last
    # checkpoint then is the --checkpoint-every=2 save at epoch 2)
    _inject_fault(monkeypatch, lambda i: i == 3)
    fault_out = str(tmp_path / "faulted")
    _run(_base_args(data, fault_out))
    fault_run = sorted(glob.glob(fault_out + "/*"))[0]
    with open(fault_run + "/logs/train_metrics.json") as f:
        fault_metrics = json.load(f)

    assert fault_metrics == clean_metrics  # bit-identical training trajectory
    assert all(len(v) == 6 for v in fault_metrics.values())

    # sample images too: epoch-indexed generate() keys make the recovered
    # run's PNGs byte-identical, not just its metrics
    for sub in ("test_images", "final_test_imgs"):
        clean_pngs, fault_pngs = _png_bytes(clean_run, sub), _png_bytes(fault_run, sub)
        assert clean_pngs and fault_pngs == clean_pngs, f"{sub} diverged"

    # --resume from the finished run with no epochs left regenerates ONLY the
    # final test images — they must be byte-identical to the clean run's
    # (index-derived keys; a call counter would reset to 0 here and diverge)
    out3 = str(tmp_path / "resumed")
    _run(_base_args(data, out3) + ["--resume", fault_run])
    run3 = sorted(glob.glob(out3 + "/*"))[0]
    assert _png_bytes(run3, "final_test_imgs") == _png_bytes(clean_run,
                                                             "final_test_imgs")

    # output contract: the fence's epoch-0 anchor checkpoint is cleaned up
    # once real saves land — training_checkpoints/ holds no epoch 0
    assert not glob.glob(clean_run + "/training_checkpoints/0")
    assert not glob.glob(fault_run + "/training_checkpoints/0")


@pytest.mark.slow
def test_cyclegan_fault_rewind_matches_clean_run(tmp_path, monkeypatch):
    """CycleGAN twin of the rewind test — load-bearing because CycleGAN's
    epochs DRAW from a host RNG (per-epoch reshuffles, cycle_gan.py:140-150):
    loop.epoch_rng makes those draws pure in (seed, epoch), so the re-run
    after a rewind reproduces the shuffle orders the fault destroyed."""
    from gan_tpu.train.cyclegan_trainer import CycleGANTrainer

    rng = np.random.default_rng(11)
    dx, dy = str(tmp_path / "x"), str(tmp_path / "y")
    for d, n in ((dx, 9), (dy, 11)):
        os.makedirs(d)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (40, 40), np.uint8), "L").save(
                os.path.join(d, f"img_{i}.png"))

    def run_cg(out):
        from cycle_gan import main
        from gan_tpu.config import parse_cyclegan
        main(parse_cyclegan(
            ["--input-images", dx, "--target-images", dy, "--output", out,
             "--train", "--epochs", "6", "--img-size", "32", "--batch-size",
             "2", "--test-img", "2", "--logging", "false", "--dtype", "fp32",
             "--num-devices", "1", "--checkpoint-every", "2"]))

    clean_out = str(tmp_path / "clean")
    run_cg(clean_out)
    clean_run = sorted(glob.glob(clean_out + "/*"))[0]
    with open(clean_run + "/logs/train_metrics.json") as f:
        clean_metrics = json.load(f)

    orig = CycleGANTrainer._run_epoch
    seen = {"n": 0}

    def faulty(self, *a, **kw):
        if kw.get("training"):
            i = seen["n"]
            seen["n"] += 1
            if i == 3:
                raise RuntimeError("injected axon worker fault")
        return orig(self, *a, **kw)

    monkeypatch.setattr(CycleGANTrainer, "_run_epoch", faulty)
    fault_out = str(tmp_path / "faulted")
    run_cg(fault_out)
    fault_run = sorted(glob.glob(fault_out + "/*"))[0]
    with open(fault_run + "/logs/train_metrics.json") as f:
        fault_metrics = json.load(f)

    assert fault_metrics == clean_metrics  # shuffle orders re-drawn exactly
    assert all(len(v) == 6 for v in fault_metrics.values())
    for sub in ("test_images", "final_test_imgs"):
        clean_pngs, fault_pngs = _png_bytes(clean_run, sub), _png_bytes(fault_run, sub)
        assert clean_pngs and fault_pngs == clean_pngs, f"{sub} diverged"
    # anchor cleanup matters here: CycleGAN keeps max_to_keep=3, so a stray
    # epoch-0 anchor would survive in the reference's output layout
    assert not glob.glob(clean_run + "/training_checkpoints/0")


@pytest.mark.slow
def test_fault_storm_exits_resume_ready(tmp_path, monkeypatch):
    """Permanent fault → recoveries exhaust → SystemExit(17) with a
    checkpoint a fresh --resume run continues from."""
    rng = np.random.default_rng(8)
    data = str(tmp_path / "data")
    _write_pairs(data, 10, rng)

    # epochs 0-1 succeed (periodic save at 2), every later epoch faults
    _inject_fault(monkeypatch, lambda i: i >= 2)
    out = str(tmp_path / "out")
    with pytest.raises(SystemExit) as ei:
        _run(_base_args(data, out))
    assert ei.value.code == 17
    run1 = sorted(glob.glob(out + "/*"))[0]
    assert glob.glob(run1 + "/training_checkpoints/2")  # resume point

    # recovery queue step: rerun with --resume on a healthy "worker"
    monkeypatch.undo()
    out2 = str(tmp_path / "out2")
    _run(_base_args(data, out2) + ["--resume", run1])
    run2 = sorted(glob.glob(out2 + "/*"))[0]
    with open(run2 + "/logs/train_metrics.json") as f:
        metrics = json.load(f)
    assert all(len(v) == 4 for v in metrics.values())  # epochs 3..6
    assert glob.glob(run2 + "/training_checkpoints/6")


@pytest.mark.slow
def test_logic_error_propagates_unrecovered(tmp_path, monkeypatch):
    """A ValueError in the epoch body is NOT a device fault: no rewind, no
    emergency checkpoint, original exception surfaces."""
    rng = np.random.default_rng(9)
    data = str(tmp_path / "data")
    _write_pairs(data, 8, rng)

    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer

    def boom(self, *a, **kw):
        raise ValueError("logic bug, not a fault")

    monkeypatch.setattr(Pix2PixTrainer, "_run_epoch", boom)
    with pytest.raises(ValueError, match="logic bug"):
        _run(_base_args(data, str(tmp_path / "out")))
