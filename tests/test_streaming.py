"""Host-streaming training paths.

Two properties pin the streaming implementation to the cached flagship path:

1. RNG/batch parity — a streamed fixed-order epoch reproduces the cached
   epoch's per-step losses at any mesh size (make_sharded_step folds the
   same (step, device) RNG structure as the cached scan body, and
   fixed-order striping yields the same global batch composition; the only
   residual differences are XLA fusion/summation-order float noise between
   the scan program and the per-batch programs, ~1e-6 relative).
2. The CLIs can train end-to-end from files without ever materializing the
   corpus in host RAM (--host-cache off → data.loader.FileCache), replacing
   tf.data's disk streaming (reference pix2pix.py:155-163).
"""

import glob
import os

import jax
import numpy as np
import pytest
from PIL import Image

from gan_tpu.config import Pix2PixConfig
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer


def _cfg(ndev=1, batch=8):
    cfg = Pix2PixConfig(data="x", output="y", img_size=32, batch_size=batch,
                        train=True, epochs=1, dtype="fp32", num_devices=ndev)
    cfg.validate()
    return cfg


def _train_cache(n, rng):
    return rng.integers(0, 255, (n, 2, 32 + 30, 32 + 30, 1), np.uint8)


@pytest.mark.parametrize("ndev", [1, 8, 4])
def test_streamed_epoch_matches_cached_epoch(cpu_devices, ndev):
    """ndev=4 exercises per-device batch 2 — parity there requires the
    trainers' stripe_order reorder of each full streamed batch (without it,
    per-sample augment/dropout pairing and BN stats diverge: ~2e-1 abs)."""
    cache = _train_cache(19, np.random.default_rng(3))  # 2 full (B=8) + rem 3
    key = jax.random.PRNGKey(11)

    t_cached = Pix2PixTrainer(_cfg(ndev), mesh=make_mesh(ndev, devices=cpu_devices))
    dev = loop.put_cache(cache, t_cached.mesh)
    l_cached = t_cached._run_epoch(dev, cache, key, training=True,
                                   fixed_order=True, rng=np.random.default_rng(0))

    t_stream = Pix2PixTrainer(_cfg(ndev), mesh=make_mesh(ndev, devices=cpu_devices))
    l_stream = t_stream._run_epoch_streaming(cache, key, training=True)

    assert l_cached.shape == l_stream.shape == (3, 4)
    np.testing.assert_allclose(l_cached, l_stream, rtol=1e-4, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=1e-3),
        t_cached.params, t_stream.params)


def _write_pairs(d, n, w=64, h=32):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(n):
        arr = rng.integers(0, 255, (h, w), np.uint8)
        Image.fromarray(arr, "L").save(os.path.join(d, f"pair_{i:03d}.png"))


def test_pix2pix_cli_file_streaming_end_to_end(tmp_path, monkeypatch):
    """--host-cache off trains from a FileCache and honors the full output
    contract, then predicts through the chunked streaming path."""
    import pix2pix as cli
    from gan_tpu.config import parse_pix2pix

    data = str(tmp_path / "data")
    out = str(tmp_path / "out")
    _write_pairs(data, 12)
    monkeypatch.setenv("GAN_TPU_ALLOW_ANY_SIZE", "1")

    cfg = parse_pix2pix([
        "--data", data, "--output", out, "--train", "--epochs", "2",
        "--img-size", "32", "--batch-size", "4", "--test-img", "2",
        "--logging", "false", "--dtype", "fp32", "--num-devices", "1",
        "--host-cache", "off"])
    cli.main(cfg)
    run = sorted(glob.glob(f"{out}/*"))[0]
    metrics = os.path.join(run, "logs", "train_metrics.json")
    assert os.path.exists(metrics)
    import json
    m = json.load(open(metrics))
    assert all(len(v) == 2 and all(np.isfinite(v)) for v in m.values())
    assert glob.glob(f"{run}/final_test_imgs/img*.png")

    out2 = str(tmp_path / "out_pred")
    cfg2 = parse_pix2pix([
        "--data", data, "--output", out2, "--predict",
        "--weights", os.path.join(run, "training_checkpoints"),
        "--img-size", "32", "--batch-size", "4", "--logging", "false",
        "--dtype", "fp32", "--num-devices", "1", "--host-cache", "off",
        "--raw-predictions", "true"])
    cli.main(cfg2)
    run2 = sorted(glob.glob(f"{out2}/*"))[-1]
    assert len(glob.glob(f"{run2}/prediction_images/img*.png")) == 12
    assert len(glob.glob(f"{run2}/prediction_images_raw/pair_*.png")) == 12


def test_fit_streamed_val_overlap_matches_cached_val(tmp_path):
    """--device-cache off runs val through the PRE-STARTED stream (producer
    launched before the train epoch so transfers overlap train compute);
    metrics must match the fully cached fit up to XLA program-shape float
    noise — the overlap is a scheduling change only."""
    rng = np.random.default_rng(17)
    train = _train_cache(11, rng)                       # full batches + tail
    val = rng.integers(0, 255, (6, 2, 32, 32, 1), np.uint8)
    test = rng.integers(0, 255, (2, 2, 32, 32, 1), np.uint8)

    def run(device_cache, out):
        cfg = _cfg(1, batch=4)
        cfg.epochs = 2
        cfg.device_cache = device_cache
        tr = Pix2PixTrainer(cfg)
        return tr.fit(train, val, test, str(tmp_path / out))

    tc1, vc1 = run("auto", "cached")
    tc2, vc2 = run("off", "streamed")
    for k in vc1:
        # first TRAIN epoch starts from identical params — only XLA
        # program-shape noise separates the runs there (scan vs per-batch
        # programs, ~1e-6 rel on losses)
        np.testing.assert_allclose(tc1[k][:1], tc2[k][:1], rtol=1e-4, atol=1e-5)
        # every later entry (val included — it runs AFTER a train epoch) has
        # passed that noise through GAN weight updates, which amplify it
        # (~5e-4 rel measured over 2 epochs); an actual pairing/RNG bug
        # shows up at ~2e-1 (see the fixed-order epoch test's docstring),
        # so the loose bound still separates cleanly
        np.testing.assert_allclose(vc1[k], vc2[k], rtol=5e-3, atol=1e-4)
        np.testing.assert_allclose(tc1[k], tc2[k], rtol=5e-3, atol=1e-4)


def test_cyclegan_streamed_epoch_matches_cached(cpu_devices):
    """CycleGAN shuffled epochs share the host perm between cached and
    streamed paths, so single-device losses match exactly too."""
    from gan_tpu.config import CycleGANConfig
    from gan_tpu.train.cyclegan_trainer import CycleGANTrainer

    cfg = CycleGANConfig(input_images="x", target_images="y", output="o",
                         img_size=32, batch_size=4, train=True, epochs=1,
                         dtype="fp32", num_devices=1)
    cfg.validate()
    rng_data = np.random.default_rng(5)
    x = rng_data.integers(0, 255, (9, 62, 62, 1), np.uint8)
    y = rng_data.integers(0, 255, (7, 62, 62, 1), np.uint8)
    key = jax.random.PRNGKey(13)

    t1 = CycleGANTrainer(cfg, mesh=make_mesh(1, devices=cpu_devices))
    caches = {"x": loop.put_cache(x, t1.mesh), "y": loop.put_cache(y, t1.mesh)}
    l1 = t1._run_epoch(caches, x, y, key, training=True,
                       rng=np.random.default_rng(21))

    t2 = CycleGANTrainer(cfg, mesh=make_mesh(1, devices=cpu_devices))
    l2 = t2._run_epoch_streaming(x, y, key, training=True,
                                 rng=np.random.default_rng(21))

    # zip length = ceil(7/4) = 2 batches: one full, one partial (4, 3)
    assert l1.shape == l2.shape == (2, 7)
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-5)
