"""Epoch segmentation (train/loop.py run_epoch_segments).

The axon TPU worker faults on epoch programs that execute too long
(round-3 bracket: 625-step/~65 s CycleGAN programs pass, 795-step/~83 s and
3000-step/82+ s fault, while XLA's memory_analysis shows the crashers far
from OOM — benchmarks/cg_hbm_probe.py). run_epoch_segments splits one epoch
scan into balanced shorter programs that chain donated params/opt-states and
continue the global step index, so the per-step RNG stream — and with it
every loss and update — is bit-identical to the single-program epoch. These
tests pin that equivalence for both trainers plus the policy arithmetic.
"""

import jax
import numpy as np
import pytest

from gan_tpu.config import CycleGANConfig, Pix2PixConfig
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train import loop
from gan_tpu.train.cyclegan_trainer import CycleGANTrainer
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer


def _p2p_cfg(ndev):
    cfg = Pix2PixConfig(data="x", output="y", img_size=32, batch_size=8,
                        train=True, epochs=1, dtype="fp32", num_devices=ndev)
    cfg.validate()
    return cfg


def _cg_cfg(ndev):
    cfg = CycleGANConfig(input_images="x", target_images="y", output="o",
                         img_size=32, batch_size=8, train=True, epochs=1,
                         dtype="fp32", num_devices=ndev)
    cfg.validate()
    return cfg


@pytest.mark.parametrize("ndev", [1, 8])
def test_pix2pix_segmented_epoch_bit_equal(ndev, monkeypatch):
    """Segmented Pix2Pix training epoch ≡ single-program epoch: identical
    losses AND identical final params (the step0 offset keeps every
    per-step fold_in key the same, donation chains the carry)."""
    n = 51  # 6 full steps of 8 (-> segments of 2) + remainder 3
    cache = np.random.default_rng(0).integers(
        0, 255, (n, 2, 62, 62, 1), dtype=np.uint8)
    key = jax.random.PRNGKey(11)

    results = {}
    for seg in ("0", "2"):
        monkeypatch.setenv("GAN_TPU_EPOCH_SEG_STEPS", seg)
        tr = Pix2PixTrainer(_p2p_cfg(ndev))
        dev = loop.put_cache(cache, tr.mesh)
        losses = tr._run_epoch(dev, cache, key, training=True,
                               fixed_order=True, rng=np.random.default_rng(1))
        results[seg] = (losses, jax.tree_util.tree_map(np.asarray, tr.params))

    l0, p0 = results["0"]
    l2, p2 = results["2"]
    assert l0.shape == l2.shape == (7, 4)
    np.testing.assert_array_equal(l0, l2)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, p2)


@pytest.mark.parametrize("ndev", [1, 8])
def test_cyclegan_segmented_epoch_bit_equal(ndev, monkeypatch):
    """Segmented CycleGAN zip epoch (shuffled perms + zip tail) ≡ the
    single-program epoch bit-for-bit at mesh sizes 1 and 8."""
    nx, ny = 43, 35  # 4 full steps (-> 2 segments of 2) + zip tail
    x = np.random.default_rng(2).integers(0, 255, (nx, 62, 62, 1), np.uint8)
    y = np.random.default_rng(3).integers(0, 255, (ny, 62, 62, 1), np.uint8)
    key = jax.random.PRNGKey(5)

    results = {}
    for seg in ("0", "3"):  # 3 -> balanced segments of 2 + 2
        monkeypatch.setenv("GAN_TPU_EPOCH_SEG_STEPS", seg)
        tr = CycleGANTrainer(_cg_cfg(ndev))
        caches = {"x": loop.put_cache(x, tr.mesh),
                  "y": loop.put_cache(y, tr.mesh)}
        losses = tr._run_epoch(caches, x, y, key, training=True,
                               rng=np.random.default_rng(9))
        results[seg] = (losses, jax.tree_util.tree_map(np.asarray, tr.params))

    l0, p0 = results["0"]
    l3, p3 = results["3"]
    assert l0.shape == l3.shape
    np.testing.assert_array_equal(l0, l3)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, p3)


def test_seg_max_steps_policy(monkeypatch):
    mesh = make_mesh(1)  # CPU in tests
    # off-TPU default: no segmentation (the fault is axon-stack-specific)
    assert loop.seg_max_steps(4, 256, mesh, t_min_ms=30, t_img_ms=4) == 0
    # env override wins on any platform
    monkeypatch.setenv("GAN_TPU_EPOCH_SEG_STEPS", "17")
    assert loop.seg_max_steps(4, 256, mesh, t_min_ms=30, t_img_ms=4) == 17
    monkeypatch.delenv("GAN_TPU_EPOCH_SEG_STEPS")

    # the arithmetic (platform-independent): floor binds at small batch,
    # the per-image slope at large; 512² scales the slope 4x
    class _Dev:
        platform = "tpu"

    class _Mesh:
        size = 1

        class devices:
            flat = [_Dev()]

    m = _Mesh()
    # batch 4 @256²: max(30, 16) ms -> 40 s / 30 ms = 1333 steps
    assert loop.seg_max_steps(4, 256, m, t_min_ms=30, t_img_ms=4) == 1333
    # batch 128 @256² pix2pix model: max(25, 128) ms -> 312 steps (the
    # full-corpus batch-128 epoch at 198 steps stays a single program)
    assert loop.seg_max_steps(128, 256, m, t_min_ms=25, t_img_ms=1) == 312
    # batch 8 @512²: max(25, 8*1*4) = 32 ms -> 1250 steps
    assert loop.seg_max_steps(8, 512, m, t_min_ms=25, t_img_ms=1) == 1250


def test_run_epoch_segments_balanced_lengths():
    """Segment boundaries are balanced (at most two distinct lengths, none
    above max_steps) and cover the step range exactly, in order."""
    calls = []

    def fake_fn(params, opt_states, caches, perms, key, step0=0):
        calls.append((step0, perms.shape[0]))
        return params + 1, opt_states, np.full((perms.shape[0], 2),
                                               float(step0))

    perms = np.arange(10 * 3).reshape(10, 3)
    p, o, losses = loop.run_epoch_segments(fake_fn, 0, 0, None, perms,
                                           None, max_steps=4)
    assert calls == [(0, 4), (4, 4), (8, 2)]
    assert p == 3  # one donation-chained call per segment
    assert losses.shape == (10, 2)
    assert set(losses[:, 0]) == {0.0, 4.0, 8.0}

    calls.clear()
    loop.run_epoch_segments(fake_fn, 0, 0, None, perms, None, max_steps=0)
    assert calls == [(0, 10)]  # single-program path: one whole-epoch call
