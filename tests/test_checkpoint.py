"""Orbax checkpoint wrapper: round-trip, retention, resume (SURVEY §5.3/§5.4)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_tpu.train.checkpoint import CheckpointManager, latest_checkpoint_dir


def _tree(key, scale=1.0):
    k1, k2 = jax.random.split(key)
    return {"a": scale * jax.random.normal(k1, (4, 8)),
            "nested": {"b": scale * jax.random.normal(k2, (3,)),
                       "count": jnp.zeros((), jnp.int32)}}


def test_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    state = _tree(jax.random.PRNGKey(0))
    mgr.save(5, state)
    assert mgr.latest_epoch() == 5
    restored = mgr.restore(_tree(jax.random.PRNGKey(1)))  # different target values
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state, restored)
    mgr.close()


def test_max_to_keep_retention(tmp_path):
    """Pix2Pix keeps 1, CycleGAN keeps 3 (pix2pix.py:420, cycle_gan.py:461)."""
    d = str(tmp_path / "ckpt")
    mgr = CheckpointManager(d, max_to_keep=3)
    for epoch in (5, 10, 15, 20):
        mgr.save(epoch, _tree(jax.random.PRNGKey(epoch)))
    kept = sorted(int(os.path.basename(p)) for p in glob.glob(d + "/[0-9]*"))
    assert kept == [10, 15, 20]
    assert mgr.latest_epoch() == 20
    mgr.close()


def test_anchor_checkpoint_cleanup(tmp_path):
    """The fault fence's epoch-start anchor (recovery.py) is not part of the
    reference's training_checkpoints/ layout: it must survive while it is the
    only rewind target and be deleted once the first real save lands."""
    d = str(tmp_path / "ckpt")
    mgr = CheckpointManager(d, max_to_keep=3)
    mgr.save(0, _tree(jax.random.PRNGKey(0)), anchor=True)
    kept = sorted(int(os.path.basename(p)) for p in glob.glob(d + "/[0-9]*"))
    assert kept == [0] and mgr.latest_epoch() == 0  # rewind target exists
    mgr.save(5, _tree(jax.random.PRNGKey(5)))       # first real save
    kept = sorted(int(os.path.basename(p)) for p in glob.glob(d + "/[0-9]*"))
    assert kept == [5]                              # anchor gone
    mgr.save(10, _tree(jax.random.PRNGKey(10)))     # no anchor left to delete
    kept = sorted(int(os.path.basename(p)) for p in glob.glob(d + "/[0-9]*"))
    assert kept == [5, 10]
    mgr.close()


def test_restore_specific_epoch(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
    s5, s10 = _tree(jax.random.PRNGKey(5)), _tree(jax.random.PRNGKey(10))
    mgr.save(5, s5)
    mgr.save(10, s10)
    r5 = mgr.restore(_tree(jax.random.PRNGKey(0)), epoch=5)
    np.testing.assert_array_equal(np.asarray(r5["a"]), np.asarray(s5["a"]))
    mgr.close()


def test_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore(_tree(jax.random.PRNGKey(0)))
    mgr.close()


def test_latest_checkpoint_dir(tmp_path):
    run = tmp_path / "run"
    (run / "training_checkpoints").mkdir(parents=True)
    assert latest_checkpoint_dir(str(run)) == str(run / "training_checkpoints")
    assert latest_checkpoint_dir(str(run / "training_checkpoints")) == \
        str(run / "training_checkpoints")


@pytest.mark.slow
def test_train_resume_e2e(tmp_path):
    """--resume continues from a saved epoch into a new run dir (TPU
    extension; the reference had no train-resume at all)."""
    from PIL import Image
    from pix2pix import main
    from gan_tpu.config import parse_pix2pix

    rng = np.random.default_rng(3)
    data = str(tmp_path / "data")
    os.makedirs(data)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (48, 96), np.uint8), "L").save(
            os.path.join(data, f"img_{i}.png"))
    out = str(tmp_path / "out")
    base = ["--data", data, "--output", out, "--train", "--img-size", "32",
            "--batch-size", "2", "--test-img", "2", "--logging", "false",
            "--dtype", "fp32", "--num-devices", "1"]
    main(parse_pix2pix(base + ["--epochs", "5"]))
    run1 = sorted(glob.glob(out + "/*"))[0]
    assert glob.glob(run1 + "/training_checkpoints/5")

    # second run under a different --output (timestamped dirs collide within
    # the same minute — reference quirk SURVEY §2.10-Q11)
    out2 = str(tmp_path / "out2")
    base2 = list(base)
    base2[base2.index(out)] = out2
    main(parse_pix2pix(base2 + ["--epochs", "7", "--resume", run1]))
    run2 = sorted(glob.glob(out2 + "/*"))[-1]
    import json
    with open(run2 + "/logs/train_metrics.json") as f:
        metrics = json.load(f)
    # resumed at epoch 5 → only epochs 6..7 trained in the new run
    assert all(len(v) == 2 for v in metrics.values())
    assert glob.glob(run2 + "/training_checkpoints/7")
