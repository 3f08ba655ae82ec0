"""Data-parallel correctness on the virtual 8-device CPU mesh (SURVEY §4:
"DP tests on CPU via xla_force_host_platform_device_count" — the standard
JAX fake-backend trick).

Key property: one psum'd train step over a batch sharded across 8 devices
produces exactly the same parameter update as the same global batch on one
device (with cross-replica batch-norm stats and dropout-free depth, the math
is identical; gradients of a mean loss compose as pmean of shard gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gan_tpu.config import Pix2PixConfig
from gan_tpu.parallel.mesh import DATA_AXIS, make_mesh
from gan_tpu.train import loop
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer


def _cfg(ndev, bn_cross):
    cfg = Pix2PixConfig(data="x", output="y", img_size=32, batch_size=8,
                        train=True, epochs=1, dtype="fp32", num_devices=ndev,
                        bn_cross_replica=bn_cross)
    cfg.validate()
    return cfg


def test_dp_step_matches_single_device(cpu_devices):
    """img_size=32 → depth-5 U-Net with no dropout blocks, so with
    cross-replica BN the DP step must match the single-device step exactly."""
    key = jax.random.PRNGKey(0)
    kx, ky, ks = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (8, 32, 32, 1), minval=-1, maxval=1)
    y = jax.random.uniform(ky, (8, 32, 32, 1), minval=-1, maxval=1)

    t1 = Pix2PixTrainer(_cfg(1, "false"), mesh=make_mesh(1, devices=cpu_devices))
    p1, o1, losses1 = jax.jit(lambda p, o, b, k: t1._train_step(p, o, b, k))(
        t1.params, t1.opt_states, (x, y), ks)

    t8 = Pix2PixTrainer(_cfg(8, "true"), mesh=make_mesh(8, devices=cpu_devices))
    def _dp_step(p, o, bx, by, k):
        p, o, losses = t8._train_step(p, o, (bx, by), k, axis_name=DATA_AXIS)
        return p, o, jax.lax.pmean(losses, DATA_AXIS)

    step8 = jax.shard_map(
        _dp_step,
        mesh=t8.mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    p8, o8, losses8 = jax.jit(step8)(t8.params, t8.opt_states, x, y, ks)

    # identical seeds → identical init params on both trainers
    np.testing.assert_allclose(np.asarray(losses1), np.asarray(losses8),
                               rtol=1e-5, atol=1e-6)
    # atol 1e-4: Adam's rsqrt amplifies float-summation order differences for
    # near-zero second moments on the very first step (observed: a handful of
    # elements out of 2M at ≤3e-5); real psum/BN logic bugs show up orders of
    # magnitude larger (a broken loss pmean measured 0.2 relative)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-4),
        p1, p8)


def test_put_cache_pads_and_shards(cpu_devices):
    mesh = make_mesh(8, devices=cpu_devices)
    cache = np.arange(10 * 4, dtype=np.uint8).reshape(10, 4)
    dev = loop.put_cache(cache, mesh)
    assert dev.shape == (16, 4)  # padded to multiple of 8
    np.testing.assert_array_equal(np.asarray(dev)[:10], cache)


def test_local_perm_stays_in_local_range():
    rng = np.random.default_rng(0)
    n, ndev, n_steps, b_loc = 21, 8, 2, 1
    perm = loop.local_perm(n, ndev=ndev, n_steps=n_steps, per_dev_batch=b_loc,
                           rng=rng, fixed_order=False)
    assert perm.shape == (n_steps, ndev * b_loc)
    l = -(-n // ndev)  # 3 rows per device
    for d in range(ndev):
        real = min(max(n - d * l, 1), l)
        block = perm[:, d * b_loc:(d + 1) * b_loc]
        assert block.min() >= 0 and block.max() < real


def test_epoch_plan():
    assert loop.epoch_plan(10, 4, 1) == (2, 4, 2)
    assert loop.epoch_plan(16, 8, 8) == (2, 1, 0)
    with pytest.raises(AssertionError):
        loop.epoch_plan(16, 6, 4)
