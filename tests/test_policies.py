"""Trainer policy knobs: remat auto thresholds, bn-cross-replica wiring."""

import jax

from gan_tpu.config import Pix2PixConfig
from gan_tpu.parallel.mesh import make_mesh
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer, use_remat


def _cfg(**kw):
    base = dict(data="x", output="y", img_size=256, batch_size=8, train=True,
                epochs=1, dtype="fp32", num_devices=1)
    base.update(kw)
    cfg = Pix2PixConfig(**base)
    cfg.validate()
    return cfg


def test_use_remat_auto_thresholds():
    # measured-safe configs stay remat-free (192 img/s at 512² batch 64)
    assert not use_remat(_cfg(img_size=256, batch_size=256), 1)
    assert not use_remat(_cfg(img_size=512, batch_size=64), 1)
    # beyond the measured-fit footprint → checkpointing kicks in
    assert use_remat(_cfg(img_size=512, batch_size=128), 1)
    # ...unless the batch shards across devices
    assert not use_remat(_cfg(img_size=512, batch_size=128, num_devices=8), 8)
    # small 512² per-device batches: remat measured FASTER (210 vs 130
    # img/s at batch 8 — benchmarks/results/remat_frontier.json), auto=on
    assert use_remat(_cfg(img_size=512, batch_size=8), 1)
    assert use_remat(_cfg(img_size=512, batch_size=64, num_devices=8), 8)
    assert not use_remat(_cfg(img_size=512, batch_size=16), 1)  # flips back
    # the small-batch gate is 512²-specific: unmeasured at 256², stays off
    assert not use_remat(_cfg(img_size=256, batch_size=8), 1)
    # explicit override wins both ways
    assert use_remat(_cfg(remat="on"), 1)
    assert not use_remat(_cfg(img_size=512, batch_size=512, remat="off"), 1)


def test_remat_flag_reaches_generator():
    t_on = Pix2PixTrainer(_cfg(remat="on", img_size=32),
                          mesh=make_mesh(1, devices=jax.devices("cpu")[:1]))
    t_off = Pix2PixTrainer(_cfg(remat="off", img_size=32),
                           mesh=make_mesh(1, devices=jax.devices("cpu")[:1]))
    assert t_on.gen.remat and not t_off.gen.remat


def test_bn_cross_replica_wiring(cpu_devices):
    t = Pix2PixTrainer(_cfg(bn_cross_replica="true", batch_size=8,
                            num_devices=8),
                       mesh=make_mesh(8, devices=cpu_devices))
    assert t._bn_axis == "data"
    t1 = Pix2PixTrainer(_cfg(bn_cross_replica="true", num_devices=1),
                        mesh=make_mesh(1, devices=cpu_devices))
    assert t1._bn_axis is None  # single device: per-replica == global
