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


def test_generate_samples_vary_per_call():
    """Successive generate() calls draw fresh dropout (reference draws
    unseeded randomness per call, pix2pix.py:228) yet stay deterministic
    from --seed: a fresh trainer replays the same sequence."""
    import numpy as np

    def fresh():
        # img_size 64 → depth-6 U-Net, which includes a dropout up-block
        # (depth 5 has none — up_specs keeps only the dropout-free tail).
        # batch 2: at batch 1 the 1×1 bottleneck batch-norms to exactly 0,
        # so that block's dropout acts on zeros and can't show up.
        t = Pix2PixTrainer(_cfg(img_size=64, batch_size=2),
                           mesh=make_mesh(1, devices=jax.devices("cpu")[:1]))
        return t

    x = np.random.default_rng(0).normal(size=(2, 64, 64, 1)).astype(np.float32)
    t = fresh()
    a, b = t.generate(x), t.generate(x)
    assert not np.array_equal(a, b)  # dropout mask varies across calls
    t2 = fresh()
    np.testing.assert_array_equal(a, t2.generate(x))  # still seeded


def test_down_auto_resolves_to_std(monkeypatch):
    """GAN_TPU_DOWN=auto must route through the measured winner (std —
    stem_study.json: s2d loses 2.9% e2e), not the s2d rewrite; s2d stays
    forceable for study. Checked structurally: the s2d path pads H,W to
    H+2,W+2 before its VALID conv, so the two lowerings are distinguishable
    via the traced jaxpr."""
    import jax.numpy as jnp
    from gan_tpu.ops import conv

    x = jnp.zeros((1, 8, 8, 1))
    w = jnp.zeros((4, 4, 1, 8))

    def uses_s2d():
        jaxpr = str(jax.make_jaxpr(lambda a, b: conv.conv2d_down(a, b))(x, w))
        return "reshape" in jaxpr  # s2d packs via pad+reshape; std convs directly

    monkeypatch.setenv("GAN_TPU_DOWN", "auto")
    assert not uses_s2d()
    monkeypatch.setenv("GAN_TPU_DOWN", "std")
    assert not uses_s2d()
    monkeypatch.setenv("GAN_TPU_DOWN", "s2d")
    assert uses_s2d()
    # numerics of the forced path still match
    import numpy as np
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.normal(size=(2, 8, 8, 2)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4, 4, 2, 8)), jnp.float32)
    got = conv.conv2d_down_s2d(x2, w2)
    want = conv.conv2d_same(x2, w2, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bn_cross_replica_wiring(cpu_devices):
    t = Pix2PixTrainer(_cfg(bn_cross_replica="true", batch_size=8,
                            num_devices=8),
                       mesh=make_mesh(8, devices=cpu_devices))
    assert t._bn_axis == "data"
    t1 = Pix2PixTrainer(_cfg(bn_cross_replica="true", num_devices=1),
                        mesh=make_mesh(1, devices=cpu_devices))
    assert t1._bn_axis is None  # single device: per-replica == global
