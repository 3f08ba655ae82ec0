"""TF-checkpoint import tool (tools/import_tf_checkpoint.py): a checkpoint
written the way the reference writes them (tf.train.Checkpoint object graph,
pix2pix.py:400-403 / cycle_gan.py:437-444) round-trips into a gan_tpu Orbax
checkpoint whose predict-mode output matches the TF model's forward."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from gan_tpu.config import CycleGANConfig, Pix2PixConfig  # noqa: E402
from gan_tpu.parallel.mesh import make_mesh  # noqa: E402
from gan_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from tools import import_tf_checkpoint as itc  # noqa: E402

tf.config.set_visible_devices([], "GPU")
REF = "/root/reference"


def _zero_dropout(model):
    for layer in model.layers:
        if isinstance(layer, tf.keras.Sequential):
            for sub in layer.layers:
                if isinstance(sub, tf.keras.layers.Dropout):
                    sub.rate = 0.0


@pytest.mark.slow
def test_pix2pix_import_serves_reference_weights(tmp_path, monkeypatch):
    monkeypatch.delenv("GAN_TPU_ALLOW_ANY_SIZE", raising=False)
    ref = itc.load_reference_modules(REF)
    tf.keras.utils.set_random_seed(0)
    model = ref["ref_pix2pix"].Pix2Pix(itc._ref_config(256, "1"))

    # save exactly as the reference's main does (pix2pix.py:400-420)
    ckpt = tf.train.Checkpoint(
        generator_optimizer=model.generator_optimizer,
        discriminator_optimizer=model.discriminator_optimizer,
        generator=model.generator, discriminator=model.discriminator)
    tf_dir = str(tmp_path / "run" / "training_checkpoints")
    tf.train.CheckpointManager(ckpt, tf_dir, max_to_keep=1).save()

    out = str(tmp_path / "imported")
    itc.main(["--model", "pix2pix", "--weights", str(tmp_path / "run"),
              "--output", out, "--img-size", "256", "--channels", "1"])

    # predict-mode path: restore like pix2pix.py --predict does
    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer
    cfg = Pix2PixConfig(data="", output="", img_size=256, train=True,
                        epochs=1, dtype="fp32", num_devices=1)
    cfg.validate()
    trainer = Pix2PixTrainer(cfg, mesh=make_mesh(1))
    mgr = CheckpointManager(out)
    trainer.load_state(mgr.restore(trainer.state()))
    mgr.close()

    _zero_dropout(model.generator)  # dropout streams can't match; zero both
    x = np.random.default_rng(0).uniform(-1, 1, (1, 256, 256, 1)).astype(np.float32)
    want = model.generator(tf.constant(x), training=True).numpy()
    got = trainer.gen.apply(trainer.params["gen"], x, rng=None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_cyclegan_import_serves_reference_weights(tmp_path, monkeypatch):
    monkeypatch.delenv("GAN_TPU_ALLOW_ANY_SIZE", raising=False)
    ref = itc.load_reference_modules(REF)
    tf.keras.utils.set_random_seed(1)
    model = ref["ref_cycle_gan"].CycleGAN(itc._ref_config(256, "1"))

    ckpt = tf.train.Checkpoint(
        generator_g=model.generator_g, generator_f=model.generator_f,
        discriminator_x=model.discriminator_x,
        discriminator_y=model.discriminator_y,
        generator_g_optimizer=model.generator_g_optimizer,
        generator_f_optimizer=model.generator_f_optimizer,
        discriminator_x_optimizer=model.discriminator_x_optimizer,
        discriminator_y_optimizer=model.discriminator_y_optimizer)
    tf_dir = str(tmp_path / "run" / "training_checkpoints")
    tf.train.CheckpointManager(ckpt, tf_dir, max_to_keep=3).save()

    out = str(tmp_path / "imported")
    itc.main(["--model", "cyclegan", "--weights", tf_dir, "--output", out])

    from gan_tpu.train.cyclegan_trainer import CycleGANTrainer
    cfg = CycleGANConfig(input_images="", output="", img_size=256, train=True,
                         epochs=1, dtype="fp32", num_devices=1)
    cfg.validate()
    trainer = CycleGANTrainer(cfg, mesh=make_mesh(1))
    mgr = CheckpointManager(out)
    trainer.load_state(mgr.restore(trainer.state()))
    mgr.close()

    _zero_dropout(model.generator_g)
    x = np.random.default_rng(1).uniform(-1, 1, (1, 256, 256, 1)).astype(np.float32)
    # predict mode uses generator_g only (cycle_gan.py:360-376)
    want = model.generator_g(tf.constant(x), training=True).numpy()
    got = trainer.gen.apply(trainer.params["gen_g"], x, rng=None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
