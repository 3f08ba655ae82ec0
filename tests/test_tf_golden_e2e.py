"""End-to-end golden parity against the ACTUAL reference implementation.

The reference at /root/reference is imported as the oracle (TF is installed
in the dev environment): its real ``Pix2Pix.train_step`` (pix2pix.py:190-218)
and ``CycleGAN.train_step`` (cycle_gan.py:206-276) run several optimizer
steps on fixed data, its TF-initialized weights are transplanted into
gan_tpu's pytrees (conv layouts match by construction — ops/conv.py), and the
per-step loss tuples must agree within fp32 tolerance. This proves the
headline loss/gradient-parity claim end to end, not just per primitive
(tests/test_tf_golden.py).

Dropout is the one stream that cannot match across frameworks, so it is
neutralized on BOTH sides (TF Dropout.rate = 0; our dropout rng=None /
DROP_RATE = 0) — every other source of randomness is removed by fixing the
inputs and transplanting weights.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gan_tpu.config import CycleGANConfig, Pix2PixConfig  # noqa: E402
from gan_tpu.parallel.mesh import make_mesh  # noqa: E402
# transplant/loader wiring lives in the import tool (single source of truth
# — it is also the user-facing TF-checkpoint importer)
from tools.import_tf_checkpoint import (  # noqa: E402
    load_reference_modules,
    transplant_discriminator as _transplant_discriminator,
    transplant_generator as _transplant_generator,
)

tf.config.set_visible_devices([], "GPU")

REF = "/root/reference"
STEPS = 3


@pytest.fixture(scope="module")
def ref():
    """Load the reference modules without polluting ``pix2pix`` (the repo's
    own CLI shares the module name)."""
    return load_reference_modules(REF)


def _zero_dropout(model):
    for layer in model.layers:
        if isinstance(layer, tf.keras.Sequential):
            for sub in layer.layers:
                if isinstance(sub, tf.keras.layers.Dropout):
                    sub.rate = 0.0


def test_pix2pix_train_steps_match_reference(ref, monkeypatch):
    """3 real optimizer steps: reference TF Pix2Pix vs gan_tpu on transplanted
    weights and fixed data — per-step (total, gan, l1, disc) losses agree."""
    monkeypatch.delenv("GAN_TPU_ALLOW_ANY_SIZE", raising=False)
    config = {"img_size": 256, "channels": "1", "learning_rate": 2e-4,
              "beta_1": 0.5, "beta_2": 0.999, "generator_loss": "l1",
              "lambda": 100}
    tf.keras.utils.set_random_seed(0)
    ref_model = ref["ref_pix2pix"].Pix2Pix(dict(config))
    _zero_dropout(ref_model.generator)

    from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer
    cfg = Pix2PixConfig(data="", output="", img_size=256, batch_size=2,
                        train=True, epochs=1, dtype="fp32", num_devices=1,
                        lam=100, generator_loss="l1")
    cfg.validate()
    trainer = Pix2PixTrainer(cfg, mesh=make_mesh(1))
    params = {"gen": _transplant_generator(ref_model.generator, "batch"),
              "disc": _transplant_discriminator(ref_model.discriminator, "batch")}
    opt_states = {"gen": trainer.tx_gen.init(params["gen"]),
                  "disc": trainer.tx_disc.init(params["disc"])}

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 256, 256, 1)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 256, 256, 1)).astype(np.float32)

    # rng=None → our dropout off; TF rates zeroed above
    step = jax.jit(lambda p, o: trainer._train_step(p, o, (jnp.asarray(x),
                                                           jnp.asarray(y)), None))
    for s in range(STEPS):
        tf_losses = [float(t) for t in ref_model.train_step(
            tf.constant(x), tf.constant(y), True)]
        params, opt_states, losses = step(params, opt_states)
        losses = np.asarray(losses, np.float64)
        np.testing.assert_allclose(
            losses, tf_losses, rtol=2e-3, atol=2e-4,
            err_msg=f"step {s}: jax {losses} vs tf {tf_losses}")


def test_cyclegan_train_steps_match_reference(ref, monkeypatch):
    """3 real optimizer steps of the full CycleGAN system (2 gens, 2 discs,
    4 Adams): the fused single-backward sg-partitioned step must track the
    reference's four persistent-tape gradients through actual updates."""
    monkeypatch.delenv("GAN_TPU_ALLOW_ANY_SIZE", raising=False)
    import gan_tpu.models.blocks as blocks
    monkeypatch.setattr(blocks, "DROP_RATE", 0.0)

    config = {"img_size": 256, "channels": "1", "learning_rate": 2e-4,
              "beta_1": 0.5, "beta_2": 0.999, "lambda": 10}
    tf.keras.utils.set_random_seed(0)
    ref_model = ref["ref_cycle_gan"].CycleGAN(dict(config))
    for g in (ref_model.generator_g, ref_model.generator_f):
        _zero_dropout(g)

    from gan_tpu.train.cyclegan_trainer import CycleGANTrainer
    cfg = CycleGANConfig(input_images="", target_images="", output="",
                         img_size=256, batch_size=1, train=True, epochs=1,
                         dtype="fp32", num_devices=1, lam=10)
    cfg.validate()
    trainer = CycleGANTrainer(cfg, mesh=make_mesh(1))
    params = {
        "gen_g": _transplant_generator(ref_model.generator_g, "instance"),
        "gen_f": _transplant_generator(ref_model.generator_f, "instance"),
        "disc_x": _transplant_discriminator(ref_model.discriminator_x, "instance"),
        "disc_y": _transplant_discriminator(ref_model.discriminator_y, "instance"),
    }
    opt_states = {k: trainer.tx.init(params[k]) for k in params}

    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (1, 256, 256, 1)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, 256, 256, 1)).astype(np.float32)

    key = jax.random.PRNGKey(0)  # only feeds zero-rate dropout
    step = jax.jit(lambda p, o: trainer._train_step(
        p, o, (jnp.asarray(x), jnp.asarray(y)), key))
    for s in range(STEPS):
        tf_losses = [float(t) for t in ref_model.train_step(
            tf.constant(x), tf.constant(y), True)]
        params, opt_states, losses = step(params, opt_states)
        losses = np.asarray(losses, np.float64)
        np.testing.assert_allclose(
            losses, tf_losses, rtol=2e-3, atol=2e-4,
            err_msg=f"step {s}: jax {losses} vs tf {tf_losses}")
