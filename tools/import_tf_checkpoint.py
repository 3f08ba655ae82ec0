#!/usr/bin/env python3
"""Import a TF-reference checkpoint into a gan_tpu (Orbax) checkpoint.

Models trained by the original TF implementation (tf.train.Checkpoint dirs
written by /root/reference/pix2pix.py:400-420 / cycle_gan.py:437-461) become
directly servable (``--predict --weights``) and fine-tunable (``--resume``)
by the gan_tpu CLIs:

    python tools/import_tf_checkpoint.py --model pix2pix \
        --weights <run>/training_checkpoints --output imported_ckpt \
        --img-size 256 --channels 1
    python pix2pix.py --data D --output O --predict --weights imported_ckpt ...

Requires tensorflow plus a checkout of the reference repo (``--reference``,
default $GAN_REFERENCE_DIR or /root/reference) to rebuild the Keras models
the checkpoint restores into — the reference stores weights keyed by its own
object graph, so its classes must exist to decode them.

Weight-layout mapping: gan_tpu's conv kernels deliberately use TF layouts
(HWIO forward, (k,k,C_out,C_in) transposed — ops/conv.py docstring), so the
transplant is a re-keying, not a transform. Optimizer slots are NOT imported
(the reference itself restores with ``expect_partial()`` ignoring them in
predict mode, pix2pix.py:411); fine-tuning restarts Adam moments fresh.

These transplant functions are also the oracle wiring for
tests/test_tf_golden_e2e.py (imported from here — single source of truth).
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys


def load_reference_modules(ref_dir: str) -> dict:
    """Import the reference's pix2pix/cycle_gan modules from a checkout
    without polluting ``pix2pix`` (the repo's own CLI shares the name)."""
    sys.path.insert(0, ref_dir)
    try:
        mods = {}
        for name, fname in (("ref_pix2pix", "pix2pix.py"),
                            ("ref_cycle_gan", "cycle_gan.py")):
            spec = importlib.util.spec_from_file_location(
                name, os.path.join(ref_dir, fname))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            mods[name] = mod
    finally:
        sys.path.remove(ref_dir)
        for m in ("base_gan", "utils"):
            sys.modules.pop(m, None)
    return mods


def _norm_from_tf(layer, norm: str):
    import jax.numpy as jnp
    if norm == "batch":
        return {"gamma": jnp.asarray(layer.gamma.numpy()),
                "beta": jnp.asarray(layer.beta.numpy())}
    return {"scale": jnp.asarray(layer.scale.numpy()),
            "offset": jnp.asarray(layer.offset.numpy())}


def transplant_generator(tf_gen, norm: str):
    """TF U-Net weights (base_gan.py:168-225) → gan_tpu UNetGenerator pytree
    (depth 8). Sequential i<8 are downsample blocks, the rest upsample; the
    final Conv2DTranspose is the tanh head."""
    import tensorflow as tf
    import jax.numpy as jnp
    seqs = [l for l in tf_gen.layers if isinstance(l, tf.keras.Sequential)]
    assert len(seqs) == 15, len(seqs)
    params = {}
    for i, s in enumerate(seqs[:8]):
        p = {"conv": jnp.asarray(s.layers[0].kernel.numpy())}
        if i != 0:
            p["norm"] = _norm_from_tf(s.layers[1], norm)
        params[f"down_{i}"] = p
    for i, s in enumerate(seqs[8:]):
        params[f"up_{i}"] = {"conv": jnp.asarray(s.layers[0].kernel.numpy()),
                             "norm": _norm_from_tf(s.layers[1], norm)}
    last = [l for l in tf_gen.layers
            if isinstance(l, tf.keras.layers.Conv2DTranspose)][-1]
    params["last"] = {"conv": jnp.asarray(last.kernel.numpy()),
                      "bias": jnp.asarray(last.bias.numpy())}
    return params


def transplant_discriminator(tf_disc, norm: str):
    """TF 70×70 PatchGAN weights (base_gan.py:124-166) → gan_tpu
    PatchGANDiscriminator pytree."""
    import tensorflow as tf
    import jax.numpy as jnp
    seqs = [l for l in tf_disc.layers if isinstance(l, tf.keras.Sequential)]
    assert len(seqs) == 3, len(seqs)
    convs = [l for l in tf_disc.layers if isinstance(l, tf.keras.layers.Conv2D)]
    assert len(convs) == 2, len(convs)
    norm_layers = [l for l in tf_disc.layers
                   if l.__class__.__name__ in ("BatchNormalization",
                                               "InstanceNormalization")]
    assert len(norm_layers) == 1
    params = {}
    for i, s in enumerate(seqs):
        p = {"conv": jnp.asarray(s.layers[0].kernel.numpy())}
        if i != 0:
            p["norm"] = _norm_from_tf(s.layers[1], norm)
        params[f"down_{i}"] = p
    params["conv512"] = jnp.asarray(convs[0].kernel.numpy())
    params["norm512"] = _norm_from_tf(norm_layers[0], norm)
    params["last"] = {"conv": jnp.asarray(convs[1].kernel.numpy()),
                      "bias": jnp.asarray(convs[1].bias.numpy())}
    return params


def _ref_config(img_size: int, channels: str) -> dict:
    return {"img_size": img_size, "channels": channels,
            "learning_rate": 2e-4, "beta_1": 0.5, "beta_2": 0.999,
            "generator_loss": "l1", "lambda": 100}


def import_pix2pix(weights_dir: str, ref_dir: str, img_size: int,
                   channels: str) -> dict:
    """Restore the reference Pix2Pix checkpoint and return gan_tpu params
    {"gen", "disc"}. Raises if no checkpoint is found."""
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    ref = load_reference_modules(ref_dir)
    model = ref["ref_pix2pix"].Pix2Pix(_ref_config(img_size, channels))
    # same object graph as the reference's main (pix2pix.py:400-403)
    ckpt = tf.train.Checkpoint(
        generator_optimizer=model.generator_optimizer,
        discriminator_optimizer=model.discriminator_optimizer,
        generator=model.generator, discriminator=model.discriminator)
    latest = tf.train.latest_checkpoint(weights_dir)
    if latest is None:
        raise FileNotFoundError(f"no TF checkpoint in {weights_dir}")
    ckpt.restore(latest).expect_partial()
    print(f"Restored TF checkpoint {latest}", flush=True)
    return {"gen": transplant_generator(model.generator, "batch"),
            "disc": transplant_discriminator(model.discriminator, "batch")}


def import_cyclegan(weights_dir: str, ref_dir: str, img_size: int,
                    channels: str) -> dict:
    """Restore the reference CycleGAN checkpoint (8-object graph,
    cycle_gan.py:437-444) and return gan_tpu params."""
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    ref = load_reference_modules(ref_dir)
    model = ref["ref_cycle_gan"].CycleGAN(_ref_config(img_size, channels))
    ckpt = tf.train.Checkpoint(
        generator_g=model.generator_g, generator_f=model.generator_f,
        discriminator_x=model.discriminator_x,
        discriminator_y=model.discriminator_y,
        generator_g_optimizer=model.generator_g_optimizer,
        generator_f_optimizer=model.generator_f_optimizer,
        discriminator_x_optimizer=model.discriminator_x_optimizer,
        discriminator_y_optimizer=model.discriminator_y_optimizer)
    latest = tf.train.latest_checkpoint(weights_dir)
    if latest is None:
        raise FileNotFoundError(f"no TF checkpoint in {weights_dir}")
    ckpt.restore(latest).expect_partial()
    print(f"Restored TF checkpoint {latest}", flush=True)
    return {
        "gen_g": transplant_generator(model.generator_g, "instance"),
        "gen_f": transplant_generator(model.generator_f, "instance"),
        "disc_x": transplant_discriminator(model.discriminator_x, "instance"),
        "disc_y": transplant_discriminator(model.discriminator_y, "instance"),
    }


def save_as_gan_tpu(params: dict, model: str, out_dir: str, img_size: int,
                    channels: str, epoch: int = 0) -> None:
    """Wrap imported params in a trainer-shaped state (fresh optimizer
    moments) and save one Orbax step that --weights/--resume can load."""
    from gan_tpu.parallel.mesh import make_mesh
    from gan_tpu.train.checkpoint import CheckpointManager

    mesh = make_mesh(1)
    if model == "pix2pix":
        from gan_tpu.config import Pix2PixConfig
        from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer
        cfg = Pix2PixConfig(data="", output="", img_size=img_size,
                            channels=channels, train=True, epochs=1,
                            num_devices=1)
        trainer = Pix2PixTrainer(cfg, mesh=mesh)
    else:
        from gan_tpu.config import CycleGANConfig
        from gan_tpu.train.cyclegan_trainer import CycleGANTrainer
        cfg = CycleGANConfig(input_images="", output="", img_size=img_size,
                             channels=channels, train=True, epochs=1,
                             num_devices=1)
        trainer = CycleGANTrainer(cfg, mesh=mesh)
    state = trainer.state()
    assert set(state["params"]) == set(params), \
        (set(state["params"]), set(params))
    state["params"] = params
    mgr = CheckpointManager(out_dir)
    mgr.save(epoch, state)
    mgr.close()
    print(f"Saved gan_tpu checkpoint (epoch {epoch}) in {out_dir}", flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("import_tf_checkpoint")
    ap.add_argument("--model", choices=["pix2pix", "cyclegan"], required=True)
    ap.add_argument("--weights", required=True,
                    help="TF training_checkpoints dir (or parent run dir)")
    ap.add_argument("--output", required=True, help="Orbax checkpoint dir to write")
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--channels", type=str, default="1", choices=["1", "3"])
    ap.add_argument("--epoch", type=int, default=0,
                    help="epoch number to record (resume starts here)")
    ap.add_argument("--reference",
                    default=os.environ.get("GAN_REFERENCE_DIR", "/root/reference"),
                    help="checkout of the reference repo (its classes decode "
                         "the checkpoint's object graph)")
    opt = ap.parse_args(argv)

    weights = opt.weights
    cand = os.path.join(weights, "training_checkpoints")
    if os.path.isdir(cand):
        weights = cand
    fn = import_pix2pix if opt.model == "pix2pix" else import_cyclegan
    params = fn(weights, opt.reference, opt.img_size, opt.channels)
    save_as_gan_tpu(params, opt.model, opt.output, opt.img_size, opt.channels,
                    epoch=opt.epoch)


if __name__ == "__main__":
    main()
