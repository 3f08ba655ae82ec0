"""Loss semantics + the fused-backward gradient partitioning.

The make-or-break property: the trainers compute ONE backward over a combined
scalar with stop-gradient partitioning (losses.sg_tree) and must produce
exactly the gradients the reference's independent GradientTapes produce
(pix2pix.py:199-218, cycle_gan.py:250-262). Verified here against explicit
per-loss jax.grad calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_tpu import losses as L
from gan_tpu.config import CycleGANConfig, Pix2PixConfig
from gan_tpu.train.cyclegan_trainer import CycleGANTrainer
from gan_tpu.train.pix2pix_trainer import Pix2PixTrainer


def test_discriminator_loss_value():
    real = jnp.full((2, 3, 3, 1), 2.0)
    gen = jnp.full((2, 3, 3, 1), -1.0)
    # BCE(1, 2.0) = softplus(-2); BCE(0, -1) = softplus(-1)
    expect = 0.5 * (np.log1p(np.exp(-2.0)) + np.log1p(np.exp(-1.0)))
    got = L.discriminator_loss(real, gen, 0.5)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_pix2pix_generator_loss_l1():
    logits = jnp.zeros((1, 2, 2, 1))
    gen = jnp.zeros((1, 4, 4, 1))
    tar = jnp.ones((1, 4, 4, 1))
    total, gan, sec = L.pix2pix_generator_loss(logits, gen, tar, lam=100.0, kind="l1")
    np.testing.assert_allclose(gan, np.log(2.0), rtol=1e-6)  # BCE(1, 0)
    np.testing.assert_allclose(sec, 1.0, rtol=1e-6)
    np.testing.assert_allclose(total, np.log(2.0) + 100.0, rtol=1e-5)


def test_cycle_identity_losses():
    a = jnp.zeros((1, 4, 4, 1))
    b = jnp.full((1, 4, 4, 1), 0.5)
    np.testing.assert_allclose(L.cycle_loss(a, b, 10.0), 5.0, rtol=1e-6)
    np.testing.assert_allclose(L.identity_loss(a, b, 10.0), 2.5, rtol=1e-6)


@pytest.fixture(scope="module")
def p2p_trainer():
    cfg = Pix2PixConfig(data="x", output="y", img_size=32, batch_size=2,
                        train=True, epochs=1, dtype="fp32", num_devices=1)
    cfg.validate()
    return Pix2PixTrainer(cfg)


def test_pix2pix_fused_backward_matches_per_tape(p2p_trainer):
    """∂combined/∂θ_G ≡ ∂gen_total/∂θ_G and ∂combined/∂θ_D ≡ ∂disc_loss/∂θ_D."""
    t = p2p_trainer
    key = jax.random.PRNGKey(0)
    kx, ky, kd = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (2, 32, 32, 1), minval=-1, maxval=1)
    y = jax.random.uniform(ky, (2, 32, 32, 1), minval=-1, maxval=1)

    fused = jax.grad(t._losses, has_aux=True)(t.params, x, y, kd)[0]

    # reference semantics: independent tapes
    def gen_total_only(gen_params):
        fake = t.gen.apply(gen_params, x, rng=kd, compute_dtype=jnp.float32)
        d_gen = t.disc.apply(t.params["disc"], x, fake, compute_dtype=jnp.float32)
        total, _, _ = L.pix2pix_generator_loss(d_gen, fake, y, lam=100.0, kind="l1")
        return total

    def disc_only(disc_params):
        fake = t.gen.apply(t.params["gen"], x, rng=kd, compute_dtype=jnp.float32)
        d_real = t.disc.apply(disc_params, x, y, compute_dtype=jnp.float32)
        d_fake = t.disc.apply(disc_params, x, fake, compute_dtype=jnp.float32)
        return L.discriminator_loss(d_real, d_fake, 0.5)

    ref_gen = jax.grad(gen_total_only)(t.params["gen"])
    ref_disc = jax.grad(disc_only)(t.params["disc"])

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        fused["gen"], ref_gen)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        fused["disc"], ref_disc)


def test_cyclegan_fused_backward_matches_per_tape():
    """All four gradient sets from the combined scalar match the reference's
    persistent-tape per-loss gradients (cycle_gan.py:250-262), including the
    cycle loss feeding both generators. The per-tape oracle here uses the
    SAME batched-pass forwards (and keys) as the trainer so dropout draws
    line up; batched ≡ unbatched primals are covered separately below."""
    cfg = CycleGANConfig(input_images="x", output="y", img_size=32, batch_size=1,
                         train=True, epochs=1, dtype="fp32", num_devices=1)
    cfg.validate()
    t = CycleGANTrainer(cfg)
    key = jax.random.PRNGKey(1)
    kx, ky, kd = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (1, 32, 32, 1), minval=-1, maxval=1)
    y = jax.random.uniform(ky, (1, 32, 32, 1), minval=-1, maxval=1)
    lam = float(cfg.lam)

    fused = jax.grad(t._losses, has_aux=True)(t.params, x, y, kd)[0]

    k1, k2, k3 = jax.random.split(kd, 3)
    P = t.params

    def forwards(gp, fp):
        def G(p, imgs, k):
            out = t.gen.apply(p, jnp.concatenate(imgs, axis=0), rng=k,
                              compute_dtype=jnp.float32)
            parts, lo = [], 0
            for im in imgs:
                parts.append(out[lo:lo + im.shape[0]])
                lo += im.shape[0]
            return parts

        fake_y, same_y = G(gp, (x, y), k1)
        cycled_x, fake_x, same_x = G(fp, (fake_y, y, x), k2)
        (cycled_y,) = G(gp, (fake_x,), k3)
        return fake_y, cycled_x, fake_x, cycled_y, same_x, same_y

    # the trainer runs each discriminator's real+fake applications as ONE
    # concatenated pass (_disc_pass); the oracle mirrors that exactly so
    # forward arithmetic is bit-identical and only the gradient
    # partitioning (fused single backward vs four per-loss tapes) differs
    def D2(p, real, fake):
        out = t.disc.apply(p, jnp.concatenate([real, fake], axis=0),
                           compute_dtype=jnp.float32)
        return out[: real.shape[0]], out[real.shape[0]:]

    def total_gen_g(gp):
        fake_y, cycled_x, fake_x, cycled_y, _, same_y = forwards(gp, P["gen_f"])
        adv = L.generator_adversarial_loss(D2(P["disc_y"], y, fake_y)[1])
        cyc = L.cycle_loss(x, cycled_x, lam) + L.cycle_loss(y, cycled_y, lam)
        return adv + cyc + L.identity_loss(y, same_y, lam)

    def total_gen_f(fp):
        fake_y, cycled_x, fake_x, cycled_y, same_x, _ = forwards(P["gen_g"], fp)
        adv = L.generator_adversarial_loss(D2(P["disc_x"], x, fake_x)[1])
        cyc = L.cycle_loss(x, cycled_x, lam) + L.cycle_loss(y, cycled_y, lam)
        return adv + cyc + L.identity_loss(x, same_x, lam)

    def disc_x_loss(dxp):
        _, _, fake_x, _, _, _ = forwards(P["gen_g"], P["gen_f"])
        return L.discriminator_loss(*D2(dxp, x, fake_x), 0.5)

    def disc_y_loss(dyp):
        fake_y = forwards(P["gen_g"], P["gen_f"])[0]
        return L.discriminator_loss(*D2(dyp, y, fake_y), 0.5)

    refs = {"gen_g": jax.grad(total_gen_g)(P["gen_g"]),
            "gen_f": jax.grad(total_gen_f)(P["gen_f"]),
            "disc_x": jax.grad(disc_x_loss)(P["disc_x"]),
            "disc_y": jax.grad(disc_y_loss)(P["disc_y"])}
    for name, ref in refs.items():
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            fused[name], ref)


def test_cyclegan_unbatched_fused_backward_matches_per_tape():
    """Same property for the large-batch (per-application) forward
    structure, forced via BATCHED_PASS_MAX."""
    cfg = CycleGANConfig(input_images="x", output="y", img_size=32, batch_size=1,
                         train=True, epochs=1, dtype="fp32", num_devices=1)
    cfg.validate()
    t = CycleGANTrainer(cfg)
    t.BATCHED_PASS_MAX = -1  # instance attr shadows the class constant
    key = jax.random.PRNGKey(2)
    kx, ky, kd = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (1, 32, 32, 1), minval=-1, maxval=1)
    y = jax.random.uniform(ky, (1, 32, 32, 1), minval=-1, maxval=1)
    lam = float(cfg.lam)

    fused = jax.grad(t._losses, has_aux=True)(t.params, x, y, kd)[0]

    k_fy, k_cx, k_fx, k_cy, k_sx, k_sy = jax.random.split(kd, 6)
    P = t.params

    def forwards(gp, fp):
        G = lambda p, i, k: t.gen.apply(p, i, rng=k, compute_dtype=jnp.float32)
        fake_y = G(gp, x, k_fy)
        cycled_x = G(fp, fake_y, k_cx)
        fake_x = G(fp, y, k_fx)
        cycled_y = G(gp, fake_x, k_cy)
        same_x = G(fp, x, k_sx)
        same_y = G(gp, y, k_sy)
        return fake_y, cycled_x, fake_x, cycled_y, same_x, same_y

    D = lambda p, i: t.disc.apply(p, i, compute_dtype=jnp.float32)

    def total_gen_g(gp):
        fake_y, cycled_x, fake_x, cycled_y, _, same_y = forwards(gp, P["gen_f"])
        adv = L.generator_adversarial_loss(D(P["disc_y"], fake_y))
        cyc = L.cycle_loss(x, cycled_x, lam) + L.cycle_loss(y, cycled_y, lam)
        return adv + cyc + L.identity_loss(y, same_y, lam)

    def total_gen_f(fp):
        fake_y, cycled_x, fake_x, cycled_y, same_x, _ = forwards(P["gen_g"], fp)
        adv = L.generator_adversarial_loss(D(P["disc_x"], fake_x))
        cyc = L.cycle_loss(x, cycled_x, lam) + L.cycle_loss(y, cycled_y, lam)
        return adv + cyc + L.identity_loss(x, same_x, lam)

    def disc_x_loss(dxp):
        fake_x = forwards(P["gen_g"], P["gen_f"])[2]
        return L.discriminator_loss(D(dxp, x), D(dxp, fake_x), 0.5)

    def disc_y_loss(dyp):
        fake_y = forwards(P["gen_g"], P["gen_f"])[0]
        return L.discriminator_loss(D(dyp, y), D(dyp, fake_y), 0.5)

    refs = {"gen_g": jax.grad(total_gen_g)(P["gen_g"]),
            "gen_f": jax.grad(total_gen_f)(P["gen_f"]),
            "disc_x": jax.grad(disc_x_loss)(P["disc_x"]),
            "disc_y": jax.grad(disc_y_loss)(P["disc_y"])}
    for name, ref in refs.items():
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            fused[name], ref)


def test_cyclegan_batched_passes_match_unbatched_primals(monkeypatch):
    """With dropout disabled (the only per-call RNG), the three batched
    U-Net passes produce exactly the reference's six per-image forwards —
    instance norm is per-sample, so concatenation cannot couple samples."""
    import gan_tpu.models.blocks as blocks
    monkeypatch.setattr(blocks, "DROP_RATE", 0.0)

    cfg = CycleGANConfig(input_images="x", output="y", img_size=32, batch_size=2,
                         train=True, epochs=1, dtype="fp32", num_devices=1)
    cfg.validate()
    t = CycleGANTrainer(cfg)
    key = jax.random.PRNGKey(5)
    kx, ky, kd = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (2, 32, 32, 1), minval=-1, maxval=1)
    y = jax.random.uniform(ky, (2, 32, 32, 1), minval=-1, maxval=1)
    lam = float(cfg.lam)
    P = t.params

    _, losses = t._losses(P, x, y, kd)

    # reference-structured unbatched forwards (keys irrelevant at rate 0)
    G = lambda p, i: t.gen.apply(p, i, rng=kd, compute_dtype=jnp.float32)
    D = lambda p, i: t.disc.apply(p, i, compute_dtype=jnp.float32)
    fake_y = G(P["gen_g"], x)
    cycled_x = G(P["gen_f"], fake_y)
    fake_x = G(P["gen_f"], y)
    cycled_y = G(P["gen_g"], fake_x)
    same_x = G(P["gen_f"], x)
    same_y = G(P["gen_g"], y)
    adv_g = L.generator_adversarial_loss(D(P["disc_y"], fake_y))
    adv_f = L.generator_adversarial_loss(D(P["disc_x"], fake_x))
    cyc = L.cycle_loss(x, cycled_x, lam) + L.cycle_loss(y, cycled_y, lam)
    want = np.array([
        adv_g, adv_f, cyc,
        adv_g + cyc + L.identity_loss(y, same_y, lam),
        adv_f + cyc + L.identity_loss(x, same_x, lam),
        L.discriminator_loss(D(P["disc_x"], x), D(P["disc_x"], fake_x), 0.5),
        L.discriminator_loss(D(P["disc_y"], y), D(P["disc_y"], fake_y), 0.5),
    ])
    np.testing.assert_allclose(np.asarray(losses), want, rtol=1e-5, atol=1e-6)


def test_pix2pix_ssim_mode_trains(p2p_trainer):
    """--generator-loss ssim uses the CORRECTED loss 1−SSIM(G(x), y)
    (the reference's version is broken — SURVEY §2.10-Q1): finite losses and
    a nonzero secondary-loss gradient through the generator."""
    import dataclasses
    t_ssim = Pix2PixTrainer(
        dataclasses.replace(p2p_trainer.config, generator_loss="ssim"))
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (2, 32, 32, 1), minval=-1, maxval=1)
    y = -x
    combined, losses = t_ssim._losses(t_ssim.params, x, y, key)
    assert np.isfinite(float(combined))
    secondary = float(losses[2])
    assert 0.0 < secondary <= 2.0  # 1 - ssim ∈ (0, 2]
    grads, _ = jax.grad(t_ssim._losses, has_aux=True)(t_ssim.params, x, y, key)
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads["gen"]))
    assert gnorm > 0.0


def test_loss_keys_match_reference():
    assert L.PIX2PIX_LOSS_KEYS == ("Generator Total Loss", "Generator Loss (Primary)",
                                   "Generator Loss (Secondary)", "Discriminator Loss")
    assert L.CYCLEGAN_LOSS_KEYS[0] == "X->Y Generator Loss"
    assert len(L.CYCLEGAN_LOSS_KEYS) == 7
