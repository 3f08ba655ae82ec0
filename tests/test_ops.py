"""Golden tests for compute primitives vs torch (CPU) and math properties.

The reference delegates these ops to TF's C++/cuDNN kernels (SURVEY §2.9);
torch's conv2d/conv_transpose2d with stride 2, padding 1 is numerically
identical to TF's 'same' convs at even sizes, giving an independent oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from gan_tpu.ops.conv import conv2d_down, conv2d_transpose_up, conv2d_valid
from gan_tpu.ops.loss_ops import bce_with_logits, l1_loss
from gan_tpu.ops.norm import batch_norm, instance_norm
from gan_tpu.ops.resize import resize_nearest, resize_nearest_np
from gan_tpu.ops.ssim import ssim

RNG = np.random.default_rng(42)


def _nhwc_to_torch(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2)


class TestConv:
    def test_conv_down_matches_torch(self):
        x = RNG.standard_normal((2, 16, 16, 3), dtype=np.float32)
        w = RNG.standard_normal((4, 4, 3, 8), dtype=np.float32) * 0.02
        got = np.asarray(conv2d_down(jnp.asarray(x), jnp.asarray(w)))
        want = F.conv2d(_nhwc_to_torch(x), torch.from_numpy(w).permute(3, 2, 0, 1),
                        stride=2, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_conv_transpose_matches_torch(self):
        x = RNG.standard_normal((2, 16, 16, 3), dtype=np.float32)
        w_tf = RNG.standard_normal((4, 4, 8, 3), dtype=np.float32) * 0.02
        got = np.asarray(conv2d_transpose_up(jnp.asarray(x), jnp.asarray(w_tf)))
        assert got.shape == (2, 32, 32, 8)
        want = F.conv_transpose2d(_nhwc_to_torch(x),
                                  torch.from_numpy(w_tf).permute(3, 2, 0, 1),
                                  stride=2, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_conv_transpose_bottleneck_1x1(self):
        # U-Net bottleneck 1x1 -> 2x2 (base_gan.py:191)
        x = RNG.standard_normal((1, 1, 1, 8), dtype=np.float32)
        w = RNG.standard_normal((4, 4, 4, 8), dtype=np.float32)
        got = np.asarray(conv2d_transpose_up(jnp.asarray(x), jnp.asarray(w)))
        assert got.shape == (1, 2, 2, 4)
        want = F.conv_transpose2d(_nhwc_to_torch(x), torch.from_numpy(w).permute(3, 2, 0, 1),
                                  stride=2, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_transpose_is_exact_adjoint(self):
        # TF Conv2DTranspose('same', s2) IS the gradient of Conv2D('same', s2):
        # <conv(x, V), y> == <x, convT(y, V)> with V reinterpreted (k,k,O,I).
        x = RNG.standard_normal((2, 16, 16, 3), dtype=np.float32)
        v = RNG.standard_normal((4, 4, 3, 8), dtype=np.float32)
        y = RNG.standard_normal((2, 8, 8, 8), dtype=np.float32)
        lhs = float(jnp.vdot(conv2d_down(jnp.asarray(x), jnp.asarray(v)), jnp.asarray(y)))
        rhs = float(jnp.vdot(jnp.asarray(x),
                             conv2d_transpose_up(jnp.asarray(y), jnp.asarray(v))))
        assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs))

    def test_conv_valid(self):
        # PatchGAN zero-pad + valid conv: 34 -> 31 (base_gan.py:145-148)
        x = RNG.standard_normal((1, 34, 34, 4), dtype=np.float32)
        w = RNG.standard_normal((4, 4, 4, 8), dtype=np.float32)
        got = np.asarray(conv2d_valid(jnp.asarray(x), jnp.asarray(w)))
        assert got.shape == (1, 31, 31, 8)
        want = F.conv2d(_nhwc_to_torch(x), torch.from_numpy(w).permute(3, 2, 0, 1),
                        stride=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_bf16_compute_dtype(self):
        x = RNG.standard_normal((1, 8, 8, 4), dtype=np.float32)
        w = RNG.standard_normal((4, 4, 4, 8), dtype=np.float32) * 0.02
        out = conv2d_down(jnp.asarray(x), jnp.asarray(w), compute_dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16

    def test_conv_down_s2d_matches_std(self):
        # space-to-depth stem rewrite: value AND grad parity vs conv2d_same
        from gan_tpu.ops.conv import conv2d_down_s2d, conv2d_same
        for h, ci, co in [(8, 1, 16), (16, 2, 8), (8, 3, 4), (12, 4, 8)]:
            x = jnp.asarray(RNG.standard_normal((2, h, h, ci), dtype=np.float32))
            w = jnp.asarray(RNG.standard_normal((4, 4, ci, co), dtype=np.float32))
            a = conv2d_same(x, w, 2)
            b = conv2d_down_s2d(x, w)
            assert b.shape == a.shape == (2, h // 2, h // 2, co)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)
            f1 = lambda x, w: jnp.sum(conv2d_same(x, w, 2) ** 2)
            f2 = lambda x, w: jnp.sum(conv2d_down_s2d(x, w) ** 2)
            g1 = jax.grad(f1, argnums=(0, 1))(x, w)
            g2 = jax.grad(f2, argnums=(0, 1))(x, w)
            for ga, gb in zip(g1, g2):
                np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                           rtol=2e-4, atol=2e-4)

    def test_conv_down_s2d_env_dispatch(self, monkeypatch):
        # GAN_TPU_DOWN=s2d routes small-C_in even-size convs through the
        # rewrite; odd sizes and wide C_in always fall back to the std path
        x = jnp.asarray(RNG.standard_normal((1, 8, 8, 1), dtype=np.float32))
        w = jnp.asarray(RNG.standard_normal((4, 4, 1, 8), dtype=np.float32))
        base = np.asarray(conv2d_down(x, w))
        monkeypatch.setenv("GAN_TPU_DOWN", "s2d")
        np.testing.assert_allclose(np.asarray(conv2d_down(x, w)), base,
                                   rtol=1e-5, atol=1e-5)
        x_odd = jnp.asarray(RNG.standard_normal((1, 7, 7, 1), dtype=np.float32))
        w1 = jnp.asarray(RNG.standard_normal((4, 4, 1, 4), dtype=np.float32))
        assert conv2d_down(x_odd, w1).shape == (1, 4, 4, 4)  # std fallback


class TestLosses:
    def test_bce_matches_torch(self):
        logits = RNG.standard_normal((2, 30, 30, 1), dtype=np.float32)
        for labels in (np.ones_like(logits), np.zeros_like(logits)):
            mine = float(bce_with_logits(jnp.asarray(labels), jnp.asarray(logits)))
            want = float(F.binary_cross_entropy_with_logits(
                torch.from_numpy(logits), torch.from_numpy(labels)))
            assert abs(mine - want) < 1e-6

    def test_bce_extreme_logits_stable(self):
        logits = jnp.asarray([[-1e4, 1e4]], jnp.float32)
        v = bce_with_logits(jnp.ones_like(logits), logits)
        assert np.isfinite(float(v))

    def test_l1(self):
        a = jnp.asarray([[1.0, -2.0]])
        b = jnp.asarray([[0.0, 2.0]])
        assert abs(float(l1_loss(a, b)) - 2.5) < 1e-7


class TestNorm:
    def test_batch_norm_matches_torch(self):
        x = RNG.standard_normal((4, 8, 8, 6), dtype=np.float32)
        gamma = RNG.standard_normal(6).astype(np.float32)
        beta = RNG.standard_normal(6).astype(np.float32)
        got = np.asarray(batch_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
        want = F.batch_norm(_nhwc_to_torch(x), None, None,
                            torch.from_numpy(gamma), torch.from_numpy(beta),
                            training=True, eps=1e-3).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_instance_norm_matches_torch(self):
        x = RNG.standard_normal((4, 8, 8, 6), dtype=np.float32)
        scale = RNG.standard_normal(6).astype(np.float32)
        offset = RNG.standard_normal(6).astype(np.float32)
        got = np.asarray(instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(offset)))
        want = F.instance_norm(_nhwc_to_torch(x), weight=torch.from_numpy(scale),
                               bias=torch.from_numpy(offset),
                               eps=1e-5).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestResize:
    def test_tf2_half_pixel_nearest_indices(self):
        # TF2 nearest (half-pixel centers): src = floor((i+0.5)*in/out)
        img = np.arange(6, dtype=np.float32).reshape(1, 1, 6, 1)
        out = resize_nearest_np(img, 1, 4)
        np.testing.assert_array_equal(out.ravel(), [0, 2, 3, 5])
        up = resize_nearest_np(img, 1, 12)
        np.testing.assert_array_equal(up.ravel(), [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5])

    def test_jnp_matches_np(self):
        img = RNG.standard_normal((2, 50, 70, 3), dtype=np.float32)
        got = np.asarray(resize_nearest(jnp.asarray(img), 286, 286))
        want = resize_nearest_np(img, 286, 286)
        np.testing.assert_array_equal(got, want)

    def test_identity(self):
        img = RNG.standard_normal((2, 8, 8, 1), dtype=np.float32)
        np.testing.assert_array_equal(np.asarray(resize_nearest(jnp.asarray(img), 8, 8)), img)


class TestSSIM:
    def test_self_similarity_is_one(self):
        x = jnp.asarray(RNG.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
        v = ssim(x, x, max_val=2.0)
        np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-5)

    def test_symmetry_and_range(self):
        a = jnp.asarray(RNG.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
        b = jnp.asarray(RNG.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
        s1, s2 = float(ssim(a, b, max_val=2.0)[0]), float(ssim(b, a, max_val=2.0)[0])
        assert abs(s1 - s2) < 1e-6
        assert -1.0 <= s1 <= 1.0

    def test_mean_shift_reduces_ssim(self):
        a = jnp.asarray(RNG.uniform(-0.5, 0.5, (1, 32, 32, 1)).astype(np.float32))
        shifted = a + 0.5
        assert float(ssim(a, shifted, max_val=2.0)[0]) < 0.99


def test_conv_transpose_phased_matches_dilated():
    """The phase-decomposed (sub-pixel) transposed conv is numerically the
    lhs-dilated form, values AND gradients (ops/conv.py — GAN_TPU_CONVT)."""
    import jax
    import jax.numpy as jnp
    from gan_tpu.ops.conv import (conv2d_transpose_up,
                                  conv2d_transpose_up_phased)

    rng = np.random.default_rng(0)
    for h, ci, co in [(8, 16, 8), (5, 3, 7)]:
        x = jnp.asarray(rng.standard_normal((2, h, h, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((4, 4, co, ci)), jnp.float32)
        a = conv2d_transpose_up(x, w)
        b = conv2d_transpose_up_phased(x, w)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    f1 = lambda x, w: jnp.sum(conv2d_transpose_up(x, w) ** 2)
    f2 = lambda x, w: jnp.sum(conv2d_transpose_up_phased(x, w) ** 2)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 5, 4)), jnp.float32)
    for a, b in zip(jax.grad(f1, (0, 1))(x, w), jax.grad(f2, (0, 1))(x, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
