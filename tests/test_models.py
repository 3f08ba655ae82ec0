"""Shape / parameter / semantics tests for U-Net and PatchGAN.

Verifies the architecture contract of the reference (base_gan.py:124-225):
output shapes at 256/512 for channels 1 and 3, patch-logit sizes 30²/62²,
N(0, 0.02) initialization, dropout-always-on semantics, parameter counts.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gan_tpu.models import UNetGenerator, PatchGANDiscriminator

KEY = jax.random.PRNGKey(7)


class TestUNet:
    @pytest.mark.parametrize("channels", [1, 3])
    def test_output_shape_256(self, channels):
        g = UNetGenerator(out_channels=channels, depth=8)
        p = g.init(KEY, channels)
        x = jnp.zeros((2, 256, 256, channels))
        y = g.apply(p, x, rng=KEY)
        assert y.shape == (2, 256, 256, channels)
        assert y.dtype == jnp.float32

    def test_output_shape_512(self):
        g = UNetGenerator(out_channels=1, depth=8)
        p = g.init(KEY, 1)
        y = g.apply(p, jnp.zeros((1, 512, 512, 1)), rng=KEY)
        assert y.shape == (1, 512, 512, 1)

    def test_output_in_tanh_range(self):
        g = UNetGenerator(out_channels=1, depth=5)
        p = g.init(KEY, 1)
        x = jax.random.normal(KEY, (2, 32, 32, 1))
        y = g.apply(p, x, rng=KEY)
        assert float(jnp.max(jnp.abs(y))) <= 1.0

    def test_param_count_matches_reference(self):
        # TF reference U-Net at C=1 has ~54.4M params (SURVEY §2.7)
        g = UNetGenerator(out_channels=1, depth=8)
        p = g.init(KEY, 1)
        n = sum(v.size for v in jax.tree.leaves(p))
        assert n == 54_408_833

    def test_init_stddev(self):
        g = UNetGenerator(out_channels=1, depth=8)
        p = g.init(KEY, 1)
        w = p["down_3"]["conv"]
        assert abs(float(jnp.std(w)) - 0.02) < 0.002
        assert abs(float(jnp.mean(w))) < 0.002
        # instance-norm scale init N(1, 0.02) (utils.py:17)
        gi = UNetGenerator(out_channels=1, depth=8, norm="instance")
        pi = gi.init(KEY, 1)
        s = pi["down_3"]["norm"]["scale"]
        assert abs(float(jnp.mean(s)) - 1.0) < 0.01

    def test_dropout_active_with_rng(self):
        # reference runs dropout in *all* modes (SURVEY §2.10 Q2/Q3)
        g = UNetGenerator(out_channels=1, depth=8)
        p = g.init(KEY, 1)
        x = jax.random.normal(KEY, (1, 256, 256, 1))
        y1 = g.apply(p, x, rng=jax.random.PRNGKey(1))
        y2 = g.apply(p, x, rng=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(y1), np.asarray(y2))
        # same rng -> deterministic
        y3 = g.apply(p, x, rng=jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y3))

    def test_bf16_compute(self):
        g = UNetGenerator(out_channels=1, depth=5)
        p = g.init(KEY, 1)
        x = jax.random.normal(KEY, (1, 32, 32, 1))
        y = g.apply(p, x, rng=KEY, compute_dtype=jnp.bfloat16)
        assert y.shape == (1, 32, 32, 1)
        yf = g.apply(p, x, rng=KEY, compute_dtype=jnp.float32)
        # bf16 forward should roughly track fp32
        assert float(jnp.mean(jnp.abs(y - yf))) < 0.1

    def test_remat_matches(self):
        g = UNetGenerator(out_channels=1, depth=5)
        gr = UNetGenerator(out_channels=1, depth=5, remat=True)
        p = g.init(KEY, 1)
        x = jax.random.normal(KEY, (1, 32, 32, 1))
        np.testing.assert_allclose(np.asarray(g.apply(p, x, rng=KEY)),
                                   np.asarray(gr.apply(p, x, rng=KEY)), atol=1e-6)


class TestPatchGAN:
    def test_patch_shapes(self):
        d = PatchGANDiscriminator(target=True)
        p = d.init(KEY, 1)
        x = jnp.zeros((2, 256, 256, 1))
        assert d.apply(p, x, x).shape == (2, 30, 30, 1)   # base_gan.py:161
        x5 = jnp.zeros((1, 512, 512, 1))
        assert d.apply(p, x5, x5).shape == (1, 62, 62, 1)  # SURVEY §2.10-Q10

    def test_no_target_mode(self):
        d = PatchGANDiscriminator(norm="instance", target=False)
        p = d.init(KEY, 3)
        x = jnp.zeros((2, 256, 256, 3))
        assert d.apply(p, x).shape == (2, 30, 30, 1)

    def test_param_count(self):
        d = PatchGANDiscriminator(target=True)
        p = d.init(KEY, 1)
        n = sum(v.size for v in jax.tree.leaves(p))
        assert n == 2_764_545
