"""Pallas kernels vs their XLA-fallback twins (interpreter mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_tpu.ops import pallas_kernels
from gan_tpu.ops.norm import instance_norm as instance_norm_xla


@pytest.mark.parametrize("shape", [(2, 16, 16, 128), (1, 32, 32, 256),
                                   (3, 8, 8, 512)])
def test_instance_norm_forward_parity(shape):
    key = jax.random.PRNGKey(0)
    kx, ks, ko = jax.random.split(key, 3)
    x = jax.random.normal(kx, shape, jnp.float32) * 3.0 + 1.0
    scale = 1.0 + 0.02 * jax.random.normal(ks, (shape[-1],))
    offset = 0.1 * jax.random.normal(ko, (shape[-1],))
    got = pallas_kernels.instance_norm(x, scale, offset)
    want = instance_norm_xla(x, scale, offset)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_instance_norm_grad_parity():
    key = jax.random.PRNGKey(1)
    kx, ks, ko, kc = jax.random.split(key, 4)
    shape = (2, 16, 16, 128)
    x = jax.random.normal(kx, shape, jnp.float32) * 2.0
    scale = 1.0 + 0.02 * jax.random.normal(ks, (shape[-1],))
    offset = 0.1 * jax.random.normal(ko, (shape[-1],))
    cot = jax.random.normal(kc, shape, jnp.float32)

    def loss_p(x, s, o):
        return jnp.sum(pallas_kernels.instance_norm(x, s, o) * cot)

    def loss_x(x, s, o):
        return jnp.sum(instance_norm_xla(x, s, o) * cot)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, scale, offset)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, scale, offset)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_instance_norm_bf16():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 16, 16, 128), jnp.bfloat16)
    scale = jnp.ones((128,))
    offset = jnp.zeros((128,))
    got = pallas_kernels.instance_norm(x, scale, offset)
    assert got.dtype == jnp.bfloat16
    want = instance_norm_xla(x, scale, offset)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=0.05)


def test_enabled_env_gate(monkeypatch):
    monkeypatch.setenv("GAN_TPU_PALLAS", "on")
    assert pallas_kernels.enabled()
    monkeypatch.setenv("GAN_TPU_PALLAS", "off")
    assert not pallas_kernels.enabled()
