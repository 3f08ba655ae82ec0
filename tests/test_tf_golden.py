"""Golden parity tests against the reference's actual TF ops (SURVEY §4).

The reference delegates all numerics to TF kernels (SURVEY §2.9); TensorFlow
is available in this environment, so each of our primitives is checked
bit-(or tolerance-)exact against the exact TF op the reference calls:
conv/convT stride-2 'same', batch/instance norm semantics, NEAREST resize,
SSIM, BCE-from-logits, and the N(0,0.02)-init loss math. Skipped gracefully
when TF is absent.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gan_tpu.ops import (batch_norm, bce_with_logits, conv2d_down,  # noqa: E402
                         conv2d_transpose_up, instance_norm, resize_nearest,
                         resize_nearest_np, ssim)

tf.config.set_visible_devices([], "GPU")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_conv2d_down_matches_tf(rng):
    """Stride-2 k4 'same' conv — base_gan.py:78."""
    for h, w, cin, cout in ((16, 16, 3, 8), (15, 17, 2, 4), (32, 32, 1, 64)):
        x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
        k = (0.02 * rng.normal(size=(4, 4, cin, cout))).astype(np.float32)
        want = tf.nn.conv2d(x, k, strides=2, padding="SAME").numpy()
        got = np.asarray(conv2d_down(jnp.asarray(x), jnp.asarray(k)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv2d_transpose_matches_keras(rng):
    """Stride-2 k4 'same' transposed conv — base_gan.py:107 (Keras layer)."""
    for h, w, cin, cout in ((8, 8, 4, 6), (16, 16, 3, 2)):
        x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
        layer = tf.keras.layers.Conv2DTranspose(
            cout, 4, strides=2, padding="same", use_bias=False)
        layer.build((None, h, w, cin))
        k_tf = layer.kernel.numpy()  # (4, 4, cout, cin)
        want = layer(x).numpy()
        got = np.asarray(conv2d_transpose_up(jnp.asarray(x), jnp.asarray(k_tf)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_batch_norm_matches_keras_training(rng):
    """BatchNormalization(training=True) — base_gan.py:83; the reference
    always runs training mode (SURVEY §2.10-Q2/Q3) so only batch stats
    matter."""
    x = rng.normal(size=(4, 8, 8, 16)).astype(np.float32) * 2 + 1
    bn = tf.keras.layers.BatchNormalization()
    bn.build((None, 8, 8, 16))
    gamma = rng.normal(size=(16,)).astype(np.float32)
    beta = rng.normal(size=(16,)).astype(np.float32)
    bn.gamma.assign(gamma)
    bn.beta.assign(beta)
    want = bn(x, training=True).numpy()
    got = np.asarray(batch_norm(jnp.asarray(x), jnp.asarray(gamma),
                                jnp.asarray(beta)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_instance_norm_matches_reference_layer(rng):
    """The reference's custom InstanceNormalization (utils.py:6-30):
    tf.nn.moments over (H, W), rsqrt(var + 1e-5), scale·x̂ + offset."""
    x = rng.normal(size=(3, 8, 8, 12)).astype(np.float32) * 3
    scale = (1.0 + 0.02 * rng.normal(size=(12,))).astype(np.float32)
    offset = rng.normal(size=(12,)).astype(np.float32)
    mean, var = tf.nn.moments(tf.constant(x), axes=[1, 2], keepdims=True)
    want = (scale * ((x - mean.numpy()) *
                     (1.0 / np.sqrt(var.numpy() + 1e-5))) + offset)
    got = np.asarray(instance_norm(jnp.asarray(x), jnp.asarray(scale),
                                   jnp.asarray(offset)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_nearest_matches_tf(rng):
    """tf.image.resize NEAREST — base_gan.py:46-53; exercised at the exact
    reference sizes (load→286, jitter 256+30, pred 256/512)."""
    for in_hw, out_hw in (((512, 640), (286, 286)), ((256, 256), (286, 286)),
                          ((100, 80), (256, 256)), ((64, 64), (32, 32))):
        x = rng.integers(0, 255, size=(*in_hw, 1)).astype(np.float32)
        want = tf.image.resize(x, out_hw, method="nearest").numpy()
        got = np.asarray(resize_nearest(jnp.asarray(x), *out_hw))
        np.testing.assert_array_equal(got, want)
        got_np = resize_nearest_np(x, *out_hw)
        np.testing.assert_array_equal(got_np, want)


def test_ssim_matches_tf(rng):
    """tf.image.ssim (11×11 Gaussian, k1/k2 defaults) — pix2pix.py:184."""
    a = rng.uniform(-1, 1, size=(2, 64, 64, 1)).astype(np.float32)
    b = (a + 0.1 * rng.normal(size=a.shape)).astype(np.float32).clip(-1, 1)
    want = tf.image.ssim(a, b, max_val=2.0).numpy()
    got = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), max_val=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bce_matches_keras(rng):
    """BinaryCrossentropy(from_logits=True) — base_gan.py:227-231."""
    logits = rng.normal(size=(2, 30, 30, 1)).astype(np.float32) * 3
    bce = tf.keras.losses.BinaryCrossentropy(from_logits=True)
    for labels in (np.ones_like(logits), np.zeros_like(logits)):
        want = bce(labels, logits).numpy()
        got = float(bce_with_logits(jnp.asarray(labels), jnp.asarray(logits)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_decode_matches_tf(tmp_path, rng):
    """decode_png(channels=c) — base_gan.py:33-37 — vs our PIL/native path."""
    from gan_tpu.data.decode import decode_image
    gray = rng.integers(0, 255, (20, 30), np.uint8)
    from PIL import Image
    p = str(tmp_path / "g.png")
    Image.fromarray(gray, "L").save(p)
    want = tf.io.decode_png(tf.io.read_file(p), channels=1).numpy()
    got = decode_image(p, 1)
    np.testing.assert_array_equal(got, want)
    want3 = tf.io.decode_png(tf.io.read_file(p), channels=3).numpy()
    np.testing.assert_array_equal(decode_image(p, 3), want3)
