"""InceptionV3 pool3 extractor (gan_tpu/models/inception.py): numerical
parity against `keras.applications.InceptionV3` with RANDOM weights — no
download needed, so the test proves the architecture + converter are exact
now, and real weights make FID true the day they appear (VERDICT r4 next #4).
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_pool3_feature_parity_vs_keras(tmp_path):
    tf = pytest.importorskip("tensorflow")
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from import_inception_weights import build_keras_model, convert_keras_inception
    from gan_tpu.models.inception import (N_CONV_BN, extract_features,
                                          inception_v3_pool3, load_params,
                                          save_params)

    model = build_keras_model(None)          # random init — offline-safe
    params = convert_keras_inception(model)
    assert len(params) == N_CONV_BN

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    want = np.asarray(model(x, training=False)).mean(axis=(1, 2))  # pool3
    got = np.asarray(inception_v3_pool3(params, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    # save/load round-trip feeds the same numbers back
    p = str(tmp_path / "iv3.npz")
    save_params(params, p)
    params2 = load_params(p)
    got2 = np.asarray(inception_v3_pool3(params2, jnp.asarray(x)))
    np.testing.assert_array_equal(got, got2)

    # extract_features handles gan_tpu-shaped input (grayscale, non-299,
    # partial final chunk) end to end
    imgs = rng.uniform(-1, 1, (3, 64, 64, 1)).astype(np.float32)
    feats = extract_features(params2, imgs, batch=2)
    assert feats.shape == (3, 2048) and np.isfinite(feats).all()
