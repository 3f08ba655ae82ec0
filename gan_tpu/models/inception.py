"""InceptionV3 "pool3" feature extractor — the true-FID backbone, in JAX.

The north-star quality metric is FID parity (BASELINE.json; the reference
evaluates quality only visually, /root/reference/README.md:206). FID needs
InceptionV3's 2048-d global-average-pool ("pool3") activations; no pretrained
weights ship in this offline image, so this module makes FID TURNKEY instead:
the full architecture runs here in JAX, `tools/import_inception_weights.py`
converts any keras InceptionV3 weight file (.h5 / .weights.h5) into the .npz
pytree this module consumes, and `tools/eval_quality.py --fid-weights PATH`
then computes real FID. Numerical parity of the extractor against
`keras.applications.InceptionV3` is unit-tested with RANDOM weights
(tests/test_inception.py) — the day weights appear, true FID is one flag.

Implementation notes (mirrors keras/src/applications/inception_v3.py, the
public architecture definition, checked against it in tests):
  * Every conv is bias-free, followed by BatchNormalization(scale=False,
    eps=1e-3) in inference mode, then ReLU — 94 (conv, bn) pairs consumed in
    keras' layer-build order, which is why params are a flat LIST.
  * AveragePooling2D(3, 1, 'same') excludes padding from the divisor
    (measured against tf.nn.avg_pool2d: corner outputs of an all-ones input
    are 1.0, not 4/9) — implemented as sum-pool / valid-count-pool.
  * Input is (N, 299, 299, 3) in [-1, 1] (keras inception preprocess_input
    scale); `prepare_images` resizes/tiles gan_tpu's [-1, 1] outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
N_CONV_BN = 94  # (Conv2D, BatchNormalization) pairs in build order


def _conv_bn(p, x, strides=(1, 1), padding="SAME"):
    x = jax.lax.conv_general_dilated(
        x, p["w"], strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + BN_EPS) + p["beta"]
    return jnp.maximum(x, 0.0)


def _max_pool_3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _avg_pool_3s1_same(x):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return s / cnt


def inception_v3_pool3(params: list, x: jnp.ndarray) -> jnp.ndarray:
    """(N, 299, 299, 3) in [-1, 1] → (N, 2048) pool3 features.

    ``params``: list of ``N_CONV_BN`` dicts {w, beta, mean, var} in keras
    layer-build order (tools/import_inception_weights.py).
    """
    assert len(params) == N_CONV_BN, len(params)
    it = iter(params)

    def cb(x, strides=(1, 1), padding="SAME"):
        return _conv_bn(next(it), x, strides, padding)

    x = cb(x, (2, 2), "VALID")                  # 32 3x3 s2
    x = cb(x, (1, 1), "VALID")                  # 32 3x3
    x = cb(x)                                   # 64 3x3
    x = _max_pool_3s2(x)
    x = cb(x, (1, 1), "VALID")                  # 80 1x1
    x = cb(x, (1, 1), "VALID")                  # 192 3x3
    x = _max_pool_3s2(x)

    # mixed 0-2: 35x35
    for _ in range(3):
        b1 = cb(x)
        b5 = cb(cb(x))
        b3d = cb(cb(cb(x)))
        bp = cb(_avg_pool_3s1_same(x))
        x = jnp.concatenate([b1, b5, b3d, bp], axis=3)

    # mixed 3 (downsample to 17x17)
    b3 = cb(x, (2, 2), "VALID")
    b3d = cb(cb(cb(x)), (2, 2), "VALID")
    # NOTE: branch order inside the chained calls must match keras; the two
    # stride-2 convs above are the LAST conv of each chain
    x = jnp.concatenate([b3, b3d, _max_pool_3s2(x)], axis=3)

    # mixed 4-7: 17x17 (1x7/7x1 factorized convs)
    for _ in range(4):
        b1 = cb(x)
        b7 = cb(cb(cb(x)))
        b7d = cb(cb(cb(cb(cb(x)))))
        bp = cb(_avg_pool_3s1_same(x))
        x = jnp.concatenate([b1, b7, b7d, bp], axis=3)

    # mixed 8 (downsample to 8x8)
    b3 = cb(cb(x), (2, 2), "VALID")
    b7x3 = cb(cb(cb(cb(x))), (2, 2), "VALID")
    x = jnp.concatenate([b3, b7x3, _max_pool_3s2(x)], axis=3)

    # mixed 9-10: 8x8, forked 1x3/3x1 branches
    for _ in range(2):
        b1 = cb(x)
        b3 = cb(x)
        b3 = jnp.concatenate([cb(b3), cb(b3)], axis=3)
        b3d = cb(cb(x))
        b3d = jnp.concatenate([cb(b3d), cb(b3d)], axis=3)
        bp = cb(_avg_pool_3s1_same(x))
        x = jnp.concatenate([b1, b3, b3d, bp], axis=3)

    assert next(it, None) is None, "param count mismatch"
    return jnp.mean(x, axis=(1, 2))             # GlobalAveragePooling (pool3)


def prepare_images(x: np.ndarray) -> np.ndarray:
    """gan_tpu outputs ((N, H, W, C) fp32 in [-1, 1], C ∈ {1, 3}) → the
    extractor's (N, 299, 299, 3): grayscale tiles to RGB, bilinear resize
    (the standard FID preprocessing choice)."""
    x = np.asarray(x, np.float32)
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    if x.shape[1:3] != (299, 299):
        x = np.asarray(jax.image.resize(
            jnp.asarray(x), (x.shape[0], 299, 299, 3), method="bilinear"))
    return x


def extract_features(params: list, images: np.ndarray,
                     batch: int = 16) -> np.ndarray:
    """Chunked pool3 features for a stack of [-1, 1] images (any H, W, C)."""
    fn = jax.jit(lambda p, z: inception_v3_pool3(p, z))
    prep = prepare_images(images)
    outs = []
    for lo in range(0, prep.shape[0], batch):
        chunk = prep[lo:lo + batch]
        if chunk.shape[0] < batch:   # pad to one static shape, trim after
            pad = np.concatenate(
                [chunk, np.zeros((batch - chunk.shape[0],) + chunk.shape[1:],
                                 np.float32)])
            outs.append(np.asarray(fn(params, jnp.asarray(pad)))[:chunk.shape[0]])
        else:
            outs.append(np.asarray(fn(params, jnp.asarray(chunk))))
    return np.concatenate(outs, axis=0)


def save_params(params: list, path: str) -> None:
    arrs = {}
    for i, p in enumerate(params):
        for k, v in p.items():
            arrs[f"{k}_{i}"] = np.asarray(v)
    np.savez(path, **arrs)


def load_params(path: str) -> list:
    z = np.load(path)
    out = []
    for i in range(N_CONV_BN):
        out.append({k: jnp.asarray(z[f"{k}_{i}"])
                    for k in ("w", "beta", "mean", "var")})
    return out
