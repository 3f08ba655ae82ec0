#!/usr/bin/env python3
"""Convert keras InceptionV3 weights → the .npz pytree gan_tpu's JAX
extractor consumes (gan_tpu/models/inception.py), making true FID one flag:

  # the day pretrained weights are reachable (file or cache):
  python tools/import_inception_weights.py --weights notop.h5 --out iv3.npz
  python tools/eval_quality.py ... --fid-weights iv3.npz

  # no weights available (offline image): --random still exports a usable
  # extractor (a fixed random-init Inception — a structured Fréchet proxy,
  # NOT comparable to published FID numbers):
  python tools/import_inception_weights.py --random --out iv3_random.npz

Conversion walks `model.layers` in build order: every Conv2D/BatchNorm pair
from the keras conv2d_bn helper (keras/src/applications/inception_v3.py:383,
bias-free conv + scale-free BN) maps to one {w, beta, mean, var} entry — the
same order gan_tpu's `inception_v3_pool3` consumes them. Feature parity with
the keras model is unit-tested with random weights (tests/test_inception.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert_keras_inception(model) -> list:
    """keras InceptionV3 (include_top=False) → list of 94 {w, beta, mean,
    var} dicts in conv2d_bn CALL order.

    Keras 3's ``model.layers`` is graph-depth-ordered (branches interleave),
    NOT build-ordered, so call order is recovered from the auto-name uid
    suffixes (``conv2d``, ``conv2d_1``, … increase strictly with creation,
    even when a prior instantiation advanced the global counter), and each
    conv's BatchNormalization is found through the graph itself
    (``bn.input._keras_history``) rather than by adjacency in the list."""
    from gan_tpu.models.inception import N_CONV_BN

    def uid(name: str) -> int:
        stem, _, suffix = name.rpartition("_")
        return int(suffix) if stem and suffix.isdigit() else -1

    convs = sorted((l for l in model.layers if type(l).__name__ == "Conv2D"),
                   key=lambda l: uid(l.name))
    bn_for = {}
    for layer in model.layers:
        if type(layer).__name__ == "BatchNormalization":
            producer = layer.input._keras_history[0]
            bn_for[producer.name] = layer
    params = []
    for conv in convs:
        assert conv.use_bias is False, conv.name
        (w,) = conv.get_weights()
        bn = bn_for[conv.name]
        beta, mean, var = (np.asarray(a, np.float32)
                           for a in bn.get_weights())
        params.append({"w": np.asarray(w, np.float32), "beta": beta,
                       "mean": mean, "var": var})
    assert len(params) == N_CONV_BN, len(params)
    return params


def build_keras_model(weights: str | None):
    from keras.applications import InceptionV3
    return InceptionV3(include_top=False, weights=weights,
                       input_shape=(299, 299, 3))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("import_inception_weights")
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--weights", type=str,
                   help="keras InceptionV3 notop weights file (.h5)")
    g.add_argument("--random", action="store_true",
                   help="export a random-init extractor (Fréchet proxy only)")
    ap.add_argument("--out", type=str, required=True, help="output .npz path")
    args = ap.parse_args(argv)

    from gan_tpu.models.inception import save_params
    model = build_keras_model(None if args.random else args.weights)
    params = convert_keras_inception(model)
    save_params(params, args.out)
    kind = "RANDOM-INIT (Fréchet proxy)" if args.random else "pretrained"
    print(f"Wrote {len(params)} conv/bn blocks ({kind}) to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
