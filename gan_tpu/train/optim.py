"""Adam optimizer with TF-Keras-parity hyperparameters.

The reference uses ``tf.keras.optimizers.Adam(lr, beta_1, beta_2)``
(base_gan.py:247-252) whose default epsilon is 1e-7 and whose update is
``m̂ / (sqrt(v̂) + ε)`` — optax's form with ``eps_root=0``. One independent
optimizer per network (2 for Pix2Pix, 4 for CycleGAN).
"""

from __future__ import annotations

import optax

TF_ADAM_EPS = 1e-7  # tf.keras.optimizers.Adam default


def adam(learning_rate: float, beta_1: float = 0.5, beta_2: float = 0.999) -> optax.GradientTransformation:
    return optax.adam(learning_rate, b1=beta_1, b2=beta_2, eps=TF_ADAM_EPS, eps_root=0.0)
