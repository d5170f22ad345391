"""Optimizer-name resolution, mirroring ``init_adam_wn`` (utils/model_utils.py:52-57).

The reference maps the CLI string ``'adam-wn'`` to
``AdamWithWeightnorm(lr=0.001, beta_1=0.9, beta_2=0.999, epsilon=1e-08, decay=0.0)``
and passes any other string through to Keras. We resolve the same names to the
optax transformations in :mod:`.adamwn`.
"""

from __future__ import annotations

import optax

from .adamwn import adam_with_weightnorm, keras_adam, keras_rmsprop, sgd_with_weightnorm


def init_optimizer(name: str) -> tuple[optax.GradientTransformation, bool]:
    """Resolve an optimizer name; returns (transformation, was_adam_wn)."""
    if name == "adam-wn":
        return (
            adam_with_weightnorm(learning_rate=0.001, b1=0.9, b2=0.999, eps=1e-8, decay=0.0),
            True,
        )
    if name == "adam":
        return keras_adam(), False
    if name == "rmsprop":
        return keras_rmsprop(), False
    if name == "sgd":
        return sgd_with_weightnorm(), False
    raise ValueError(f"unknown optimizer {name!r} (expected adam-wn|adam|rmsprop|sgd)")
