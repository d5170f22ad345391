"""Optimizer-name resolution, mirroring ``init_adam_wn`` (utils/model_utils.py:52-57).

The reference maps the CLI string ``'adam-wn'`` to
``AdamWithWeightnorm(lr=0.001, beta_1=0.9, beta_2=0.999, epsilon=1e-08, decay=0.0)``
and passes **any other string through to Keras** (``model.compile(optimizer=str)``
-> Keras 2.0.0 ``optimizers.get``). So ``--optimizer sgd`` means *plain* Keras
SGD, and adagrad / adadelta / adamax / nadam are all valid names; an unknown
name raises ``ValueError`` exactly where Keras would. We resolve the same
names, with Keras 2.0.0 default hyperparameters, to optax transformations.

Extension: ``'sgd-wn'`` selects ``SGDWithWeightnorm`` (the reference defines
the class, ``utils/weightnorm.py:6-72``, but no CLI string ever reaches it).
"""

from __future__ import annotations

import optax

from .adamwn import adam_with_weightnorm, keras_adam, keras_rmsprop, sgd_with_weightnorm
from .keras_optimizers import (
    keras_adadelta,
    keras_adagrad,
    keras_adamax,
    keras_nadam,
    keras_sgd,
)

# the Keras 2.0.0 optimizers.get table (keras/optimizers.py), minus
# 'tfoptimizer' (a TF-object wrapper no CLI string can name)
_KERAS_NAMES = {
    "sgd": keras_sgd,
    "rmsprop": keras_rmsprop,
    "adagrad": keras_adagrad,
    "adadelta": keras_adadelta,
    "adam": keras_adam,
    "adamax": keras_adamax,
    "nadam": keras_nadam,
}


def init_optimizer(name: str) -> tuple[optax.GradientTransformation, bool]:
    """Resolve an optimizer name; returns (transformation, was_adam_wn)."""
    if name == "adam-wn":
        return (
            adam_with_weightnorm(learning_rate=0.001, b1=0.9, b2=0.999, eps=1e-8, decay=0.0),
            True,
        )
    if name == "sgd-wn":  # extension: the reference's SGDWithWeightnorm class
        return sgd_with_weightnorm(), False
    fn = _KERAS_NAMES.get(name.lower())
    if fn is None:
        # fail exactly where Keras 2.0.0 optimizers.get would
        raise ValueError(f"Could not interpret optimizer identifier: {name!r}")
    return fn(), False
