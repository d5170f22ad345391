from .adamwn import adam_with_weightnorm, keras_adam, keras_rmsprop, sgd_with_weightnorm
from .factory import init_optimizer
from .data_init import data_based_init

__all__ = [
    "adam_with_weightnorm",
    "data_based_init",
    "init_optimizer",
    "keras_adam",
    "keras_rmsprop",
    "sgd_with_weightnorm",
]
