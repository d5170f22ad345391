"""Reference-shaped sampler helpers.

The reference exposes ``sample_x`` / ``sample_w`` / ``sample_z`` /
``sample_w_discrete`` as module-level functions (``cl_vae/model.py:44-74``,
``cl_vrnn/model.py:62-96``); users of the reference reach for these names.
These are thin, explicit-PRNG wrappers over :mod:`..nn.distributions` — the
compiled generation loops in :mod:`.generate` use the underlying functions
directly.
"""

from __future__ import annotations

import jax

from ..nn.distributions import (
    sample_gaussian,
    sample_logistic_normal,
    sample_w_discrete as _sample_w_discrete,
)


def sample_x(key, x_mean):
    """x ~ Bernoulli(x_mean), as float (reference cl_vae/model.py:44-45)."""
    return jax.random.bernoulli(key, x_mean).astype(x_mean.dtype)


def sample_w(key, args, add_noise: bool = True):
    """(w_mean, w_log_var) -> simplex point w (reference cl_vae/model.py:47-66)."""
    w_mean, w_log_var = args
    return sample_logistic_normal(key, w_mean, w_log_var, add_noise=add_noise)


def sample_z(key, args):
    """(z_mean, z_log_var) -> z (reference cl_vae/model.py:68-74)."""
    z_mean, z_log_var = args
    return sample_gaussian(key, z_mean, z_log_var)


def sample_w_discrete(key, w):
    """One-hot categorical draw from w (reference cl_vrnn/model.py:65-69)."""
    return _sample_w_discrete(key, w)
