"""Reparameterized samplers and KL terms.

The Logistic-Normal construction follows the reference exactly
(``cl_vae/model.py:146-156``, ``cl_vrnn/model.py:183-191``): sample a
(K-1)-dim Gaussian, append a zero logit, softmax onto the K-simplex. The
appended zero pins the last coordinate's logit so the distribution is
identifiable — this is the "classifying" latent w over musical keys.

All samplers take an explicit `jax.random` key: generation loops run fully
on-device under ``lax.scan`` with split keys (replacing the reference's
per-step NumPy draws at ``cl_vae/model.py:44-74``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gaussian(key, mean, log_var):
    """z = mean + exp(log_var/2) * eps, eps ~ N(0, I) (cl_vae/model.py:170-173)."""
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + jnp.exp(log_var / 2) * eps


def sample_logistic_normal(key, mean, log_var, add_noise=True):
    """Sample w on the K-simplex from a logit-Normal with K-1 free logits.

    Reference ``cl_vae/model.py:146-156``; ``add_noise=False`` gives the
    deterministic mean-logit point used by ``sample_w(..., add_noise=False)``
    (``cl_vae/model.py:55-58``).
    """
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    w_norm = mean + jnp.exp(log_var / 2) * eps if add_noise else mean
    zeros = jnp.zeros(w_norm.shape[:-1] + (1,), w_norm.dtype)
    logits = jnp.concatenate([w_norm, zeros], axis=-1)
    return jax.nn.softmax(logits, axis=-1)


def logistic_normal_from_eps(mean, log_var, eps, add_noise=True):
    """:func:`sample_logistic_normal` with the Gaussian draw passed in.

    Lets the noise-explicit samplers (and the generation-parity tests against
    ``tools/ref_oracle.RefGen*``) share one draw between implementations.
    """
    w_norm = mean + jnp.exp(log_var / 2) * eps if add_noise else mean
    zeros = jnp.zeros(w_norm.shape[:-1] + (1,), w_norm.dtype)
    logits = jnp.concatenate([w_norm, zeros], axis=-1)
    return jax.nn.softmax(logits, axis=-1)


def sample_w_discrete_from_u(u, w):
    """:func:`sample_w_discrete` with the uniform passed in.

    ``np.random.choice(len(w), p=w/w.sum())`` (cl_vrnn/model.py:65-69) is the
    inverse-CDF draw ``searchsorted(cumsum(p), u, side='right')``; given the
    same uniform both implementations pick the same index.
    """
    p = w / jnp.sum(w, axis=-1, keepdims=True)
    idx = jnp.searchsorted(jnp.cumsum(p, axis=-1), u, side="right")
    idx = jnp.minimum(idx, w.shape[-1] - 1)
    return jax.nn.one_hot(idx, w.shape[-1], dtype=w.dtype)


def sample_w_discrete(key, w):
    """One-hot draw from the categorical given by w (cl_vrnn/model.py:65-69)."""
    idx = jax.random.choice(key, w.shape[-1], p=w / jnp.sum(w))
    return jax.nn.one_hot(idx, w.shape[-1], dtype=w.dtype)


def gaussian_kl(mean, log_var):
    """KL(N(mean, exp(log_var)) || N(0, I)), summed over the last axis."""
    return -0.5 * jnp.sum(1 + log_var - jnp.square(mean) - jnp.exp(log_var), axis=-1)


def logistic_normal_kl(mean, log_var, log_var_prior=0.0):
    """KL of the logit-Normal posterior against N(0, exp(log_var_prior) I).

    Mirrors ``w_kl_loss`` (cl_vae/model.py:202-206): summed over the K-1 logits.
    """
    vs = (
        1
        - log_var_prior
        + log_var
        - jnp.exp(log_var) / jnp.exp(log_var_prior)
        - jnp.square(mean) / jnp.exp(log_var_prior)
    )
    return -0.5 * jnp.sum(vs, axis=-1)
