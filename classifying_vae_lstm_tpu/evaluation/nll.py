"""Importance-sampled test NLL (IWAE-style bound), nats per frame.

The reference ships the numeric helpers for this (``bincrossentropy``,
``logmeanexp``, ``utils/model_utils.py:9-17,169-170``) but no driver ever
calls them — the paper's NLL table was produced outside the repo (SURVEY §5).
This module provides the actual estimator, fully compiled: K importance
samples per datapoint via ``vmap``, batches via ``lax.scan``.

Estimator (per datapoint):

    log p(x) >= logmeanexp_k [ log p(x | z_k, w_k) + log p(z_k) + log p(u_k)
                               - log q(z_k | x, w_k) - log q(u_k | x) ]

where u is the (K-1)-dim *logit-space* Gaussian behind the Logistic-Normal w:
both prior and posterior are defined on the same logit space, so the softmax
Jacobians cancel in the ratio and the w contribution is a plain Gaussian
density ratio. The prior on u is N(0, e^{w_log_var_prior} I) (the same prior
the training-time ``w_kl_loss`` regularizes toward, ``cl_vae/model.py:202-206``),
and p(z) is N(0, I).

Reported as **negative** log-likelihood per frame: the cl_vae number divides
by 1 frame per datapoint; cl_vrnn divides by seq_length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import cl_vae, cl_vrnn

_LOG2PI = jnp.log(2 * jnp.pi)


def _log_normal(x, mean, log_var):
    """Sum of independent Gaussian log-densities over the last axis."""
    return -0.5 * jnp.sum(_LOG2PI + log_var + (x - mean) ** 2 / jnp.exp(log_var), axis=-1)


def _log_bernoulli(x, p):
    p = jnp.clip(p, 1e-7, 1 - 1e-7)
    return jnp.sum(x * jnp.log(p) + (1 - x) * jnp.log(1 - p), axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples"))
def iw_nll_cl_vae(params, cfg: cl_vae.Config, x, y, key, n_samples: int = 64, x_prev=None):
    """IW test NLL for a cl_vae batch. x,y: [B, D]; returns per-example [B] nats/frame."""

    def one_sample(k):
        ku, kz = jax.random.split(k)
        w_mean, w_log_var = cl_vae.encode_w(params, x)
        eps = jax.random.normal(ku, w_mean.shape)
        u = w_mean + jnp.exp(w_log_var / 2) * eps  # logit-space sample
        zeros = jnp.zeros(u.shape[:-1] + (1,), u.dtype)
        w = jax.nn.softmax(jnp.concatenate([u, zeros], axis=-1), axis=-1)
        z_mean, z_log_var = cl_vae.encode_z(params, cfg, x, w)
        z = z_mean + jnp.exp(z_log_var / 2) * jax.random.normal(kz, z_mean.shape)
        x_hat = cl_vae.decode(params, cfg, w, z, x_prev)
        log_w = (
            _log_bernoulli(y, x_hat)
            + _log_normal(z, jnp.zeros_like(z), jnp.zeros_like(z))
            + _log_normal(u, jnp.zeros_like(u), jnp.full_like(u, cfg.w_log_var_prior))
            - _log_normal(z, z_mean, z_log_var)
            - _log_normal(u, w_mean, w_log_var)
        )
        return log_w

    keys = jax.random.split(key, n_samples)
    log_ws = jax.vmap(one_sample)(keys)  # [K, B]
    m = jnp.max(log_ws, axis=0)
    ll = m + jnp.log(jnp.mean(jnp.exp(log_ws - m[None, :]), axis=0))
    return -ll


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples"))
def iw_nll_cl_vrnn(params, cfg: cl_vrnn.Config, x, y, key, n_samples: int = 64, x_prev=None):
    """IW test NLL for a cl_vrnn batch. x,y: [B, T, D]; returns [B] nats/frame."""

    def one_sample(k):
        ku, kz = jax.random.split(k)
        w_mean, w_log_var = cl_vrnn.encode_w(params, cfg, x)
        eps = jax.random.normal(ku, w_mean.shape)
        u = w_mean + jnp.exp(w_log_var / 2) * eps
        zeros = jnp.zeros(u.shape[:-1] + (1,), u.dtype)
        w = jax.nn.softmax(jnp.concatenate([u, zeros], axis=-1), axis=-1)
        z_mean, z_log_var, _ = cl_vrnn.encode_z_sequence(params, cfg, x, w)
        z = z_mean + jnp.exp(z_log_var / 2) * jax.random.normal(kz, z_mean.shape)
        x_hat, _ = cl_vrnn.decode_sequence(params, cfg, z, w, x_prev)
        log_w = (
            jnp.sum(_log_bernoulli(y, x_hat), axis=-1)  # sum over time
            + jnp.sum(_log_normal(z, jnp.zeros_like(z), jnp.zeros_like(z)), axis=-1)
            + _log_normal(u, jnp.zeros_like(u), jnp.full_like(u, cfg.w_log_var_prior))
            - jnp.sum(_log_normal(z, z_mean, z_log_var), axis=-1)
            - _log_normal(u, w_mean, w_log_var)
        )
        return log_w

    keys = jax.random.split(key, n_samples)
    log_ws = jax.vmap(one_sample)(keys)
    m = jnp.max(log_ws, axis=0)
    ll = m + jnp.log(jnp.mean(jnp.exp(log_ws - m[None, :]), axis=0))
    return -ll / cfg.seq_length


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "batch_size", "family"))
def iw_nll_dataset(params, cfg, data: dict, key, n_samples: int, batch_size: int,
                   family: str = "cl_vae"):
    """Whole-test-set NLL as ONE device program: ``lax.scan`` over batches.

    ``data`` holds ``x``/``y`` (and optionally ``x_prev``) arrays [N, ...].
    The final partial batch is padded (wrap-around indices, static shapes) and
    the pad rows sliced off afterwards, so the returned [N] per-example NLLs
    cover 100% of the split — no N % batch_size truncation.
    """
    fn = iw_nll_cl_vae if family == "cl_vae" else iw_nll_cl_vrnn
    n = data["x"].shape[0]
    nb = -(-n // batch_size)  # ceil: last batch padded, not dropped
    idx = jnp.arange(nb * batch_size) % n
    batched = {k: jnp.take(v, idx, axis=0).reshape((nb, batch_size) + v.shape[1:])
               for k, v in data.items()}
    keys = jax.random.split(key, nb)

    def step(_, xs):
        batch, k = xs
        nll = fn(params, cfg, batch["x"], batch["y"], k, n_samples, batch.get("x_prev"))
        return None, nll

    _, nlls = jax.lax.scan(step, None, (batched, keys))
    return nlls.reshape(-1)[:n]


def iw_nll_dataset_dp(params, cfg, data: dict, key, n_samples: int, batch_size: int,
                      family: str = "cl_vae", mesh=None):
    """Data-parallel whole-test-set NLL over a device mesh.

    The per-example estimator is embarrassingly parallel, so each device
    evaluates its batch shard: params replicated, every batch sharded over
    the mesh's ``'data'`` axis, XLA partitions the scan with zero collectives
    in the hot loop. Identical numerics to :func:`iw_nll_dataset` (same keys,
    same draws — sharding does not change the math; tested on the virtual
    8-device CPU mesh in ``test_parallel.py``).

    ``batch_size`` must divide by the data-axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n_data = mesh.shape["data"]
    if batch_size % n_data != 0:
        raise ValueError(f"batch_size {batch_size} not divisible by data axis {n_data}")
    fn = iw_nll_cl_vae if family == "cl_vae" else iw_nll_cl_vrnn
    n = data["x"].shape[0]
    nb = -(-n // batch_size)
    idx = jnp.arange(nb * batch_size) % n
    shard = NamedSharding(mesh, PartitionSpec(None, "data"))
    repl = NamedSharding(mesh, PartitionSpec())
    batched = {
        k: jax.device_put(
            jnp.take(v, idx, axis=0).reshape((nb, batch_size) + v.shape[1:]), shard
        )
        for k, v in data.items()
    }
    params = jax.device_put(params, repl)
    keys = jax.random.split(key, nb)

    @functools.partial(jax.jit, static_argnames=("n_samples", "family"))
    def run(params, batched, keys, n_samples, family):
        def step(_, xs):
            batch, k = xs
            nll = fn(params, cfg, batch["x"], batch["y"], k, n_samples,
                     batch.get("x_prev"))
            return None, nll

        _, nlls = jax.lax.scan(step, None, (batched, keys))
        return nlls.reshape(-1)

    return run(params, batched, keys, n_samples, family)[:n]
