"""Weight-normalized optimizers (Salimans & Kingma) as optax transformations.

Reproduces the reference's ``AdamWithWeightnorm`` / ``SGDWithWeightnorm``
(``utils/weightnorm.py:6-178``) exactly:

* every rank>=2 weight W is implicitly reparameterized as ``W = g * V / ||V||``
  through a persistent per-column scaler ``V_scaler = g / ||V||`` (init ones);
* the incoming gradient on W is split into ``(grad_g, grad_V)``
  (``get_weightnorm_params_and_grads``, reference :146-166);
* Adam/SGD moments are kept for both g (per-column) and V (full shape), the
  updates are applied in (g, V) space, and the new W is written back
  (``add_weightnorm_param_updates``, reference :169-178);
* rank-1 parameters (biases) get the plain update rule.

The Adam step uses the *Keras 2.0* formulation (bias correction folded into the
learning rate: ``lr_t = lr * sqrt(1-b2^t) / (1-b1^t)``), which differs slightly
from optax's — loss-curve parity depends on it (SURVEY §7 hard part (a)).

All of this is pure elementwise + reduction math: XLA fuses the whole update
into a few VPU kernels per parameter, and under data parallelism it runs
replicated after the gradient all-reduce.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdamWNState(NamedTuple):
    count: jnp.ndarray
    m: optax.Params  # first moment, shaped like params (V-space for rank>=2)
    v: optax.Params  # second moment
    m_g: optax.Params  # first moment for g (last-dim vectors; empty for rank<2)
    v_g: optax.Params  # second moment for g
    v_scaler: optax.Params  # persistent V_scaler = g/||V|| (init ones)


def _wn_empty(p):
    return jnp.zeros((0,), p.dtype)


def _g_shaped(p):
    return jnp.zeros((p.shape[-1],), p.dtype) if p.ndim > 1 else _wn_empty(p)


def _scaler_init(p):
    return jnp.ones((p.shape[-1],), p.dtype) if p.ndim > 1 else _wn_empty(p)


def _split_wn_grads(p, g, v_scaler):
    """W-space (param, grad) -> (V, V_norm, g_param, grad_g, grad_V).

    Mirrors ``get_weightnorm_params_and_grads`` (reference :146-166).
    """
    norm_axes = tuple(range(p.ndim - 1))
    scaler = v_scaler.reshape((1,) * len(norm_axes) + (-1,))
    V = p / scaler
    V_norm = jnp.sqrt(jnp.sum(jnp.square(V), norm_axes))
    g_param = v_scaler * V_norm
    grad_g = jnp.sum(g * V, norm_axes) / V_norm
    grad_V = scaler * (g - (grad_g / V_norm).reshape(scaler.shape) * V)
    return V, V_norm, g_param, grad_g, grad_V


def _write_back(new_V, new_g):
    """(V, g) -> (W, V_scaler) (``add_weightnorm_param_updates``, reference :169-178)."""
    norm_axes = tuple(range(new_V.ndim - 1))
    new_V_norm = jnp.sqrt(jnp.sum(jnp.square(new_V), norm_axes))
    new_scaler = new_g / new_V_norm
    new_W = new_scaler.reshape((1,) * len(norm_axes) + (-1,)) * new_V
    return new_W, new_scaler


def adam_with_weightnorm(
    learning_rate: float = 0.001,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    decay: float = 0.0,
) -> optax.GradientTransformation:
    """AdamWithWeightnorm (reference :75-143) with Keras Adam hyper-defaults."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamWNState(
            count=jnp.zeros([], jnp.int32),
            m=zeros,
            v=jax.tree.map(jnp.zeros_like, params),
            m_g=jax.tree.map(_g_shaped, params),
            v_g=jax.tree.map(_g_shaped, params),
            v_scaler=jax.tree.map(_scaler_init, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adam_with_weightnorm requires params")
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = learning_rate
        if decay > 0:
            lr = lr / (1.0 + decay * (t - 1.0))
        lr_t = lr * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)

        def leaf_update(p, g, m, v, m_g, v_g, v_scaler):
            if p.ndim > 1:
                V, V_norm, g_param, grad_g, grad_V = _split_wn_grads(p, g, v_scaler)
                m_g_t = b1 * m_g + (1 - b1) * grad_g
                v_g_t = b2 * v_g + (1 - b2) * jnp.square(grad_g)
                new_g = g_param - lr_t * m_g_t / (jnp.sqrt(v_g_t) + eps)
                m_t = b1 * m + (1 - b1) * grad_V
                v_t = b2 * v + (1 - b2) * jnp.square(grad_V)
                new_V = V - lr_t * m_t / (jnp.sqrt(v_t) + eps)
                new_W, new_scaler = _write_back(new_V, new_g)
                return new_W - p, m_t, v_t, m_g_t, v_g_t, new_scaler
            m_t = b1 * m + (1 - b1) * g
            v_t = b2 * v + (1 - b2) * jnp.square(g)
            update = -lr_t * m_t / (jnp.sqrt(v_t) + eps)
            return update, m_t, v_t, m_g, v_g, v_scaler

        out = jax.tree.map(leaf_update, params, grads, state.m, state.v, state.m_g, state.v_g, state.v_scaler)
        updates, m, v, m_g, v_g, v_scaler = (
            jax.tree.map(lambda o, i=i: o[i], out, is_leaf=lambda x: isinstance(x, tuple))
            for i in range(6)
        )
        return updates, AdamWNState(count, m, v, m_g, v_g, v_scaler)

    return optax.GradientTransformation(init_fn, update_fn)


class SGDWNState(NamedTuple):
    count: jnp.ndarray
    momentum: optax.Params
    momentum_g: optax.Params
    v_scaler: optax.Params


def sgd_with_weightnorm(
    learning_rate: float = 0.01,
    momentum: float = 0.0,
    decay: float = 0.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """SGDWithWeightnorm (reference :6-72)."""

    def init_fn(params):
        return SGDWNState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
            momentum_g=jax.tree.map(_g_shaped, params),
            v_scaler=jax.tree.map(_scaler_init, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("sgd_with_weightnorm requires params")
        count = state.count + 1
        lr = learning_rate
        if decay > 0:
            lr = lr / (1.0 + decay * (count.astype(jnp.float32) - 1.0))

        def leaf_update(p, g, m, m_g, v_scaler):
            if p.ndim > 1:
                V, V_norm, g_param, grad_g, grad_V = _split_wn_grads(p, g, v_scaler)
                v_g = momentum * m_g - lr * grad_g
                new_g = g_param + momentum * v_g - lr * grad_g if nesterov else g_param + v_g
                v_v = momentum * m - lr * grad_V
                new_V = V + momentum * v_v - lr * grad_V if nesterov else V + v_v
                new_W, new_scaler = _write_back(new_V, new_g)
                return new_W - p, v_v, v_g, new_scaler
            v = momentum * m - lr * g
            update = momentum * v - lr * g if nesterov else v
            return update, v, m_g, v_scaler

        out = jax.tree.map(leaf_update, params, grads, state.momentum, state.momentum_g, state.v_scaler)
        updates, mom, mom_g, v_scaler = (
            jax.tree.map(lambda o, i=i: o[i], out, is_leaf=lambda x: isinstance(x, tuple))
            for i in range(4)
        )
        return updates, SGDWNState(count, mom, mom_g, v_scaler)

    return optax.GradientTransformation(init_fn, update_fn)


class KerasAdamState(NamedTuple):
    count: jnp.ndarray
    m: optax.Params
    v: optax.Params


def keras_adam(
    learning_rate: float = 0.001,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Plain Adam with Keras 2.0 semantics (lr-folded bias correction)."""

    def init_fn(params):
        return KerasAdamState(
            jnp.zeros([], jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr_t = learning_rate * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.v, grads)
        updates = jax.tree.map(lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), m, v)
        return updates, KerasAdamState(count, m, v)

    return optax.GradientTransformation(init_fn, update_fn)


def keras_rmsprop(
    learning_rate: float = 0.001, rho: float = 0.9, eps: float = 1e-8
) -> optax.GradientTransformation:
    """RMSprop with Keras 2.0 defaults (the reference's '--optimizer rmsprop')."""

    def init_fn(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update_fn(grads, state, params=None):
        acc = jax.tree.map(lambda a, g: rho * a + (1 - rho) * jnp.square(g), state, grads)
        updates = jax.tree.map(lambda g, a: -learning_rate * g / (jnp.sqrt(a) + eps), grads, acc)
        return updates, acc

    return optax.GradientTransformation(init_fn, update_fn)
