"""Plain Keras-2.0 optimizers as optax transformations (string passthrough).

The reference maps only ``'adam-wn'`` itself; every other ``--optimizer``
string is handed to Keras unchanged (``utils/model_utils.py:52-57`` returns
``(optimizer, False)`` and ``get_model`` compiles with the string, so Keras
2.0.0 ``optimizers.get`` resolves it). That makes ``--optimizer sgd`` mean
*plain* Keras SGD — not SGD-with-weightnorm — and makes adagrad / adadelta /
adamax / nadam all valid. This module reproduces those update rules with the
Keras 2.0.0 default hyperparameters and epsilon (1e-8), matching the pinned
``Keras==2.0.0`` formulas exactly (lr-folded bias correction, pre-increment
decay, Nadam's 0.96-schedule momentum cache).

``keras_adam`` / ``keras_rmsprop`` live in :mod:`.adamwn`; this module adds
the remaining names so :func:`.factory.init_optimizer` covers the full Keras
2.0.0 string surface and fails exactly where Keras would (unknown name ->
``ValueError``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class KerasSGDState(NamedTuple):
    count: jnp.ndarray
    momentum: optax.Params


def keras_sgd(
    learning_rate: float = 0.01,
    momentum: float = 0.0,
    decay: float = 0.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """Keras 2.0.0 SGD: v = mu*m - lr*g; p += mu*v - lr*g if nesterov else v."""

    def init_fn(params):
        return KerasSGDState(jnp.zeros([], jnp.int32), jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        count = state.count + 1
        lr = learning_rate
        if decay > 0:
            lr = lr / (1.0 + decay * (count.astype(jnp.float32) - 1.0))
        v = jax.tree.map(lambda m, g: momentum * m - lr * g, state.momentum, grads)
        if nesterov:
            updates = jax.tree.map(lambda vv, g: momentum * vv - lr * g, v, grads)
        else:
            updates = v
        return updates, KerasSGDState(count, v)

    return optax.GradientTransformation(init_fn, update_fn)


def keras_adagrad(
    learning_rate: float = 0.01, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Keras 2.0.0 Adagrad: a += g^2; p -= lr * g / (sqrt(a) + eps)."""

    def init_fn(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update_fn(grads, state, params=None):
        acc = jax.tree.map(lambda a, g: a + jnp.square(g), state, grads)
        updates = jax.tree.map(lambda g, a: -learning_rate * g / (jnp.sqrt(a) + eps), grads, acc)
        return updates, acc

    return optax.GradientTransformation(init_fn, update_fn)


class KerasAdadeltaState(NamedTuple):
    acc: optax.Params
    delta_acc: optax.Params


def keras_adadelta(
    learning_rate: float = 1.0, rho: float = 0.95, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Keras 2.0.0 Adadelta: RMS-ratio update with an accumulator of deltas."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return KerasAdadeltaState(zeros, jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        acc = jax.tree.map(lambda a, g: rho * a + (1 - rho) * jnp.square(g), state.acc, grads)
        step = jax.tree.map(
            lambda g, a, d: g * jnp.sqrt(d + eps) / jnp.sqrt(a + eps), grads, acc, state.delta_acc
        )
        updates = jax.tree.map(lambda s: -learning_rate * s, step)
        delta_acc = jax.tree.map(
            lambda d, s: rho * d + (1 - rho) * jnp.square(s), state.delta_acc, step
        )
        return updates, KerasAdadeltaState(acc, delta_acc)

    return optax.GradientTransformation(init_fn, update_fn)


class KerasAdamaxState(NamedTuple):
    count: jnp.ndarray
    m: optax.Params
    u: optax.Params


def keras_adamax(
    learning_rate: float = 0.002,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Keras 2.0.0 Adamax: infinity-norm Adam, lr_t = lr / (1 - b1^t)."""

    def init_fn(params):
        return KerasAdamaxState(
            jnp.zeros([], jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr_t = learning_rate / (1.0 - b1**t)
        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
        u = jax.tree.map(lambda u, g: jnp.maximum(b2 * u, jnp.abs(g)), state.u, grads)
        updates = jax.tree.map(lambda m, u: -lr_t * m / (u + eps), m, u)
        return updates, KerasAdamaxState(count, m, u)

    return optax.GradientTransformation(init_fn, update_fn)


class KerasNadamState(NamedTuple):
    count: jnp.ndarray
    m_schedule: jnp.ndarray
    m: optax.Params
    v: optax.Params


def keras_nadam(
    learning_rate: float = 0.002,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    schedule_decay: float = 0.004,
) -> optax.GradientTransformation:
    """Keras 2.0.0 Nadam: Nesterov Adam with the 0.96^t momentum schedule."""

    def init_fn(params):
        return KerasNadamState(
            jnp.zeros([], jnp.int32),
            jnp.ones([], jnp.float32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        cache_t = b1 * (1.0 - 0.5 * 0.96 ** (t * schedule_decay))
        cache_t1 = b1 * (1.0 - 0.5 * 0.96 ** ((t + 1.0) * schedule_decay))
        m_schedule_new = state.m_schedule * cache_t
        m_schedule_next = m_schedule_new * cache_t1
        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.v, grads)

        def upd(g, m_t, v_t):
            g_prime = g / (1.0 - m_schedule_new)
            m_t_prime = m_t / (1.0 - m_schedule_next)
            v_t_prime = v_t / (1.0 - b2**t)
            m_t_bar = (1.0 - cache_t) * g_prime + cache_t1 * m_t_prime
            return -learning_rate * m_t_bar / (jnp.sqrt(v_t_prime) + eps)

        updates = jax.tree.map(upd, grads, m, v)
        return updates, KerasNadamState(count, m_schedule_new, m, v)

    return optax.GradientTransformation(init_fn, update_fn)
