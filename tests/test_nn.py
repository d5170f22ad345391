"""nn core/distribution/loss tests against NumPy oracles of the Keras formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from classifying_vae_lstm_tpu.nn import (
    binary_crossentropy,
    categorical_crossentropy,
    kl_loss,
    sample_gaussian,
    sample_logistic_normal,
    sample_w_discrete,
    vae_loss,
    w_kl_loss,
    w_rec_loss,
)
from classifying_vae_lstm_tpu.nn.core import glorot_uniform, hard_sigmoid, init_lstm, orthogonal


def test_binary_crossentropy_matches_keras_formula():
    rng = np.random.default_rng(0)
    y = (rng.random((5, 88)) < 0.1).astype(np.float32)
    p = rng.random((5, 88)).astype(np.float32)
    eps = 1e-7
    pc = np.clip(p, eps, 1 - eps)
    oracle = -(y * np.log(pc) + (1 - y) * np.log(1 - pc)).mean(axis=-1)
    np.testing.assert_allclose(binary_crossentropy(y, p), oracle, rtol=1e-5)
    np.testing.assert_allclose(vae_loss(y, p, 88), 88 * oracle, rtol=1e-5)


def test_categorical_crossentropy_renormalizes():
    y = np.eye(4, dtype=np.float32)[[0, 2]]
    p = np.array([[2.0, 1.0, 1.0, 1.0], [0.1, 0.1, 0.7, 0.1]], dtype=np.float32)
    pn = p / p.sum(-1, keepdims=True)
    oracle = -np.sum(y * np.log(np.clip(pn, 1e-7, 1 - 1e-7)), axis=-1)
    np.testing.assert_allclose(categorical_crossentropy(y, p), oracle, rtol=1e-3)
    np.testing.assert_allclose(w_rec_loss(y, p, 4), 3 * oracle, rtol=1e-3)


def test_kl_loss_oracle():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(7, 3)).astype(np.float32)
    lv = rng.normal(size=(7, 3)).astype(np.float32)
    oracle = -0.5 * np.sum(1 + lv - m**2 - np.exp(lv), axis=-1)
    np.testing.assert_allclose(kl_loss(m, lv), oracle, rtol=1e-5)
    # zero at the prior
    np.testing.assert_allclose(kl_loss(np.zeros((2, 4)), np.zeros((2, 4))), 0.0, atol=1e-6)


def test_kl_loss_rank3_sums_latent_axis_only():
    # cl_vrnn kl_loss: rank-3 z_args sum over latent dim per timestep
    m = np.ones((2, 5, 3), dtype=np.float32)
    lv = np.zeros((2, 5, 3), dtype=np.float32)
    out = kl_loss(m, lv)
    assert out.shape == (2, 5)
    np.testing.assert_allclose(out, 1.5, rtol=1e-6)


def test_w_kl_loss_prior():
    rng = np.random.default_rng(2)
    m = rng.normal(size=(4, 9)).astype(np.float32)
    lv = rng.normal(size=(4, 9)).astype(np.float32)
    for prior in (0.0, 1.0, -0.5):
        vs = 1 - prior + lv - np.exp(lv) / np.exp(prior) - m**2 / np.exp(prior)
        oracle = -0.5 * np.sum(vs, axis=-1)
        np.testing.assert_allclose(w_kl_loss(m, lv, prior), oracle, rtol=1e-5)


def test_logistic_normal_on_simplex():
    key = jax.random.PRNGKey(0)
    mean = jnp.zeros((1000, 9))
    log_var = jnp.zeros((1000, 9))
    w = sample_logistic_normal(key, mean, log_var)
    assert w.shape == (1000, 10)  # K-1 logits -> K simplex coords
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    assert (np.asarray(w) > 0).all()


def test_logistic_normal_no_noise_is_softmax_of_mean():
    mean = jnp.array([[1.0, -1.0]])
    w = sample_logistic_normal(jax.random.PRNGKey(0), mean, jnp.zeros((1, 2)), add_noise=False)
    oracle = np.exp([1.0, -1.0, 0.0])
    oracle = oracle / oracle.sum()
    np.testing.assert_allclose(np.asarray(w[0]), oracle, rtol=1e-5)


def test_sample_gaussian_moments():
    key = jax.random.PRNGKey(3)
    mean = 2.0 * jnp.ones((20000, 2))
    log_var = jnp.log(0.25) * jnp.ones((20000, 2))
    z = sample_gaussian(key, mean, log_var)
    assert abs(float(z.mean()) - 2.0) < 0.02
    assert abs(float(z.std()) - 0.5) < 0.02


def test_sample_w_discrete_one_hot():
    w = jnp.array([0.7, 0.2, 0.1])
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    draws = jax.vmap(lambda k: sample_w_discrete(k, w))(keys)
    np.testing.assert_allclose(np.asarray(draws.sum(-1)), 1.0)
    freq = np.asarray(draws.mean(0))
    assert abs(freq[0] - 0.7) < 0.08


def test_glorot_uniform_bounds():
    k = glorot_uniform(jax.random.PRNGKey(0), (100, 200))
    limit = np.sqrt(6.0 / 300)
    assert float(jnp.abs(k).max()) <= limit
    assert float(jnp.abs(k).max()) > 0.8 * limit


def test_orthogonal_is_orthogonal():
    q = np.asarray(orthogonal(jax.random.PRNGKey(0), (64, 64)), dtype=np.float64)
    np.testing.assert_allclose(q @ q.T, np.eye(64), atol=1e-5)


def test_hard_sigmoid():
    x = jnp.array([-10.0, -2.5, 0.0, 2.5, 10.0])
    np.testing.assert_allclose(np.asarray(hard_sigmoid(x)), [0, 0, 0.5, 1, 1], atol=1e-6)


def test_lstm_init_forget_bias():
    p = init_lstm(jax.random.PRNGKey(0), 10, 8)
    assert p["kernel"].shape == (10, 32)
    assert p["recurrent_kernel"].shape == (8, 32)
    b = np.asarray(p["bias"])
    np.testing.assert_array_equal(b[8:16], 1.0)  # forget gate
    np.testing.assert_array_equal(b[:8], 0.0)
