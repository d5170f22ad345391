"""Numerics-check utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from classifying_vae_lstm_tpu.models import cl_vae
from classifying_vae_lstm_tpu.train.debug import assert_finite_pytree, check_first_batch


def test_assert_finite_passes():
    assert_finite_pytree({"a": jnp.ones(3), "b": {"c": jnp.zeros((2, 2))}})


def test_assert_finite_names_culprit():
    with pytest.raises(FloatingPointError, match="b/c"):
        assert_finite_pytree({"a": jnp.ones(3), "b": {"c": jnp.array([1.0, jnp.nan])}})


def test_check_first_batch_ok():
    cfg = cl_vae.Config(original_dim=8, intermediate_dim=6, latent_dim=2,
                        intermediate_class_dim=4, n_classes=2)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (10, 8)) < 0.3).astype(jnp.float32)
    batch = {"x": x, "y": x, "w": jax.nn.one_hot(jnp.arange(10) % 2, 2)}
    loss_fn = lambda p, b, k, *a: cl_vae.loss_and_metrics(p, cfg, b, k, *a)
    m = check_first_batch(loss_fn, params, batch, jax.random.PRNGKey(2),
                          jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
    assert np.isfinite(m["loss"])


def test_check_first_batch_catches_bad_params():
    cfg = cl_vae.Config(original_dim=8, intermediate_dim=6, latent_dim=2,
                        intermediate_class_dim=4, n_classes=2)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    params["h_w"]["kernel"] = params["h_w"]["kernel"].at[0, 0].set(jnp.nan)
    x = jnp.zeros((4, 8))
    batch = {"x": x, "y": x, "w": jnp.ones((4, 2)) / 2}
    loss_fn = lambda p, b, k, *a: cl_vae.loss_and_metrics(p, cfg, b, k, *a)
    with pytest.raises(FloatingPointError, match="h_w/kernel"):
        check_first_batch(loss_fn, params, batch, jax.random.PRNGKey(2),
                          jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
