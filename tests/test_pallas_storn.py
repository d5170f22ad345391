"""Fused-STORN Pallas kernel vs the fused XLA scan (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from classifying_vae_lstm_tpu.models import cl_vrnn


def _setup(use_x_prev=True, B=6, T=5, D=14, H=12, L=3, K=3):
    cfg = cl_vrnn.Config(original_dim=D, intermediate_dim=H, latent_dim=L,
                         seq_length=T, n_classes=K, use_x_prev=use_x_prev)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, T, D)) < 0.2).astype(jnp.float32)
    return cfg, params, x


def test_matches_fused_xla_path():
    cfg, params, x = _setup()
    k = jax.random.PRNGKey(7)
    a = cl_vrnn._apply_fused(params, cfg, x, k, x_prev=x)
    b = cl_vrnn.apply_pallas_inference(params, cfg, x, k, x_prev=x)
    for name in ("X_decoded_mean", "Z_mean", "Z_log_var", "Z", "W"):
        np.testing.assert_allclose(np.asarray(a[name]), np.asarray(b[name]),
                                   rtol=1e-5, atol=1e-5)


def test_no_x_prev_variant():
    cfg, params, x = _setup(use_x_prev=False)
    k = jax.random.PRNGKey(3)
    a = cl_vrnn._apply_fused(params, cfg, x, k)
    b = cl_vrnn.apply_pallas_inference(params, cfg, x, k)
    np.testing.assert_allclose(np.asarray(a["X_decoded_mean"]),
                               np.asarray(b["X_decoded_mean"]), rtol=1e-5, atol=1e-5)


def test_jittable():
    cfg, params, x = _setup()
    fn = jax.jit(lambda p, x, k: cl_vrnn.apply_pallas_inference(p, cfg, x, k, x_prev=x)["X_decoded_mean"])
    out = fn(params, x, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
