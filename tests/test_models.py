"""Model-level tests: shapes, loss composition vs oracle, vanilla-VAE mode."""

import jax
import jax.numpy as jnp
import numpy as np

from classifying_vae_lstm_tpu.models import cl_vae, cl_vrnn


def _vae_setup(n_classes=4, use_x_prev=False, intermediate_dim=32):
    cfg = cl_vae.Config(original_dim=20, intermediate_dim=intermediate_dim, latent_dim=3,
                        intermediate_class_dim=16, n_classes=n_classes, use_x_prev=use_x_prev)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (10, 20)) < 0.2).astype(jnp.float32)
    w = jax.nn.one_hot(jnp.arange(10) % n_classes, n_classes)
    return cfg, params, x, w


def test_cl_vae_apply_shapes():
    cfg, params, x, w = _vae_setup()
    out = cl_vae.apply(params, cfg, x, jax.random.PRNGKey(2))
    assert out["x_decoded_mean"].shape == (10, 20)
    assert out["w"].shape == (10, 4)
    assert out["z"].shape == (10, 3)
    np.testing.assert_allclose(np.asarray(out["w"].sum(-1)), 1.0, rtol=1e-5)
    p = np.asarray(out["x_decoded_mean"])
    assert (p > 0).all() and (p < 1).all()


def test_cl_vae_no_hidden_layer():
    # intermediate_dim == 0 skips the hidden layers (cl_vae/model.py:161-167)
    cfg, params, x, w = _vae_setup(intermediate_dim=0)
    assert "h" not in params and "decoder_h" not in params
    out = cl_vae.apply(params, cfg, x, jax.random.PRNGKey(2))
    assert out["x_decoded_mean"].shape == (10, 20)


def test_cl_vae_x_prev_changes_output():
    cfg, params, x, w = _vae_setup(use_x_prev=True)
    k = jax.random.PRNGKey(2)
    out1 = cl_vae.apply(params, cfg, x, k, x_prev=x)
    out2 = cl_vae.apply(params, cfg, x, k, x_prev=jnp.zeros_like(x))
    assert float(jnp.abs(out1["x_decoded_mean"] - out2["x_decoded_mean"]).max()) > 1e-4


def test_cl_vae_loss_composition():
    """total == vae + w_kl_w*w_kl + class_w*w_rec + kl_w*kl with batch means."""
    cfg, params, x, w = _vae_setup()
    batch = {"x": x, "y": x, "w": w}
    key = jax.random.PRNGKey(3)
    total, m = cl_vae.loss_and_metrics(params, cfg, batch, key, 0.5, 2.0, 0.25)
    expect = (
        m["x_decoded_mean_loss"] + 0.25 * m["w_loss"] + 2.0 * m["w2_loss"] + 0.5 * m["z_args_loss"]
    )
    np.testing.assert_allclose(float(total), float(expect), rtol=1e-5)


def test_cl_vae_loss_weights_traced_not_recompiled():
    cfg, params, x, w = _vae_setup()
    batch = {"x": x, "y": x, "w": w}
    fn = jax.jit(lambda kw: cl_vae.loss_and_metrics(params, cfg, batch, jax.random.PRNGKey(0), kw)[0])
    l1 = fn(jnp.float32(0.0))
    l2 = fn(jnp.float32(1.0))
    assert fn._cache_size() == 1  # one trace serves all anneal values
    assert float(l1) != float(l2)


def test_vanilla_vae_mode():
    """n_classes=1: w collapses to [1.0], w losses vanish (BASELINE config 2)."""
    cfg, params, x, _ = _vae_setup(n_classes=1)
    out = cl_vae.apply(params, cfg, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
    total, m = cl_vae.loss_and_metrics(
        params, cfg, {"x": x, "y": x, "w": jnp.ones((10, 1))}, jax.random.PRNGKey(3)
    )
    assert float(m["w_loss"]) == 0.0 and float(m["w2_loss"]) == 0.0
    np.testing.assert_allclose(
        float(total), float(m["x_decoded_mean_loss"] + m["z_args_loss"]), rtol=1e-5
    )


def _vrnn_setup(use_x_prev=False):
    cfg = cl_vrnn.Config(original_dim=14, intermediate_dim=12, latent_dim=3,
                         seq_length=5, n_classes=3, use_x_prev=use_x_prev)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (8, 5, 14)) < 0.2).astype(jnp.float32)
    w = jax.nn.one_hot(jnp.arange(8) % 3, 3)
    return cfg, params, x, w


def test_cl_vrnn_apply_shapes():
    cfg, params, x, w = _vrnn_setup()
    out = cl_vrnn.apply(params, cfg, x, jax.random.PRNGKey(2))
    assert out["X_decoded_mean"].shape == (8, 5, 14)
    assert out["Z_mean"].shape == (8, 5, 3)
    assert out["W"].shape == (8, 3)
    np.testing.assert_allclose(np.asarray(out["W"].sum(-1)), 1.0, rtol=1e-5)


def test_cl_vrnn_loss_composition():
    cfg, params, x, w = _vrnn_setup(use_x_prev=True)
    batch = {"x": x, "x_prev": x, "y": x, "w": w}
    total, m = cl_vrnn.loss_and_metrics(params, cfg, batch, jax.random.PRNGKey(3), 0.5, 2.0, 0.25)
    expect = (
        m["X_decoded_mean_loss"] + 0.25 * m["W_loss"] + 2.0 * m["W2_loss"] + 0.5 * m["Z_args_loss"]
    )
    np.testing.assert_allclose(float(total), float(expect), rtol=1e-5)


def test_cl_vrnn_step_matches_sequence():
    """Step-wise encoder/decoder (generation path) == sequence path (training).

    This is the property reference quirk Q3 broke: its sampling-time z-encoder
    used fresh LSTM weights. Here both paths share params by construction.
    """
    cfg, params, x, w = _vrnn_setup()
    W = w[:, :]
    zm_seq, zv_seq, _ = cl_vrnn.encode_z_sequence(params, cfg, x, W)
    h = jnp.zeros((8, 12))
    c = jnp.zeros((8, 12))
    for t in range(5):
        zm_t, zv_t, h, c = cl_vrnn.encode_z_step(params, x[:, t], W, h, c)
        np.testing.assert_allclose(np.asarray(zm_seq[:, t]), np.asarray(zm_t), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(zv_seq[:, t]), np.asarray(zv_t), rtol=1e-4, atol=1e-5)

    z = jax.random.normal(jax.random.PRNGKey(4), (8, 5, 3))
    xm_seq, _ = cl_vrnn.decode_sequence(params, cfg, z, W)
    h = jnp.zeros((8, 12))
    c = jnp.zeros((8, 12))
    for t in range(5):
        xm_t, h, c = cl_vrnn.decode_step(params, cfg, z[:, t], W, h, c)
        np.testing.assert_allclose(np.asarray(xm_seq[:, t]), np.asarray(xm_t), rtol=1e-4, atol=1e-5)


def test_cl_vrnn_head_init_stddev():
    cfg, params, _, _ = _vrnn_setup()
    # RandomNormal(0, 0.1) heads (cl_vrnn/model.py:200-207,229-233)
    s = float(jnp.std(params["X_decoded_mean"]["kernel"]))
    assert 0.05 < s < 0.15


def test_cl_vrnn_fused_scan_matches_two_scan():
    """_apply_fused (single scan for both LSTMs) == the two-scan reference path."""
    from classifying_vae_lstm_tpu.nn.distributions import (
        sample_gaussian,
        sample_logistic_normal,
    )

    cfg, params, x, w = _vrnn_setup(use_x_prev=True)
    k = jax.random.PRNGKey(9)
    fused = cl_vrnn._apply_fused(params, cfg, x, k, x_prev=x)
    kw, kz, _, _ = jax.random.split(k, 4)
    Wm, Wv = cl_vrnn.encode_w(params, cfg, x)
    W = sample_logistic_normal(kw, Wm, Wv)
    Zm, Zv, _ = cl_vrnn.encode_z_sequence(params, cfg, x, W)
    Z = sample_gaussian(kz, Zm, Zv)
    Xd, _ = cl_vrnn.decode_sequence(params, cfg, Z, W, x)
    np.testing.assert_allclose(np.asarray(fused["X_decoded_mean"]), np.asarray(Xd),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused["Z_mean"]), np.asarray(Zm), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fused["Z"]), np.asarray(Z), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fused["W"]), np.asarray(W))


def test_cl_vrnn_fused_scan_gradients_match():
    cfg, params, x, w = _vrnn_setup(use_x_prev=True)
    batch = {"x": x, "x_prev": x, "y": x, "w": w}
    k = jax.random.PRNGKey(9)
    import dataclasses

    # dropout > 0 forces the two-scan path; use 0 with a manual two-scan loss
    def loss_two_scan(p):
        from classifying_vae_lstm_tpu.nn import losses as L
        from classifying_vae_lstm_tpu.nn.distributions import (
            sample_gaussian,
            sample_logistic_normal,
        )

        kw, kz, _, _ = jax.random.split(k, 4)
        Wm, Wv = cl_vrnn.encode_w(p, cfg, batch["x"])
        W = sample_logistic_normal(kw, Wm, Wv)
        Zm, Zv, _ = cl_vrnn.encode_z_sequence(p, cfg, batch["x"], W)
        Z = sample_gaussian(kz, Zm, Zv)
        Xd, _ = cl_vrnn.decode_sequence(p, cfg, Z, W, batch["x_prev"])
        return (
            jnp.mean(L.vae_loss(batch["y"], Xd, cfg.original_dim))
            + jnp.mean(L.kl_loss(Zm, Zv))
            + jnp.mean(L.w_kl_loss(Wm, Wv, cfg.w_log_var_prior))
            + jnp.mean(L.w_rec_loss(batch["w"], W, cfg.n_classes))
        )

    def loss_fused(p):
        return cl_vrnn.loss_and_metrics(p, cfg, batch, k)[0]

    ga = jax.grad(loss_two_scan)(params)
    gb = jax.grad(loss_fused)(params)
    for path_a, path_b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(path_a), np.asarray(path_b),
                                   rtol=1e-4, atol=1e-6)


def test_cl_vrnn_bf16_compute_close_to_f32():
    import dataclasses

    cfg, params, x, w = _vrnn_setup(use_x_prev=True)
    cfg16 = dataclasses.replace(cfg, bf16_compute=True)
    k = jax.random.PRNGKey(5)
    a = cl_vrnn.apply(params, cfg, x, k, x_prev=x)
    b = cl_vrnn.apply(params, cfg16, x, k, x_prev=x)
    assert b["X_decoded_mean"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(a["X_decoded_mean"]),
                               np.asarray(b["X_decoded_mean"]), atol=0.03)


def test_cl_vae_bf16_compute_close_to_f32():
    # (extension) scaled-training mode: wide matmuls in bf16, f32 accumulation,
    # distribution heads f32 — mirrors cl_vrnn.Config.bf16_compute.
    import dataclasses

    cfg, params, x, w = _vae_setup(use_x_prev=True)
    cfg16 = dataclasses.replace(cfg, bf16_compute=True)
    k = jax.random.PRNGKey(5)
    a = cl_vae.apply(params, cfg, x, k, x_prev=x)
    b = cl_vae.apply(params, cfg16, x, k, x_prev=x)
    assert b["x_decoded_mean"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(a["x_decoded_mean"]),
                               np.asarray(b["x_decoded_mean"]), atol=0.03)
    batch = {"x": x, "y": x, "w": w, "x_prev": x}
    (la, _) = cl_vae.loss_and_metrics(params, cfg, batch, k)
    (lb, _) = cl_vae.loss_and_metrics(params, cfg16, batch, k)
    np.testing.assert_allclose(float(la), float(lb), rtol=5e-3)
    g = jax.grad(lambda p: cl_vae.loss_and_metrics(p, cfg16, batch, k)[0])(params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))
