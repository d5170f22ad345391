"""LSTM op tests: scan vs single-step equivalence, Keras-semantics cell."""

import jax
import jax.numpy as jnp
import numpy as np

from classifying_vae_lstm_tpu.nn.core import hard_sigmoid, init_lstm
from classifying_vae_lstm_tpu.ops import lstm_sequence, lstm_step


def test_sequence_matches_stepwise():
    key = jax.random.PRNGKey(0)
    p = init_lstm(key, 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 12))
    h_seq, (h_T, c_T) = lstm_sequence(p, x)
    h = jnp.zeros((3, 16))
    c = jnp.zeros((3, 16))
    for t in range(7):
        h, c = lstm_step(p, x[:, t], h, c)
        np.testing.assert_allclose(np.asarray(h_seq[:, t]), np.asarray(h), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_T), np.asarray(h), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_T), np.asarray(c), rtol=1e-5, atol=1e-6)


def test_cell_oracle_numpy():
    """One step against a NumPy transcription of the Keras LSTM cell."""
    rng = np.random.default_rng(0)
    in_dim, H = 5, 4
    p = {
        "kernel": jnp.array(rng.normal(size=(in_dim, 4 * H)).astype(np.float32)),
        "recurrent_kernel": jnp.array(rng.normal(size=(H, 4 * H)).astype(np.float32)),
        "bias": jnp.array(rng.normal(size=(4 * H,)).astype(np.float32)),
    }
    x = rng.normal(size=(2, in_dim)).astype(np.float32)
    h0 = rng.normal(size=(2, H)).astype(np.float32)
    c0 = rng.normal(size=(2, H)).astype(np.float32)
    h, c = lstm_step(p, jnp.array(x), jnp.array(h0), jnp.array(c0))

    z = x @ np.asarray(p["kernel"]) + h0 @ np.asarray(p["recurrent_kernel"]) + np.asarray(p["bias"])
    hs = lambda v: np.clip(0.2 * v + 0.5, 0, 1)
    i, f, g, o = z[:, :H], z[:, H : 2 * H], z[:, 2 * H : 3 * H], z[:, 3 * H :]
    c_ref = hs(f) * c0 + hs(i) * np.tanh(g)
    h_ref = hs(o) * np.tanh(c_ref)
    np.testing.assert_allclose(np.asarray(c), c_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=1e-4, atol=1e-5)


def test_initial_state_passthrough():
    p = init_lstm(jax.random.PRNGKey(0), 6, 8)
    x = jnp.zeros((2, 1, 6))
    h0 = jnp.ones((2, 8))
    c0 = 2 * jnp.ones((2, 8))
    h_seq, _ = lstm_sequence(p, x, h0, c0)
    h1, c1 = lstm_step(p, x[:, 0], h0, c0)
    np.testing.assert_allclose(np.asarray(h_seq[:, 0]), np.asarray(h1), rtol=1e-5)


def test_jit_and_grad():
    p = init_lstm(jax.random.PRNGKey(0), 6, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 6))

    @jax.jit
    def loss(p, x):
        h_seq, _ = lstm_sequence(p, x)
        return jnp.sum(h_seq**2)

    g = jax.grad(loss)(p, x)
    assert g["kernel"].shape == p["kernel"].shape
    assert float(jnp.abs(g["recurrent_kernel"]).max()) > 0


def test_remat_matches_plain():
    p = init_lstm(jax.random.PRNGKey(0), 6, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 6))

    def loss(p, remat):
        h, _ = lstm_sequence(p, x, remat=remat)
        return jnp.sum(h**2)

    np.testing.assert_allclose(float(loss(p, False)), float(loss(p, True)), rtol=1e-6)
    ga = jax.grad(loss)(p, False)
    gb = jax.grad(loss)(p, True)
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]), rtol=1e-5, atol=1e-6)


def test_bf16_compute_close_to_f32():
    p = init_lstm(jax.random.PRNGKey(0), 6, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 6))
    a, _ = lstm_sequence(p, x)
    b, _ = lstm_sequence(p, x, compute_dtype=jnp.bfloat16)
    assert b.dtype == jnp.float32  # accumulation and gates stay f32
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.05)


def test_keras_lstm_dropout_masks_semantics():
    """Keras-2.0 dropout: 4 per-gate masks, values in {0, 1/(1-p)}."""
    from classifying_vae_lstm_tpu.ops.lstm import keras_lstm_dropout_masks

    masks = np.asarray(keras_lstm_dropout_masks(jax.random.PRNGKey(0), 0.25, 32, 20))
    assert masks.shape == (4, 32, 20)
    vals = np.unique(masks)
    np.testing.assert_allclose(sorted(vals), [0.0, 1.0 / 0.75], rtol=1e-6)
    # the four gate masks are independent draws, not copies
    assert not np.array_equal(masks[0], masks[1])


def test_lstm_sequence_dropout_matches_manual_per_gate():
    """lstm_sequence(dropout=...) == manual per-gate masked projections with
    the same masks, constant over time."""
    from classifying_vae_lstm_tpu.nn.core import init_lstm
    from classifying_vae_lstm_tpu.ops.lstm import (
        keras_lstm_dropout_masks,
        lstm_sequence,
        lstm_step,
    )

    B, T, D, H = 5, 7, 6, 8
    params = init_lstm(jax.random.PRNGKey(0), D, H)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    dkey = jax.random.PRNGKey(2)
    h_seq, _ = lstm_sequence(params, x, dropout=0.4, dropout_key=dkey)

    masks = keras_lstm_dropout_masks(dkey, 0.4, B, D)
    h = jnp.zeros((B, H))
    c = jnp.zeros((B, H))
    from classifying_vae_lstm_tpu.nn.core import hard_sigmoid
    from classifying_vae_lstm_tpu.ops.lstm import _gates

    for t in range(T):
        z = jnp.concatenate(
            [(x[:, t] * masks[g]) @ params["kernel"][:, g * H:(g + 1) * H]
             for g in range(4)], axis=-1,
        ) + params["bias"] + h @ params["recurrent_kernel"]
        h, c = _gates(z, c, H, hard_sigmoid, jnp.tanh)
        np.testing.assert_allclose(np.asarray(h_seq[:, t]), np.asarray(h),
                                   rtol=2e-5, atol=2e-6)


def test_cl_vrnn_dropout_trains():
    from classifying_vae_lstm_tpu.models import cl_vrnn

    cfg = cl_vrnn.Config(original_dim=10, intermediate_dim=8, latent_dim=2,
                         seq_length=5, n_classes=3, dropout=0.3)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (8, 5, 10)) < 0.2).astype(jnp.float32)
    batch = {"x": x, "y": x, "w": jnp.eye(3)[jnp.arange(8) % 3]}
    loss, _ = cl_vrnn.loss_and_metrics(params, cfg, batch, jax.random.PRNGKey(2))
    cfg0 = cl_vrnn.Config(**{**cfg.__dict__, "dropout": 0.0})
    loss0, _ = cl_vrnn.loss_and_metrics(params, cfg0, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert abs(float(loss) - float(loss0)) > 1e-6  # dropout actually applied
