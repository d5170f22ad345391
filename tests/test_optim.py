"""Weight-norm optimizer tests against a NumPy oracle of the reference math
(utils/weightnorm.py:75-178, transcribed as formulas, not code)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from classifying_vae_lstm_tpu.optim import (
    adam_with_weightnorm,
    data_based_init,
    init_optimizer,
    keras_adam,
    sgd_with_weightnorm,
)


def _oracle_adamwn_step(W, grad, st, lr=1e-3, b1=0.9, b2=0.999, eps=1e-8):
    """One reference AdamWithWeightnorm step on a rank-2 W, NumPy."""
    t = st["t"] + 1
    lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
    scaler = st["v_scaler"]
    V = W / scaler[None, :]
    V_norm = np.sqrt((V**2).sum(0))
    g_param = scaler * V_norm
    grad_g = (grad * V).sum(0) / V_norm
    grad_V = scaler[None, :] * (grad - (grad_g / V_norm)[None, :] * V)
    m_g = b1 * st["m_g"] + (1 - b1) * grad_g
    v_g = b2 * st["v_g"] + (1 - b2) * grad_g**2
    new_g = g_param - lr_t * m_g / (np.sqrt(v_g) + eps)
    m = b1 * st["m"] + (1 - b1) * grad_V
    v = b2 * st["v"] + (1 - b2) * grad_V**2
    new_V = V - lr_t * m / (np.sqrt(v) + eps)
    new_norm = np.sqrt((new_V**2).sum(0))
    new_scaler = new_g / new_norm
    new_W = new_scaler[None, :] * new_V
    return new_W, {"t": t, "m": m, "v": v, "m_g": m_g, "v_g": v_g, "v_scaler": new_scaler}


def test_adamwn_matches_oracle_multi_step():
    rng = np.random.default_rng(0)
    W0 = rng.normal(size=(12, 7)).astype(np.float32)
    b0 = rng.normal(size=(7,)).astype(np.float32)
    params = {"layer": {"kernel": jnp.array(W0), "bias": jnp.array(b0)}}
    opt = adam_with_weightnorm()
    state = opt.init(params)

    W = W0.astype(np.float64)
    st = {
        "t": 0,
        "m": np.zeros_like(W),
        "v": np.zeros_like(W),
        "m_g": np.zeros(7),
        "v_g": np.zeros(7),
        "v_scaler": np.ones(7),
    }
    b = b0.astype(np.float64)
    mb = np.zeros_like(b)
    vb = np.zeros_like(b)
    for step in range(5):
        gW = rng.normal(size=W0.shape).astype(np.float32)
        gb = rng.normal(size=b0.shape).astype(np.float32)
        grads = {"layer": {"kernel": jnp.array(gW), "bias": jnp.array(gb)}}
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        # oracle
        W, st = _oracle_adamwn_step(W, gW.astype(np.float64), st)
        t = step + 1
        lr_t = 1e-3 * np.sqrt(1 - 0.999**t) / (1 - 0.9**t)
        mb = 0.9 * mb + 0.1 * gb
        vb = 0.999 * vb + 0.001 * gb**2
        b = b - lr_t * mb / (np.sqrt(vb) + 1e-8)
        np.testing.assert_allclose(np.asarray(params["layer"]["kernel"]), W, rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(params["layer"]["bias"]), b, rtol=2e-4, atol=1e-6)


def test_adamwn_first_step_preserves_direction_scale():
    # With V_scaler=1 the first step must equal plain g/V split math; sanity: a
    # zero gradient produces a zero update.
    params = {"k": jnp.ones((4, 3))}
    opt = adam_with_weightnorm()
    state = opt.init(params)
    updates, _ = opt.update({"k": jnp.zeros((4, 3))}, state, params)
    np.testing.assert_allclose(np.asarray(updates["k"]), 0.0, atol=1e-8)


def test_sgdwn_plain_matches_sgd_for_rank1():
    params = {"b": jnp.array([1.0, 2.0])}
    opt = sgd_with_weightnorm(learning_rate=0.1)
    state = opt.init(params)
    updates, _ = opt.update({"b": jnp.array([1.0, -1.0])}, state, params)
    np.testing.assert_allclose(np.asarray(updates["b"]), [-0.1, 0.1], rtol=1e-6)


def test_sgdwn_rank2_reduces_loss():
    # Weight-norm SGD should descend a simple quadratic in W.
    rng = np.random.default_rng(1)
    W = jnp.array(rng.normal(size=(6, 4)).astype(np.float32))
    target = jnp.array(rng.normal(size=(6, 4)).astype(np.float32))
    params = {"k": W}
    opt = sgd_with_weightnorm(learning_rate=0.05, momentum=0.9)
    state = opt.init(params)
    loss = lambda p: 0.5 * jnp.sum((p["k"] - target) ** 2)
    l0 = float(loss(params))
    for _ in range(50):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss(params)) < 0.1 * l0


def test_keras_adam_bias_correction():
    params = {"w": jnp.zeros((3,))}
    opt = keras_adam(learning_rate=0.1)
    state = opt.init(params)
    g = {"w": jnp.ones((3,))}
    updates, _ = opt.update(g, state, params)
    # first step: lr_t*m/(sqrt(v)+eps) = 0.1*sqrt(1-b2)/(1-b1) * 0.1/(sqrt(0.001)+eps)
    lr_t = 0.1 * np.sqrt(1 - 0.999) / (1 - 0.9)
    expected = -lr_t * 0.1 / (np.sqrt(0.001) + 1e-8)
    np.testing.assert_allclose(np.asarray(updates["w"]), expected, rtol=1e-5)


def test_init_optimizer_names():
    """'adam-wn' is special; everything else passes through to Keras names
    (utils/model_utils.py:52-57 -> Keras 2.0.0 optimizers.get)."""
    for name, wn in [("adam-wn", True), ("adam", False), ("rmsprop", False), ("sgd", False),
                     ("adagrad", False), ("adadelta", False), ("adamax", False),
                     ("nadam", False), ("sgd-wn", False), ("SGD", False)]:
        opt, was_wn = init_optimizer(name)
        assert was_wn == wn
        assert hasattr(opt, "update")
    import pytest

    with pytest.raises(ValueError):  # fail exactly where Keras would
        init_optimizer("no-such-optimizer")


def test_sgd_is_plain_keras_sgd():
    """'sgd' must NOT be weight-normalized: on a rank-2 param the update is
    exactly -lr*g (the reference hands the string to Keras untouched)."""
    opt, _ = init_optimizer("sgd")
    params = {"k": jnp.ones((4, 3))}
    state = opt.init(params)
    g = {"k": jnp.full((4, 3), 0.5)}
    updates, _ = opt.update(g, state, params)
    np.testing.assert_allclose(np.asarray(updates["k"]), -0.01 * 0.5, rtol=1e-6)


def test_keras_sgd_momentum_nesterov_oracle():
    from classifying_vae_lstm_tpu.optim import keras_sgd

    rng = np.random.default_rng(5)
    p0 = rng.normal(size=(6,)).astype(np.float32)
    for nesterov in (False, True):
        params = {"w": jnp.array(p0)}
        opt = keras_sgd(learning_rate=0.1, momentum=0.9, nesterov=nesterov)
        state = opt.init(params)
        p, v = p0.astype(np.float64), np.zeros(6)
        for _ in range(4):
            g = rng.normal(size=(6,)).astype(np.float32)
            updates, state = opt.update({"w": jnp.array(g)}, state, params)
            params = optax.apply_updates(params, updates)
            v = 0.9 * v - 0.1 * g
            p = p + (0.9 * v - 0.1 * g if nesterov else v)
            np.testing.assert_allclose(np.asarray(params["w"]), p, rtol=1e-5, atol=1e-6)


def test_keras_adagrad_oracle():
    from classifying_vae_lstm_tpu.optim import keras_adagrad

    params = {"w": jnp.zeros((3,))}
    opt = keras_adagrad()
    state = opt.init(params)
    p, a = np.zeros(3), np.zeros(3)
    rng = np.random.default_rng(6)
    for _ in range(3):
        g = rng.normal(size=(3,)).astype(np.float32)
        updates, state = opt.update({"w": jnp.array(g)}, state, params)
        params = optax.apply_updates(params, updates)
        a = a + g**2
        p = p - 0.01 * g / (np.sqrt(a) + 1e-8)
        np.testing.assert_allclose(np.asarray(params["w"]), p, rtol=1e-5, atol=1e-7)


def test_keras_adadelta_oracle():
    from classifying_vae_lstm_tpu.optim import keras_adadelta

    params = {"w": jnp.zeros((3,))}
    opt = keras_adadelta()
    state = opt.init(params)
    p, a, d = np.zeros(3), np.zeros(3), np.zeros(3)
    rng = np.random.default_rng(7)
    for _ in range(4):
        g = rng.normal(size=(3,)).astype(np.float32)
        updates, state = opt.update({"w": jnp.array(g)}, state, params)
        params = optax.apply_updates(params, updates)
        a = 0.95 * a + 0.05 * g**2
        step = g * np.sqrt(d + 1e-8) / np.sqrt(a + 1e-8)
        p = p - 1.0 * step
        d = 0.95 * d + 0.05 * step**2
        np.testing.assert_allclose(np.asarray(params["w"]), p, rtol=1e-5, atol=1e-7)


def test_keras_adamax_oracle():
    from classifying_vae_lstm_tpu.optim import keras_adamax

    params = {"w": jnp.zeros((3,))}
    opt = keras_adamax()
    state = opt.init(params)
    p, m, u = np.zeros(3), np.zeros(3), np.zeros(3)
    rng = np.random.default_rng(8)
    for t in range(1, 5):
        g = rng.normal(size=(3,)).astype(np.float32)
        updates, state = opt.update({"w": jnp.array(g)}, state, params)
        params = optax.apply_updates(params, updates)
        lr_t = 0.002 / (1 - 0.9**t)
        m = 0.9 * m + 0.1 * g
        u = np.maximum(0.999 * u, np.abs(g))
        p = p - lr_t * m / (u + 1e-8)
        np.testing.assert_allclose(np.asarray(params["w"]), p, rtol=1e-5, atol=1e-7)


def test_keras_nadam_oracle():
    from classifying_vae_lstm_tpu.optim import keras_nadam

    params = {"w": jnp.zeros((3,))}
    opt = keras_nadam()
    state = opt.init(params)
    p, m, v = np.zeros(3), np.zeros(3), np.zeros(3)
    m_sched = 1.0
    rng = np.random.default_rng(9)
    for t in range(1, 5):
        g = rng.normal(size=(3,)).astype(np.float32)
        updates, state = opt.update({"w": jnp.array(g)}, state, params)
        params = optax.apply_updates(params, updates)
        cache_t = 0.9 * (1 - 0.5 * 0.96 ** (t * 0.004))
        cache_t1 = 0.9 * (1 - 0.5 * 0.96 ** ((t + 1) * 0.004))
        m_sched_new = m_sched * cache_t
        m_sched_next = m_sched_new * cache_t1
        g_prime = g / (1 - m_sched_new)
        m = 0.9 * m + 0.1 * g
        m_prime = m / (1 - m_sched_next)
        v = 0.999 * v + 0.001 * g**2
        v_prime = v / (1 - 0.999**t)
        m_bar = (1 - cache_t) * g_prime + cache_t1 * m_prime
        p = p - 0.002 * m_bar / (np.sqrt(v_prime) + 1e-8)
        m_sched = m_sched_new
        np.testing.assert_allclose(np.asarray(params["w"]), p, rtol=1e-5, atol=1e-7)


def test_data_based_init_cl_vae_all_layers_sequential():
    """Every dense layer is rescaled, and each layer's pre-activation on the
    init batch (recomputed through the rescaled earlier layers with the same
    sample keys) is exactly zero-mean/unit-std — the reference's per-layer
    sess.run loop semantics (weightnorm.py:196-210)."""
    from classifying_vae_lstm_tpu.models import cl_vae
    from classifying_vae_lstm_tpu.nn.distributions import (
        sample_gaussian,
        sample_logistic_normal,
    )
    from classifying_vae_lstm_tpu.optim.data_init import data_based_init_cl_vae

    cfg = cl_vae.Config(original_dim=12, intermediate_dim=8, latent_dim=2,
                        intermediate_class_dim=6, n_classes=3, use_x_prev=True)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.array((rng.random((100, 12)) < 0.3).astype(np.float32)),
        "x_prev": jnp.array((rng.random((100, 12)) < 0.3).astype(np.float32)),
    }
    key = jax.random.PRNGKey(42)
    new = data_based_init_cl_vae(params, cfg, batch, key)
    for name in ("h_w", "w_mean", "w_log_var", "h", "z_mean", "z_log_var",
                 "decoder_h", "x_decoded_mean"):
        assert not np.allclose(np.asarray(new[name]["kernel"]),
                               np.asarray(params[name]["kernel"])), name

    # replay the forward pass with the same keys; check exact normalization
    kw, kz = jax.random.split(key)
    x = batch["x"]
    pre = lambda l, a: np.asarray(a @ new[l]["kernel"] + new[l]["bias"])

    def check(o, name):
        np.testing.assert_allclose(o.mean(0), 0.0, atol=1e-4, err_msg=name)
        np.testing.assert_allclose(o.std(0), 1.0, atol=1e-2, err_msg=name)

    check(pre("h_w", x), "h_w")
    h_w = jax.nn.relu(jnp.asarray(pre("h_w", x)))
    check(pre("w_mean", h_w), "w_mean")
    check(pre("w_log_var", h_w), "w_log_var")
    w = sample_logistic_normal(kw, jnp.asarray(pre("w_mean", h_w)),
                               jnp.asarray(pre("w_log_var", h_w)))
    xw = jnp.concatenate([x, w], axis=-1)
    check(pre("h", xw), "h")
    h = jax.nn.relu(jnp.asarray(pre("h", xw)))
    check(pre("z_mean", h), "z_mean")
    check(pre("z_log_var", h), "z_log_var")
    z = sample_gaussian(kz, jnp.asarray(pre("z_mean", h)), jnp.asarray(pre("z_log_var", h)))
    wz = jnp.concatenate([w, batch["x_prev"], z], axis=-1)
    check(pre("decoder_h", wz), "decoder_h")
    hd = jax.nn.relu(jnp.asarray(pre("decoder_h", wz)))
    check(pre("x_decoded_mean", hd), "x_decoded_mean")


def test_data_based_init_cl_vrnn_heads_and_first_loss():
    """cl_vrnn init touches hW/Wargs/Z heads/X head (not the LSTMs) and
    changes the first-batch loss."""
    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.optim.data_init import data_based_init_cl_vrnn

    cfg = cl_vrnn.Config(original_dim=10, intermediate_dim=8, latent_dim=2,
                         seq_length=6, n_classes=3)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.array((rng.random((100, 6, 10)) < 0.2).astype(np.float32))
    batch = {"x": x, "y": x, "w": jnp.array(np.eye(3, dtype=np.float32)[rng.integers(0, 3, 100)])}
    new = data_based_init_cl_vrnn(params, cfg, batch, jax.random.PRNGKey(7))
    for name in ("hW", "Wargs", "Z_mean", "Z_log_var", "X_decoded_mean"):
        assert not np.allclose(np.asarray(new[name]["kernel"]),
                               np.asarray(params[name]["kernel"])), name
    for name in ("encoder_h", "decoder_h"):  # LSTMs untouched (Dense-only filter)
        np.testing.assert_array_equal(np.asarray(new[name]["kernel"]),
                                      np.asarray(params[name]["kernel"]))
    l0, _ = cl_vrnn.loss_and_metrics(params, cfg, batch, jax.random.PRNGKey(9))
    l1, _ = cl_vrnn.loss_and_metrics(new, cfg, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(l1)) and abs(float(l1) - float(l0)) > 1e-3


def test_data_based_init():
    rng = np.random.default_rng(0)
    params = {"h": {"kernel": jnp.array(rng.normal(size=(10, 5)).astype(np.float32)),
                    "bias": jnp.zeros(5)}}
    x = rng.normal(size=(200, 10)).astype(np.float32)
    pre = x @ np.asarray(params["h"]["kernel"]) + np.asarray(params["h"]["bias"])
    new = data_based_init(params, {"h": jnp.array(pre)})
    out = x @ np.asarray(new["h"]["kernel"]) + np.asarray(new["h"]["bias"])
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(0), 1.0, atol=1e-2)


def test_adamwn_weightnorm_invariant():
    # after any number of steps, v_scaler must equal g/||V|| implicitly:
    # reconstructing V = W/scaler then scaler*||V|| recovers a consistent g.
    rng = np.random.default_rng(3)
    params = {"k": jnp.array(rng.normal(size=(8, 5)).astype(np.float32))}
    opt = adam_with_weightnorm()
    state = opt.init(params)
    for _ in range(3):
        g = {"k": jnp.array(rng.normal(size=(8, 5)).astype(np.float32))}
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    W = np.asarray(params["k"])
    scaler = np.asarray(state.v_scaler["k"])
    V = W / scaler[None, :]
    # by construction new_W = new_scaler * new_V, so W/scaler should have norm g/scaler
    np.testing.assert_allclose(scaler * np.sqrt((V**2).sum(0)) / np.sqrt((V**2).sum(0)), scaler)


def test_adamwn_decay():
    """lr decay: lr_t shrinks as 1/(1 + decay*(t-1)) (reference weightnorm.py:81-82)."""
    params = {"b": jnp.zeros((3,))}
    opt = adam_with_weightnorm(learning_rate=0.1, decay=1.0)
    state = opt.init(params)
    g = {"b": jnp.ones((3,))}
    u1, state = opt.update(g, state, params)
    u2, state = opt.update(g, state, params)
    # second step lr halves (decay factor 1/(1+1)); moments also evolve, so
    # just check the update magnitude dropped by roughly half
    assert abs(float(u2["b"][0])) < 0.75 * abs(float(u1["b"][0]))


def test_sgdwn_nesterov():
    params = {"k": jnp.ones((4, 3))}
    opt = sgd_with_weightnorm(learning_rate=0.1, momentum=0.9, nesterov=True)
    state = opt.init(params)
    g = {"k": 0.1 * jnp.ones((4, 3))}
    updates, state = opt.update(g, state, params)
    import optax

    params = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(params["k"])).all()
    # nesterov lookahead: first step = momentum*v - lr*g applied in g/V space
    updates2, _ = opt.update(g, state, params)
    assert np.abs(np.asarray(updates2["k"])).max() > np.abs(np.asarray(updates["k"])).max() * 0.9


def test_keras_rmsprop_step():
    from classifying_vae_lstm_tpu.optim import keras_rmsprop

    params = {"w": jnp.zeros((2,))}
    opt = keras_rmsprop(learning_rate=0.01)
    state = opt.init(params)
    g = {"w": jnp.ones((2,))}
    updates, _ = opt.update(g, state, params)
    expected = -0.01 * 1.0 / (np.sqrt(0.1) + 1e-8)
    np.testing.assert_allclose(np.asarray(updates["w"]), expected, rtol=1e-5)
