"""Composition parity vs the reference-semantics oracle (VERDICT item 1).

``tools/ref_oracle.py`` is an independent torch/f64 transcription of the
reference Keras graphs and AdamWithWeightnorm. These tests drive the JAX
framework and the oracle with the SAME init, SAME batch order, and SAME
noise draws for N optimizer steps and assert the per-step training losses
(and final parameters) agree to float32 tolerance — the end-to-end
"train-on-tiny-slice loss-curve comparison vs reference semantics" that
SURVEY §4 prescribes. Every sub-oracle (losses, optimizer, schedules) passed
individually in round 1; this asserts the *composition*.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

sys.path.insert(0, "/root/repo")

from classifying_vae_lstm_tpu.models import cl_vae, cl_vrnn
from classifying_vae_lstm_tpu.optim import init_optimizer
from tools.ref_oracle import RefAdamWN, RefCLVAE, RefCLVRNN, train_steps


def _np_params(params):
    return jax.tree.map(lambda a: np.asarray(a), params)


def _jax_losses(family_loss, params, batches, keys, weights):
    """N jitted train steps with adam-wn; returns per-step losses + params."""
    opt, _ = init_optimizer("adam-wn")
    opt_state = opt.init(params)
    kl_w, class_w, w_kl_w = (jnp.float32(w) for w in weights)

    @jax.jit
    def step(params, opt_state, batch, key):
        (loss, _), grads = jax.value_and_grad(family_loss, has_aux=True)(
            params, batch, key, kl_w, class_w, w_kl_w
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for batch, k in zip(batches, keys):
        params, opt_state, loss = step(params, opt_state, batch, k)
        losses.append(float(loss))
    return losses, params


def _vae_noise(key, B, K1, L):
    kw, kz = jax.random.split(key)
    return (np.asarray(jax.random.normal(kw, (B, K1))),
            np.asarray(jax.random.normal(kz, (B, L))))


def _vrnn_noise(key, B, K1, T, L):
    kw, kz, _, _ = jax.random.split(key, 4)
    return (np.asarray(jax.random.normal(kw, (B, K1))),
            np.asarray(jax.random.normal(kz, (B, T, L))))


def test_cl_vae_composition_matches_reference_oracle():
    D, H, L, CK, K = 16, 12, 3, 8, 4
    B, STEPS = 20, 8
    weights = (0.7, 1.3, 0.5)  # non-trivial kl/class/w_kl weights
    cfg = cl_vae.Config(original_dim=D, intermediate_dim=H, latent_dim=L,
                        intermediate_class_dim=CK, n_classes=K, use_x_prev=False)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(STEPS):
        x = (rng.random((B, D)) < 0.25).astype(np.float32)
        w = np.eye(K, dtype=np.float32)[rng.integers(0, K, B)]
        batches.append({"x": x, "y": x, "w": w})
    keys = [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(STEPS)]
    noises = [_vae_noise(k, B, K - 1, L) for k in keys]

    oracle = RefCLVAE(_np_params(params), D, H, L, K)
    opt = RefAdamWN(oracle.parameters())
    ref_losses = train_steps(oracle, opt, batches, noises, weights)

    loss_fn = lambda p, b, k, klw, cw, wklw: cl_vae.loss_and_metrics(p, cfg, b, k, klw, cw, wklw)
    jbatches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    jax_losses, jax_params = _jax_losses(loss_fn, params, jbatches, keys, weights)

    np.testing.assert_allclose(jax_losses, ref_losses, rtol=3e-4, atol=3e-4)
    # the trained parameters themselves agree (composition incl. AdamWN)
    for name in ("h_w", "z_mean", "decoder_h", "x_decoded_mean"):
        np.testing.assert_allclose(
            np.asarray(jax_params[name]["kernel"]),
            oracle.p[name]["kernel"].detach().numpy(),
            rtol=5e-3, atol=5e-5, err_msg=name,
        )


def test_cl_vrnn_composition_matches_reference_oracle():
    D, H, L, T, K = 10, 8, 2, 5, 3
    B, STEPS = 16, 8
    weights = (1.0, 1.0, 1.0)
    cfg = cl_vrnn.Config(original_dim=D, intermediate_dim=H, latent_dim=L,
                         seq_length=T, n_classes=K, use_x_prev=True)
    params = cl_vrnn.init(jax.random.PRNGKey(1), cfg)

    rng = np.random.default_rng(1)
    batches = []
    for _ in range(STEPS):
        x = (rng.random((B, T, D)) < 0.2).astype(np.float32)
        xp = (rng.random((B, T, D)) < 0.2).astype(np.float32)
        w = np.eye(K, dtype=np.float32)[rng.integers(0, K, B)]
        batches.append({"x": x, "y": x, "w": w, "x_prev": xp})
    keys = [jax.random.fold_in(jax.random.PRNGKey(11), i) for i in range(STEPS)]
    noises = [_vrnn_noise(k, B, K - 1, T, L) for k in keys]

    oracle = RefCLVRNN(_np_params(params), D, H, L, T, K, use_x_prev=True)
    opt = RefAdamWN(oracle.parameters())
    ref_losses = train_steps(oracle, opt, batches, noises, weights)

    loss_fn = lambda p, b, k, klw, cw, wklw: cl_vrnn.loss_and_metrics(p, cfg, b, k, klw, cw, wklw)
    jbatches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    jax_losses, jax_params = _jax_losses(loss_fn, params, jbatches, keys, weights)

    np.testing.assert_allclose(jax_losses, ref_losses, rtol=3e-4, atol=3e-4)
    for name in ("encoder_h", "decoder_h", "Z_mean", "X_decoded_mean"):
        np.testing.assert_allclose(
            np.asarray(jax_params[name]["kernel"]),
            oracle.p[name]["kernel"].detach().numpy(),
            rtol=5e-3, atol=5e-5, err_msg=name,
        )


@pytest.mark.slow
def test_cl_vae_loss_curve_on_real_jsb_slice(jsb_cs_path):
    """SURVEY §4 parity test as prescribed: tiny slice of the real corpus,
    reference defaults (88/88/2, adam-wn, all weights 1), loss curves match."""
    from classifying_vae_lstm_tpu.data import PianoData
    from classifying_vae_lstm_tpu.data.pianoroll import to_categorical

    P = PianoData(jsb_cs_path, batch_size=100, seq_length=1, return_y_next=False,
                  squeeze_x=True, squeeze_y=True)
    K = int(len(np.unique(P.train_song_keys)))
    cfg = cl_vae.Config(original_dim=88, intermediate_dim=88, latent_dim=2,
                        intermediate_class_dim=88, n_classes=K)
    params = cl_vae.init(jax.random.PRNGKey(3), cfg)

    B, STEPS = 100, 6
    w_all = to_categorical(P.train_song_keys, K)
    batches = [{"x": P.x_train[i * B:(i + 1) * B].astype(np.float32),
                "y": P.x_train[i * B:(i + 1) * B].astype(np.float32),
                "w": w_all[i * B:(i + 1) * B].astype(np.float32)}
               for i in range(STEPS)]
    keys = [jax.random.fold_in(jax.random.PRNGKey(13), i) for i in range(STEPS)]
    noises = [_vae_noise(k, B, K - 1, 2) for k in keys]

    oracle = RefCLVAE(_np_params(params), 88, 88, 2, K)
    opt = RefAdamWN(oracle.parameters())
    ref_losses = train_steps(oracle, opt, batches, noises, (1.0, 1.0, 1.0))

    loss_fn = lambda p, b, k, klw, cw, wklw: cl_vae.loss_and_metrics(p, cfg, b, k, klw, cw, wklw)
    jbatches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    jax_losses, _ = _jax_losses(loss_fn, params, jbatches, keys, (1.0, 1.0, 1.0))

    np.testing.assert_allclose(jax_losses, ref_losses, rtol=3e-4, atol=3e-4)
    assert ref_losses[-1] < ref_losses[0]  # both actually learn
