"""Generation tests: shapes, determinism under fixed keys, semantics flags."""

import jax
import jax.numpy as jnp
import numpy as np

from classifying_vae_lstm_tpu.models import cl_vae, cl_vrnn
from classifying_vae_lstm_tpu.sampling import generate_cl_vae, generate_cl_vrnn, infer_w_cl_vrnn
from classifying_vae_lstm_tpu.sampling.generate import (
    generate_cl_vae_batch,
    generate_cl_vrnn_batch,
)


def _vae():
    cfg = cl_vae.Config(original_dim=16, intermediate_dim=12, latent_dim=3,
                        intermediate_class_dim=8, n_classes=4, use_x_prev=True)
    return cfg, cl_vae.init(jax.random.PRNGKey(0), cfg)


def _vrnn():
    cfg = cl_vrnn.Config(original_dim=16, intermediate_dim=12, latent_dim=3,
                         seq_length=4, n_classes=4, use_x_prev=True)
    return cfg, cl_vrnn.init(jax.random.PRNGKey(0), cfg)


def test_cl_vae_generation_binary_and_deterministic():
    cfg, params = _vae()
    seed = (jax.random.uniform(jax.random.PRNGKey(1), (16,)) < 0.2).astype(jnp.float32)
    a = generate_cl_vae(params, cfg, seed, 10, jax.random.PRNGKey(2))
    b = generate_cl_vae(params, cfg, seed, 10, jax.random.PRNGKey(2))
    c = generate_cl_vae(params, cfg, seed, 10, jax.random.PRNGKey(3))
    assert a.shape == (10, 16)
    assert set(np.unique(np.asarray(a))) <= {0.0, 1.0}
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same key
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0  # different key


def test_cl_vae_w_val_conditions_generation():
    cfg, params = _vae()
    seed = (jax.random.uniform(jax.random.PRNGKey(1), (16,)) < 0.2).astype(jnp.float32)
    k = jax.random.PRNGKey(2)
    a = generate_cl_vae(params, cfg, seed, 10, k, w_val=jnp.array([1.0, 0, 0, 0]))
    b = generate_cl_vae(params, cfg, seed, 10, k, w_val=jnp.array([0, 0, 0, 1.0]))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0


def test_cl_vae_batch_is_noise_explicit_scan():
    cfg, params = _vae()
    seeds = (jax.random.uniform(jax.random.PRNGKey(1), (3, 16)) < 0.2).astype(jnp.float32)
    key = jax.random.PRNGKey(5)
    batch = generate_cl_vae_batch(params, cfg, seeds, 6, key)
    assert batch.shape == (3, 6, 16)
    assert set(np.unique(np.asarray(batch))) <= {0.0, 1.0}
    # the batch sampler is the noise-explicit batched scan (same key -> same
    # frames as generate_cl_vae_batch_noise with the noise it pre-draws);
    # per-song w inference uses the same encode_w + mean-logit softmax
    from classifying_vae_lstm_tpu.nn.distributions import sample_logistic_normal
    from classifying_vae_lstm_tpu.sampling.generate import (
        draw_generation_noise, generate_cl_vae_batch_noise)

    kw, kn = jax.random.split(key)
    wm, wlv = cl_vae.encode_w(params, seeds)
    ws = sample_logistic_normal(kw, wm, wlv, add_noise=False)
    eps, u = draw_generation_noise(kn, 3, 6, cfg.latent_dim, cfg.original_dim)
    ref = generate_cl_vae_batch_noise(params, cfg, seeds, 6, eps, u, ws)
    np.testing.assert_array_equal(np.asarray(batch), np.asarray(ref))

    # deterministic-noise consistency with the per-song sampler: zero z-noise
    # and u=0.5 make both paths deterministic -> frame-identical
    eps0, uh = jnp.zeros_like(eps), jnp.full_like(u, 0.5)
    got = generate_cl_vae_batch_noise(params, cfg, seeds, 6, eps0, uh, ws)
    for b in range(3):
        x_prev, x_prev_t = seeds[b][None], seeds[b][None]
        outs = []
        for t in range(6):
            zm, zv = cl_vae.encode_z(params, cfg, x_prev, ws[b : b + 1])
            xm = cl_vae.decode(params, cfg, ws[b : b + 1], zm,
                               x_prev_t if cfg.use_x_prev else None)
            x_t = (0.5 < xm).astype(jnp.float32)
            x_prev, x_prev_t = x_t, x_prev
            outs.append(x_t[0])
        np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(jnp.stack(outs)))


def test_infer_w_is_simplex_and_chunked():
    cfg, params = _vrnn()
    seed = (jax.random.uniform(jax.random.PRNGKey(1), (12, 16)) < 0.2).astype(jnp.float32)
    w = infer_w_cl_vrnn(params, cfg, seed, jax.random.PRNGKey(2))
    assert w.shape == (4,)
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-5)
    wd = infer_w_cl_vrnn(params, cfg, seed, jax.random.PRNGKey(2), w_discrete=True)
    assert set(np.unique(np.asarray(wd))) <= {0.0, 1.0} and float(wd.sum()) == 1.0


def test_cl_vrnn_generation_post_seed_only():
    cfg, params = _vrnn()
    seed = (jax.random.uniform(jax.random.PRNGKey(1), (8, 16)) < 0.2).astype(jnp.float32)
    w = jnp.array([0.25, 0.25, 0.25, 0.25])
    xs = generate_cl_vrnn(params, cfg, seed, 5, jax.random.PRNGKey(2), w)
    assert xs.shape == (5, 16)  # Xs[nseedsteps:] (cl_vrnn/model.py:60)
    assert set(np.unique(np.asarray(xs))) <= {0.0, 1.0}


def test_cl_vrnn_seed_conditions_output():
    # compare decoder PROBABILITIES (binary draws under a shared key can
    # coincide for an untrained model whose probs sit near 0.5)
    cfg, params = _vrnn()
    k = jax.random.PRNGKey(2)
    w = jnp.array([1.0, 0, 0, 0])
    s1 = jnp.zeros((8, 16))
    s2 = jnp.ones((8, 16))
    a = generate_cl_vrnn(params, cfg, s1, 6, k, w, return_probs=True)
    b = generate_cl_vrnn(params, cfg, s2, 6, k, w, return_probs=True)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_cl_vrnn_batch_matches_noise_sampler():
    """The batch sampler is the noise-explicit batched scan: same key ->
    exactly the frames generate_cl_vrnn_batch_noise produces with the noise
    generate_cl_vrnn_batch pre-draws. (The per-song generate_cl_vrnn is the
    same generative process — pinned by the deterministic-noise test in
    test_pallas_generate.py — but consumes its PRNG per song, so draws
    differ.)"""
    from classifying_vae_lstm_tpu.sampling.generate import (
        draw_generation_noise, generate_cl_vrnn_batch_noise)

    cfg, params = _vrnn()
    seeds = (jax.random.uniform(jax.random.PRNGKey(1), (3, 8, 16)) < 0.2).astype(jnp.float32)
    ws = jax.nn.one_hot(jnp.arange(3), 4)
    key = jax.random.PRNGKey(5)
    batch = generate_cl_vrnn_batch(params, cfg, seeds, 4, key, ws)
    assert batch.shape == (3, 4, 16)
    assert set(np.unique(np.asarray(batch))) <= {0.0, 1.0}
    eps, u = draw_generation_noise(key, 3, 12, cfg.latent_dim, 16)
    ref = generate_cl_vrnn_batch_noise(params, cfg, seeds, 4, eps, u, ws)
    np.testing.assert_array_equal(np.asarray(batch), np.asarray(ref))


def test_reference_sampler_api():
    """sample_x/sample_w/sample_z wrappers (reference cl_vae/model.py:44-74)."""
    from classifying_vae_lstm_tpu.sampling import sample_w, sample_x, sample_z

    k = jax.random.PRNGKey(0)
    x = sample_x(k, jnp.full((5, 88), 0.5))
    assert set(np.unique(np.asarray(x))) <= {0.0, 1.0}
    w = sample_w(k, (jnp.zeros((2, 3)), jnp.zeros((2, 3))))
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    w0 = sample_w(k, (jnp.zeros((2, 3)), jnp.zeros((2, 3))), add_noise=False)
    np.testing.assert_allclose(np.asarray(w0), 0.25)
    z = sample_z(k, (jnp.ones((4, 2)), jnp.full((4, 2), -20.0)))
    np.testing.assert_allclose(np.asarray(z), 1.0, atol=1e-3)
