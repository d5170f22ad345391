"""NLL estimator tests: numerics helpers vs oracle, IW bound sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from classifying_vae_lstm_tpu.evaluation import iw_nll_cl_vae, iw_nll_cl_vrnn
from classifying_vae_lstm_tpu.models import cl_vae, cl_vrnn
from classifying_vae_lstm_tpu.utils import LL_frame, bincrossentropy, logmeanexp, logsumexp


def test_logmeanexp_oracle():
    rng = np.random.default_rng(0)
    vs = rng.normal(size=(16, 5))
    np.testing.assert_allclose(logmeanexp(vs), np.log(np.exp(vs).mean(0)), rtol=1e-10)
    np.testing.assert_allclose(logsumexp(vs), np.log(np.exp(vs).sum(0)), rtol=1e-10)


def test_logmeanexp_stable_for_large_values():
    vs = np.array([[1000.0], [1000.0]])
    np.testing.assert_allclose(logmeanexp(vs), 1000.0)


def test_bincrossentropy_and_ll_frame():
    x = np.array([[1.0, 0.0]])
    xhat = np.array([[0.9, 0.2]])
    oracle = np.array([[np.log(0.9), np.log(0.8)]])
    np.testing.assert_allclose(bincrossentropy(x, xhat), oracle, rtol=1e-7)
    ll = LL_frame(np.tile(x, (1, 44)), np.tile(xhat, (1, 44)))
    np.testing.assert_allclose(ll, -88 * oracle.mean(), rtol=1e-5)


def test_iw_nll_more_samples_tightens_bound():
    """E[IW-NLL] is monotone non-increasing in K (tighter bound)."""
    cfg = cl_vae.Config(original_dim=12, intermediate_dim=8, latent_dim=2,
                        intermediate_class_dim=6, n_classes=3)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (64, 12)) < 0.2).astype(jnp.float32)
    nll1 = float(iw_nll_cl_vae(params, cfg, x, x, jax.random.PRNGKey(2), 1).mean())
    nll64 = float(iw_nll_cl_vae(params, cfg, x, x, jax.random.PRNGKey(2), 64).mean())
    assert nll64 <= nll1 + 0.05


def test_iw_nll_reasonable_range():
    cfg = cl_vae.Config(original_dim=12, intermediate_dim=8, latent_dim=2,
                        intermediate_class_dim=6, n_classes=3)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (32, 12)) < 0.2).astype(jnp.float32)
    nll = np.asarray(iw_nll_cl_vae(params, cfg, x, x, jax.random.PRNGKey(2), 16))
    assert np.isfinite(nll).all()
    # untrained model on 12-dim binary data: ~12*log(2) +/- slack
    assert 2.0 < nll.mean() < 40.0


def test_iw_nll_vrnn_per_frame_normalization():
    cfg = cl_vrnn.Config(original_dim=10, intermediate_dim=8, latent_dim=2,
                         seq_length=6, n_classes=3)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (16, 6, 10)) < 0.2).astype(jnp.float32)
    nll = np.asarray(iw_nll_cl_vrnn(params, cfg, x, x, jax.random.PRNGKey(2), 8))
    assert nll.shape == (16,)
    assert np.isfinite(nll).all()
    assert 1.0 < nll.mean() < 40.0  # nats per FRAME, not per window


def test_iw_nll_dataset_covers_full_split():
    """The final partial batch is padded, not dropped: per-example NLLs cover
    100% of the split and the padded wrap-around rows match the head rows."""
    from classifying_vae_lstm_tpu.evaluation.nll import iw_nll_dataset

    cfg = cl_vae.Config(original_dim=12, intermediate_dim=8, latent_dim=2,
                        intermediate_class_dim=6, n_classes=3)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    n, bs = 53, 16  # 53 % 16 = 5: a 3-batch scan + an 11-row pad
    x = (jax.random.uniform(jax.random.PRNGKey(1), (n, 12)) < 0.2).astype(jnp.float32)
    data = {"x": x, "y": x}
    nlls = np.asarray(iw_nll_dataset(params, cfg, data, jax.random.PRNGKey(2), 4, bs))
    assert nlls.shape == (n,)  # no truncation to 48
    assert np.isfinite(nlls).all()
    # exactly divisible split: identical path, still full coverage
    nlls2 = np.asarray(iw_nll_dataset(params, cfg, {"x": x[:48], "y": x[:48]},
                                      jax.random.PRNGKey(2), 4, bs))
    assert nlls2.shape == (48,)
    np.testing.assert_allclose(nlls[:48], nlls2, rtol=1e-5)


def test_key_pitch_classes():
    from classifying_vae_lstm_tpu.evaluation.key_consistency import key_to_pitch_classes

    np.testing.assert_array_equal(sorted(key_to_pitch_classes("C")), [0, 2, 4, 5, 7, 9, 11])
    # B- major: Bb C D Eb F G A -> {10, 0, 2, 3, 5, 7, 9}
    np.testing.assert_array_equal(sorted(key_to_pitch_classes("B-")), [0, 2, 3, 5, 7, 9, 10])
    # minor maps through relative major: 'a' -> C
    np.testing.assert_array_equal(sorted(key_to_pitch_classes("a")), [0, 2, 4, 5, 7, 9, 11])


def test_in_scale_fraction():
    from classifying_vae_lstm_tpu.evaluation.key_consistency import in_scale_fraction

    roll = np.zeros((4, 88))
    # C major triad: C4=60, E4=64, G4=67 -> indices 39, 43, 46
    roll[:, [60 - 21, 64 - 21, 67 - 21]] = 1
    assert in_scale_fraction(roll, "C") == 1.0
    # F# major does not contain C or E or G naturals
    assert in_scale_fraction(roll, "F#") < 0.5
    assert np.isnan(in_scale_fraction(np.zeros((4, 88)), "C"))


def test_key_consistency_report_shape():
    from classifying_vae_lstm_tpu.evaluation.key_consistency import key_consistency_report

    rng = np.random.default_rng(0)
    rolls = [(rng.random((8, 88)) < 0.05).astype(float) for _ in range(4)]
    rep = key_consistency_report(rolls, ["C", "C", "G", "G"])
    assert set(rep) == {"conditioned", "mismatched", "margin"}
