"""Training-loop tests: anneal schedule, early stopping, checkpoint roundtrip,
fit() semantics, and loss decrease on synthetic data."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from classifying_vae_lstm_tpu.models import cl_vae
from classifying_vae_lstm_tpu.optim import init_optimizer
from classifying_vae_lstm_tpu.train import Trainer, fit, load_checkpoint, save_checkpoint
from classifying_vae_lstm_tpu.train.callbacks import (
    AnnealSchedule,
    CheckpointPolicy,
    EarlyStoppingAfterEpoch,
)


def test_anneal_schedule_linear():
    # reference AnnealLossWeight: start + (epoch/n)*(final-start), final from n on
    s = AnnealSchedule(start_value=0.1, final_value=1.0, n_epochs=10)
    assert s(0) == 0.1
    np.testing.assert_allclose(s(5), 0.1 + 0.5 * 0.9)
    assert s(10) == 1.0 and s(50) == 1.0


def test_anneal_schedule_disabled_is_constant_one():
    s = AnnealSchedule(n_epochs=0)
    assert s(0) == 1.0 and s(100) == 1.0


def test_anneal_schedule_sigmoid():
    s = AnnealSchedule(start_value=0.0, final_value=1.0, n_epochs=10, slope=10)
    assert s(1) < 0.1 and s(9) > 0.9
    np.testing.assert_allclose(s(5), 0.5, atol=0.01)


def test_early_stopping_inert_until_min_epoch():
    es = EarlyStoppingAfterEpoch(min_epoch=5, patience=1)
    # worsening losses before min_epoch never stop
    for e in range(5):
        assert not es.should_stop(e, 100.0 + e)
    assert not es.should_stop(5, 1.0)  # new best
    assert not es.should_stop(6, 2.0)  # wait 0 < patience -> wait becomes 1
    assert es.should_stop(7, 2.0)  # wait 1 >= patience -> stop (reference :101-104)


def test_checkpoint_policy_best_only():
    cp = CheckpointPolicy(min_epoch=2)
    assert not cp.should_save(0, 1.0)  # inert
    assert cp.should_save(2, 5.0)
    assert not cp.should_save(3, 6.0)
    assert cp.should_save(4, 4.0)


def test_checkpoint_roundtrip(tmp_path):
    cfg = cl_vae.Config(original_dim=10, intermediate_dim=8, latent_dim=2,
                        intermediate_class_dim=6, n_classes=3)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "m.npz")
    save_checkpoint(path, params)
    loaded = load_checkpoint(path)
    assert jax.tree.structure(loaded) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _make_trainer_and_data(n=120, batch=20, n_classes=3):
    cfg = cl_vae.Config(original_dim=12, intermediate_dim=16, latent_dim=2,
                        intermediate_class_dim=8, n_classes=n_classes)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (n, 12)) < 0.25).astype(jnp.float32)
    w = jax.nn.one_hot(jnp.arange(n) % n_classes, n_classes)
    data = {"x": x, "y": x, "w": w}
    loss_fn = functools.partial(
        lambda c, p, b, k, klw, cw, wklw: cl_vae.loss_and_metrics(p, c, b, k, klw, cw, wklw), cfg
    )
    opt, _ = init_optimizer("adam-wn")
    return Trainer(loss_fn, opt, batch_size=batch), params, data


def test_fit_loss_decreases_and_history(tmp_path):
    trainer, params, data = _make_trainer_and_data()
    ckpt = str(tmp_path / "run.npz")
    _, best_params, history, best_loss = fit(
        trainer, params, data, data, num_epochs=8, key=jax.random.PRNGKey(2),
        patience=0, min_epoch=0, checkpoint_path=ckpt, verbose=False,
    )
    assert history["loss"][-1] < history["loss"][0]
    for k in ("loss", "val_loss", "x_decoded_mean_loss", "w_acc"):
        assert len(history[k]) == 8
    assert os.path.exists(ckpt)
    assert best_loss["val_loss"] == min(history["val_loss"])


def test_fit_early_stops(tmp_path):
    trainer, params, data = _make_trainer_and_data()
    # patience 1, min_epoch 0: will stop well before 200 epochs
    _, _, history, _ = fit(
        trainer, params, data, data, num_epochs=200, key=jax.random.PRNGKey(2),
        patience=1, min_epoch=0, verbose=False,
    )
    assert len(history["loss"]) < 200


def test_fit_anneal_weights_enter_loss():
    trainer, params, data = _make_trainer_and_data()
    # with heavy annealing the epoch-0 total must exclude most of the kl terms
    _, _, h1, _ = fit(trainer, params, data, data, num_epochs=1, key=jax.random.PRNGKey(2),
                      kl_anneal=10, w_kl_anneal=10, patience=0, verbose=False)
    _, _, h2, _ = fit(trainer, params, data, data, num_epochs=1, key=jax.random.PRNGKey(2),
                      patience=0, verbose=False)
    # identical params/key; only the weights differ -> totals must differ
    assert h1["loss"][0] < h2["loss"][0]


def test_trainer_shuffles_between_epochs():
    trainer, params, data = _make_trainer_and_data()
    opt_state = trainer.optimizer.init(params)
    one = jnp.float32(1.0)
    p1, s1, m1 = trainer.train_epoch(params, opt_state, data, jax.random.PRNGKey(1), one, one, one)
    # same init params, different epoch key -> different batch order -> different result
    params2 = cl_vae.init(jax.random.PRNGKey(0), cl_vae.Config(
        original_dim=12, intermediate_dim=16, latent_dim=2, intermediate_class_dim=8, n_classes=3))
    opt_state2 = trainer.optimizer.init(params2)
    p2, s2, m2 = trainer.train_epoch(params2, opt_state2, data, jax.random.PRNGKey(99), one, one, one)
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2))]
    assert max(diffs) > 1e-6


def test_train_epochs_compiled_mode_matches_sequential_shapes():
    """Trainer.train_epochs: per-epoch metric arrays, loss decreases."""
    trainer, params, data = _make_trainer_and_data()
    opt_state = trainer.optimizer.init(params)
    E = 4
    kl_ws = jnp.ones(E)
    w_kl_ws = jnp.ones(E)
    p, s, ms, vms = trainer.train_epochs(
        jax.tree.map(jnp.copy, params), opt_state, data, data,
        jax.random.PRNGKey(3), kl_ws, jnp.float32(1.0), w_kl_ws,
    )
    assert ms["loss"].shape == (E,)
    assert vms["loss"].shape == (E,)
    assert float(ms["loss"][-1]) < float(ms["loss"][0])


def test_fit_trace_dir_writes_profile(tmp_path):
    trainer, params, data = _make_trainer_and_data()
    trace_dir = str(tmp_path / "trace")
    fit(trainer, params, data, data, num_epochs=3, key=jax.random.PRNGKey(2),
        patience=0, verbose=False, trace_dir=trace_dir)
    assert os.path.exists(trace_dir)
    files = [f for _, _, fs in os.walk(trace_dir) for f in fs]
    assert files  # a profile was captured


def test_training_fully_deterministic_under_seed():
    """Same data + same keys -> bitwise-identical trained params."""
    results = []
    for _ in range(2):
        trainer, params, data = _make_trainer_and_data()
        opt_state = trainer.optimizer.init(params)
        one = jnp.float32(1.0)
        p, s, m = trainer.train_epoch(params, opt_state, data, jax.random.PRNGKey(7), one, one, one)
        results.append((jax.tree.leaves(p), float(m["loss"])))
    for a, b in zip(results[0][0], results[1][0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert results[0][1] == results[1][1]


def test_save_checkpoint_without_epoch(tmp_path):
    from classifying_vae_lstm_tpu.train.checkpoint import load_opt_state

    trainer, params, data = _make_trainer_and_data()
    opt_state = trainer.optimizer.init(params)
    path = str(tmp_path / "ne.npz")
    save_checkpoint(path, params, opt_state)  # no epoch recorded
    st, epoch = load_opt_state(path.replace(".npz", ".opt.npz"), opt_state)
    assert epoch == 0


def test_train_epoch_drops_remainder():
    """N not a batch multiple: remainder dropped (reference truncation rule)."""
    trainer, params, data = _make_trainer_and_data(n=120, batch=50)  # 120 -> 2 batches
    opt_state = trainer.optimizer.init(params)
    one = jnp.float32(1.0)
    p, s, m = trainer.train_epoch(params, opt_state, data, jax.random.PRNGKey(0), one, one, one)
    assert np.isfinite(float(m["loss"]))


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest = __import__("pytest")
    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest.skip("orbax not installed")
    from classifying_vae_lstm_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    cfg = cl_vae.Config(original_dim=10, intermediate_dim=8, latent_dim=2,
                        intermediate_class_dim=6, n_classes=3)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, params, epoch=5)
    restored = load_checkpoint_orbax(path)
    assert int(restored["epoch"]) == 5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
