"""Data/tensor-parallel tests on the virtual 8-device CPU mesh (SURVEY §4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from classifying_vae_lstm_tpu.models import cl_vae
from classifying_vae_lstm_tpu.optim import init_optimizer
from classifying_vae_lstm_tpu.parallel import make_mesh, shard_batch, shard_training_state
from classifying_vae_lstm_tpu.train import Trainer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(n=160, batch=40, n_classes=4):
    cfg = cl_vae.Config(original_dim=16, intermediate_dim=16, latent_dim=2,
                        intermediate_class_dim=8, n_classes=n_classes)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (n, 16)) < 0.25).astype(jnp.float32)
    w = jax.nn.one_hot(jnp.arange(n) % n_classes, n_classes)
    data = {"x": x, "y": x, "w": w}
    loss_fn = functools.partial(
        lambda c, p, b, k, klw, cw, wklw: cl_vae.loss_and_metrics(p, c, b, k, klw, cw, wklw), cfg
    )
    opt, _ = init_optimizer("adam-wn")
    return Trainer(loss_fn, opt, batch_size=batch), params, data


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == 8


def test_sharded_training_matches_single_device():
    """DP-sharded epoch == unsharded epoch (same key) within fp tolerance."""
    trainer, params, data = _setup()
    one = jnp.float32(1.0)
    key = jax.random.PRNGKey(7)

    opt_state = trainer.optimizer.init(params)
    p_ref, _, m_ref = trainer.train_epoch(
        jax.tree.map(jnp.copy, params), opt_state, data, key, one, one, one
    )

    mesh = make_mesh(n_data=8, n_model=1)
    trainer2, params2, _ = _setup()
    params2, sh_data, _ = shard_training_state(mesh, params2, data, data)
    opt_state2 = trainer2.optimizer.init(params2)
    p_sh, _, m_sh = trainer2.train_epoch(params2, opt_state2, sh_data, key, one, one, one)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_sh["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_tensor_parallel_epoch_matches_single_device():
    """4x2 DP x TP train_epoch == single-device epoch within fp tolerance.

    Column (last-dim) sharding splits each kernel's OUTPUT features across
    the 'model' axis; the weight-norm g/V reductions run over the unsharded
    all-but-last axes, so they stay device-local (`parallel/mesh.py:21-23`)
    and the AdamWN update must be bit-comparable to the replicated one. A
    silent perturbation of the update under sharding would show up here.
    """
    trainer, params, data = _setup()
    one = jnp.float32(1.0)
    key = jax.random.PRNGKey(7)

    opt_state = trainer.optimizer.init(params)
    p_ref, _, m_ref = trainer.train_epoch(
        jax.tree.map(jnp.copy, params), opt_state, data, key, one, one, one
    )

    mesh = make_mesh(n_data=4, n_model=2)
    trainer2, params2, _ = _setup()
    params2, sh_data, _ = shard_training_state(mesh, params2, data, data)
    # kernels are column-sharded over 'model'
    assert "model" in str(params2["h_w"]["kernel"].sharding.spec)
    opt_state2 = trainer2.optimizer.init(params2)
    p_tp, _, m_tp = trainer2.train_epoch(params2, opt_state2, sh_data, key, one, one, one)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_tp["loss"]), rtol=1e-4)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(p_ref)
    flat_tp = jax.tree.leaves(p_tp)
    for (path, a), b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_tensor_parallel_nll_matches_replicated():
    """TP-sharded IW-NLL == replicated IW-NLL (same key), per window."""
    from classifying_vae_lstm_tpu.evaluation.nll import iw_nll_dataset
    from classifying_vae_lstm_tpu.models import cl_vae as cv

    cfg = cv.Config(original_dim=16, intermediate_dim=16, latent_dim=2,
                    intermediate_class_dim=8, n_classes=4)
    params = cv.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (32, 16)) < 0.25).astype(jnp.float32)
    data = {"x": x, "y": x}
    key = jax.random.PRNGKey(9)

    ref = iw_nll_dataset(params, cfg, data, key, n_samples=8, batch_size=16,
                         family="cl_vae")

    mesh = make_mesh(n_data=4, n_model=2)
    from classifying_vae_lstm_tpu.parallel import shard_params
    params_tp = shard_params(params, mesh)
    tp = iw_nll_dataset(params_tp, cfg, data, key, n_samples=8, batch_size=16,
                        family="cl_vae")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(tp), rtol=1e-5, atol=1e-6)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(n_data=8, n_model=1)
    data = {"x": jnp.zeros((64, 16))}
    sh = shard_batch(mesh, data)
    assert len(sh["x"].sharding.device_set) == 8


def test_shard_opt_state_runs():
    from classifying_vae_lstm_tpu.parallel.mesh import shard_opt_state

    trainer, params, data = _setup()
    mesh = make_mesh(n_data=4, n_model=2)
    opt_state = trainer.optimizer.init(params)
    sharded = shard_opt_state(opt_state, mesh)
    # moments follow the kernel column sharding; scalars replicated
    assert jax.tree.structure(sharded) == jax.tree.structure(opt_state)


def test_shard_map_step_matches_gspmd_step():
    """Explicit shard_map+psum step == implicit NamedSharding step.

    Same batch, same params; the PRNG layout differs (shard_map folds in the
    device index), so compare against an oracle computed with the same
    fold-in, and check the GSPMD path only for loss-scale agreement.
    """
    import functools

    from classifying_vae_lstm_tpu.parallel.shard_map_step import (
        make_shard_map_train_step,
        replicate,
    )

    trainer, params, data = _setup(n=80, batch=80)
    mesh = make_mesh(n_data=8, n_model=1)
    opt = trainer.optimizer
    step = make_shard_map_train_step(trainer.loss_fn, opt, mesh)

    params_r = replicate(params, mesh)
    opt_state = replicate(opt.init(params), mesh)
    batch = shard_batch(mesh, {k: v[:80] for k, v in data.items()})
    one = jnp.float32(1.0)
    p2, s2, m2 = step(params_r, opt_state, batch, jax.random.PRNGKey(0), one, one, one)
    assert np.isfinite(float(m2["loss"]))

    # oracle: single-device computation of the same sharded semantics
    keys = [jax.random.fold_in(jax.random.PRNGKey(0), i) for i in range(8)]
    shards = {k: np.split(np.asarray(v[:80]), 8) for k, v in data.items()}
    grads_acc = None
    losses = []
    for i in range(8):
        b = {k: jnp.asarray(v[i]) for k, v in shards.items()}
        (loss, m), g = jax.value_and_grad(trainer.loss_fn, has_aux=True)(
            params, b, keys[i], one, one, one
        )
        losses.append(float(m["loss"]))
        grads_acc = g if grads_acc is None else jax.tree.map(jnp.add, grads_acc, g)
    mean_loss = np.mean(losses)
    np.testing.assert_allclose(float(m2["loss"]), mean_loss, rtol=1e-4)

    import optax

    grads_mean = jax.tree.map(lambda a: a / 8, grads_acc)
    updates, _ = opt.update(grads_mean, opt.init(params), params)
    p_oracle = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree.leaves(p_oracle), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_dp_nll_matches_single_device():
    """iw_nll_dataset_dp on the 8-device mesh == iw_nll_dataset single-device:
    same keys -> same draws; sharding must not change the math."""
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.evaluation.nll import (
        iw_nll_dataset,
        iw_nll_dataset_dp,
    )
    from classifying_vae_lstm_tpu.models import cl_vae
    from classifying_vae_lstm_tpu.parallel import make_mesh

    cfg = cl_vae.Config(original_dim=12, intermediate_dim=8, latent_dim=2,
                        intermediate_class_dim=6, n_classes=3)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    n = 53  # forces a padded final batch too
    x = (jax.random.uniform(jax.random.PRNGKey(1), (n, 12)) < 0.2).astype(jnp.float32)
    data = {"x": x, "y": x}
    key = jax.random.PRNGKey(2)
    single = np.asarray(iw_nll_dataset(params, cfg, data, key, 4, 16))
    mesh = make_mesh(n_data=8, n_model=1)
    dp = np.asarray(iw_nll_dataset_dp(params, cfg, data, key, 4, 16, "cl_vae", mesh))
    assert dp.shape == (n,)
    np.testing.assert_allclose(dp, single, rtol=2e-5, atol=2e-6)

    import pytest

    with pytest.raises(ValueError):
        iw_nll_dataset_dp(params, cfg, data, key, 4, 12, "cl_vae", mesh)  # 12 % 8


def test_shard_map_dp_composes_with_pallas_backend():
    """DP (shard_map + psum) x Pallas kernels: inside shard_map every device
    sees its LOCAL batch shard, so the fused-LSTM pallas_call (not GSPMD-
    partitionable from the outside) runs per device — the multi-chip story
    for the scaled training mode. Updates match the single-device pallas step."""
    import optax

    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.parallel import make_shard_map_train_step, replicate

    cfg = cl_vrnn.Config(original_dim=12, intermediate_dim=16, latent_dim=2,
                         seq_length=4, n_classes=3, use_x_prev=True,
                         lstm_backend="pallas")
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    n = 32
    x = (jax.random.uniform(jax.random.PRNGKey(1), (n, 4, 12)) < 0.2).astype(jnp.float32)
    w = jax.nn.one_hot(jnp.arange(n) % 3, 3)
    batch = {"x": x, "x_prev": x, "y": x, "w": w}
    loss_fn = functools.partial(
        lambda c, p, b, k, klw, cw, wklw: cl_vrnn.loss_and_metrics(p, c, b, k, klw, cw, wklw), cfg
    )
    opt, _ = init_optimizer("adam-wn")
    one = jnp.float32(1.0)

    mesh = make_mesh(n_data=8, n_model=1)
    step = make_shard_map_train_step(loss_fn, opt, mesh)
    p_dp, s_dp, m_dp = step(replicate(params, mesh), replicate(opt.init(params), mesh),
                            shard_batch(mesh, batch), jax.random.PRNGKey(2), one, one, one)

    # single-device oracle with the same per-shard PRNG folding + mean-reduce
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    grads_acc, metrics_acc = [], []
    for d in range(8):
        sl = slice(d * 4, (d + 1) * 4)
        shard = {k: v[sl] for k, v in batch.items()}
        k = jax.random.fold_in(jax.random.PRNGKey(2), d)
        (_, m), g = grad_fn(params, shard, k, one, one, one)
        grads_acc.append(g)
        metrics_acc.append(m)
    gmean = jax.tree.map(lambda *a: jnp.mean(jnp.stack(a), 0), *grads_acc)
    state = opt.init(params)
    updates, _ = opt.update(gmean, state, params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(m_dp["loss"]),
                               float(np.mean([m["loss"] for m in metrics_acc])), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        p_dp, p_ref,
    )


def test_noise_explicit_apply_matches_key_path():
    """apply(x, key) == apply(x, key, noise=draw_apply_noise(key, ...)) EXACTLY,
    both families — the invariant DP training's bit-identity rests on."""
    from classifying_vae_lstm_tpu.models import cl_vrnn

    cfg_v = cl_vae.Config(original_dim=12, intermediate_dim=16, latent_dim=2,
                          intermediate_class_dim=8, n_classes=3, use_x_prev=True)
    p_v = cl_vae.init(jax.random.PRNGKey(0), cfg_v)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (9, 12)) < 0.2).astype(jnp.float32)
    key = jax.random.PRNGKey(5)
    a = cl_vae.apply(p_v, cfg_v, x, key, x)
    b = cl_vae.apply(p_v, cfg_v, x, key, x, noise=cl_vae.draw_apply_noise(key, cfg_v, 9))
    jax.tree.map(lambda u, v: np.testing.assert_array_equal(np.asarray(u), np.asarray(v)), a, b)

    for backend in ("xla",):  # fused path (default) + two-scan via dropout gate below
        cfg_r = cl_vrnn.Config(original_dim=12, intermediate_dim=16, latent_dim=2,
                               seq_length=4, n_classes=3, use_x_prev=True,
                               lstm_backend=backend)
        p_r = cl_vrnn.init(jax.random.PRNGKey(0), cfg_r)
        xs = (jax.random.uniform(jax.random.PRNGKey(1), (9, 4, 12)) < 0.2).astype(jnp.float32)
        a = cl_vrnn.apply(p_r, cfg_r, xs, key, xs)
        noise = cl_vrnn.draw_apply_noise(key, cfg_r, 9)
        b = cl_vrnn.apply(p_r, cfg_r, xs, key, xs, noise=noise)
        jax.tree.map(lambda u, v: np.testing.assert_array_equal(np.asarray(u), np.asarray(v)), a, b)
        # two-scan path (remat=True forces it) must agree with the same noise
        import dataclasses
        cfg_2 = dataclasses.replace(cfg_r, remat=True)
        c = cl_vrnn.apply(p_r, cfg_2, xs, key, xs, noise=noise)
        np.testing.assert_allclose(np.asarray(b["X_decoded_mean"]),
                                   np.asarray(c["X_decoded_mean"]), rtol=1e-5, atol=1e-6)


def test_dp_train_epoch_bit_matches_single_device():
    """Trainer(mesh=...) epoch == single-device epoch, SAME key, per-leaf.

    The DP epoch pre-draws the global batch's noise from the same per-batch
    keys apply() would split (models.*.draw_apply_noise) and shards it with
    the data, so the only difference is the fp order of the gradient mean
    (pmean of shard-means). VERDICT round-4 missing #1: first-class DP
    training, now CLI-reachable via --dp (see test_cli.py)."""
    from classifying_vae_lstm_tpu.train import Trainer

    trainer, params, data = _setup()
    one = jnp.float32(1.0)
    key = jax.random.PRNGKey(11)

    opt_state = trainer.optimizer.init(params)
    p_ref, _, m_ref = trainer.train_epoch(
        jax.tree.map(jnp.copy, params), opt_state, data, key, one, one, one
    )
    vm_ref = trainer.eval_epoch(p_ref, data, key, one, one, one)

    cfg = cl_vae.Config(original_dim=16, intermediate_dim=16, latent_dim=2,
                        intermediate_class_dim=8, n_classes=4)
    mesh = make_mesh(n_data=8, n_model=1)
    trainer_dp = Trainer(trainer.loss_fn, trainer.optimizer, batch_size=40, mesh=mesh,
                         noise_fn=lambda k: cl_vae.draw_apply_noise(k, cfg, 40))
    opt2 = trainer_dp.optimizer.init(params)
    p_dp, _, m_dp = trainer_dp.train_epoch(
        jax.tree.map(jnp.copy, params), opt2, data, key, one, one, one
    )
    vm_dp = trainer_dp.eval_epoch(p_dp, data, key, one, one, one)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_dp["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(vm_ref["loss"]), float(vm_dp["loss"]), rtol=1e-5)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(p_ref)
    for (path, a), b in zip(flat_ref, jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))


def test_dp_generation_matches_single_device(monkeypatch):
    """Sharded generation == single-device generation, exactly (the noise is
    drawn globally and sharded with the songs); also composes with the fused
    Pallas generation kernel inside shard_map."""
    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.ops import pallas_generate
    from classifying_vae_lstm_tpu.sampling.generate import (
        draw_generation_noise, generate_cl_vrnn_batch_dp,
        generate_cl_vrnn_batch_noise)

    cfg = cl_vrnn.Config(original_dim=12, intermediate_dim=16, latent_dim=2,
                         seq_length=4, n_classes=3, use_x_prev=True)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    B, Tseed, nsteps = 16, 4, 6
    seeds = (jax.random.uniform(jax.random.PRNGKey(1), (B, Tseed, 12)) < 0.2).astype(jnp.float32)
    ws = jax.nn.one_hot(jnp.arange(B) % 3, 3).astype(jnp.float32)
    key = jax.random.PRNGKey(2)
    mesh = make_mesh(n_data=8, n_model=1)

    got = generate_cl_vrnn_batch_dp(params, cfg, seeds, nsteps, key, ws, mesh)
    eps, u = draw_generation_noise(key, B, Tseed + nsteps, 2, 12)
    ref = generate_cl_vrnn_batch_noise(params, cfg, seeds, nsteps, eps, u, ws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # fused pallas kernel inside shard_map (interpret mode via the test hook)
    monkeypatch.setattr(pallas_generate, "FORCE_OFF_TPU", True)
    cfg_p = cl_vrnn.Config(original_dim=12, intermediate_dim=16, latent_dim=2,
                           seq_length=4, n_classes=3, use_x_prev=True,
                           lstm_backend="pallas")
    assert pallas_generate.should_use(cfg_p, B // 8)
    got_p = generate_cl_vrnn_batch_dp(params, cfg_p, seeds, nsteps, key, ws, mesh)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref))


def test_dp_vae_generation_matches_single_device(monkeypatch):
    """cl_vae sharded generation == single-device, exactly; composes with
    the fused cl_vae generation kernel inside shard_map (round-3 kernel)."""
    from classifying_vae_lstm_tpu.models import cl_vae
    from classifying_vae_lstm_tpu.ops import pallas_generate_vae
    from classifying_vae_lstm_tpu.sampling.generate import (
        draw_generation_noise, generate_cl_vae_batch_dp,
        generate_cl_vae_batch_noise)

    cfg = cl_vae.Config(original_dim=12, intermediate_dim=16, latent_dim=2,
                        intermediate_class_dim=8, n_classes=3, use_x_prev=True)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    B, nsteps = 16, 6
    seeds = (jax.random.uniform(jax.random.PRNGKey(1), (B, 12)) < 0.2).astype(jnp.float32)
    ws = jax.nn.one_hot(jnp.arange(B) % 3, 3).astype(jnp.float32)
    key = jax.random.PRNGKey(2)
    mesh = make_mesh(n_data=8, n_model=1)

    got = generate_cl_vae_batch_dp(params, cfg, seeds, nsteps, key, ws, mesh)
    eps, u = draw_generation_noise(key, B, nsteps, 2, 12)
    ref = generate_cl_vae_batch_noise(params, cfg, seeds, nsteps, eps, u, ws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    import dataclasses

    monkeypatch.setattr(pallas_generate_vae, "FORCE_OFF_TPU", True)
    cfg_p = dataclasses.replace(cfg, gen_backend="pallas")
    assert pallas_generate_vae.should_use(cfg_p, B // 8)
    got_p = generate_cl_vae_batch_dp(params, cfg_p, seeds, nsteps, key, ws, mesh)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref))


def test_dp_generation_int8_mode(monkeypatch):
    """Int8 fused generation inside shard_map DP: valid output, per-shard
    quantization identical to single-device (weights replicate)."""
    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.ops import pallas_generate
    from classifying_vae_lstm_tpu.sampling.generate import (
        draw_generation_noise, generate_cl_vrnn_batch_dp)

    monkeypatch.setattr(pallas_generate, "FORCE_OFF_TPU", True)
    monkeypatch.setattr(pallas_generate, "pick_mode", lambda cfg: "int8")
    cfg = cl_vrnn.Config(original_dim=12, intermediate_dim=16, latent_dim=2,
                         seq_length=4, n_classes=3, use_x_prev=True,
                         lstm_backend="pallas")
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    B = 16
    seeds = (jax.random.uniform(jax.random.PRNGKey(1), (B, 4, 12)) < 0.2).astype(jnp.float32)
    ws = jax.nn.one_hot(jnp.arange(B) % 3, 3).astype(jnp.float32)
    mesh = make_mesh(n_data=8, n_model=1)
    got = generate_cl_vrnn_batch_dp(params, cfg, seeds, 6, jax.random.PRNGKey(2), ws, mesh)
    assert got.shape == (B, 6, 12)
    assert set(np.unique(np.asarray(got))) <= {0.0, 1.0}
    # exact vs single-device int8 kernel with the same globally-drawn noise
    eps, u = draw_generation_noise(jax.random.PRNGKey(2), B, 10, 2, 12)
    ref = pallas_generate.generate_cl_vrnn_batch_pallas(params, cfg, seeds, 6, eps, u, ws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_shard_map_dp_composes_with_fused_kernels(monkeypatch):
    """DP (shard_map + psum) x the experimental kernel fusions (proj + drk +
    full backward): the custom_vjp's in-kernel weight-grad accumulators run
    per shard and the psum-of-grads must reproduce the single-device fused
    step exactly, like the unfused pallas composition above."""
    import optax

    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.parallel import make_shard_map_train_step, replicate

    # fusion is plumbed per-config (Config.fusion static triple), not globals
    cfg = cl_vrnn.Config(original_dim=12, intermediate_dim=16, latent_dim=2,
                         seq_length=4, n_classes=3, use_x_prev=True,
                         lstm_backend="pallas", fusion=(True, True, True))
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    n = 32
    x = (jax.random.uniform(jax.random.PRNGKey(1), (n, 4, 12)) < 0.2).astype(jnp.float32)
    w = jax.nn.one_hot(jnp.arange(n) % 3, 3)
    batch = {"x": x, "x_prev": x, "y": x, "w": w}
    loss_fn = functools.partial(
        lambda c, p, b, k, klw, cw, wklw: cl_vrnn.loss_and_metrics(p, c, b, k, klw, cw, wklw), cfg
    )
    opt, _ = init_optimizer("adam-wn")
    one = jnp.float32(1.0)

    mesh = make_mesh(n_data=8, n_model=1)
    step = make_shard_map_train_step(loss_fn, opt, mesh)
    p_dp, s_dp, m_dp = step(replicate(params, mesh), replicate(opt.init(params), mesh),
                            shard_batch(mesh, batch), jax.random.PRNGKey(2), one, one, one)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    grads_acc, metrics_acc = [], []
    for d in range(8):
        sl = slice(d * 4, (d + 1) * 4)
        shard = {k: v[sl] for k, v in batch.items()}
        k = jax.random.fold_in(jax.random.PRNGKey(2), d)
        (_, m), g = grad_fn(params, shard, k, one, one, one)
        grads_acc.append(g)
        metrics_acc.append(m)
    gmean = jax.tree.map(lambda *a: jnp.mean(jnp.stack(a), 0), *grads_acc)
    state = opt.init(params)
    updates, _ = opt.update(gmean, state, params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(m_dp["loss"]),
                               float(np.mean([m["loss"] for m in metrics_acc])), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        p_dp, p_ref,
    )
