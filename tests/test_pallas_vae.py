"""Fused cl_vae dense-stack kernel vs the XLA composition.

The kernel (ops/pallas_vae.py) computes the whole cl_vae graph — key
encoder, logistic-normal w sample, latent encoder, z sample, decoder, frame
head (reference cl_vae/model.py:130-224) — in one Pallas program per
direction. These tests pin it (CPU interpret) against the model's XLA apply
for the forward AND every gradient, including padded batches and bf16. The
on-TPU numerics sweep lives in tools/verify_kernels_tpu.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from classifying_vae_lstm_tpu.models import cl_vae
from classifying_vae_lstm_tpu.ops.pallas_vae import fits, should_use


def _setup(B=12, D=16, Cw=8, H=24, L=3, K=4, use_x_prev=True, seed=0):
    cfg = cl_vae.Config(original_dim=D, intermediate_dim=H, latent_dim=L,
                        intermediate_class_dim=Cw, n_classes=K,
                        use_x_prev=use_x_prev)
    params = cl_vae.init(jax.random.PRNGKey(seed), cfg)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
    x = (jax.random.uniform(ks[0], (B, D)) < 0.2).astype(jnp.float32)
    xp = (jax.random.uniform(ks[1], (B, D)) < 0.2).astype(jnp.float32)
    noise = {"eps_w": jax.random.normal(ks[2], (B, K - 1)),
             "eps_z": jax.random.normal(ks[3], (B, L))}
    return cfg, params, x, xp, noise


OUTS = ("x_decoded_mean", "w", "w_mean", "w_log_var", "z", "z_mean", "z_log_var")


@pytest.mark.parametrize("use_x_prev", [True, False])
def test_forward_matches_xla(use_x_prev):
    cfg, params, x, xp, noise = _setup(use_x_prev=use_x_prev)
    cfg_p = dataclasses.replace(cfg, train_backend="pallas")
    key = jax.random.PRNGKey(9)
    out_p = cl_vae.apply(params, cfg_p, x, key, xp if use_x_prev else None,
                         noise=noise)
    out_x = cl_vae.apply(params, cfg, x, key, xp if use_x_prev else None,
                         noise=noise)
    for k in OUTS:
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_x[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_forward_internal_draws_match_xla():
    """Without explicit noise, the fused path must split/draw the SAME eps
    the XLA path's samplers do (key-for-key reproducibility contract)."""
    cfg, params, x, xp, _ = _setup()
    cfg_p = dataclasses.replace(cfg, train_backend="pallas")
    key = jax.random.PRNGKey(42)
    out_p = cl_vae.apply(params, cfg_p, x, key, xp)
    out_x = cl_vae.apply(params, cfg, x, key, xp)
    for k in OUTS:
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_x[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def _loss(params, cfg, x, xp, noise):
    out = cl_vae.apply(params, cfg, x, jax.random.PRNGKey(0), xp, noise=noise)
    # touch every output with different weights (all four kernel cotangents:
    # dxhat, dwargs, dzargs, dw)
    return (jnp.sum(out["x_decoded_mean"] ** 2)
            + jnp.sum(jnp.sin(out["w_mean"])) + jnp.sum(out["w_log_var"] ** 2)
            + jnp.sum(out["z_mean"] * jnp.cos(out["z_log_var"]))
            + jnp.sum(out["w"] ** 3) + jnp.sum(out["z"] * out["z"]))


@pytest.mark.parametrize("use_x_prev", [True, False])
def test_gradients_match_xla(use_x_prev):
    """Every parameter + input gradient vs the XLA composition, including
    the w fan-out (loss + latent encoder + decoder -> one softmax vjp)."""
    cfg, params, x, xp, noise = _setup(use_x_prev=use_x_prev)
    cfg_p = dataclasses.replace(cfg, train_backend="pallas")
    xp_in = xp if use_x_prev else None
    for argnums in [0, 2] if use_x_prev else [0]:
        ga = jax.grad(lambda p, x, xp: _loss(p, cfg, x, xp, noise),
                      argnums=argnums)(params, x, xp_in)
        gb = jax.grad(lambda p, x, xp: _loss(p, cfg_p, x, xp, noise),
                      argnums=argnums)(params, x, xp_in)
        flat_a, _ = jax.tree_util.tree_flatten_with_path(ga)
        for (path, a), b in zip(flat_a, jax.tree.leaves(gb)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
                err_msg=f"argnums={argnums} {jax.tree_util.keystr(path)}")


def test_loss_and_metrics_grads():
    """The production unit: loss_and_metrics grads through the real ELBO
    (Keras clip semantics outside the kernel) + identical metric values."""
    cfg, params, x, xp, noise = _setup(B=16)
    cfg_p = dataclasses.replace(cfg, train_backend="pallas")
    w = jax.nn.one_hot(jnp.arange(16) % cfg.n_classes, cfg.n_classes)
    batch = {"x": x, "x_prev": xp, "y": x, "w": w,
             "eps_w": noise["eps_w"], "eps_z": noise["eps_z"]}

    def run(c):
        (total, m), g = jax.value_and_grad(
            lambda p: cl_vae.loss_and_metrics(p, c, batch, jax.random.PRNGKey(0)),
            has_aux=True)(params)
        return total, m, g

    ta, ma, ga = run(cfg)
    tb, mb, gb = run(cfg_p)
    np.testing.assert_allclose(float(ta), float(tb), rtol=1e-5)
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]), rtol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_gradients_padded_batch():
    """B not a multiple of the batch block: the entry pads with zero rows —
    gradients must be exact (padded rows contribute exactly 0)."""
    cfg, params, x, xp, noise = _setup(B=11)
    cfg_p = dataclasses.replace(cfg, train_backend="pallas")
    ga = jax.grad(lambda p: _loss(p, cfg, x, xp, noise))(params)
    gb = jax.grad(lambda p: _loss(p, cfg_p, x, xp, noise))(params)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(ga)
    for (path, a), b in zip(flat_a, jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_bf16_close_to_f32():
    """bf16 kernel vs (a) XLA f32 forward — loose, bounds total bf16 error —
    and (b) gradient ERROR NORMS vs the f32 truth: the kernel's bf16 error
    must be norm-comparable to XLA-bf16's own error per leaf. Element-wise
    comparison is the wrong instrument here — the two bf16 paths round at
    different points, and cancellation can make one small-magnitude element
    differ 10x+ while both are equally valid bf16 evaluations. Shapes must
    be large enough for rounding to average (at B=16/H=32 a single
    near-cancelling dot blows one leaf to 8% in EITHER path); at this shape
    the measured profile is pallas ~= xla on every leaf (<= 1.4%)."""
    cfg, params, x, xp, noise = _setup(B=256, D=128, Cw=64, H=256, L=16, K=13)
    cfg_b = dataclasses.replace(cfg, bf16_compute=True)
    cfg_p = dataclasses.replace(cfg_b, train_backend="pallas")
    out_p = cl_vae.apply(params, cfg_p, x, jax.random.PRNGKey(0), xp, noise=noise)
    out_x = cl_vae.apply(params, cfg, x, jax.random.PRNGKey(0), xp, noise=noise)
    np.testing.assert_allclose(np.asarray(out_p["x_decoded_mean"]),
                               np.asarray(out_x["x_decoded_mean"]),
                               rtol=0.05, atol=0.05)
    g32 = jax.grad(lambda p: _loss(p, cfg, x, xp, noise))(params)
    ga = jax.grad(lambda p: _loss(p, cfg_b, x, xp, noise))(params)
    gb = jax.grad(lambda p: _loss(p, cfg_p, x, xp, noise))(params)
    for f, a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(ga),
                       jax.tree.leaves(gb)):
        f = np.asarray(f, np.float32)
        err_x = np.linalg.norm(np.asarray(a, np.float32) - f)
        err_p = np.linalg.norm(np.asarray(b, np.float32) - f)
        base = 0.02 * (np.linalg.norm(f) + 1e-3)
        assert err_p <= 3.0 * err_x + base, (err_p, err_x, base)


def test_gate():
    mk = lambda **kw: cl_vae.Config(original_dim=976, intermediate_class_dim=256,
                                    latent_dim=16, n_classes=13,
                                    use_x_prev=True, **kw)
    # default config never routes to the kernel
    assert not should_use(mk(intermediate_dim=2048, bf16_compute=True))
    # auto: resolves to XLA everywhere — the kernel's measured win region is
    # empty (0.642-0.913x XLA on v5e, artifacts/vae_train_kernel_exp.json)
    assert not should_use(mk(intermediate_dim=2048, bf16_compute=True,
                             train_backend="auto"))
    assert not should_use(mk(intermediate_dim=88, bf16_compute=True,
                             train_backend="auto"))
    assert not should_use(mk(intermediate_dim=2048, train_backend="auto"))
    # explicit pallas needs only the structural fit
    assert should_use(mk(intermediate_dim=88, train_backend="pallas"))
    assert fits(mk(intermediate_dim=2048, bf16_compute=True))
    # no hidden layer / vanilla VAE stay on XLA
    assert not should_use(mk(intermediate_dim=0, train_backend="pallas"))
    k1 = dataclasses.replace(mk(intermediate_dim=2048, train_backend="pallas"),
                             n_classes=1)
    assert not should_use(k1)
