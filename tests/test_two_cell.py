"""Two-cell (encoder ∥ decoder) fused kernel vs the XLA composition.

The kernel (ops/pallas_two_cell.py) computes the whole cl_vrnn recurrent
core — encoder LSTM, z heads, z sample, decoder LSTM (reference
cl_vrnn/model.py:196-228) — in one Pallas program with a one-step software
lag. These tests pin it (CPU interpret) against the model's two-scan XLA
path for the forward AND every gradient, including padded batches and the
bf16 stream mode. The on-TPU numerics sweep lives in
tools/verify_kernels_tpu.py (CPU interpret cannot catch Mosaic layout/VMEM
faults — CLAUDE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from classifying_vae_lstm_tpu.models import cl_vrnn
from classifying_vae_lstm_tpu.ops.pallas_two_cell import (
    should_use,
    two_cell_sequence,
)


def _setup(B=12, T=5, D=16, H=24, L=2, K=3, use_x_prev=True, seed=0):
    cfg = cl_vrnn.Config(original_dim=D, intermediate_dim=H, latent_dim=L,
                         seq_length=T, n_classes=K, use_x_prev=use_x_prev)
    params = cl_vrnn.init(jax.random.PRNGKey(seed), cfg)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
    x = (jax.random.uniform(ks[0], (B, T, D)) < 0.2).astype(jnp.float32)
    xp = (jax.random.uniform(ks[1], (B, T, D)) < 0.2).astype(jnp.float32)
    W = jax.nn.softmax(jax.random.normal(ks[2], (B, K)))
    eps = jax.random.normal(ks[3], (B, T, L))
    return cfg, params, x, xp, W, eps


def _xla_core(params, cfg, x, xp, W, eps):
    """The two-scan XLA reference composition (dropout=0, noise-explicit)."""
    zm, zlv, _ = cl_vrnn.encode_z_sequence(params, cfg, x, W)
    z = zm + jnp.exp(zlv / 2) * eps
    from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence

    dec_in = jnp.concatenate(
        ([xp, z] if cfg.use_x_prev else [z])
        + [jnp.broadcast_to(W[:, None, :], (z.shape[0], z.shape[1], W.shape[-1]))],
        axis=-1)
    hd, _ = lstm_sequence(
        params["decoder_h"], dec_in,
        compute_dtype=jnp.bfloat16 if cfg.bf16_compute else None)
    return hd, zm, zlv, z


@pytest.mark.parametrize("use_x_prev", [True, False])
def test_forward_matches_xla(use_x_prev):
    cfg, params, x, xp, W, eps = _setup(use_x_prev=use_x_prev)
    hd, zm, zlv, z = two_cell_sequence(params, cfg, x, xp if use_x_prev else None,
                                       W, eps)
    hd_r, zm_r, zlv_r, z_r = _xla_core(params, cfg, x, xp, W, eps)
    np.testing.assert_allclose(np.asarray(zm), np.asarray(zm_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(zlv), np.asarray(zlv_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hd), np.asarray(hd_r), rtol=1e-5, atol=1e-6)


def test_gradients_match_xla():
    """Every parameter + input gradient vs the XLA composition, including the
    z-head/sample coupling (the dec->enc cross term the lagged backward
    carries through the dhez scratch)."""
    cfg, params, x, xp, W, eps = _setup()

    def loss(params, x, xp, W, via):
        core = two_cell_sequence if via == "pallas" else _xla_core
        if via == "pallas":
            hd, zm, zlv, z = core(params, cfg, x, xp, W, eps)
        else:
            hd, zm, zlv, z = core(params, cfg, x, xp, W, eps)
        # touch every output with different weights (dhd, dzargs cotangents)
        return (jnp.sum(hd ** 2) + jnp.sum(jnp.sin(zm)) + jnp.sum(zlv ** 2)
                + jnp.sum(z * jnp.cos(z)))

    for argnums in [0, 1, 2, 3]:
        ga = jax.grad(loss, argnums=argnums)(params, x, xp, W, "xla")
        gb = jax.grad(loss, argnums=argnums)(params, x, xp, W, "pallas")
        flat_a, _ = jax.tree_util.tree_flatten_with_path(ga)
        for (path, a), b in zip(flat_a, jax.tree.leaves(gb)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
                err_msg=f"argnums={argnums} {jax.tree_util.keystr(path)}")


def test_gradients_padded_batch():
    """B not a multiple of the batch block: the entry pads with zero rows —
    gradients must be exact (padded rows contribute exactly 0)."""
    cfg, params, x, xp, W, eps = _setup(B=11)

    def loss(params, via):
        core = two_cell_sequence if via == "pallas" else _xla_core
        hd, zm, zlv, z = core(params, cfg, x, xp, W, eps)
        return jnp.sum(hd ** 2) + jnp.sum(zm * zlv)

    ga = jax.grad(loss)(params, "xla")
    gb = jax.grad(loss)(params, "pallas")
    flat_a, _ = jax.tree_util.tree_flatten_with_path(ga)
    for (path, a), b in zip(flat_a, jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_bf16_close_to_f32():
    cfg, params, x, xp, W, eps = _setup(B=16, H=32)
    hd, zm, zlv, z = two_cell_sequence(params, cfg, x, xp, W, eps,
                                       compute_dtype=jnp.bfloat16)
    hd_r, zm_r, zlv_r, z_r = _xla_core(params, cfg, x, xp, W, eps)
    np.testing.assert_allclose(np.asarray(hd), np.asarray(hd_r), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(zm), np.asarray(zm_r), rtol=0.05, atol=0.05)

    def loss(p, cd):
        hd, zm, zlv, z = two_cell_sequence(p, cfg, x, xp, W, eps, compute_dtype=cd)
        return jnp.sum(hd ** 2) + jnp.sum(zm * zlv)

    ga = jax.grad(loss)(params, None)
    gb = jax.grad(loss)(params, jnp.bfloat16)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.1 * (np.abs(a).max() + 1e-3))


def test_apply_routes_two_cell(monkeypatch):
    """models/cl_vrnn.apply: pallas backend + two_cell preconditions -> the
    fused two-cell path, identical outputs to the XLA apply (same key)."""
    import dataclasses

    from classifying_vae_lstm_tpu.ops import pallas_two_cell

    cfg, params, x, xp, W, eps = _setup(B=8, T=4)
    calls = {"n": 0}
    real = pallas_two_cell.two_cell_sequence

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pallas_two_cell, "two_cell_sequence", spy)
    key = jax.random.PRNGKey(7)
    cfg_p = dataclasses.replace(cfg, lstm_backend="pallas", two_cell=True)
    out_p = cl_vrnn.apply(params, cfg_p, x, key, xp)
    assert calls["n"] == 1
    out_x = cl_vrnn.apply(params, cfg, x, key, xp)
    for k in ("X_decoded_mean", "Z_mean", "Z_log_var", "Z", "W"):
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_x[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_should_use_gate():
    mk = lambda **kw: cl_vrnn.Config(original_dim=88, **kw)
    assert not should_use(mk(intermediate_dim=88))       # reference width: XLA wins
    assert should_use(mk(intermediate_dim=512, bf16_compute=True))
    assert should_use(mk(intermediate_dim=512))          # f32 fits at 512
    assert not should_use(mk(intermediate_dim=2048, bf16_compute=True))  # VMEM
    assert not should_use(mk(intermediate_dim=512, dropout=0.1))
    # explicit override wins both ways
    assert should_use(mk(intermediate_dim=88), two_cell=True)
    assert not should_use(mk(intermediate_dim=512, bf16_compute=True), two_cell=False)
