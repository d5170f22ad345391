"""Fused whole-generation cl_vae Pallas kernel vs the noise-explicit XLA sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from classifying_vae_lstm_tpu.models import cl_vae
from classifying_vae_lstm_tpu.ops import pallas_generate_vae
from classifying_vae_lstm_tpu.sampling.generate import (
    draw_generation_noise,
    generate_cl_vae_batch,
    generate_cl_vae_batch_noise,
)


def _setup(use_x_prev=True, B=8, nsteps=10, H=16, D=12, L=2, K=3, seed=0):
    cfg = cl_vae.Config(original_dim=D, intermediate_dim=H, latent_dim=L,
                        intermediate_class_dim=H, n_classes=K,
                        use_x_prev=use_x_prev)
    params = cl_vae.init(jax.random.PRNGKey(seed), cfg)
    seeds = (jax.random.uniform(jax.random.PRNGKey(1), (B, D)) < 0.2).astype(jnp.float32)
    ws = jax.nn.one_hot(jnp.arange(B) % K, K).astype(jnp.float32)
    eps, u = draw_generation_noise(jax.random.PRNGKey(2), B, nsteps, L, D)
    return cfg, params, seeds, ws, eps, u, nsteps


@pytest.mark.parametrize("use_x_prev", [True, False])
@pytest.mark.parametrize("use_z_prior", [False, True])
def test_fused_vae_generation_matches_xla(use_x_prev, use_z_prior):
    """Same pre-drawn noise -> same frames and same probabilities."""
    cfg, params, seeds, ws, eps, u, nsteps = _setup(use_x_prev)
    ref = generate_cl_vae_batch_noise(params, cfg, seeds, nsteps, eps, u, ws,
                                      use_z_prior=use_z_prior)
    got = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws, use_z_prior=use_z_prior)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    ref_p = generate_cl_vae_batch_noise(params, cfg, seeds, nsteps, eps, u, ws,
                                        use_z_prior=use_z_prior, return_probs=True)
    got_p = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws, use_z_prior=use_z_prior,
        return_probs=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                               rtol=1e-5, atol=1e-5)


def test_fused_vae_vanilla_k1():
    """Vanilla VAE (n_classes == 1): w is the constant [1.0] simplex point."""
    cfg, params, seeds, _, eps, u, nsteps = _setup(K=1)
    ws = jnp.ones((seeds.shape[0], 1), jnp.float32)
    ref = generate_cl_vae_batch_noise(params, cfg, seeds, nsteps, eps, u, ws)
    got = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_vae_tiled_blocks_and_padded_batch(monkeypatch):
    """Small forced blocks: the (x_prev, x_prev_t) scratch carry crosses
    t-blocks, and a batch that is NOT a multiple of the block pads via the
    cdiv grid (rows are independent songs)."""
    monkeypatch.setattr(pallas_generate_vae, "_pick_blocks",
                        lambda B, T, D, H, L, mode: (8, 5))
    cfg, params, seeds, ws, eps, u, nsteps = _setup(B=11)
    ref = generate_cl_vae_batch_noise(params, cfg, seeds, nsteps, eps, u, ws)
    got = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_vae_gates():
    """No hidden layers -> the kernel refuses (XLA keeps those configs)."""
    no_hidden = cl_vae.Config(original_dim=12, intermediate_dim=0, latent_dim=2)
    assert not pallas_generate_vae.fits(no_hidden)
    small = cl_vae.Config(original_dim=12, intermediate_dim=16, latent_dim=2)
    assert pallas_generate_vae.pick_mode(small) == "f32"
    assert not pallas_generate_vae.should_use(small, 8)  # gen_backend == 'xla'


def test_batch_sampler_dispatches_to_fused(monkeypatch):
    """generate_cl_vae_batch routes through the fused kernel when the config
    opts in — same key, same songs as the XLA path (f32 frame-exactness)."""
    import dataclasses

    cfg, params, seeds, ws, _, _, nsteps = _setup()
    key = jax.random.PRNGKey(7)
    ref = generate_cl_vae_batch(params, cfg, seeds, nsteps, key, w_vals=ws)
    monkeypatch.setattr(pallas_generate_vae, "FORCE_OFF_TPU", True)
    pcfg = dataclasses.replace(cfg, gen_backend="pallas")
    assert pallas_generate_vae.should_use(pcfg, seeds.shape[0])
    got = generate_cl_vae_batch(params, pcfg, seeds, nsteps, key, w_vals=ws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_vae_bf16_mode_close():
    """bf16 weights: frames mostly agree, probs drift at bf16 order only."""
    cfg, params, seeds, ws, eps, u, nsteps = _setup()
    f32_p = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws, return_probs=True, mode="f32")
    got_p = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws, return_probs=True, mode="bf16")
    d = np.abs(np.asarray(got_p) - np.asarray(f32_p))
    assert d.max() < 0.06 and d.mean() < 0.01, (d.max(), d.mean())
    assert d.max() > 0.0  # genuinely a different precision path
    got = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws, mode="bf16")
    assert set(np.unique(np.asarray(got))) <= {0.0, 1.0}


def test_fused_vae_int8_mode_close():
    """Int8 weights (per-column scales; dynamic row scale on the decoder's
    relu hidden): probs track the XLA f32 sampler at quantization order.
    Mode forced via the static ``mode`` argument (a cached trace for the
    same shapes would silently ignore a patched ``pick_mode``)."""
    cfg, params, seeds, ws, eps, u, nsteps = _setup()
    ref_p = generate_cl_vae_batch_noise(params, cfg, seeds, nsteps, eps, u, ws,
                                        return_probs=True)
    got_p = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws, return_probs=True, mode="int8")
    # free-running: a near-threshold Bernoulli flip early shifts later frames
    # in BOTH samplers' state, so the raw max compounds — bound it loosely
    d = np.abs(np.asarray(got_p) - np.asarray(ref_p))
    assert d.max() < 0.25 and d.mean() < 0.01, (d.max(), d.mean())
    # pure quantization error, feedback isolated: u=1 forces all-zero frames
    # in both samplers (identical state trajectories) — tight bound
    u1 = jnp.ones_like(u)
    ref_q = generate_cl_vae_batch_noise(params, cfg, seeds, nsteps, eps, u1, ws,
                                        return_probs=True)
    got_q = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u1, ws, return_probs=True, mode="int8")
    dq = np.abs(np.asarray(got_q) - np.asarray(ref_q))
    assert dq.max() < 0.06 and dq.mean() < 0.003, (dq.max(), dq.mean())
    f32_p = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws, return_probs=True, mode="f32")
    assert np.abs(np.asarray(got_p) - np.asarray(f32_p)).max() > 1e-6
    got = pallas_generate_vae.generate_cl_vae_batch_pallas(
        params, cfg, seeds, nsteps, eps, u, ws, mode="int8")
    assert set(np.unique(np.asarray(got))) <= {0.0, 1.0}


def test_vae_pick_mode_escalation():
    """f32 checkpoints never quantize; bf16 checkpoints escalate bf16 ->
    int8 -> None as widths outgrow the VMEM budget (mirrors the cl_vrnn
    ladder)."""
    mk = lambda h, bf16: cl_vae.Config(
        original_dim=976, intermediate_dim=h, latent_dim=16, n_classes=13,
        use_x_prev=True, bf16_compute=bf16)
    assert pallas_generate_vae.pick_mode(mk(1024, False)) == "f32"
    assert pallas_generate_vae.pick_mode(mk(1024, True)) == "bf16"
    assert pallas_generate_vae.pick_mode(mk(5120, True)) == "int8"
    assert pallas_generate_vae.pick_mode(mk(12288, True)) is None


def test_resolve_gen_backend():
    """'keep' is identity; explicit choices replace; 'auto' stays xla off-TPU."""
    from classifying_vae_lstm_tpu.cli.common import resolve_gen_backend

    cfg = cl_vae.Config(original_dim=12, intermediate_dim=16, latent_dim=2)
    assert resolve_gen_backend(cfg, "keep") is cfg
    assert resolve_gen_backend(cfg, "pallas").gen_backend == "pallas"
    assert resolve_gen_backend(cfg, "auto").gen_backend == "xla"  # CPU mesh
