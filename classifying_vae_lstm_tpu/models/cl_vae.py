"""Classifying VAE: per-frame VAE with a Logistic-Normal key latent.

TPU-native re-design of the reference graph (``cl_vae/model.py:130-224``):

* one param pytree, pure ``init``/``apply``/``loss_and_metrics`` functions —
  the reference's four-output Keras model, the ``w2 = w + 1e-10`` aliasing hack
  (quirk Q8) and the sampling-time "model surgery"
  (``make_w_encoder``/``make_z_encoder``/``make_decoder``,
  ``cl_vae/model.py:76-128``) all collapse into plain function calls on
  sub-pytrees;
* anneal weights (``kl_weight``, ``w_kl_weight``) are traced scalars, so
  annealing never recompiles (the reference mutates ``K.variable`` loss
  weights, ``cl_vae/train.py:40-51``);
* the whole forward + ELBO runs as a handful of fused MXU matmuls; batch is
  the leading axis and shards over the data mesh axis (:mod:`..parallel`).

Architecture (all Dense):
  key encoder   x -> h_w(relu, class_dim_0) -> w_mean/w_log_var (K-1 each)
  w ~ LogisticNormal(w_mean, w_log_var)                   [K-simplex]
  latent encoder concat(x, w) -> [h(relu, latent_dim_0)] -> z_mean/z_log_var
  z ~ N(z_mean, exp(z_log_var))
  decoder  concat(w, [x_prev,] z) -> [decoder_h(relu)] -> sigmoid(x_mean)

``latent_dim_0 == 0`` (aka ``--intermediate_dim 0``) skips the hidden layers,
matching the reference's branches at ``cl_vae/model.py:161-167,183-188``.
A vanilla (non-classifying) VAE — BASELINE.json config 2 — is this model with
``n_classes == 1``: w collapses to the constant [1.0] simplex point and the
w losses vanish; see :func:`loss_and_metrics`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import losses as L
from ..nn.core import dense, init_dense
from ..nn.distributions import sample_gaussian, sample_logistic_normal


@dataclasses.dataclass(frozen=True)
class Config:
    """Model hyperparameters (mirrors the reference get_model signature)."""

    original_dim: int = 88
    intermediate_dim: int = 88  # latent_dim_0; 0 = no hidden layers
    latent_dim: int = 2
    intermediate_class_dim: int = 88  # class_dim_0
    n_classes: int = 2  # class_dim (K)
    use_x_prev: bool = False
    w_log_var_prior: float = 0.0
    # (extension) bf16 matmul operands with f32 accumulation for SCALED
    # training (MXU-native mode, mirrors cl_vrnn.Config.bf16_compute). The
    # default f32/precision-highest path is the reference-parity path; at the
    # reference's 88-wide layers bf16 buys nothing, at seq-concat widths
    # (original_dim ~1000, intermediate_dim >=1024) it doubles MXU throughput.
    bf16_compute: bool = False
    # generation-time backend: 'xla' (lax.scan sampler) or 'pallas' (fused
    # whole-generation kernel, ops/pallas_generate_vae.py).
    gen_backend: str = "xla"
    # training-step backend (round 5): 'xla' (the default AND the measured
    # winner), 'pallas' (the whole dense stack fwd+bwd in one VMEM-resident
    # kernel per direction, ops/pallas_vae.py), or 'auto' (resolves to 'xla'
    # everywhere — the kernel's measured win region is empty). Round 4 saw
    # the XLA step at ~25-30% of roof at D976/H2048/B4096
    # (artifacts/vae_scale_bench.json) and called the headroom "known"; the
    # round-5 kernel prototype tested that call on v5e and LOST at every
    # scale (0.642-0.913x, artifacts/vae_train_kernel_exp.json) — the
    # binding cost is the [B, ~1000]-frame stream both backends pay, so the
    # headroom is not recoverable by fusion alone (design call:
    # ops/pallas_vae.py docstring, docs/KERNELS.md). Static + hashable,
    # recorded in args.json like cl_vrnn's fusion/two_cell.
    train_backend: str = "xla"

    @property
    def has_hidden(self) -> bool:
        return self.intermediate_dim > 0


def init(key, cfg: Config) -> dict:
    """Initialize the param pytree (layer names match the reference graph)."""
    ks = jax.random.split(key, 8)
    K1 = cfg.n_classes - 1
    params = {
        "h_w": init_dense(ks[0], cfg.original_dim, cfg.intermediate_class_dim),
        "w_mean": init_dense(ks[1], cfg.intermediate_class_dim, K1),
        "w_log_var": init_dense(ks[2], cfg.intermediate_class_dim, K1),
    }
    enc_in = cfg.original_dim + cfg.n_classes
    if cfg.has_hidden:
        params["h"] = init_dense(ks[3], enc_in, cfg.intermediate_dim)
        params["z_mean"] = init_dense(ks[4], cfg.intermediate_dim, cfg.latent_dim)
        params["z_log_var"] = init_dense(ks[5], cfg.intermediate_dim, cfg.latent_dim)
    else:
        params["z_mean"] = init_dense(ks[4], enc_in, cfg.latent_dim)
        params["z_log_var"] = init_dense(ks[5], enc_in, cfg.latent_dim)
    dec_in = cfg.n_classes + cfg.latent_dim + (cfg.original_dim if cfg.use_x_prev else 0)
    if cfg.has_hidden:
        params["decoder_h"] = init_dense(ks[6], dec_in, cfg.intermediate_dim)
        params["x_decoded_mean"] = init_dense(ks[7], cfg.intermediate_dim, cfg.original_dim)
    else:
        params["x_decoded_mean"] = init_dense(ks[7], dec_in, cfg.original_dim)
    return params


def encode_w(params, x, dtype=None):
    """x -> (w_mean, w_log_var). Replaces make_w_encoder (cl_vae/model.py:76-85)."""
    h_w = dense(params["h_w"], x, jax.nn.relu, dtype=dtype)
    return dense(params["w_mean"], h_w), dense(params["w_log_var"], h_w)


def encode_z(params, cfg: Config, x, w, dtype=None):
    """(x, w) -> (z_mean, z_log_var). Replaces make_z_encoder (cl_vae/model.py:87-102)."""
    xw = jnp.concatenate([x, w], axis=-1)
    h = dense(params["h"], xw, jax.nn.relu, dtype=dtype) if cfg.has_hidden else xw
    return dense(params["z_mean"], h), dense(params["z_log_var"], h)


def decode(params, cfg: Config, w, z, x_prev=None, dtype=None):
    """(w, z[, x_prev]) -> sigmoid x_mean. Replaces make_decoder (cl_vae/model.py:104-128)."""
    xpz = jnp.concatenate([x_prev, z], axis=-1) if cfg.use_x_prev else z
    wz = jnp.concatenate([w, xpz], axis=-1)
    h = dense(params["decoder_h"], wz, jax.nn.relu, dtype=dtype) if cfg.has_hidden else wz
    return dense(params["x_decoded_mean"], h, jax.nn.sigmoid, dtype=dtype)


def draw_apply_noise(key, cfg: Config, batch_size: int) -> dict:
    """Pre-draw :func:`apply`'s Gaussian noise, bit-identical to its internal draws.

    Mirrors the split/shape/dtype sequence inside :func:`apply` exactly, so
    ``apply(p, cfg, x, key)`` == ``apply(p, cfg, x, key, noise=draw_apply_noise(
    key, cfg, B))``. This is the hook the data-parallel trainer uses: noise is
    drawn once for the GLOBAL batch and sharded with it over the mesh, making
    ``--dp`` training bit-identical to single-device (``train/loop.py``).
    """
    kw, kz = jax.random.split(key)
    return {
        "eps_w": jax.random.normal(kw, (batch_size, cfg.n_classes - 1)),
        "eps_z": jax.random.normal(kz, (batch_size, cfg.latent_dim)),
    }


def apply(params, cfg: Config, x, key, x_prev=None, noise=None):
    """Full stochastic forward pass; returns every named tensor of the graph.

    Under ``cfg.bf16_compute`` the WIDE matmuls (hidden layers + frame head)
    take bf16 operands with f32 accumulation; the tiny distribution heads
    (w/z mean & log-var — they feed ``exp``) stay f32 like cl_vrnn's.

    ``noise`` (optional): pre-drawn eps dict from :func:`draw_apply_noise`;
    when given the pass is deterministic in it (``key`` is unused).
    """
    from ..nn.distributions import logistic_normal_from_eps

    cd = jnp.bfloat16 if cfg.bf16_compute else None
    if noise is None:
        kw, kz = jax.random.split(key)
    from ..ops.pallas_vae import should_use as _use_fused_vae

    if _use_fused_vae(cfg):
        # fused dense-stack path (ops/pallas_vae.py): same draws as below —
        # sample_logistic_normal/sample_gaussian draw with the f32 head
        # shapes, exactly what draw_apply_noise pre-draws
        from ..ops.pallas_vae import vae_apply_core

        B = x.shape[0]
        if noise is None:
            eps_w = jax.random.normal(kw, (B, cfg.n_classes - 1))
            eps_z = jax.random.normal(kz, (B, cfg.latent_dim))
        else:
            eps_w, eps_z = noise["eps_w"], noise["eps_z"]
        return vae_apply_core(params, cfg, x, x_prev, eps_w, eps_z,
                              compute_dtype=cd)
    w_mean, w_log_var = encode_w(params, x, dtype=cd)
    if noise is None:
        w = sample_logistic_normal(kw, w_mean, w_log_var)
    else:
        w = logistic_normal_from_eps(w_mean, w_log_var, noise["eps_w"].astype(w_mean.dtype))
    z_mean, z_log_var = encode_z(params, cfg, x, w, dtype=cd)
    if noise is None:
        z = sample_gaussian(kz, z_mean, z_log_var)
    else:
        z = z_mean + jnp.exp(z_log_var / 2) * noise["eps_z"].astype(z_mean.dtype)
    x_decoded_mean = decode(params, cfg, w, z, x_prev, dtype=cd)
    return {
        "x_decoded_mean": x_decoded_mean,
        "w": w,
        "w_mean": w_mean,
        "w_log_var": w_log_var,
        "z": z,
        "z_mean": z_mean,
        "z_log_var": z_log_var,
    }


def loss_and_metrics(params, cfg: Config, batch, key, kl_weight=1.0, class_weight=1.0, w_kl_weight=1.0):
    """Weighted ELBO + named terms, Keras-compile parity.

    ``batch`` is a dict with ``x`` (encoder input), ``y`` (reconstruction
    target), ``w`` (one-hot key), optional ``x_prev``. The reference wires
    ``model.fit(xtr, [y, w, w, y])`` with loss weights
    {vae: 1, w_kl: w_kl_weight, w_rec: class_weight, kl: kl_weight}
    (``cl_vae/model.py:216-219``, ``cl_vae/train.py:58-71``); each term is
    averaged over the batch before weighting, exactly like Keras.
    """
    noise = {"eps_w": batch["eps_w"], "eps_z": batch["eps_z"]} if "eps_w" in batch else None
    out = apply(params, cfg, batch["x"], key, batch.get("x_prev"), noise=noise)
    vae = jnp.mean(L.vae_loss(batch["y"], out["x_decoded_mean"], cfg.original_dim))
    kl = jnp.mean(L.kl_loss(out["z_mean"], out["z_log_var"]))
    if cfg.n_classes > 1:
        w_kl = jnp.mean(L.w_kl_loss(out["w_mean"], out["w_log_var"], cfg.w_log_var_prior))
        w_rec = jnp.mean(L.w_rec_loss(batch["w"], out["w"], cfg.n_classes))
        w_acc = jnp.mean(
            (jnp.argmax(out["w"], -1) == jnp.argmax(batch["w"], -1)).astype(jnp.float32)
        )
    else:  # vanilla VAE: no free logits, w losses vanish identically
        w_kl = jnp.array(0.0)
        w_rec = jnp.array(0.0)
        w_acc = jnp.array(1.0)
    total = vae + w_kl_weight * w_kl + class_weight * w_rec + kl_weight * kl
    return total, {
        "loss": total,
        "x_decoded_mean_loss": vae,
        "w_loss": w_kl,
        "w2_loss": w_rec,
        "z_args_loss": kl,
        "w_acc": w_acc,
    }
