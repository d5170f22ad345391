"""Classifying VAE+LSTM (STORN-style sequence model).

TPU-native re-design of the reference graph (``cl_vrnn/model.py:164-267``):

* both LSTMs run under ``jax.lax.scan`` with their input projections hoisted
  into single whole-sequence MXU matmuls (:mod:`..ops.lstm`) — the TPU
  treatment of the reference's Keras symbolic unroll;
* the same cell weights drive training and step-wise generation, which fixes
  reference quirk Q3 by construction (the reference's ``make_z_encoder``
  rebuilt a *fresh* LSTM and never copied the trained weights,
  ``cl_vrnn/model.py:122-133``);
* per-timestep Gaussian latents + one window-level Logistic-Normal key latent,
  losses identical to :mod:`.cl_vae` but summed per timestep (rank-3),
  reference ``cl_vrnn/model.py:236-264``.

Architecture:
  key head   flatten(X) -> hW(relu, original_dim) -> Wargs(2*(K-1)) -> split
  W ~ LogisticNormal(W_mean, W_log_var)                       [K-simplex]
  encoder    LSTM(intermediate_dim) over concat(X, repeat(W))
             -> Z_mean/Z_log_var per step (RandomNormal(0, 0.1) kernels,
                reference cl_vrnn/model.py:200-207)
  Z_t ~ N(Z_mean_t, exp(Z_log_var_t))
  decoder    LSTM(intermediate_dim) over concat([Xp,] Z, repeat(W))
             -> sigmoid Dense X_decoded_mean per step (RandomNormal(0, 0.1))

The reference's ``dropout`` constructor arg exists but is never CLI-exposed
(SURVEY §2 row 7); we accept and apply it with the real Keras-2.0 LSTM
semantics — four independent per-gate input masks, constant over all
timesteps, inverted-scaled (:func:`..ops.lstm.keras_lstm_dropout_masks`) —
default 0.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import losses as L
from ..nn.core import dense, init_dense, random_normal_init
from ..nn.distributions import sample_gaussian, sample_logistic_normal
from ..ops.lstm import lstm_sequence, lstm_step


@dataclasses.dataclass(frozen=True)
class Config:
    original_dim: int = 88
    intermediate_dim: int = 88
    latent_dim: int = 2
    seq_length: int = 16
    n_classes: int = 2
    use_x_prev: bool = False
    w_log_var_prior: float = 0.0
    dropout: float = 0.0
    lstm_backend: str = "xla"  # 'xla' (lax.scan) or 'pallas' (fused kernel)
    remat: bool = False  # jax.checkpoint the scan body (long-context memory)
    bf16_compute: bool = False  # bf16 matmul operands, f32 accumulation
    # pallas kernel-fusion triple (proj, drk, full); None = set_fusion policy
    # defaults (ops/pallas_lstm.resolve_fusion) — static, hashable, frozen
    fusion: tuple | None = None
    # two-cell fused train kernel (encoder ∥ decoder in ONE Pallas program,
    # ops/pallas_two_cell.py): None = auto (pallas_two_cell.should_use),
    # True/False = explicit override — static and hashable like `fusion`
    two_cell: bool | None = None


def init(key, cfg: Config) -> dict:
    from ..nn.core import init_lstm

    ks = jax.random.split(key, 7)
    K1 = cfg.n_classes - 1
    head_init = random_normal_init(0.1)
    enc_in = cfg.original_dim + cfg.n_classes
    dec_in = cfg.latent_dim + cfg.n_classes + (cfg.original_dim if cfg.use_x_prev else 0)
    return {
        "hW": init_dense(ks[0], cfg.seq_length * cfg.original_dim, cfg.original_dim),
        "Wargs": init_dense(ks[1], cfg.original_dim, 2 * K1),
        "encoder_h": init_lstm(ks[2], enc_in, cfg.intermediate_dim),
        "Z_mean": init_dense(ks[3], cfg.intermediate_dim, cfg.latent_dim, head_init),
        "Z_log_var": init_dense(ks[4], cfg.intermediate_dim, cfg.latent_dim, head_init),
        "decoder_h": init_lstm(ks[5], dec_in, cfg.intermediate_dim),
        "X_decoded_mean": init_dense(ks[6], cfg.intermediate_dim, cfg.original_dim, head_init),
    }


def encode_w(params, cfg: Config, x_window):
    """Flattened window -> (W_mean, W_log_var) (reference cl_vrnn/model.py:174-181)."""
    K1 = cfg.n_classes - 1
    flat = x_window.reshape(x_window.shape[:-2] + (cfg.seq_length * cfg.original_dim,))
    hW = dense(params["hW"], flat, jax.nn.relu)
    Wargs = dense(params["Wargs"], hW)
    return Wargs[..., :K1], Wargs[..., K1:]


def _repeat_w(w, seq_length):
    """[B, K] -> [B, T, K] (the reference's RepeatVector)."""
    return jnp.broadcast_to(w[:, None, :], (w.shape[0], seq_length, w.shape[-1]))


def encode_z_sequence(params, cfg: Config, x, w, h0=None, c0=None, dropout_key=None):
    """(X, W) -> per-step (Z_mean, Z_log_var) + final LSTM state.

    ``dropout_key`` enables the Keras-2.0 LSTM ``dropout`` semantics (four
    per-gate input masks, constant over time — reference
    ``cl_vrnn/model.py:196``); inert when ``cfg.dropout == 0``.
    """
    xw = jnp.concatenate([x, _repeat_w(w, x.shape[1])], axis=-1)
    h_seq, state = lstm_sequence(
        params["encoder_h"], xw, h0, c0, backend=cfg.lstm_backend, remat=cfg.remat,
        compute_dtype=jnp.bfloat16 if cfg.bf16_compute else None,
        dropout=cfg.dropout, dropout_key=dropout_key,
        fusion=cfg.fusion if cfg.lstm_backend == "pallas" else None,
    )
    return dense(params["Z_mean"], h_seq), dense(params["Z_log_var"], h_seq), state


def decode_sequence(params, cfg: Config, z, w, x_prev=None, h0=None, c0=None, dropout_key=None):
    """(Z, W[, Xp]) -> per-step sigmoid X_mean + final LSTM state."""
    xpz = jnp.concatenate([x_prev, z], axis=-1) if cfg.use_x_prev else z
    xpz = jnp.concatenate([xpz, _repeat_w(w, z.shape[1])], axis=-1)
    h_seq, state = lstm_sequence(
        params["decoder_h"], xpz, h0, c0, backend=cfg.lstm_backend, remat=cfg.remat,
        compute_dtype=jnp.bfloat16 if cfg.bf16_compute else None,
        dropout=cfg.dropout, dropout_key=dropout_key,
        fusion=cfg.fusion if cfg.lstm_backend == "pallas" else None,
    )
    return dense(params["X_decoded_mean"], h_seq, jax.nn.sigmoid), state


def encode_z_step(params, x_t, w, h, c):
    """Single-step z encoder for generation; carries (h, c) explicitly.

    Equivalent of the reference's stateful batch-1 z-encoder
    (``cl_vrnn/model.py:116-136``) but sharing the trained weights (Q3 fixed).
    """
    xw = jnp.concatenate([x_t, w], axis=-1)
    h, c = lstm_step(params["encoder_h"], xw, h, c)
    return dense(params["Z_mean"], h), dense(params["Z_log_var"], h), h, c


def decode_step(params, cfg: Config, z_t, w, h, c, x_prev=None):
    """Single-step decoder for generation (reference cl_vrnn/model.py:138-162)."""
    xpz = jnp.concatenate([x_prev, z_t], axis=-1) if cfg.use_x_prev else z_t
    xpz = jnp.concatenate([xpz, w], axis=-1)
    h, c = lstm_step(params["decoder_h"], xpz, h, c)
    return dense(params["X_decoded_mean"], h, jax.nn.sigmoid), h, c


def draw_apply_noise(key, cfg: Config, batch_size: int) -> dict:
    """Pre-draw :func:`apply`'s Gaussian noise, bit-identical to its internal draws.

    Mirrors the split/shape/dtype sequence both apply paths use (``kw, kz, _,
    _ = split(key, 4)``; eps_w ``[B, K-1]``, eps_z ``[B, T, L]``), so
    ``apply(p, cfg, x, key)`` == ``apply(..., noise=draw_apply_noise(key, cfg,
    B))``. The data-parallel trainer draws this for the GLOBAL batch and
    shards it with the data, making ``--dp`` bit-identical to single-device
    training (``train/loop.py``). Dropout keys are not covered (dropout is
    never CLI-exposed; DP requires ``cfg.dropout == 0``).
    """
    kw, kz, _, _ = jax.random.split(key, 4)
    return {
        "eps_w": jax.random.normal(kw, (batch_size, cfg.n_classes - 1)),
        "eps_z": jax.random.normal(kz, (batch_size, cfg.seq_length, cfg.latent_dim)),
    }


def _apply_fused(params, cfg: Config, x, key, x_prev=None, noise=None):
    """Fused forward: encoder cell, z head, z sample, decoder cell in ONE scan.

    The decoder at step t needs only the encoder output at step t, so the two
    LSTM recurrences run in a single ``lax.scan`` carrying both states — half
    the loop overhead of two sequential scans, identical numerics (the z noise
    is pre-drawn with the same key/shape the two-scan path uses). All input
    projections (encoder XW, decoder Xp/W parts) stay hoisted as whole-sequence
    MXU matmuls; only z's contribution to the decoder projection is per-step.
    """
    from ..nn.core import hard_sigmoid
    from ..ops.lstm import _gates

    if noise is None:
        kw, kz, _, _ = jax.random.split(key, 4)  # same split as the two-scan path
    B, T, D = x.shape
    H = cfg.intermediate_dim
    L = cfg.latent_dim
    # bf16_compute: matmul operands in bf16, f32 accumulation (MXU-native mode
    # for scaled-up hidden sizes); default keeps f32 operands for parity
    cd = jnp.bfloat16 if cfg.bf16_compute else None
    prec = None if cfg.bf16_compute else "highest"
    mm = lambda a, b: jnp.dot(
        a.astype(cd) if cd else a, b.astype(cd) if cd else b,
        preferred_element_type=jnp.float32, precision=prec,
    )
    W_mean, W_log_var = encode_w(params, cfg, x)
    if noise is None:
        W = sample_logistic_normal(kw, W_mean, W_log_var)
        # same draw as sample_gaussian(kz, Z_mean, Z_log_var) in the two-scan path
        eps = jax.random.normal(kz, (B, T, L))
    else:
        from ..nn.distributions import logistic_normal_from_eps

        W = logistic_normal_from_eps(W_mean, W_log_var, noise["eps_w"].astype(W_mean.dtype))
        eps = noise["eps_z"]

    xw = jnp.concatenate([x, _repeat_w(W, T)], axis=-1)
    enc = params["encoder_h"]
    dec = params["decoder_h"]
    xz_enc = mm(xw, enc["kernel"]) + enc["bias"]
    # decoder input is concat([Xp,] Z, W): split its kernel by input rows and
    # precompute the Xp and W contributions for the whole sequence
    n_xp = D if cfg.use_x_prev else 0
    k_xp = dec["kernel"][:n_xp]
    k_z = dec["kernel"][n_xp : n_xp + L]
    k_w = dec["kernel"][n_xp + L :]
    xz_dec = mm(_repeat_w(W, T), k_w) + dec["bias"]
    if cfg.use_x_prev:
        xz_dec = xz_dec + mm(x_prev, k_xp)

    def body(carry, xs):
        h_e, c_e, h_d, c_d = carry
        xz_e_t, xz_d_t, eps_t = xs
        z_e = xz_e_t + mm(h_e, enc["recurrent_kernel"])
        h_e, c_e = _gates(z_e, c_e, H, hard_sigmoid, jnp.tanh)
        zm = dense(params["Z_mean"], h_e)
        zv = dense(params["Z_log_var"], h_e)
        z = zm + jnp.exp(zv / 2) * eps_t
        z_d = xz_d_t + mm(z, k_z) + mm(h_d, dec["recurrent_kernel"])
        h_d, c_d = _gates(z_d, c_d, H, hard_sigmoid, jnp.tanh)
        return (h_e, c_e, h_d, c_d), (h_d, zm, zv, z)

    zeros = jnp.zeros((B, H), x.dtype)
    xs_t = (jnp.swapaxes(xz_enc, 0, 1), jnp.swapaxes(xz_dec, 0, 1), jnp.swapaxes(eps, 0, 1))
    _, (h_d_seq, zm_seq, zv_seq, z_seq) = jax.lax.scan(
        body, (zeros, zeros, zeros, zeros), xs_t, unroll=4
    )
    to_bt = lambda a: jnp.swapaxes(a, 0, 1)
    X_decoded_mean = dense(params["X_decoded_mean"], to_bt(h_d_seq), jax.nn.sigmoid)
    return {
        "X_decoded_mean": X_decoded_mean,
        "W": W,
        "W_mean": W_mean,
        "W_log_var": W_log_var,
        "Z": to_bt(z_seq),
        "Z_mean": to_bt(zm_seq),
        "Z_log_var": to_bt(zv_seq),
    }


def _apply_two_cell(params, cfg: Config, x, key, x_prev=None, noise=None):
    """Pallas two-cell path: the whole recurrent core (encoder LSTM, z heads,
    z sample, decoder LSTM) in ONE kernel whose two chain matmuls overlap in
    the MXU pipeline (ops/pallas_two_cell.py — the H>=256 train regime is
    chain-latency bound and the chains hide behind each other). Key/noise
    semantics identical to the other apply paths."""
    from ..ops.pallas_two_cell import two_cell_sequence

    if noise is None:
        kw, kz, _, _ = jax.random.split(key, 4)  # same split as the two-scan path
    B, T, _ = x.shape
    W_mean, W_log_var = encode_w(params, cfg, x)
    if noise is None:
        W = sample_logistic_normal(kw, W_mean, W_log_var)
        eps = jax.random.normal(kz, (B, T, cfg.latent_dim))
    else:
        from ..nn.distributions import logistic_normal_from_eps

        W = logistic_normal_from_eps(W_mean, W_log_var, noise["eps_w"].astype(W_mean.dtype))
        eps = noise["eps_z"]
    hd, zm, zlv, z = two_cell_sequence(
        params, cfg, x, x_prev, W, eps,
        compute_dtype=jnp.bfloat16 if cfg.bf16_compute else None)
    X_decoded_mean = dense(params["X_decoded_mean"], hd, jax.nn.sigmoid)
    return {
        "X_decoded_mean": X_decoded_mean,
        "W": W,
        "W_mean": W_mean,
        "W_log_var": W_log_var,
        "Z": z,
        "Z_mean": zm,
        "Z_log_var": zlv,
    }


def apply(params, cfg: Config, x, key, x_prev=None, noise=None):
    """Full stochastic forward pass over a window batch [B, T, D].

    Uses the fused single-scan path when its preconditions hold (no dropout,
    XLA backend); the Pallas two-cell kernel when the backend is pallas and
    :func:`..ops.pallas_two_cell.should_use` holds; the two-scan path is kept
    for dropout/small-pallas configurations and as the reference
    implementation both fused paths are tested against.

    ``noise`` (optional): pre-drawn eps dict from :func:`draw_apply_noise`;
    when given the pass is deterministic in it (requires ``dropout == 0``).
    """
    if cfg.dropout == 0.0 and cfg.lstm_backend == "xla" and not cfg.remat:
        return _apply_fused(params, cfg, x, key, x_prev, noise)
    if cfg.dropout == 0.0 and cfg.lstm_backend == "pallas" and not cfg.remat:
        from ..ops.pallas_two_cell import should_use

        if should_use(cfg):
            return _apply_two_cell(params, cfg, x, key, x_prev, noise)
    kw, kz, kd1, kd2 = jax.random.split(key, 4)
    W_mean, W_log_var = encode_w(params, cfg, x)
    if noise is None:
        W = sample_logistic_normal(kw, W_mean, W_log_var)
    else:
        from ..nn.distributions import logistic_normal_from_eps

        assert cfg.dropout == 0.0, "noise-explicit apply does not cover dropout masks"
        W = logistic_normal_from_eps(W_mean, W_log_var, noise["eps_w"].astype(W_mean.dtype))
    Z_mean, Z_log_var, _ = encode_z_sequence(params, cfg, x, W, dropout_key=kd1)
    if noise is None:
        Z = sample_gaussian(kz, Z_mean, Z_log_var)
    else:
        Z = Z_mean + jnp.exp(Z_log_var / 2) * noise["eps_z"].astype(Z_mean.dtype)
    X_decoded_mean, _ = decode_sequence(params, cfg, Z, W, x_prev, dropout_key=kd2)
    return {
        "X_decoded_mean": X_decoded_mean,
        "W": W,
        "W_mean": W_mean,
        "W_log_var": W_log_var,
        "Z": Z,
        "Z_mean": Z_mean,
        "Z_log_var": Z_log_var,
    }


def loss_and_metrics(params, cfg: Config, batch, key, kl_weight=1.0, class_weight=1.0, w_kl_weight=1.0):
    """Weighted sequence ELBO with Keras reductions (cl_vrnn/model.py:236-264).

    ``vae`` and ``kl`` are per-(batch, timestep) and averaged over both axes;
    the w terms are per-window. Targets: ``y`` [B, T, D] per-step next frames.
    """
    noise = {"eps_w": batch["eps_w"], "eps_z": batch["eps_z"]} if "eps_w" in batch else None
    out = apply(params, cfg, batch["x"], key, batch.get("x_prev"), noise=noise)
    vae = jnp.mean(L.vae_loss(batch["y"], out["X_decoded_mean"], cfg.original_dim))
    kl = jnp.mean(L.kl_loss(out["Z_mean"], out["Z_log_var"]))
    if cfg.n_classes > 1:
        w_kl = jnp.mean(L.w_kl_loss(out["W_mean"], out["W_log_var"], cfg.w_log_var_prior))
        w_rec = jnp.mean(L.w_rec_loss(batch["w"], out["W"], cfg.n_classes))
        w_acc = jnp.mean(
            (jnp.argmax(out["W"], -1) == jnp.argmax(batch["w"], -1)).astype(jnp.float32)
        )
    else:
        w_kl = jnp.array(0.0)
        w_rec = jnp.array(0.0)
        w_acc = jnp.array(1.0)
    total = vae + w_kl_weight * w_kl + class_weight * w_rec + kl_weight * kl
    return total, {
        "loss": total,
        "X_decoded_mean_loss": vae,
        "W_loss": w_kl,
        "W2_loss": w_rec,
        "Z_args_loss": kl,
        "w_acc": w_acc,
    }
