"""Pallas fused STORN step kernel (inference).

One kernel runs the ENTIRE cl_vrnn per-step block for all T steps with every
carried tensor resident in VMEM:

    encoder LSTM cell -> Z_mean/Z_log_var heads -> z = mean + exp(lv/2)*eps
    -> decoder LSTM cell

Inputs are the hoisted whole-sequence projections (encoder ``xz_enc`` and the
decoder's Xp/W contributions ``xz_dec``) plus pre-drawn Gaussian noise, so the
kernel body is two small MXU matmuls + four tiny head matmuls + gates per
step, with zero HBM round-trips for the four LSTM states.

Forward-only by design: training uses the fused XLA scan
(:func:`..models.cl_vrnn._apply_fused`, whose backward XLA handles well);
this kernel serves the forward-dominated paths — importance-sampled NLL
evaluation (K forward passes per datapoint) and serving. Numerical parity
with the XLA path is tested in ``tests/test_pallas_storn.py``.

Measured (TPU v5e, B=200 T=16 H=88, full-batch block): forward 546 us vs the
fused XLA scan's 451 us with bitwise-identical outputs — XLA's cross-iteration
pipelining beats this single sequential kernel at reference sizes, so the XLA
path stays the default everywhere and this kernel stands as the measured
counter-example (see docs/DESIGN.md). Compiles in ~4 s (cached thereafter via
the persistent compile cache).

Layout: time-major [T, B, *]; batch-blocked grid like
:mod:`.pallas_lstm`; f32 with explicit high-precision matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _storn_kernel(
    xz_enc_ref,  # [T, B, 4H]
    xz_dec_ref,  # [T, B, 4H]
    eps_ref,  # [T, B, L]
    rk_enc_ref,  # [H, 4H]
    rk_dec_ref,  # [H, 4H]
    kz_ref,  # [L, 4H] decoder kernel rows for z
    zm_k_ref,  # [H, L]
    zm_b_ref,  # [1, L]
    zv_k_ref,  # [H, L]
    zv_b_ref,  # [1, L]
    hd_seq_ref,  # out [T, B, H]
    zm_seq_ref,  # out [T, B, L]
    zv_seq_ref,  # out [T, B, L]
    z_seq_ref,  # out [T, B, L]
    h_e,
    c_e,
    h_d,
    c_d,  # VMEM scratch [B, H]
):
    T = xz_enc_ref.shape[0]
    H = h_e.shape[-1]
    h_e[:] = jnp.zeros_like(h_e)
    c_e[:] = jnp.zeros_like(c_e)
    h_d[:] = jnp.zeros_like(h_d)
    c_d[:] = jnp.zeros_like(c_d)

    def hs(v):
        return jnp.clip(0.2 * v + 0.5, 0.0, 1.0)

    def cell(z, c_prev):
        i = hs(z[:, :H])
        f = hs(z[:, H : 2 * H])
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = hs(z[:, 3 * H :])
        c = f * c_prev + i * g
        return o * jnp.tanh(c), c

    def step(t, _):
        mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32, precision="highest")
        z_e = xz_enc_ref[t] + mm(h_e[:], rk_enc_ref[:])
        he, ce = cell(z_e, c_e[:])
        h_e[:] = he
        c_e[:] = ce
        zm = mm(he, zm_k_ref[:]) + zm_b_ref[0]
        zv = mm(he, zv_k_ref[:]) + zv_b_ref[0]
        z = zm + jnp.exp(zv / 2) * eps_ref[t]
        z_d = xz_dec_ref[t] + mm(z, kz_ref[:]) + mm(h_d[:], rk_dec_ref[:])
        hd, cd = cell(z_d, c_d[:])
        h_d[:] = hd
        c_d[:] = cd
        hd_seq_ref[t] = hd
        zm_seq_ref[t] = zm
        zv_seq_ref[t] = zv
        z_seq_ref[t] = z
        return 0

    jax.lax.fori_loop(0, T, step, 0)


def storn_forward_pallas(params, cfg, xz_enc_t, xz_dec_t, eps_t, block_b: int | None = None):
    """Run the fused STORN recurrence. Time-major inputs [T, B, *].

    Returns (h_d_seq, zm_seq, zv_seq, z_seq), all [T, B, *].
    """
    T, B, H4 = xz_enc_t.shape
    H = H4 // 4
    L = eps_t.shape[-1]
    n_xp = cfg.original_dim if cfg.use_x_prev else 0
    dec_k = params["decoder_h"]["kernel"]
    k_z = dec_k[n_xp : n_xp + L]
    if block_b is None:
        # largest divisor of B whose working set fits comfortably in VMEM;
        # big blocks keep the MXU fed (8-row blocks cost ~2x, measured)
        for bb in sorted((d for d in range(1, B + 1) if B % d == 0), reverse=True):
            bytes_needed = 4 * (T * bb * (8 * H + 4 * L) + 4 * bb * H + 3 * H * 4 * H)
            if bytes_needed < 10 * 1024 * 1024:
                block_b = bb
                break
    nb = pl.cdiv(B, block_b)

    f32 = jnp.float32
    spec_tb = lambda d: pl.BlockSpec((T, block_b, d), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
    spec_full = lambda s: pl.BlockSpec(s, lambda b: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _storn_kernel,
        grid=(nb,),
        in_specs=[
            spec_tb(H4),
            spec_tb(H4),
            spec_tb(L),
            spec_full((H, H4)),
            spec_full((H, H4)),
            spec_full((L, H4)),
            spec_full((H, L)),
            spec_full((1, L)),
            spec_full((H, L)),
            spec_full((1, L)),
        ],
        out_specs=(spec_tb(H), spec_tb(L), spec_tb(L), spec_tb(L)),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), f32),
            jax.ShapeDtypeStruct((T, B, L), f32),
            jax.ShapeDtypeStruct((T, B, L), f32),
            jax.ShapeDtypeStruct((T, B, L), f32),
        ),
        scratch_shapes=[pltpu.VMEM((block_b, H), f32) for _ in range(4)],
        interpret=_interpret(),
    )(
        xz_enc_t.astype(f32),
        xz_dec_t.astype(f32),
        eps_t.astype(f32),
        params["encoder_h"]["recurrent_kernel"].astype(f32),
        params["decoder_h"]["recurrent_kernel"].astype(f32),
        k_z.astype(f32),
        params["Z_mean"]["kernel"].astype(f32),
        params["Z_mean"]["bias"].reshape(1, -1).astype(f32),
        params["Z_log_var"]["kernel"].astype(f32),
        params["Z_log_var"]["bias"].reshape(1, -1).astype(f32),
    )
    return out
