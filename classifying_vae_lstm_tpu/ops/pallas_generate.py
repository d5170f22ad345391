"""Pallas fused WHOLE-GENERATION kernel for the cl_vrnn sampler.

Autoregressive generation is the serving hot path (reference
``cl_vrnn/model.py:9-60`` crossed Python<->TF 2-3x per frame; the XLA rebuild
made a whole song one ``lax.scan`` program). This kernel goes one level
further: the ENTIRE generate loop — encoder LSTM cell, z heads, z sample,
decoder LSTM cell, sigmoid frame head, Bernoulli draw, feedback — runs inside
ONE Pallas kernel with every weight matrix resident in VMEM and the carried
state (h/c of both LSTMs plus the fed-back frame) in VMEM scratch.

Why it wins: under ``lax.scan`` XLA re-fetches the weights from HBM every
timestep (buffers are not pinned across loop iterations) — at hidden 512
that's ~5 MB/step, so a 256-step generation moves >1 GB of weight traffic
that this kernel loads exactly once. The streams that remain are the tiny
per-step tensors: seed frames in, (eps, u) noise in, frames/probs out.

Randomness is EXPLICIT: the caller pre-draws ``eps`` (Gaussian for z) and
``u`` (uniforms for the Bernoulli frame draws) with ``jax.random`` and the
kernel is a pure deterministic function of them — verified EXACTLY against
:func:`...sampling.generate.generate_cl_vrnn_batch_noise` (same noise in,
same songs out; ``tests/test_pallas_generate.py``).

VMEM budget: both recurrent kernels must fit. With the Mosaic scoped-VMEM
limit lifted via CompilerParams (the 16 MB default is far under v5e's
128 MB physical VMEM; measured perf-neutral on the LSTM kernels), a 28 MB
budget keeps bf16 weights resident through hidden 1024 — previously 1024
escalated to int8 — and int8 through ~1536; :func:`fits` gates selection
and the XLA scan remains the fallback (and the parity default at reference
sizes).

Falls back to interpret mode off-TPU so the tests run on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lstm import _compiler_params, _interpret

_BUDGET = 28 * 1024 * 1024


def _gates(z, c_prev, H):
    i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
    f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
    g = jnp.tanh(z[:, 2 * H : 3 * H])
    o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
    c = f * c_prev + i * g
    return o * jnp.tanh(c), c


def _weight_bytes(D: int, H: int, L: int, mode: str) -> int:
    """Resident weight cost with each tensor at the dtype the kernel actually
    loads it in (not a single uniform width — the int8 mode keeps the z head
    bf16 and the decoder z rows f32, carries five per-column f32 scale
    vectors, and every mode lane-pads the frame head to Dp)."""
    wb = {"f32": 4, "bf16": 2, "int8": 1}[mode]
    Dp = max(128, -(-D // 128) * 128)
    big = wb * (
        D * 4 * H + H * 4 * H          # encoder x-kernel + recurrent
        + D * 4 * H + H * 4 * H        # decoder x rows + recurrent
        + H * Dp                       # frame head (lane-padded)
    )
    z_head = (2 if mode == "int8" else wb) * H * 128   # bf16 floor in int8 mode
    z_dec = (4 if mode == "int8" else wb) * L * 4 * H  # f32 in int8 mode
    biases = 4 * (128 + Dp)                            # bz + bx, f32
    # int8 scales: ske/srke/skd/srkd [1, 4H] + swx [1, Dp], f32
    scales = 4 * (4 * 4 * H + Dp) if mode == "int8" else 0
    return big + z_head + z_dec + biases + scales


def pick_mode(cfg) -> str | None:
    """Weight precision for the fused kernel, or None if nothing fits VMEM.

    bf16 checkpoints escalate to INT8 weights when bf16 doesn't fit (under
    the 28 MB budget bf16 holds through hidden 1024 — ~19 MB resident — and
    int8 extends the kernel to ~hidden 1536 at half the bytes).
    The kernel's activations make int8 nearly free in accuracy: frames are
    binary (exact int8), h is tanh*sigmoid-bounded in (-1, 1) (fixed scale
    127), and the z path bypasses matmuls entirely — so the only error is the
    per-column weight rounding, <=0.4% of each column's max, the same order
    as bf16 rounding. f32 checkpoints never quantize (parity path).
    """
    limit = _BUDGET - int(2.5 * 1024 * 1024)
    D, H, L = cfg.original_dim, cfg.intermediate_dim, cfg.latent_dim
    if cfg.bf16_compute:
        if _weight_bytes(D, H, L, "bf16") < limit:
            return "bf16"
        if _weight_bytes(D, H, L, "int8") < limit:
            return "int8"
        return None
    return "f32" if _weight_bytes(D, H, L, "f32") < limit else None


def fits(cfg) -> bool:
    """Can the fused generation kernel hold this model's weights in VMEM?"""
    return pick_mode(cfg) is not None


def _quant_cols(w):
    """Per-output-column symmetric int8 quantization: (q [in, out] int8,
    scale [1, out] f32) with w ~= q * scale."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0, 1e-12)
    return jnp.round(w / s).astype(jnp.int8), s.astype(jnp.float32)


# test hook: lets the CPU-mesh tests exercise the fused path in interpret
# mode even though production dispatch requires a real TPU
FORCE_OFF_TPU = False


def should_use(cfg, batch_size: int) -> bool:
    """Production dispatch predicate for the fused generation kernel.

    True when the config selected the pallas backend, the weights fit VMEM,
    and a real TPU is attached — off-TPU the kernel would run in interpret
    mode, orders of magnitude slower than the XLA scan fallback. (Any batch
    is blockable: batch blocks pad via a cdiv grid.)
    """
    del batch_size
    if getattr(cfg, "lstm_backend", "xla") != "pallas" or not fits(cfg):
        return False
    return jax.default_backend() == "tpu" or FORCE_OFF_TPU


def _pick_blocks(B: int, T: int, D: int, H: int, L: int, mode: str):
    wcost = _weight_bytes(D, H, L, mode)
    stream = (4 * D + L) * 4  # seed + u + x_out + xm_out (D each) + eps (L), f32
    # batch blocks need not divide B (rows independent; padded cdiv grid);
    # time blocks must divide T so the sequential scratch carry sees no
    # padded steps before real ones
    divs = (d for d in range(1, B + 1) if B % d == 0 and (d % 8 == 0 or d == B))
    pows = (p for p in (256, 128, 64, 32, 16, 8) if p < B)
    b_cands = sorted(set(divs) | set(pows), reverse=True)
    t_divs = sorted((d for d in range(1, T + 1) if T % d == 0), reverse=True)
    for bb in b_cands:
        if bb > 256:
            continue
        fixed = wcost + 2 * bb * 4 * H * 4 + 4 * bb * (4 * H + D)  # song proj + scratch
        for bt in t_divs:
            if fixed + 2 * (bt * bb * stream) < _BUDGET:
                return bb, bt
    # unreachable under should_use() (fits() bounds the weight cost);
    # smallest blocks as a best effort for direct callers
    return min(8, B), t_divs[-1]


def _make_kernel(Tseed: int, block_t: int, H: int, L: int, use_x_prev: bool, wt):
    f32 = jnp.float32
    prec = "highest" if wt == f32 else None
    mm = lambda a, b: jnp.dot(a.astype(wt), b[:], preferred_element_type=f32,
                              precision=prec)

    def kernel(seed_ref, eps_ref, u_ref,
               wke_x_ref, rke_ref, encb_ref, wz_ref, bz_ref,
               wkd_x_ref, wkd_z_ref, rkd_ref, decb_ref, wx_ref, bx_ref,
               x_out_ref, xm_out_ref,
               he_scr, ce_scr, hd_scr, cd_scr, xprev_scr):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            he_scr[:] = jnp.zeros_like(he_scr)
            ce_scr[:] = jnp.zeros_like(ce_scr)
            hd_scr[:] = jnp.zeros_like(hd_scr)
            cd_scr[:] = jnp.zeros_like(cd_scr)
            xprev_scr[:] = jnp.zeros_like(xprev_scr)

        t0 = pl.program_id(1) * block_t

        def step(s, _):
            tg = t0 + s
            x_in = jnp.where(tg < Tseed, seed_ref[s], xprev_scr[:])
            # encoder cell (w contribution + bias precomputed per song: encb)
            z_e = mm(x_in, wke_x_ref) + encb_ref[:] + mm(he_scr[:], rke_ref)
            h_e, c_e = _gates(z_e, ce_scr[:], H)
            he_scr[:] = h_e
            ce_scr[:] = c_e
            # z heads: packed into a 128-lane-padded [H, 128] weight so the
            # matmul is MXU-shaped (an [H, 2L] output would be scalarized)
            zmv = mm(h_e, wz_ref) + bz_ref[:]
            z = zmv[:, :L] + jnp.exp(zmv[:, L : 2 * L] / 2) * eps_ref[s]
            # decoder cell; z's contribution expanded as L rank-1 broadcast
            # products (a contraction dim of L=2 would also scalarize)
            z_d = decb_ref[:] + mm(hd_scr[:], rkd_ref)
            for l in range(L):
                z_d = z_d + z[:, l : l + 1] * wkd_z_ref[l : l + 1].astype(f32)
            if use_x_prev:
                z_d = z_d + mm(x_in, wkd_x_ref)
            h_d, c_d = _gates(z_d, cd_scr[:], H)
            hd_scr[:] = h_d
            cd_scr[:] = c_d
            # frame head (lane-padded to a 128-wide MXU output, prefix-sliced
            # back to D) + Bernoulli draw (u < p), fed back as x_prev
            D = xprev_scr.shape[-1]
            xm = jax.nn.sigmoid(mm(h_d, wx_ref) + bx_ref[:])[:, :D]
            x_t = (u_ref[s] < xm).astype(f32)
            xprev_scr[:] = x_t
            x_out_ref[s] = x_t
            xm_out_ref[s] = xm
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    return kernel


def _make_kernel_int8(Tseed: int, block_t: int, H: int, L: int, use_x_prev: bool):
    """Int8-weight variant: the five large weights arrive as int8 with
    per-column f32 scales; matmuls run int8 x int8 -> int32 on the MXU (2x
    bf16 throughput on v5e) and dequantize once per output column. Inputs
    are exact or fixed-scale: x is binary, h = round(h * 127) / 127.

    NOTE: mirrors :func:`_make_kernel` step for step — any change to the
    shared generation semantics (seed/feedback select, gate form, z sample,
    rank-1 z expansion, Bernoulli) must be applied to BOTH kernels; the
    int8-vs-f32 closeness tests anchor them together."""
    f32 = jnp.float32
    i8, i32 = jnp.int8, jnp.int32

    def qmm(a_q, w_ref, s_ref, inv=1.0):
        acc = jnp.dot(a_q, w_ref[:], preferred_element_type=i32)
        return acc.astype(f32) * (s_ref[:] * inv)

    def kernel(seed_ref, eps_ref, u_ref,
               wke_x_ref, ske_ref, rke_ref, srke_ref, encb_ref,
               wz_ref, bz_ref,
               wkd_x_ref, skd_ref, wkd_z_ref, rkd_ref, srkd_ref, decb_ref,
               wx_ref, swx_ref, bx_ref,
               x_out_ref, xm_out_ref,
               he_scr, ce_scr, hd_scr, cd_scr, xprev_scr):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            he_scr[:] = jnp.zeros_like(he_scr)
            ce_scr[:] = jnp.zeros_like(ce_scr)
            hd_scr[:] = jnp.zeros_like(hd_scr)
            cd_scr[:] = jnp.zeros_like(cd_scr)
            xprev_scr[:] = jnp.zeros_like(xprev_scr)

        t0 = pl.program_id(1) * block_t
        inv127 = 1.0 / 127.0

        def step(s, _):
            tg = t0 + s
            x_in = jnp.where(tg < Tseed, seed_ref[s], xprev_scr[:])
            x_q = x_in.astype(i8)  # binary frames: exact int8
            h_q = jnp.round(he_scr[:] * 127.0).astype(i8)  # h in (-1, 1)
            z_e = qmm(x_q, wke_x_ref, ske_ref) + encb_ref[:] \
                + qmm(h_q, rke_ref, srke_ref, inv127)
            h_e, c_e = _gates(z_e, ce_scr[:], H)
            he_scr[:] = h_e
            ce_scr[:] = c_e
            # z heads stay bf16 (tiny [H, 128]; zv feeds an exp)
            zmv = jnp.dot(h_e.astype(jnp.bfloat16), wz_ref[:],
                          preferred_element_type=f32) + bz_ref[:]
            z = zmv[:, :L] + jnp.exp(zmv[:, L : 2 * L] / 2) * eps_ref[s]
            hd_q = jnp.round(hd_scr[:] * 127.0).astype(i8)
            z_d = decb_ref[:] + qmm(hd_q, rkd_ref, srkd_ref, inv127)
            for l in range(L):
                z_d = z_d + z[:, l : l + 1] * wkd_z_ref[l : l + 1]
            if use_x_prev:
                z_d = z_d + qmm(x_q, wkd_x_ref, skd_ref)
            h_d, c_d = _gates(z_d, cd_scr[:], H)
            hd_scr[:] = h_d
            cd_scr[:] = c_d
            D = xprev_scr.shape[-1]
            hd2_q = jnp.round(h_d * 127.0).astype(i8)
            xm = jax.nn.sigmoid(qmm(hd2_q, wx_ref, swx_ref, inv127) + bx_ref[:])[:, :D]
            x_t = (u_ref[s] < xm).astype(f32)
            xprev_scr[:] = x_t
            x_out_ref[s] = x_t
            xm_out_ref[s] = xm
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "nsteps", "return_probs", "mode"))
def generate_cl_vrnn_batch_pallas(params, cfg, x_seeds, nsteps: int, eps, u, ws,
                                  return_probs: bool = False,
                                  mode: str | None = None):
    """Fused-kernel equivalent of ``generate_cl_vrnn_batch_noise``.

    x_seeds [B, Tseed, D]; eps [B, total, L]; u [B, total, D]; ws [B, K].
    Returns [B, nsteps, D] (post-seed frames; probs when ``return_probs``).

    ``mode`` overrides the weight precision (``"f32"``/``"bf16"``/``"int8"``;
    default: :func:`pick_mode`). It is a STATIC jit argument on purpose —
    monkeypatching :func:`pick_mode` cannot force a precision once a trace
    for the same shapes is cached, so benches/tests that A/B precisions must
    pass it explicitly to get distinct cache entries.
    """
    B, Tseed, D = x_seeds.shape
    H, L = cfg.intermediate_dim, cfg.latent_dim
    total = Tseed + nsteps
    mode = mode or pick_mode(cfg)
    if mode is None:
        raise ValueError("model does not fit the fused generation kernel's VMEM budget")
    wt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[mode]
    f32 = jnp.float32

    enc, dec = params["encoder_h"], params["decoder_h"]
    n_xp = D if cfg.use_x_prev else 0
    # per-song constant projections fold the w rows AND the biases
    encb = (
        jnp.dot(ws, enc["kernel"][D:], preferred_element_type=f32, precision="highest")
        + enc["bias"]
    ).astype(f32)
    decb = (
        jnp.dot(ws, dec["kernel"][n_xp + L :], preferred_element_type=f32, precision="highest")
        + dec["bias"]
    ).astype(f32)
    # z-head weights padded to 128 lanes: cols [0:L] = Z_mean, [L:2L] = Z_log_var
    wz = jnp.zeros((H, 128), f32).at[:, :L].set(params["Z_mean"]["kernel"]) \
        .at[:, L : 2 * L].set(params["Z_log_var"]["kernel"])
    bz = jnp.zeros((1, 128), f32).at[0, :L].set(params["Z_mean"]["bias"]) \
        .at[0, L : 2 * L].set(params["Z_log_var"]["bias"])
    wkd_x = dec["kernel"][:n_xp] if cfg.use_x_prev else jnp.zeros((D, 4 * H), f32)
    Dp = max(128, -(-D // 128) * 128)  # frame head lane-padded
    wx = jnp.zeros((H, Dp), f32).at[:, :D].set(params["X_decoded_mean"]["kernel"])
    bx = jnp.zeros((1, Dp), f32).at[0, :D].set(params["X_decoded_mean"]["bias"])

    seed_pad = jnp.concatenate(
        [x_seeds, jnp.zeros((B, nsteps, D), x_seeds.dtype)], axis=1)
    tm = lambda a: jnp.swapaxes(a, 0, 1)  # [B, T, .] -> time-major

    block_b, block_t = _pick_blocks(B, total, D, H, L, mode)
    nb = pl.cdiv(B, block_b)
    nt = pl.cdiv(total, block_t)

    t_spec = lambda dim: pl.BlockSpec((block_t, block_b, dim), lambda b, t: (t, b, 0),
                                      memory_space=pltpu.VMEM)
    const = lambda r, c: pl.BlockSpec((r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    song = lambda c: pl.BlockSpec((block_b, c), lambda b, t: (b, 0), memory_space=pltpu.VMEM)

    out_specs = (t_spec(D), t_spec(D))
    out_shape = (
        jax.ShapeDtypeStruct((total, B, D), f32),
        jax.ShapeDtypeStruct((total, B, D), f32),
    )
    scratch = [
        pltpu.VMEM((block_b, H), f32),
        pltpu.VMEM((block_b, H), f32),
        pltpu.VMEM((block_b, H), f32),
        pltpu.VMEM((block_b, H), f32),
        pltpu.VMEM((block_b, D), f32),
    ]
    streams = (tm(seed_pad).astype(f32), tm(eps).astype(f32), tm(u).astype(f32))

    if mode == "int8":
        wke_q, ske = _quant_cols(enc["kernel"][:D])
        rke_q, srke = _quant_cols(enc["recurrent_kernel"])
        wkd_q, skd = _quant_cols(wkd_x)
        rkd_q, srkd = _quant_cols(dec["recurrent_kernel"])
        wx_q, swx = _quant_cols(wx)
        kernel = pl.pallas_call(
            _make_kernel_int8(Tseed, block_t, H, L, cfg.use_x_prev),
            grid=(nb, nt),
            in_specs=[
                t_spec(D), t_spec(L), t_spec(D),
                const(D, 4 * H), const(1, 4 * H),    # enc x-kernel + scales
                const(H, 4 * H), const(1, 4 * H),    # enc recurrent + scales
                song(4 * H),                         # encb
                const(H, 128), const(1, 128),        # z heads (bf16) + bias
                const(D, 4 * H), const(1, 4 * H),    # dec x rows + scales
                const(L, 4 * H),                     # dec z rows (f32)
                const(H, 4 * H), const(1, 4 * H),    # dec recurrent + scales
                song(4 * H),                         # decb
                const(H, Dp), const(1, Dp),          # frame head + scales
                const(1, Dp),                        # frame bias
            ],
            out_specs=out_specs, out_shape=out_shape, scratch_shapes=scratch,
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )
        x_out, xm_out = kernel(
            *streams,
            wke_q, ske, rke_q, srke, encb,
            wz.astype(jnp.bfloat16), bz,
            wkd_q, skd, dec["kernel"][n_xp : n_xp + L].astype(f32),
            rkd_q, srkd, decb,
            wx_q, swx, bx,
        )
    else:
        kernel = pl.pallas_call(
            _make_kernel(Tseed, block_t, H, L, cfg.use_x_prev, wt),
            grid=(nb, nt),
            in_specs=[
                t_spec(D),               # seed
                t_spec(L),               # eps
                t_spec(D),               # u
                const(D, 4 * H),         # enc x-kernel
                const(H, 4 * H),         # enc recurrent
                song(4 * H),             # encb (w rows + bias, per song)
                const(H, 128),           # z heads packed (lane-padded)
                const(1, 128),           # z bias
                const(D, 4 * H),         # dec x rows
                const(L, 4 * H),         # dec z rows
                const(H, 4 * H),         # dec recurrent
                song(4 * H),             # decb
                const(H, Dp),            # frame head (lane-padded)
                const(1, Dp),            # frame bias
            ],
            out_specs=out_specs, out_shape=out_shape, scratch_shapes=scratch,
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )
        x_out, xm_out = kernel(
            *streams,
            enc["kernel"][:D].astype(wt), enc["recurrent_kernel"].astype(wt), encb,
            wz.astype(wt), bz.astype(f32),
            wkd_x.astype(wt), dec["kernel"][n_xp : n_xp + L].astype(wt),
            dec["recurrent_kernel"].astype(wt), decb,
            wx.astype(wt), bx,
        )
    out = xm_out if return_probs else x_out
    return tm(out)[:, Tseed:]
