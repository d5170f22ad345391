"""Pallas fused WHOLE-GENERATION kernel for the cl_vae sampler.

The cl_vrnn family got its fused sampler in :mod:`.pallas_generate`; this is
the cl_vae counterpart (reference generation loop ``cl_vae/model.py:9-74``,
rebuilt as one ``lax.scan`` in ``sampling/generate.generate_cl_vae_batch``).
The per-frame step is pure dense compute — z-encoder hidden, z heads, z
sample, decoder hidden, sigmoid frame head, Bernoulli draw, one-step-lagged
feedback — and the whole autoregressive loop runs inside ONE Pallas kernel
with every weight matrix resident in VMEM and the two carried frames
(``x_prev`` for the z-encoder, the lagged ``x_prev_t`` for the decoder,
reference ``cl_vae/model.py:23,40``) in VMEM scratch.

Why it wins, same argument as the cl_vrnn kernel: under ``lax.scan`` XLA
re-fetches every weight from HBM each timestep (loop buffers are not pinned)
— at hidden 1024 that is ~1.8 MB/step, >400 MB of weight traffic for a
256-step song batch that this kernel loads exactly once. The remaining
streams are the tiny per-step tensors: (eps, u) noise in, frames/probs out.

Randomness is EXPLICIT (pre-drawn ``eps``/``u``), so the kernel is a pure
deterministic function verified EXACTLY against
:func:`...sampling.generate.generate_cl_vae_batch_noise`
(``tests/test_pallas_generate_vae.py``).

TPU shape rules (learned on hardware, see DESIGN.md): the hidden dim is
lane-padded to a 128 multiple (an 88-wide MXU output would be scalarized) —
padded encoder columns carry zero weights and a zero folded bias, so their
ReLU output is identically 0 and they contribute nothing downstream; the
z draw's L-wide tensors ride in a 128-lane-padded head, and the decoder's
z contribution is expanded as L rank-1 broadcast products (a contraction
dim of L=2 would scalarize).

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


def _pad128(n: int) -> int:
    return max(128, -(-n // 128) * 128)


def _weight_bytes(D: int, H: int, L: int, mode: str) -> int:
    """Resident VMEM cost with each tensor at the dtype the kernel actually
    loads it in (the int8 mode keeps the z heads bf16 and the decoder z rows
    f32, and carries three per-column f32 scale vectors)."""
    wb = {"f32": 4, "bf16": 2, "int8": 1}[mode]
    Hp, Dp = _pad128(H), _pad128(D)
    big = wb * (
        D * Hp          # encoder x rows
        + D * Hp        # decoder x_prev rows
        + Hp * Dp       # frame head
    )
    z_head = (2 if mode == "int8" else wb) * Hp * 128  # bf16 floor in int8 mode
    z_rows = 4 * L * Hp                 # decoder z rows stay f32 (tiny)
    biases = 4 * (128 + Dp)             # bz + bx
    # int8 scales: ske/skd [1, Hp] + swx [1, Dp], f32
    scales = 4 * (2 * Hp + Dp) if mode == "int8" else 0
    return big + z_head + z_rows + biases + scales


def pick_mode(cfg) -> str | None:
    """Weight precision for the fused kernel, or None when it can't run.

    Mirrors :func:`..pallas_generate.pick_mode`: f32 checkpoints never
    quantize (the parity path; at reference widths f32 fits trivially).
    bf16 checkpoints (``--bf16_compute`` training, extension) take bf16
    weights, escalating to INT8 when bf16 no longer fits — per-column
    weight quantization, with binary frames exact in int8 and the one
    unbounded activation (the decoder's relu hidden) dynamically
    row-scaled in-kernel. Configs without hidden layers
    (``intermediate_dim == 0``) have nothing for the MXU to chew on —
    the XLA scan keeps them.
    """
    if not cfg.has_hidden:
        return None
    D, H, L = cfg.original_dim, cfg.intermediate_dim, cfg.latent_dim
    limit = _BUDGET - int(2.5 * 1024 * 1024)
    if getattr(cfg, "bf16_compute", False):
        if _weight_bytes(D, H, L, "bf16") < limit:
            return "bf16"
        if _weight_bytes(D, H, L, "int8") < limit:
            return "int8"
        return None
    return "f32" if _weight_bytes(D, H, L, "f32") < limit else None


def fits(cfg) -> bool:
    """Can the fused cl_vae generation kernel hold this model in VMEM?"""
    return pick_mode(cfg) is not None


# test hook: lets the CPU-mesh tests exercise the fused dispatch in interpret
# mode even though production dispatch requires a real TPU
FORCE_OFF_TPU = False


def should_use(cfg, batch_size: int) -> bool:
    """Production dispatch predicate (mirrors pallas_generate.should_use):
    the config opted into the pallas generation backend (``--gen_backend``
    on the sample/serve CLIs, extension), the weights fit VMEM, and a real
    TPU is attached (off-TPU interpret mode would be slower than XLA)."""
    del batch_size
    if getattr(cfg, "gen_backend", "xla") != "pallas" or not fits(cfg):
        return False
    return jax.default_backend() == "tpu" or FORCE_OFF_TPU


def _pick_blocks(B: int, T: int, D: int, H: int, L: int, mode: str):
    """(block_b, block_t): batch blocks pad via a cdiv grid (rows are
    independent songs); time blocks must divide T (the scratch carry walks
    t-blocks sequentially)."""
    wcost = _weight_bytes(D, H, L, mode)
    Hp = _pad128(H)
    stream = (3 * D + L) * 4  # u + x_out + xm_out (D each) + eps (L), f32
    divs = (d for d in range(1, B + 1) if B % d == 0 and (d % 8 == 0 or d == B))
    pows = (p for p in (256, 128, 64, 32, 16, 8) if p < B)
    b_cands = sorted(set(divs) | set(pows), reverse=True)
    t_divs = sorted((d for d in range(1, T + 1) if T % d == 0), reverse=True)
    for bb in b_cands:
        if bb > 256:
            continue
        # per-song encb/decb + seed + the two frame carries, f32
        fixed = wcost + bb * (2 * Hp + 3 * D) * 4
        for bt in t_divs:
            if fixed + 2 * (bt * bb * stream) < _BUDGET:
                return bb, bt
    return min(8, B), t_divs[-1]  # unreachable under should_use()


def _make_kernel(block_t: int, H: int, L: int, use_x_prev: bool,
                 use_z_prior: bool, wt):
    f32 = jnp.float32
    prec = "highest" if wt == f32 else None
    mm = lambda a, b: jnp.dot(a.astype(wt), b[:], preferred_element_type=f32,
                              precision=prec)

    def kernel(eps_ref, u_ref, seed_ref,
               wke_ref, encb_ref, wz_ref, bz_ref,
               wkd_x_ref, wkd_z_ref, decb_ref, wx_ref, bx_ref,
               x_out_ref, xm_out_ref,
               xprev_scr, xprevt_scr):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            xprev_scr[:] = seed_ref[:]
            xprevt_scr[:] = seed_ref[:]

        def step(s, _):
            xp = xprev_scr[:]
            xpt = xprevt_scr[:]
            # z encoder: relu hidden on (x_prev, w); the w rows and bias are
            # folded into the per-song encb (padded cols are 0 -> relu 0)
            h_e = jnp.maximum(mm(xp, wke_ref) + encb_ref[:], 0.0)
            # z heads packed 128-lane-wide: cols [0:L]=mean, [L:2L]=log_var
            zmv = mm(h_e, wz_ref) + bz_ref[:]
            if use_z_prior:
                z = eps_ref[s]
            else:
                z = zmv[:, :L] + jnp.exp(zmv[:, L : 2 * L] / 2) * eps_ref[s]
            # decoder hidden on (w, [x_prev_t,] z); w rows folded into decb,
            # z rows expanded as rank-1 products (L=2 would scalarize the MXU)
            z_d = decb_ref[:]
            for l in range(L):
                z_d = z_d + z[:, l : l + 1] * wkd_z_ref[l : l + 1]
            if use_x_prev:
                z_d = z_d + mm(xpt, wkd_x_ref)
            h_d = jnp.maximum(z_d, 0.0)
            D = xprev_scr.shape[-1]
            xm = jax.nn.sigmoid(mm(h_d, wx_ref) + bx_ref[:])[:, :D]
            x_t = (u_ref[s] < xm).astype(f32)
            xprevt_scr[:] = xp  # decoder input lags one step (model.py:23,40)
            xprev_scr[:] = x_t
            x_out_ref[s] = x_t
            xm_out_ref[s] = xm
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    return kernel


def _make_kernel_int8(block_t: int, H: int, L: int, use_x_prev: bool,
                      use_z_prior: bool):
    """Int8-weight variant: the three large weights arrive as int8 with
    per-column f32 scales; matmuls run int8 x int8 -> int32 on the MXU (2x
    bf16 throughput on v5e). Frame inputs are binary (exact int8). The only
    unbounded activation entering an int8 matmul is the decoder's relu
    hidden, which gets a dynamic per-row scale (its max IS the row max —
    relu output is non-negative). The z heads stay bf16 (tiny [Hp, 128];
    z_log_var feeds an exp) and the L decoder z rows stay f32 rank-1 adds.

    NOTE: mirrors :func:`_make_kernel` step for step — any change to the
    shared generation semantics must be applied to BOTH kernels; the
    int8-vs-f32 closeness tests anchor them together."""
    f32, i8, i32 = jnp.float32, jnp.int8, jnp.int32

    def qmm(a_q, w_ref, s_ref):
        return jnp.dot(a_q, w_ref[:], preferred_element_type=i32).astype(f32) * s_ref[:]

    def kernel(eps_ref, u_ref, seed_ref,
               wke_ref, ske_ref, encb_ref, wz_ref, bz_ref,
               wkd_x_ref, skd_ref, wkd_z_ref, decb_ref,
               wx_ref, swx_ref, bx_ref,
               x_out_ref, xm_out_ref,
               xprev_scr, xprevt_scr):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            xprev_scr[:] = seed_ref[:]
            xprevt_scr[:] = seed_ref[:]

        def step(s, _):
            xp = xprev_scr[:]
            xpt = xprevt_scr[:]
            h_e = jnp.maximum(qmm(xp.astype(i8), wke_ref, ske_ref) + encb_ref[:], 0.0)
            zmv = jnp.dot(h_e.astype(jnp.bfloat16), wz_ref[:],
                          preferred_element_type=f32) + bz_ref[:]
            if use_z_prior:
                z = eps_ref[s]
            else:
                z = zmv[:, :L] + jnp.exp(zmv[:, L : 2 * L] / 2) * eps_ref[s]
            z_d = decb_ref[:]
            for l in range(L):
                z_d = z_d + z[:, l : l + 1] * wkd_z_ref[l : l + 1]
            if use_x_prev:
                z_d = z_d + qmm(xpt.astype(i8), wkd_x_ref, skd_ref)
            h_d = jnp.maximum(z_d, 0.0)
            # dynamic per-row activation scale (h_d >= 0 so max == max|.|)
            rs = jnp.maximum(jnp.max(h_d, axis=-1, keepdims=True), 1e-12) / 127.0
            hd_q = jnp.round(h_d / rs).astype(i8)
            D = xprev_scr.shape[-1]
            xm = jax.nn.sigmoid((qmm(hd_q, wx_ref, swx_ref) * rs + bx_ref[:]))[:, :D]
            x_t = (u_ref[s] < xm).astype(f32)
            xprevt_scr[:] = xp  # decoder input lags one step (model.py:23,40)
            xprev_scr[:] = x_t
            x_out_ref[s] = x_t
            xm_out_ref[s] = xm
            return 0

        jax.lax.fori_loop(0, block_t, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "cfg", "nsteps", "use_z_prior", "return_probs", "mode"))
def generate_cl_vae_batch_pallas(params, cfg, x_seeds, nsteps: int, eps, u, ws,
                                 use_z_prior: bool = False,
                                 return_probs: bool = False,
                                 mode: str | None = None):
    """Fused-kernel equivalent of ``generate_cl_vae_batch_noise``.

    x_seeds [B, D] (single seed frame per song); eps [B, nsteps, L];
    u [B, nsteps, D]; ws [B, K] simplex points. Returns [B, nsteps, D]
    (probs when ``return_probs``). ``mode`` ("f32"/"bf16"/"int8") is a STATIC
    jit argument so precision A/Bs get distinct trace-cache entries.
    """
    B, D = x_seeds.shape
    H, L, K = cfg.intermediate_dim, cfg.latent_dim, cfg.n_classes
    if not cfg.has_hidden:
        raise ValueError("fused cl_vae generation requires hidden layers")
    mode = mode or pick_mode(cfg)
    if mode is None:
        raise ValueError("model does not fit the fused generation kernel's VMEM budget")
    wt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[mode]
    f32 = jnp.float32
    Hp, Dp = _pad128(H), _pad128(D)
    n_xp = D if cfg.use_x_prev else 0

    pad_cols = lambda m, c: jnp.zeros((m.shape[0], c), f32).at[:, : m.shape[1]].set(m)
    enc, dec = params["h"], params["decoder_h"]
    # per-song constants fold the w rows AND the biases (padded cols stay 0)
    encb = pad_cols(
        jnp.dot(ws, enc["kernel"][D:], preferred_element_type=f32,
                precision="highest") + enc["bias"], Hp)
    decb = pad_cols(
        jnp.dot(ws, dec["kernel"][:K], preferred_element_type=f32,
                precision="highest") + dec["bias"], Hp)
    wke = pad_cols(enc["kernel"][:D], Hp)
    wkd_x = (pad_cols(dec["kernel"][K : K + n_xp], Hp) if cfg.use_x_prev
             else jnp.zeros((D, Hp), f32))
    wkd_z = pad_cols(dec["kernel"][K + n_xp :], Hp)
    # z heads packed into one 128-lane matmul: [0:L]=Z_mean, [L:2L]=Z_log_var
    wz = jnp.zeros((Hp, 128), f32).at[:H, :L].set(params["z_mean"]["kernel"]) \
        .at[:H, L : 2 * L].set(params["z_log_var"]["kernel"])
    bz = jnp.zeros((1, 128), f32).at[0, :L].set(params["z_mean"]["bias"]) \
        .at[0, L : 2 * L].set(params["z_log_var"]["bias"])
    wx = jnp.zeros((Hp, Dp), f32).at[:H, :D].set(params["x_decoded_mean"]["kernel"])
    bx = jnp.zeros((1, Dp), f32).at[0, :D].set(params["x_decoded_mean"]["bias"])

    tm = lambda a: jnp.swapaxes(a, 0, 1)  # [B, T, .] -> time-major
    block_b, block_t = _pick_blocks(B, nsteps, D, H, L, mode)
    nb = pl.cdiv(B, block_b)
    nt = pl.cdiv(nsteps, block_t)

    t_spec = lambda dim: pl.BlockSpec((block_t, block_b, dim), lambda b, t: (t, b, 0),
                                      memory_space=pltpu.VMEM)
    const = lambda r, c: pl.BlockSpec((r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    song = lambda c: pl.BlockSpec((block_b, c), lambda b, t: (b, 0), memory_space=pltpu.VMEM)

    out_specs = (t_spec(D), t_spec(D))
    out_shape = (
        jax.ShapeDtypeStruct((nsteps, B, D), f32),
        jax.ShapeDtypeStruct((nsteps, B, D), f32),
    )
    scratch = [
        pltpu.VMEM((block_b, D), f32),
        pltpu.VMEM((block_b, D), f32),
    ]
    streams = (tm(eps).astype(f32), tm(u).astype(f32), x_seeds.astype(f32))

    if mode == "int8":
        from .pallas_generate import _quant_cols

        wke_q, ske = _quant_cols(wke)
        wkd_q, skd = _quant_cols(wkd_x)
        wx_q, swx = _quant_cols(wx)
        kernel = pl.pallas_call(
            _make_kernel_int8(block_t, H, L, cfg.use_x_prev, use_z_prior),
            grid=(nb, nt),
            in_specs=[
                t_spec(L), t_spec(D), song(D),
                const(D, Hp), const(1, Hp),   # encoder x rows + scales
                song(Hp),                     # encb
                const(Hp, 128), const(1, 128),  # z heads (bf16) + bias
                const(D, Hp), const(1, Hp),   # decoder x rows + scales
                const(L, Hp),                 # decoder z rows (f32)
                song(Hp),                     # decb
                const(Hp, Dp), const(1, Dp),  # frame head + scales
                const(1, Dp),                 # frame bias
            ],
            out_specs=out_specs, out_shape=out_shape, scratch_shapes=scratch,
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )
        x_out, xm_out = kernel(
            *streams,
            wke_q, ske, encb,
            wz.astype(jnp.bfloat16), bz,
            wkd_q, skd, wkd_z, decb,
            wx_q, swx, bx,
        )
    else:
        kernel = pl.pallas_call(
            _make_kernel(block_t, H, L, cfg.use_x_prev, use_z_prior, wt),
            grid=(nb, nt),
            in_specs=[
                t_spec(L),          # eps
                t_spec(D),          # u
                song(D),            # seed frame (scratch init)
                const(D, Hp),       # encoder x rows
                song(Hp),           # encb (w rows + bias, per song)
                const(Hp, 128),     # z heads packed
                const(1, 128),      # z bias
                const(D, Hp),       # decoder x_prev rows
                const(L, Hp),       # decoder z rows (f32)
                song(Hp),           # decb
                const(Hp, Dp),      # frame head
                const(1, Dp),       # frame bias
            ],
            out_specs=out_specs, out_shape=out_shape, scratch_shapes=scratch,
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )
        x_out, xm_out = kernel(
            *streams,
            wke.astype(wt), encb,
            wz.astype(wt), bz,
            wkd_x.astype(wt), wkd_z, decb,
            wx.astype(wt), bx,
        )
    return tm(xm_out if return_probs else x_out)
