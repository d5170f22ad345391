"""Pallas fused LSTM sequence kernel.

Runs the ENTIRE recurrence in one TPU kernel: the carried (h, c) state lives
in VMEM scratch across all T steps, the per-step work is the recurrent
``[B, H] @ [H, 4H]`` MXU matmul plus the fused gate elementwise block, and the
only HBM traffic is streaming the precomputed input projection in and the
hidden sequence out. Under ``lax.scan`` XLA round-trips the carry through HBM
each step; at these sizes (H=88-176) that HBM latency dominates, which is
exactly what this kernel removes.

Layout notes (see /opt/skills/guides/pallas_guide.md):

* time-major ``xz [T, B, 4H]`` so each step's slice is a contiguous (B, 4H)
  VMEM tile; last dim 4H lands on the 128-lane axis;
* the input projection (where the FLOPs are) stays OUTSIDE the kernel as one
  large batched matmul — the MXU is happiest with [B*T, in] @ [in, 4H];
* grid over batch blocks when B is large; each program owns its (h, c) block;
* matmuls use ``preferred_element_type=jnp.float32``.

Training support: ``lstm_sequence_pallas`` carries a ``jax.custom_vjp``. The
forward rule runs a training variant of the kernel that additionally streams
out the pre-activations ``z`` (so the backward never redoes the recurrent
matmul), and the backward is a SECOND Pallas kernel running time in reverse
with (dh, dc) resident in VMEM — its only sequential matmul is
``dz @ rk.T``. Everything order-independent leaves the kernel: the recurrent
weight gradient is one large ``[H, B*T] @ [B*T, 4H]`` MXU matmul over the
saved hidden sequence, and the input-projection backward is XLA autodiff of
the hoisted matmul. This keeps the backward's sequential critical path the
same length as the forward's (one [B,*]@[*,H] matmul per step).

Measured on TPU v5e (`tools/bench_pallas_scale.py`, results committed in
`artifacts/pallas_scale_bench.json`):

* reference sizes (B=200, T=16, H=88, f32): the XLA scan wins the end-to-end
  forward (702 vs 1220 us incl. input projection) and training is a wash —
  default backend stays 'xla' there;
* scaled sizes with bf16 weights resident in VMEM, the streams (xz in; z/dz
  residuals) ALSO in bf16 — halving HBM traffic and admitting a 128-row batch
  block that fills the MXU — double-buffered across the tiled grid: forward
  1.6x XLA (1763 vs 2811 us at H=1024/B=1024, 85.4 achieved TFLOP/s = 43% of
  v5e bf16 peak). Wired into the forward-dominated shipping paths:
  ``cli/evaluate.py --lstm_backend`` and ``cli/serve.py`` ('auto' selects it
  at hidden>=512 on TPU);
* TRAINING at scaled sizes (`tools/bench_lstm_bwd.py`,
  `artifacts/lstm_bwd_bench.json`): with the Pallas backward kernel the
  fwd+bwd pass at H=1024/B=1024 bf16 runs 4.39 ms vs XLA autodiff's 12.97 ms
  (103.0 vs 34.9 sustained TFLOP/s = 52% of peak) — 2.96x; the full cl_vrnn
  optimizer step is 3.1x (45.0% vs 14.4% MFU; 44.4% at T=64/B=256 —
  `artifacts/train_scale_bench.json`). `cl_vrnn_train --lstm_backend auto`
  selects it at hidden>=512 on TPU. h/c state and all accumulation stay f32;
  only the stream dtypes follow ``compute_dtype``.

Falls back to interpret mode automatically off-TPU so tests run on the CPU
mesh. Select with ``lstm_backend='pallas'`` (cl_vrnn Config / CLI flag).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# VMEM sizing. v5e has 128 MB physical VMEM/core; the compiler's DEFAULT
# scoped limit is only 16 MB, and the original block budget (14 MB) was
# chosen to fit under it. Lifting the limit via CompilerParams both fixes a
# real OOM (the backward kernel overflowed the 16 MB stack by ~0.6 MB when a
# fused multi-step scan handed it differently-tiled operands — seen at
# H512/B1024 bf16 inside Trainer-style scanned epochs) and unlocks a bigger
# block budget: at H1024/B1024 the old 14 MB budget forced (bb=64, bt=1) on
# the train kernels — 256 sequential half-utilized-MXU matmuls — while
# 28 MB admits (bb=256, bt=1), measured +4% fwd+bwd in the scanned-epoch
# regime, and lets B200 keep a single full-dim batch block (+6-8% over the
# old time-tiled picks). Fatter time blocks LOSE outright — see
# _pick_blocks' prefer_bt1 and artifacts/vmem_budget_sweep.json.
# `set_vmem_budget` lets the sweep tool (tools/exp_vmem_budget.py) measure
# candidates; defaults hold the measured-best values. The limit itself is
# perf-neutral (32 vs 96 MB measured within 0.5%); 110 MB is what the
# H2048 probe ran under (artifacts/fused_kernel_exp.json h2048 phase:
# rk_t alone is 33.5 MB there) and leaves 18 MB of physical headroom.
_VMEM_LIMIT_BYTES = 110 * 1024 * 1024
_BLOCK_BUDGET_BYTES = 28 * 1024 * 1024
_MAX_BLOCK_B = 256

# Train-step fusions (ADOPTED as defaults — tools/exp_fused.py A/B'd all
# rungs on TPU v5e under the scanned-epoch protocol,
# artifacts/fused_kernel_exp.json: the full triple wins the chained grad
# step 1.199x at H1024/B1024, 1.289x at H512/B1024, 1.023x at B200/H512,
# and the full optimizer step 1.21x at H512/B1024; no config lost):
# * _FUSE_PROJ: the training forward computes the input projection x @ W + b
#   INSIDE the kernel (one [bt*bb, INp] @ [INp, 4H] MXU matmul per grid step,
#   hoisted out of the serial recurrence) instead of reading a precomputed
#   xz stream — eliminating the [T, B, 4H] xz HBM round-trip (134 MB each
#   way at H1024/B1024 bf16) that the hoisted-XLA-projection design pays.
# * _FUSE_DRK: the backward kernel accumulates the recurrent weight gradient
#   drk += h_prev[t].T @ dz[t] step by step in VMEM — MXU work with no
#   serial consumer, so it rides the latency bubbles the MFU breakdown
#   measured (kernels at 55.5% of their FLOP roof, recurrence-latency
#   bound) — instead of re-reading h_seq and dz_seq from HBM for a separate
#   [H, B*T] @ [B*T, 4H] matmul after the kernel.
# * _FUSE_BWD_FULL (needs proj+drk): the backward kernel additionally folds
#   in dW += x[t].T @ dz, db += sum(dz), and dx[t] = dz @ W.T — dz's only
#   remaining consumers — so the [T, B, 4H] dz stream never leaves the
#   kernel at all (replaced by the 32x-smaller dx stream) and the external
#   projection-backward matmul passes disappear.
_FUSE_PROJ = True
_FUSE_DRK = True
_FUSE_BWD_FULL = True


def set_fusion(proj: bool | None = None, drk: bool | None = None,
               full: bool | None = None) -> tuple[bool, bool, bool]:
    """Set the module-level fusion POLICY DEFAULTS; returns the previous triple.

    These globals are only the defaults consumed when a caller passes
    ``fusion=None`` to :func:`lstm_sequence_pallas` — the fusion choice
    itself is a static argument plumbed through the custom_vjp cores
    (``nondiff_argnums``), so A/Bs and per-config policies pass it
    explicitly and never depend on trace-time global state (the round-3
    bf16-vs-int8 lesson: cached traces silently ignore later global flips).
    ``full`` only takes effect on the fused-projection training path and
    implies the drk fusion there."""
    global _FUSE_PROJ, _FUSE_DRK, _FUSE_BWD_FULL
    prev = (_FUSE_PROJ, _FUSE_DRK, _FUSE_BWD_FULL)
    if proj is not None:
        _FUSE_PROJ = bool(proj)
    if drk is not None:
        _FUSE_DRK = bool(drk)
    if full is not None:
        _FUSE_BWD_FULL = bool(full)
    return prev


def resolve_fusion(
    fusion: tuple[bool, bool, bool] | None,
    hidden_dim: int | None = None,
) -> tuple[bool, bool, bool]:
    """Normalize a (proj, drk, full) triple; ``None`` -> the policy defaults.

    ``full`` requires the fused-projection forward (it consumes the x/hprev
    streams that only the fp kernel emits) — without proj it is dropped, the
    same "only takes effect on the fp path" semantics set_fusion documents —
    and implies drk on fallback paths, so the triple is canonicalized here
    once rather than at every gate.

    With ``hidden_dim`` given, the triple is additionally gated by the
    measured VMEM ceiling of the drk/full rungs: their backward keeps an
    f32 [H, 4H] dRk accumulator resident (16·H² bytes) next to the rk_t
    weight. Measured boundary (artifacts/fused_kernel_exp.json): H1536
    (37.7 MB accumulator) runs the full rung at 140.9 TFLOP/s; H2048
    (67 MB) FAILS TO COMPILE even at a 110 MB scoped limit, where the
    proj-only triple is the measured winner (144.1 TFLOP/s, 3.27x the XLA
    scan's 44.1). Above the boundary drk/full are therefore dropped —
    downgrading beats handing Mosaic a program it cannot compile."""
    if fusion is None:
        fusion = (_FUSE_PROJ, _FUSE_DRK, _FUSE_BWD_FULL)
    proj, drk, full = (bool(f) for f in fusion)
    if hidden_dim is not None and hidden_dim * 4 * hidden_dim * 4 > 38 * 2**20:
        drk = full = False
    full = full and proj
    return proj, drk or full, full


def set_vmem_budget(block_budget: int | None = None,
                    limit: int | None = None,
                    max_block_b: int | None = None) -> tuple[int, int, int]:
    """Override the block-selection budget / Mosaic scoped-VMEM limit / bb cap.

    Returns the previous (block_budget, limit, max_block_b). Block shapes are
    picked at trace time, so callers must build a FRESH ``jax.jit`` wrapper
    after changing these (cached traces keep their old blocks)."""
    global _BLOCK_BUDGET_BYTES, _VMEM_LIMIT_BYTES, _MAX_BLOCK_B
    prev = (_BLOCK_BUDGET_BYTES, _VMEM_LIMIT_BYTES, _MAX_BLOCK_B)
    if block_budget is not None:
        _BLOCK_BUDGET_BYTES = int(block_budget)
    if limit is not None:
        _VMEM_LIMIT_BYTES = int(limit)
    if max_block_b is not None:
        _MAX_BLOCK_B = int(max_block_b)
    return prev


def _compiler_params() -> pltpu.CompilerParams:
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def rk_fits_vmem(hidden_dim: int, bf16: bool = True) -> bool:
    """The kernels keep the recurrent weight resident in VMEM. Callers
    (resolve_lstm_backend 'auto') gate on this instead of discovering the
    ceiling as a Mosaic OOM. Measured upper bound: H2560 bf16 (rk 52.4 MB
    = exactly 50 MiB resident) runs the proj-fused grad step at
    149.0 TFLOP/s, 2.96x the XLA scan's 50.3 (h2560 phase; H2048: 144.1 vs
    44.1, 3.27x — artifacts/fused_kernel_exp.json; the drk/full rungs do
    NOT compile at either size — resolve_fusion(hidden_dim=...) downgrades
    them, see its docstring) — _pick_blocks grants rk_cost + 20 MB of
    budget so a block config exists up there. H3072 bf16 (rk 75.5 MB) is
    unprobed; the gate stays below it until measured.

    The f32 ceiling is SEPARATE and lower (9 MB, the pre-round-4 bound):
    auto always selects bf16 streams at scale, so large-H f32 residency was
    never probed on hardware — the round-4 ceiling lift must not silently
    admit explicit `--lstm_backend pallas` f32 runs at H1024 (rk 16.8 MB)
    into an unmeasured regime (advisor round-4 finding)."""
    bytes_per = 2 if bf16 else 4
    cap_mib = 50 if bf16 else 9
    return hidden_dim * 4 * hidden_dim * bytes_per <= cap_mib * 1024 * 1024


def _lstm_seq_kernel(xz_ref, rk_ref, h0_ref, c0_ref, hseq_ref, cseq_ref, h_scr, c_scr):
    """One batch-block: scan T steps with (h, c) resident in VMEM scratch."""
    T = xz_ref.shape[0]
    H = h0_ref.shape[-1]
    h_scr[:] = h0_ref[:]
    c_scr[:] = c0_ref[:]
    wt = rk_ref.dtype
    prec = "highest" if wt == jnp.float32 else None

    def step(t, _):
        z = xz_ref[t].astype(jnp.float32) + jnp.dot(
            h_scr[:].astype(wt), rk_ref[:], preferred_element_type=jnp.float32, precision=prec
        )
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        hseq_ref[t] = h
        cseq_ref[t] = c
        return 0

    jax.lax.fori_loop(0, T, step, 0)


def _lstm_seq_kernel_ilv(xz_ref, rk_ref, h0_ref, c0_ref, hseq_ref, cseq_ref,
                         h_scr, c_scr):
    """Interleaved (half-block MXU/VPU pipelined) inference forward — same
    pipelining as :func:`_lstm_seq_train_kernel_ilv` without the z stream;
    numerically identical to :func:`_lstm_seq_kernel`."""
    T = xz_ref.shape[0]
    hb = h_scr.shape[0] // 2
    H = h0_ref.shape[-1]
    h_scr[:] = h0_ref[:]
    c_scr[:] = c0_ref[:]
    f32 = jnp.float32
    wt = rk_ref.dtype
    prec = "highest" if wt == f32 else None
    mm = lambda h: jnp.dot(h.astype(wt), rk_ref[:], preferred_element_type=f32,
                           precision=prec)

    def gates(z, c_prev):
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_prev + i * g
        return o * jnp.tanh(c), c

    zA0 = xz_ref[0, :hb].astype(f32) + mm(h_scr[:hb])

    def step(t, zA):
        zB = xz_ref[t, hb:].astype(f32) + mm(h_scr[hb:])   # MXU ...
        hA, cA = gates(zA, c_scr[:hb])                     # ... || VPU
        h_scr[:hb] = hA
        c_scr[:hb] = cA
        hseq_ref[t, :hb] = hA
        cseq_ref[t, :hb] = cA
        tn = jnp.minimum(t + 1, T - 1)
        zA_next = xz_ref[tn, :hb].astype(f32) + mm(hA)     # MXU ...
        hB, cB = gates(zB, c_scr[hb:])                     # ... || VPU
        h_scr[hb:] = hB
        c_scr[hb:] = cB
        hseq_ref[t, hb:] = hB
        cseq_ref[t, hb:] = cB
        return zA_next

    jax.lax.fori_loop(0, T, step, zA0)


def _lstm_seq_kernel_tblocked(xz_ref, rk_ref, h0_ref, c0_ref, hseq_ref, cseq_ref, h_scr, c_scr):
    """Grid (nb, nt): t-blocks iterate sequentially (innermost grid dim), so
    the (h, c) VMEM scratch carries across them — this is the double-buffered
    DMA form: while this t-block computes, pallas prefetches the next xz
    block, so at large H the recurrent matmul fully overlaps the xz stream.
    The recurrent weight block index is constant, so it is fetched once and
    stays resident (pass it bf16 at scale: at H=1024 it is 8 MB of the
    ~16 MB/core VMEM)."""
    T_blk = xz_ref.shape[0]
    H = h_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    f32 = jnp.float32
    wt = rk_ref.dtype
    prec = "highest" if wt == f32 else None

    def step(t, _):
        z = xz_ref[t].astype(f32) + jnp.dot(
            h_scr[:].astype(wt), rk_ref[:], preferred_element_type=f32, precision=prec
        )
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        hseq_ref[t] = h
        cseq_ref[t] = c
        return 0

    jax.lax.fori_loop(0, T_blk, step, 0)


def _lstm_seq_kernel_tblocked_ilv(xz_ref, rk_ref, h0_ref, c0_ref,
                                  hseq_ref, cseq_ref, h_scr, c_scr):
    """Interleaved variant of the t-blocked inference forward (same pipelining
    as :func:`_lstm_seq_train_kernel_ilv`, no z stream; scratch carries (h, c)
    across t-blocks exactly like :func:`_lstm_seq_kernel_tblocked`)."""
    T_blk = xz_ref.shape[0]
    hb = h_scr.shape[0] // 2
    H = h_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    f32 = jnp.float32
    wt = rk_ref.dtype
    prec = "highest" if wt == f32 else None
    mm = lambda h: jnp.dot(h.astype(wt), rk_ref[:], preferred_element_type=f32,
                           precision=prec)

    def gates(z, c_prev):
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_prev + i * g
        return o * jnp.tanh(c), c

    zA0 = xz_ref[0, :hb].astype(f32) + mm(h_scr[:hb])

    def step(t, zA):
        zB = xz_ref[t, hb:].astype(f32) + mm(h_scr[hb:])   # MXU ...
        hA, cA = gates(zA, c_scr[:hb])                     # ... || VPU
        h_scr[:hb] = hA
        c_scr[:hb] = cA
        hseq_ref[t, :hb] = hA
        cseq_ref[t, :hb] = cA
        tn = jnp.minimum(t + 1, T_blk - 1)
        zA_next = xz_ref[tn, :hb].astype(f32) + mm(hA)     # MXU ...
        hB, cB = gates(zB, c_scr[hb:])                     # ... || VPU
        h_scr[hb:] = hB
        c_scr[hb:] = cB
        hseq_ref[t, hb:] = hB
        cseq_ref[t, hb:] = cB
        return zA_next

    jax.lax.fori_loop(0, T_blk, step, zA0)


def _forward_kernel_call(xz_t, rk, h0, c0, block_b: int, block_t: int | None = None):
    """xz_t: [T, B, 4H] time-major -> (h_seq, c_seq) [T, B, H].

    ``block_t=None`` keeps the whole sequence block in VMEM (reference sizes);
    a value tiles time across the innermost grid dim with the state carried in
    scratch (scaled sizes — see :func:`_lstm_seq_kernel_tblocked`)."""
    T, B, H4 = xz_t.shape
    H = H4 // 4
    nb = pl.cdiv(B, block_b)
    if block_t is None:
        kernel = pl.pallas_call(
            _lstm_seq_kernel_ilv if _use_interleave(block_b, T) else _lstm_seq_kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((T, block_b, H4), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, H4), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((T, block_b, H), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, block_b, H), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
                jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_b, H), jnp.float32),
                pltpu.VMEM((block_b, H), jnp.float32),
            ],
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )
        return kernel(xz_t, rk, h0, c0)

    nt = pl.cdiv(T, block_t)
    kernel = pl.pallas_call(
        _lstm_seq_kernel_tblocked_ilv if _use_interleave(block_b, block_t)
        else _lstm_seq_kernel_tblocked,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((block_t, block_b, H4), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_t, block_b, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )
    return kernel(xz_t, rk, h0, c0)


def _pick_blocks(B: int, T: int, H: int, rk_bytes_per_el: int,
                 stream_bytes: int = 24, min_sublane: int = 8,
                 prefer_bt1: bool = False) -> tuple[int, int | None]:
    """(block_b, block_t) from a VMEM byte budget (`_BLOCK_BUDGET_BYTES`).

    The resident recurrent weight costs ``H * 4H * rk_bytes_per_el``; the
    streamed blocks are double-buffered (x2). ``stream_bytes`` is the total
    bytes streamed per (batch element, time step) in units of H — e.g. the
    f32 inference forward moves xz in (4H x 4 B) + h/c out (2H x 4 B) = 24;
    the bf16 training streams are half that per tensor (see the callers).

    Selection order: the single-block fast path (grid (1,), reference regime),
    then the LARGEST batch block that fits — wide [bb, H] @ [H, 4H] matmuls
    are what feed the MXU (bb=128 fills its rows; preferring tiny-bb whole-T
    kernels was measured 2.5x slower at H=1024 bf16).

    The TIME-block preference splits by caller (on-hardware sweep under the
    scanned-epoch protocol — artifacts/vmem_budget_sweep.json; per-dispatch
    timings of the same kernels were 20-30x inflated AND rank-unstable):
    - ``prefer_bt1=True`` (training fwd/bwd): largest bb that fits at bt=1,
      full-dim B included. Every fatter time block LOST: at H1024/B1024 bf16
      (256,1) beat (64,1) by 4% and (256,2) by 13%; at B200 the single
      full-dim (200,1) block beat the old time-tiled/padded picks by 6-8%
      despite its sublane misalignment. bb=512 measured == (256,1), so the
      cap stays at 256. Streaming overlap at bt=1 beats the cross-step
      interleave pipeline once batch blocks are MXU-wide.
    - default (inference forward): whole-T over time-tiled at equal bb (one
      grid dim, no carry re-init), then descending bt — multi-step blocks
      enable the interleave pipeline that wins the small-batch inference
      regime (artifacts/lstm_interleave_exp.json).

    ``min_sublane`` is the Mosaic sublane tile for the streamed dtype: blocks'
    second-to-last dim must be a multiple of 8 (f32) / 16 (bf16) unless it
    equals the full array dim; bf16 callers pass 16. Every candidate honors
    the alignment (padded power-of-two blocks don't need to divide B, so an
    aligned candidate always exists down to bb=min_sublane; B itself — a
    full-dim block — is the only sub-aligned shape Mosaic accepts).
    """
    rk_cost = H * 4 * H * rk_bytes_per_el
    # The swept 28 MB optimum (artifacts/vmem_budget_sweep.json) decomposes
    # as rk (8 MB at the swept H1024 bf16) + ~20 MB of streamed blocks;
    # beyond H1024 keep the 20 MB stream allowance on top of the resident
    # weight instead of starving the streams (the h1536 probe measured
    # 140.9 TFLOP/s under exactly this budget — fused_kernel_exp.json).
    budget = max(_BLOCK_BUDGET_BYTES, rk_cost + 20 * 1024 * 1024)
    scratch = lambda bb: 4 * 2 * bb * H
    # time blocks must DIVIDE T: in the backward kernel the reversed grid
    # processes the last time block first, so a padded time tail would feed
    # garbage into the (dh, dc) scratch carry before the real steps
    t_divs = sorted((d for d in range(1, T + 1) if T % d == 0), reverse=True)
    # single-block fast path: grid (1,), nothing double-buffered (round-1
    # regime — B=200 whole-batch fits and runs fastest)
    if rk_cost + T * B * stream_bytes * H + scratch(B) < budget:
        return B, None

    def candidates(sub):
        # batch blocks need NOT divide B: rows are independent in every
        # kernel (matmuls/gates are row-wise), so a padded cdiv grid is
        # harmless — this is what keeps e.g. B=500 (no 8-aligned divisor)
        # inside the VMEM budget instead of falling back to one 500-row block
        divs = (d for d in range(1, B + 1) if B % d == 0 and (d % sub == 0 or d == B))
        pows = (p for p in (512, 256, 128, 64, 32, 16, 8) if p < B and p % sub == 0)
        return sorted(set(divs) | set(pows), reverse=True)

    def search(sub):
        for bb in candidates(sub):
            if bb > _MAX_BLOCK_B:
                continue
            if prefer_bt1:
                if rk_cost + 2 * (bb * stream_bytes * H) + scratch(bb) < budget:
                    return bb, 1
                continue
            if rk_cost + 2 * (T * bb * stream_bytes * H) + scratch(bb) < budget:
                return bb, None  # whole-T at this bb
            for bt in t_divs:
                if bt == T:
                    continue
                if rk_cost + 2 * (bt * bb * stream_bytes * H) + scratch(bb) < budget:
                    return bb, bt
        return None

    got = search(min_sublane)
    if got is not None:
        return got
    return min(min_sublane, B), t_divs[-1]


def _lstm_seq_train_kernel(xz_ref, rk_ref, h0_ref, c0_ref,
                           hseq_ref, cseq_ref, zseq_ref, h_scr, c_scr):
    """Training forward: the t-blocked kernel, additionally streaming out the
    pre-activations ``z`` so the backward kernel never redoes the recurrent
    matmul (saving z costs one 4H-wide HBM write per step; recomputing it
    would cost a sequential [B,H]@[H,4H] matmul per step — measured slower)."""
    T_blk = xz_ref.shape[0]
    H = h_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    f32 = jnp.float32
    wt = rk_ref.dtype
    prec = "highest" if wt == f32 else None

    def step(t, _):
        z = xz_ref[t].astype(f32) + jnp.dot(
            h_scr[:].astype(wt), rk_ref[:], preferred_element_type=f32, precision=prec
        )
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        hseq_ref[t] = h
        cseq_ref[t] = c
        zseq_ref[t] = z.astype(zseq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, T_blk, step, 0)


def _use_interleave(block_b: int, block_t: int) -> bool:
    """Half-block MXU/VPU pipelining pays when a block spans >= 2 timesteps.

    The recurrence serializes the per-step matmul (MXU) and gate math (VPU);
    splitting the batch block into independent halves A/B and ordering
    ``mm_B || gates_A`` then ``mm_A(t+1) || gates_B`` overlaps the units
    (measured +15-29% forward at batch 200 / hidden >= 512 —
    `artifacts/lstm_interleave_exp.json`). At block_t == 1 the cross-step
    pipeline degenerates (the prefetched next-step matmul is wasted work) and
    measured neutral — keep the plain kernel there."""
    return block_t >= 2 and block_b >= 32 and block_b % 2 == 0


def _lstm_seq_train_kernel_ilv(xz_ref, rk_ref, h0_ref, c0_ref,
                               hseq_ref, cseq_ref, zseq_ref, h_scr, c_scr):
    """Interleaved (two half-block pipelined) variant of the training forward.

    Numerically identical to :func:`_lstm_seq_train_kernel` — rows are
    independent, only the issue order changes."""
    T_blk = xz_ref.shape[0]
    hb = h_scr.shape[0] // 2
    H = h_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    f32 = jnp.float32
    wt = rk_ref.dtype
    prec = "highest" if wt == f32 else None
    mm = lambda h: jnp.dot(h.astype(wt), rk_ref[:], preferred_element_type=f32,
                           precision=prec)

    def gates(z, c_prev):
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_prev + i * g
        return o * jnp.tanh(c), c

    zA0 = xz_ref[0, :hb].astype(f32) + mm(h_scr[:hb])

    def step(t, zA):
        zB = xz_ref[t, hb:].astype(f32) + mm(h_scr[hb:])   # MXU ...
        hA, cA = gates(zA, c_scr[:hb])                     # ... || VPU
        h_scr[:hb] = hA
        c_scr[:hb] = cA
        hseq_ref[t, :hb] = hA
        cseq_ref[t, :hb] = cA
        zseq_ref[t, :hb] = zA.astype(zseq_ref.dtype)
        tn = jnp.minimum(t + 1, T_blk - 1)
        zA_next = xz_ref[tn, :hb].astype(f32) + mm(hA)     # MXU ...
        hB, cB = gates(zB, c_scr[hb:])                     # ... || VPU
        h_scr[hb:] = hB
        c_scr[hb:] = cB
        hseq_ref[t, hb:] = hB
        cseq_ref[t, hb:] = cB
        zseq_ref[t, hb:] = zB.astype(zseq_ref.dtype)
        return zA_next

    jax.lax.fori_loop(0, T_blk, step, zA0)


def _lstm_seq_kernel_tblocked_fp(x_ref, w_ref, b_ref, rk_ref, h0_ref, c0_ref,
                                 hseq_ref, cseq_ref, h_scr, c_scr, xz_scr):
    """Fused-projection inference forward (t-blocked; nt=1 covers whole-T):
    :func:`_lstm_seq_kernel_tblocked` with the input projection computed
    in-kernel from the raw x block — same rounding point as the unfused
    kernel's xz stream, so numerics match it exactly. The projected block is
    staged through VMEM scratch (``xz_scr``) rather than held as a value:
    Mosaic cannot lower a traced-index slice of an in-register array
    (dynamic_slice on values is unimplemented for the TC kernel type), while
    the equivalent ref load is the same path the unfused xz stream uses."""
    T_blk, bb = x_ref.shape[0], x_ref.shape[1]
    H = h_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    f32 = jnp.float32
    wt = rk_ref.dtype
    prec = "highest" if wt == f32 else None
    xz = jnp.dot(x_ref[:].reshape(T_blk * bb, -1).astype(wt), w_ref[:],
                 preferred_element_type=f32, precision=prec) + b_ref[:].astype(f32)
    xz_scr[:] = xz.astype(x_ref.dtype).reshape(T_blk, bb, -1)

    def step(t, _):
        z = xz_scr[t].astype(f32) + jnp.dot(
            h_scr[:].astype(wt), rk_ref[:], preferred_element_type=f32, precision=prec
        )
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        hseq_ref[t] = h
        cseq_ref[t] = c
        return 0

    jax.lax.fori_loop(0, T_blk, step, 0)


def _lstm_seq_kernel_tblocked_fp_ilv(x_ref, w_ref, b_ref, rk_ref, h0_ref, c0_ref,
                                     hseq_ref, cseq_ref, h_scr, c_scr, xz_scr):
    """Interleaved fused-projection inference forward: the half-block
    MXU/VPU pipeline of :func:`_lstm_seq_kernel_tblocked_ilv` reading the
    in-kernel xz instead of a streamed one (staged via ``xz_scr`` — see
    :func:`_lstm_seq_kernel_tblocked_fp` for why values can't be
    traced-index sliced in Mosaic)."""
    T_blk, bb = x_ref.shape[0], x_ref.shape[1]
    hb = h_scr.shape[0] // 2
    H = h_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    f32 = jnp.float32
    wt = rk_ref.dtype
    prec = "highest" if wt == f32 else None
    mm = lambda h: jnp.dot(h.astype(wt), rk_ref[:], preferred_element_type=f32,
                           precision=prec)
    xz_all = jnp.dot(x_ref[:].reshape(T_blk * bb, -1).astype(wt), w_ref[:],
                     preferred_element_type=f32, precision=prec) + b_ref[:].astype(f32)
    xz_scr[:] = xz_all.astype(x_ref.dtype).reshape(T_blk, bb, -1)

    def gates(z, c_prev):
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_prev + i * g
        return o * jnp.tanh(c), c

    zA0 = xz_scr[0, :hb].astype(f32) + mm(h_scr[:hb])

    def step(t, zA):
        zB = xz_scr[t, hb:].astype(f32) + mm(h_scr[hb:])   # MXU ...
        hA, cA = gates(zA, c_scr[:hb])                     # ... || VPU
        h_scr[:hb] = hA
        c_scr[:hb] = cA
        hseq_ref[t, :hb] = hA
        cseq_ref[t, :hb] = cA
        tn = jnp.minimum(t + 1, T_blk - 1)
        zA_next = xz_scr[tn, :hb].astype(f32) + mm(hA)     # MXU ...
        hB, cB = gates(zB, c_scr[hb:])                     # ... || VPU
        h_scr[hb:] = hB
        c_scr[hb:] = cB
        hseq_ref[t, hb:] = hB
        cseq_ref[t, hb:] = cB
        return zA_next

    jax.lax.fori_loop(0, T_blk, step, zA0)


def _lstm_seq_train_kernel_fp(x_ref, w_ref, b_ref, rk_ref, h0_ref, c0_ref,
                              hseq_ref, cseq_ref, zseq_ref,
                              hprevseq_ref, cprevseq_ref, h_scr, c_scr,
                              xz_scr):
    """Fused-projection training forward (_FUSE_PROJ): identical math to
    :func:`_lstm_seq_train_kernel` except (a) the input projection is
    computed here from the raw x block — one [bt*bb, INp] @ [INp, 4H] MXU
    matmul per grid step, OUTSIDE the serial recurrence loop (it has no h
    dependency), then rounded to the stream dtype exactly where the
    XLA-hoisted path rounds its xz stream, so the per-step numerics
    bit-match the unfused kernel up to matmul tiling; and (b) the PREVIOUS
    (h, c) state streams out too, straight from scratch — the backward
    consumes h_prev/c_prev sequences, and emitting them here replaces two
    external [T, B, H] concat materialization passes with VMEM writes."""
    T_blk, bb = x_ref.shape[0], x_ref.shape[1]
    H = h_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    f32 = jnp.float32
    wt = rk_ref.dtype
    prec = "highest" if wt == f32 else None
    sd = zseq_ref.dtype
    xz = jnp.dot(x_ref[:].reshape(T_blk * bb, -1).astype(wt), w_ref[:],
                 preferred_element_type=f32, precision=prec) + b_ref[:].astype(f32)
    # stage through VMEM scratch: traced-index slices of values don't lower
    # (see _lstm_seq_kernel_tblocked_fp)
    xz_scr[:] = xz.astype(sd).reshape(T_blk, bb, -1)

    def step(t, _):
        h_prev = h_scr[:]
        c_prev = c_scr[:]
        hprevseq_ref[t] = h_prev.astype(hprevseq_ref.dtype)
        cprevseq_ref[t] = c_prev
        z = xz_scr[t].astype(f32) + jnp.dot(
            h_prev.astype(wt), rk_ref[:], preferred_element_type=f32, precision=prec
        )
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        hseq_ref[t] = h
        cseq_ref[t] = c
        zseq_ref[t] = z.astype(sd)
        return 0

    jax.lax.fori_loop(0, T_blk, step, 0)


def _bwd_gate_grads(z, c, c_prev, dh, dc_in):
    """Shared BPTT gate-gradient math (Keras-2.0 hard-sigmoid i/f/o, tanh g),
    used by every plain backward kernel (the interleaved variant keeps its
    own predicated-store flow): returns ``(dz, dc*f)`` — the pre-activation
    cotangent and the next carry. ``dh``/``dc_in`` must already include the
    incoming cotangents plus the scratch carries."""
    H = c.shape[-1]
    i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
    f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
    g = jnp.tanh(z[:, 2 * H : 3 * H])
    o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
    tanh_c = jnp.tanh(c)
    hsd = lambda gate: jnp.where((gate > 0.0) & (gate < 1.0), 0.2, 0.0)
    dc = dc_in + dh * o * (1 - tanh_c**2)
    do = dh * tanh_c
    di = dc * g
    dg = dc * i
    df = dc * c_prev
    dz = jnp.concatenate(
        [di * hsd(i), df * hsd(f), dg * (1 - g**2), do * hsd(o)], axis=-1
    )
    return dz, dc * f


def _lstm_bwd_kernel(nt, zseq_ref, cprev_ref, cseq_ref, dhseq_ref, dcseq_ref,
                     rkt_ref, dzseq_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
    """Reverse-time BPTT block: (dh, dc) live in VMEM scratch across all
    t-blocks (the grid's t axis is index-mapped to walk time BACKWARD); the
    only sequential matmul is ``dz @ rk.T``. The order-independent weight
    gradient is NOT accumulated here — it leaves as the dz stream and becomes
    one big MXU matmul outside (carrying the [H, 4H] f32 accumulator through
    a reverse scan is exactly what made the XLA backward HBM-bound)."""
    del nt
    T_blk = zseq_ref.shape[0]
    H = dh_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    f32 = jnp.float32
    wt = rkt_ref.dtype
    prec = "highest" if wt == f32 else None

    def step(s, _):
        t = T_blk - 1 - s  # reverse within the block
        dz, dcf = _bwd_gate_grads(zseq_ref[t].astype(f32), cseq_ref[t],
                                  cprev_ref[t], dh_scr[:] + dhseq_ref[t],
                                  dc_scr[:] + dcseq_ref[t])
        dzseq_ref[t] = dz.astype(dzseq_ref.dtype)
        dh_scr[:] = jnp.dot(dz.astype(wt), rkt_ref[:], preferred_element_type=f32, precision=prec)
        dc_scr[:] = dcf
        return 0

    jax.lax.fori_loop(0, T_blk, step, 0)
    # every t-block writes; the LAST grid step is time-block 0, so the final
    # write is the true (dh0, dc0)
    dh0_ref[:] = dh_scr[:]
    dc0_ref[:] = dc_scr[:]


def _lstm_bwd_kernel_ilv(nt, zseq_ref, cprev_ref, cseq_ref, dhseq_ref, dcseq_ref,
                         rkt_ref, dzseq_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
    """Interleaved (half-block pipelined) variant of the BPTT backward.

    Per half the chain is VPU (gate grads -> dz) -> MXU (dz @ rk.T) -> VPU
    (previous step). Half B's VPU work overlaps half A's matmul and vice
    versa. A's step-(s+1) VPU work runs speculatively inside step s (its
    stores are predicated off on the final step so time 0 is not recomputed
    with stale state). Numerics identical to :func:`_lstm_bwd_kernel`."""
    del nt
    T_blk = zseq_ref.shape[0]
    hb = dh_scr.shape[0] // 2
    H = dh_scr.shape[-1]
    A, B = slice(0, hb), slice(hb, dh_scr.shape[0])

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    f32 = jnp.float32
    wt = rkt_ref.dtype
    prec = "highest" if wt == f32 else None
    hsd = lambda gate: jnp.where((gate > 0.0) & (gate < 1.0), 0.2, 0.0)
    mm = lambda dz: jnp.dot(dz.astype(wt), rkt_ref[:], preferred_element_type=f32,
                            precision=prec)

    def dz_math(t, rows, dh_in, store):
        """Gate grads for one half at time t; returns dz. Stores dz and the
        dc carry only under ``store`` (the speculative final call must not
        re-touch state)."""
        z = zseq_ref[t, rows].astype(f32)
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        tanh_c = jnp.tanh(cseq_ref[t, rows])
        dh = dh_in + dhseq_ref[t, rows]
        dc = dc_scr[rows] + dcseq_ref[t, rows] + dh * o * (1 - tanh_c**2)
        do = dh * tanh_c
        di = dc * g
        dg = dc * i
        df = dc * cprev_ref[t, rows]
        dz = jnp.concatenate(
            [di * hsd(i), df * hsd(f), dg * (1 - g**2), do * hsd(o)], axis=-1
        )

        @pl.when(store)
        def _():
            dzseq_ref[t, rows] = dz.astype(dzseq_ref.dtype)
            dc_scr[rows] = dc * f

        return dz

    true_ = jnp.bool_(True)
    dzA0 = dz_math(T_blk - 1, A, dh_scr[A], true_)

    def step(s, dzA):
        t = T_blk - 1 - s
        dhA = mm(dzA)                                   # MXU ...
        dzB = dz_math(t, B, dh_scr[B], true_)           # ... || VPU
        dh_scr[A] = dhA
        dh_scr[B] = mm(dzB)                             # MXU ...
        tn = jnp.maximum(t - 1, 0)
        dzA_next = dz_math(tn, A, dhA, s < T_blk - 1)   # ... || VPU
        return dzA_next

    jax.lax.fori_loop(0, T_blk, step, dzA0)
    dh0_ref[:] = dh_scr[:]
    dc0_ref[:] = dc_scr[:]


def _lstm_bwd_kernel_drk(nt, B, zseq_ref, cprev_ref, cseq_ref, hprev_ref,
                         dhseq_ref, dcseq_ref, rkt_ref,
                         dzseq_ref, dh0_ref, dc0_ref, drk_ref, dh_scr, dc_scr):
    """BPTT backward with the recurrent weight gradient fused in (_FUSE_DRK).

    Same reverse walk as :func:`_lstm_bwd_kernel`, plus a resident [H, 4H]
    f32 accumulator (the drk OUTPUT block — constant index map, so Mosaic
    keeps it in VMEM across the whole grid and flushes once):
    ``drk += h_prev[t].T @ dz[t]`` per step. That matmul has no serial
    consumer inside the kernel — the scheduler slots it into the MXU bubbles
    left by the dz/gate VPU math — and it replaces the separate
    [H, B*T] @ [B*T, 4H] XLA matmul that re-reads h_seq and dz_seq from HBM.
    Accumulation order differs from the big matmul (per-step f32 adds vs
    XLA's K-chunked f32 adds) — same operand dtypes, reorder-level deltas.

    Padded batch rows (cdiv grid) would corrupt the reduction, so when the
    last block is padded (B % bb != 0) dz is masked to zero on out-of-range
    rows before the accumulate."""
    del nt
    T_blk = zseq_ref.shape[0]
    bb = dh_scr.shape[0]
    H = dh_scr.shape[-1]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero_acc():
        drk_ref[:] = jnp.zeros_like(drk_ref)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    f32 = jnp.float32
    wt = rkt_ref.dtype
    prec = "highest" if wt == f32 else None
    if B % bb != 0:
        rows = jax.lax.broadcasted_iota(jnp.int32, (bb, 1), 0)
        valid = (rows + bb * pl.program_id(0)) < B
    else:
        valid = None

    def step(s, _):
        t = T_blk - 1 - s
        dz, dcf = _bwd_gate_grads(zseq_ref[t].astype(f32), cseq_ref[t],
                                  cprev_ref[t], dh_scr[:] + dhseq_ref[t],
                                  dc_scr[:] + dcseq_ref[t])
        hp = hprev_ref[t]
        if valid is not None:
            # zero BOTH operands on padded rows: a zeroed dz alone still
            # poisons the reduction when the padded h_prev garbage is
            # non-finite (0 * nan = nan)
            dz = jnp.where(valid, dz, 0.0)
            hp = jnp.where(valid, hp, 0.0)
        dzseq_ref[t] = dz.astype(dzseq_ref.dtype)
        dh_scr[:] = jnp.dot(dz.astype(wt), rkt_ref[:], preferred_element_type=f32, precision=prec)
        dc_scr[:] = dcf
        drk_ref[:] += jax.lax.dot_general(
            hp.astype(wt), dz.astype(wt),
            (((0,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
        return 0

    jax.lax.fori_loop(0, T_blk, step, 0)
    dh0_ref[:] = dh_scr[:]
    dc0_ref[:] = dc_scr[:]


def _lstm_bwd_kernel_full(nt, B, zseq_ref, cprev_ref, cseq_ref, hprev_ref,
                          xseq_ref, dhseq_ref, dcseq_ref, rkt_ref, wt_ref,
                          dxseq_ref, dh0_ref, dc0_ref, drk_ref, dw_ref, db_ref,
                          dh_scr, dc_scr):
    """Fully-fused BPTT backward (_FUSE_BWD_FULL): :func:`_lstm_bwd_kernel_drk`
    plus the projection backward folded in — dW += x[t].T @ dz and
    db += sum(dz) accumulate in resident f32 blocks, and dx[t] = dz @ W.T
    streams out in dz's place. dz therefore never touches HBM (its four
    consumers — drk, dW, db, dx — are all computed here); the extra matmuls
    are bubble-riders with no serial consumer, like the drk one."""
    del nt
    T_blk = zseq_ref.shape[0]
    bb = dh_scr.shape[0]
    H = dh_scr.shape[-1]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero_acc():
        drk_ref[:] = jnp.zeros_like(drk_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    f32 = jnp.float32
    wt = rkt_ref.dtype
    prec = "highest" if wt == f32 else None
    if B % bb != 0:
        rows = jax.lax.broadcasted_iota(jnp.int32, (bb, 1), 0)
        valid = (rows + bb * pl.program_id(0)) < B
    else:
        valid = None
    colsum = lambda m: jnp.sum(m, axis=0, keepdims=True)  # VPU cross-sublane

    def step(s, _):
        t = T_blk - 1 - s
        dz, dcf = _bwd_gate_grads(zseq_ref[t].astype(f32), cseq_ref[t],
                                  cprev_ref[t], dh_scr[:] + dhseq_ref[t],
                                  dc_scr[:] + dcseq_ref[t])
        hp = hprev_ref[t]
        xp = xseq_ref[t]
        if valid is not None:
            dz = jnp.where(valid, dz, 0.0)
            hp = jnp.where(valid, hp, 0.0)
            xp = jnp.where(valid, xp, 0.0)
        # serial chain
        dh_scr[:] = jnp.dot(dz.astype(wt), rkt_ref[:], preferred_element_type=f32, precision=prec)
        dc_scr[:] = dcf
        # bubble-riders (no serial consumer)
        dxseq_ref[t] = jnp.dot(dz.astype(wt), wt_ref[:],
                               preferred_element_type=f32,
                               precision=prec).astype(dxseq_ref.dtype)
        drk_ref[:] += jax.lax.dot_general(
            hp.astype(wt), dz.astype(wt),
            (((0,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
        dw_ref[:] += jax.lax.dot_general(
            xp.astype(wt), dz.astype(wt),
            (((0,), (0,)), ((), ())), preferred_element_type=f32, precision=prec)
        db_ref[:] += colsum(dz)
        return 0

    jax.lax.fori_loop(0, T_blk, step, 0)
    dh0_ref[:] = dh_scr[:]
    dc0_ref[:] = dc_scr[:]


def _forward_train_call(xz_t, rk, h0, c0):
    """Training forward: (h_seq, c_seq, z_seq) [T, B, .]. h/c are f32 (state
    contract + downstream heads); the z residual stream keeps xz's dtype —
    bf16 in the scaled mode, halving the widest stream both ways."""
    T, B, H4 = xz_t.shape
    H = H4 // 4
    sd = xz_t.dtype
    # xz in (4H) + z out (4H) at stream dtype, h/c out (2H) f32
    stream_bytes = 8 * jnp.dtype(sd).itemsize + 8
    block_b, block_t = _pick_blocks(B, T, H, rk.dtype.itemsize, stream_bytes,
                                    min_sublane=16 if jnp.dtype(sd).itemsize == 2 else 8,
                                    prefer_bt1=True)
    if block_t is None:
        block_t = T
    nb = pl.cdiv(B, block_b)
    nt = pl.cdiv(T, block_t)
    kernel = pl.pallas_call(
        _lstm_seq_train_kernel_ilv if _use_interleave(block_b, block_t)
        else _lstm_seq_train_kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((block_t, block_b, H4), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_t, block_b, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H4), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H4), sd),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )
    return kernel(xz_t, rk, h0, c0)


def _assert_fp_vmem_total(block_t, block_b, H, INp, sb, rk_bytes, stream_bytes):
    """The fused-projection call sites keep extra residents OUTSIDE the block
    budget by design (W at the compute dtype, the staged xz scratch) so the
    measured-best stream blocks don't shrink — but a whole-T pick makes the
    xz scratch scale with T, so guard the TOTAL against the Mosaic scoped
    limit instead of silently overrunning it at long-T shapes."""
    rk_cost = H * 4 * H * rk_bytes
    w_cost = INp * 4 * H * rk_bytes + 4 * 4 * H  # W (compute dtype) + f32 bias
    xz_scratch = block_t * block_b * 4 * H * sb
    streams = 2 * block_t * block_b * stream_bytes * H  # double-buffered
    hc_scratch = 4 * 2 * block_b * H
    total = rk_cost + w_cost + xz_scratch + streams + hc_scratch
    if total >= _VMEM_LIMIT_BYTES:
        raise ValueError(
            f"fused-projection blocks (bt={block_t}, bb={block_b}) need "
            f"~{total / 2**20:.1f} MB of VMEM (limit "
            f"{_VMEM_LIMIT_BYTES / 2**20:.0f} MB) — T={block_t} whole-sequence "
            "staging does not fit; use the unfused path at this shape")


def _forward_train_call_fp(x_t, w, b, rk, h0, c0):
    """Fused-projection training forward: x_t [T, B, INp] (lane-padded),
    w [INp, 4H] f32, b [1, 4H] f32 -> (h_seq, c_seq, z_seq).

    Block policy matches :func:`_forward_train_call` (same budget, same
    prefer_bt1) — the extra residents (W at the compute dtype, ~1 MB at
    H1024 bf16, plus the per-block xz temp) ride the physical-VMEM headroom
    above `_BLOCK_BUDGET_BYTES` rather than shrinking the measured-best
    stream blocks (total stays well under `_VMEM_LIMIT_BYTES`)."""
    T, B, INp = x_t.shape
    H = rk.shape[0]
    H4 = 4 * H
    sd = x_t.dtype
    sb = jnp.dtype(sd).itemsize
    # x in (INp) + z/hprev out (5H) at stream dtype, h/c/cprev out (3H) f32
    stream_bytes = 5 * sb + 12 + -(-INp * sb // H)
    block_b, block_t = _pick_blocks(B, T, H, rk.dtype.itemsize, stream_bytes,
                                    min_sublane=16 if sb == 2 else 8,
                                    prefer_bt1=True)
    if block_t is None:
        block_t = T
    _assert_fp_vmem_total(block_t, block_b, H, INp, sb,
                          rk.dtype.itemsize, stream_bytes)
    nb = pl.cdiv(B, block_b)
    nt = pl.cdiv(T, block_t)
    seq = lambda b_, t: (t, b_, 0)
    kernel = pl.pallas_call(
        _lstm_seq_train_kernel_fp,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((block_t, block_b, INp), seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((INp, H4), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b_, t: (b_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b_, t: (b_, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_t, block_b, H), seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H4), seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), seq, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H4), sd),
            jax.ShapeDtypeStruct((T, B, H), sd),       # h_prev stream
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),  # c_prev stream
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_t, block_b, H4), sd),  # staged in-kernel xz
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )
    wt = rk.dtype
    return kernel(x_t, w.astype(wt), b, rk, h0, c0)


def _forward_kernel_call_fp(x_t, w, b, rk, h0, c0):
    """Fused-projection INFERENCE forward -> (h_seq, c_seq). Same block
    policy as the unfused inference path (whole-T preferred, then descending
    bt with the interleave pipeline); whole-T runs as the t-blocked grid
    with nt=1."""
    T, B, INp = x_t.shape
    H = rk.shape[0]
    H4 = 4 * H
    sd = x_t.dtype
    sb = jnp.dtype(sd).itemsize
    # x in (INp) at stream dtype, h/c out (2H) f32
    stream_bytes = 8 + -(-INp * sb // H)
    block_b, block_t = _pick_blocks(B, T, H, rk.dtype.itemsize, stream_bytes,
                                    min_sublane=16 if sb == 2 else 8)
    if block_t is None:
        block_t = T
    _assert_fp_vmem_total(block_t, block_b, H, INp, sb,
                          rk.dtype.itemsize, stream_bytes)
    nb = pl.cdiv(B, block_b)
    nt = pl.cdiv(T, block_t)
    kernel = pl.pallas_call(
        _lstm_seq_kernel_tblocked_fp_ilv if _use_interleave(block_b, block_t)
        else _lstm_seq_kernel_tblocked_fp,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((block_t, block_b, INp), lambda b_, t: (t, b_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((INp, H4), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b_, t: (b_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b_, t: (b_, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_t, block_b, H), lambda b_, t: (t, b_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), lambda b_, t: (t, b_, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_t, block_b, H4), sd),  # staged in-kernel xz
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )
    return kernel(x_t, w.astype(rk.dtype), b, rk, h0, c0)


def _backward_call(z_seq, c_prev_seq, c_seq, dh_seq, dc_seq, rk_t):
    """(dz_seq [T, B, 4H], dh0 [B, H], dc0 [B, H]). dz keeps z's stream
    dtype — it only feeds bf16-operand matmuls downstream (drk and the
    input-projection backward)."""
    T, B, H4 = z_seq.shape
    H = H4 // 4
    sd = z_seq.dtype
    # z in + dz out (4H each) at stream dtype; c_prev/c/dh/dc (4H total) f32
    stream_bytes = 8 * jnp.dtype(sd).itemsize + 16
    block_b, block_t = _pick_blocks(B, T, H, rk_t.dtype.itemsize, stream_bytes,
                                    min_sublane=16 if jnp.dtype(sd).itemsize == 2 else 8,
                                    prefer_bt1=True)
    if block_t is None:
        block_t = T
    nb = pl.cdiv(B, block_b)
    nt = pl.cdiv(T, block_t)
    rev = lambda b, t: (nt - 1 - t, b, 0)  # walk time blocks backward
    kernel = pl.pallas_call(
        functools.partial(
            _lstm_bwd_kernel_ilv if _use_interleave(block_b, block_t)
            else _lstm_bwd_kernel, nt),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((block_t, block_b, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_t, block_b, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H4), sd),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )
    return kernel(z_seq, c_prev_seq, c_seq, dh_seq, dc_seq, rk_t)


def _backward_call_drk(z_seq, c_prev_seq, c_seq, h_prev_seq, dh_seq, dc_seq, rk_t):
    """Fused-drk backward: additionally streams h_prev (at the stream dtype)
    and returns ``(dz_seq, dh0, dc0, drk [H, 4H] f32)`` with the weight
    gradient accumulated inside the kernel (see :func:`_lstm_bwd_kernel_drk`).

    The [H, 4H] f32 accumulator (16 MB at H1024) is an extra resident on top
    of rk.T; like the fused-projection weights it rides the physical-VMEM
    headroom above the block budget instead of shrinking the stream blocks."""
    T, B, H4 = z_seq.shape
    H = H4 // 4
    sd = z_seq.dtype
    sb = jnp.dtype(sd).itemsize
    # z in + dz out (4H each) + h_prev in (H) at stream dtype; c_prev/c/dh/dc f32
    stream_bytes = 9 * sb + 16
    block_b, block_t = _pick_blocks(B, T, H, rk_t.dtype.itemsize, stream_bytes,
                                    min_sublane=16 if sb == 2 else 8,
                                    prefer_bt1=True)
    if block_t is None:
        block_t = T
    nb = pl.cdiv(B, block_b)
    nt = pl.cdiv(T, block_t)
    rev = lambda b, t: (nt - 1 - t, b, 0)
    kernel = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel_drk, nt, B),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((block_t, block_b, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_t, block_b, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H4), sd),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )
    return kernel(z_seq, c_prev_seq, c_seq, h_prev_seq, dh_seq, dc_seq, rk_t)


def _full_bwd_blocks(T, B, H, INp, sd):
    """Block pick for the fully-fused backward — shared with the
    :func:`_core_fp_bwd` gate so the padded-grid fallback decision sees the
    exact blocks the kernel would run with."""
    sb = jnp.dtype(sd).itemsize
    # z in (4H) + hprev in (H) at stream dtype, x in + dx out (INp each, in
    # H units) at stream dtype; cprev/c/dh/dc (4H total) f32
    stream_bytes = 5 * sb + 16 + 2 * -(-INp * sb // H)
    # rk-bytes arg: the resident rk.T is budgeted at the STREAM itemsize —
    # correct only because the fp path forces rk to the stream dtype
    # (lstm_sequence_pallas casts rk to `sd`); a future mixed-precision rk
    # must pass its own itemsize here or the weight is mis-budgeted
    return _pick_blocks(B, T, H, sb, stream_bytes,
                        min_sublane=16 if sb == 2 else 8, prefer_bt1=True)


def _full_bwd_block_b(T, B, H, INp, sd) -> int:
    return _full_bwd_blocks(T, B, H, INp, sd)[0]


def _backward_call_full(z_seq, c_prev_seq, c_seq, h_prev_seq, x_t, dh_seq,
                        dc_seq, rk_t, w_t):
    """Fully-fused backward: returns ``(dx_t, dh0, dc0, drk, dw, db)`` with
    every gradient term computed inside the kernel (dz never leaves VMEM).
    x_t/w_t are the lane-padded raw input stream and transposed projection
    weight; dw/db come back f32 at the padded width."""
    T, B, H4 = z_seq.shape
    H = H4 // 4
    INp = x_t.shape[-1]
    sd = z_seq.dtype
    # _full_bwd_blocks budgets the resident rk.T at the stream itemsize
    assert rk_t.dtype == sd, (rk_t.dtype, sd)
    block_b, block_t = _full_bwd_blocks(T, B, H, INp, sd)
    if block_t is None:
        block_t = T
    nb = pl.cdiv(B, block_b)
    nt = pl.cdiv(T, block_t)
    rev = lambda b, t: (nt - 1 - t, b, 0)
    kernel = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel_full, nt, B),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((block_t, block_b, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, INp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, INp), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_t, block_b, INp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((INp, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, INp), sd),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
            jax.ShapeDtypeStruct((INp, H4), jnp.float32),
            jax.ShapeDtypeStruct((1, H4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )
    return kernel(z_seq, c_prev_seq, c_seq, h_prev_seq, x_t, dh_seq, dc_seq,
                  rk_t, w_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_pallas_core(drk: bool, xz_t, rk, h0, c0):
    # `drk` is the static fused-weight-gradient switch (resolve_fusion()[1]);
    # the primal forward ignores it but it must be part of the signature so
    # the vjp picks the right backward kernel without global state
    del drk
    # xz in (4H) at its own dtype, h/c out (2H) f32
    stream_bytes = 4 * jnp.dtype(xz_t.dtype).itemsize + 8
    block_b, block_t = _pick_blocks(
        xz_t.shape[1], xz_t.shape[0], h0.shape[-1], rk.dtype.itemsize, stream_bytes,
        min_sublane=16 if jnp.dtype(xz_t.dtype).itemsize == 2 else 8,
    )
    h_seq, c_seq = _forward_kernel_call(xz_t, rk, h0, c0, block_b, block_t)
    return h_seq, c_seq


def _core_fwd(drk, xz_t, rk, h0, c0):
    del drk
    h_seq, c_seq, z_seq = _forward_train_call(xz_t, rk, h0, c0)
    return (h_seq, c_seq), (rk, h0, c0, h_seq, c_seq, z_seq)


def _bptt_and_drk(drk, rk, h0, c0, h_seq, c_seq, z_seq, dh_seq, dc_seq):
    """Shared backward: reverse-time kernel + recurrent weight gradient.

    With ``drk`` (static) the weight gradient accumulates inside the kernel;
    otherwise it is one big order-independent [H, B*T] @ [B*T, 4H] MXU
    matmul over the saved hidden sequence. Returns (dz_seq, drk f32, dh0, dc0)."""
    T, B, H4 = z_seq.shape
    H = H4 // 4
    wt = rk.dtype
    prec = "highest" if wt == jnp.float32 else None

    c_prev_seq = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)
    h_prev_seq = jnp.concatenate([h0[None], h_seq[:-1]], axis=0)
    if drk:
        dz_seq, dh0, dc0, drk = _backward_call_drk(
            z_seq, c_prev_seq, c_seq, h_prev_seq.astype(z_seq.dtype),
            dh_seq, dc_seq, rk.T.astype(wt))
    else:
        dz_seq, dh0, dc0 = _backward_call(z_seq, c_prev_seq, c_seq, dh_seq,
                                          dc_seq, rk.T.astype(wt))
        drk = jnp.dot(
            h_prev_seq.reshape(T * B, H).T.astype(wt),
            dz_seq.reshape(T * B, H4).astype(wt),
            preferred_element_type=jnp.float32, precision=prec,
        )
    return dz_seq, drk, dh0, dc0


def _core_bwd(drk, res, grads):
    """Pallas reverse-time BPTT + the recurrent weight gradient."""
    rk, h0, c0, h_seq, c_seq, z_seq = res
    dh_seq, dc_seq = grads
    dz_seq, drk_g, dh0, dc0 = _bptt_and_drk(drk, rk, h0, c0, h_seq, c_seq,
                                            z_seq, dh_seq, dc_seq)
    return dz_seq, drk_g.astype(rk.dtype), dh0, dc0


_lstm_pallas_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _lstm_pallas_core_fp(drk: bool, full: bool, x_t, w, b, rk, h0, c0):
    """Fused-projection core: x_t [T, B, INp] (lane-padded) at the stream
    dtype, w [INp, 4H] f32, b [1, 4H] f32. Both the primal (inference) and
    the vjp forward compute the projection in-kernel. ``drk``/``full`` are
    the static backward-fusion switches (resolve_fusion()[1:]): without
    either, the projection backward stays XLA (dW/dx/db from the streamed
    dz_seq)."""
    del drk, full
    return _forward_kernel_call_fp(x_t, w, b, rk, h0, c0)


def _core_fp_fwd(drk, full, x_t, w, b, rk, h0, c0):
    del drk, full
    h_seq, c_seq, z_seq, hp_seq, cp_seq = _forward_train_call_fp(
        x_t, w, b, rk, h0, c0)
    # the PREV sequences come out of the kernel (h0/c0 embedded as row 0), so
    # the backward needs no concat materialization passes — and h_seq itself
    # is not a residual at all
    return (h_seq, c_seq), (x_t, w, rk, hp_seq, cp_seq, c_seq, z_seq)


def _core_fp_bwd(drk, full, res, grads):
    x_t, w, rk, hp_seq, cp_seq, c_seq, z_seq = res
    dh_seq, dc_seq = grads
    T, B, H4 = z_seq.shape
    H = H4 // 4
    INp = x_t.shape[-1]
    wt = rk.dtype
    prec = "highest" if wt == jnp.float32 else None
    if full and B % _full_bwd_block_b(T, B, H, INp, z_seq.dtype) == 0:
        # exactly-dividing batch blocks only: at padded cdiv grids the kernel
        # crashes the TPU worker (B500 H512 bf16; rounds 3-4). The repro
        # ladder (tools/repro_full_bwd_fault.py) pins the trigger to the
        # operand layouts the surrounding XLA program assigns to the custom
        # call through jit-of-grad — a direct pallas_call of the identical
        # kernel at the identical padded shape is clean. Since round 5 this
        # condition ALWAYS holds for callers going through
        # lstm_sequence_pallas: the entry pads the batch up to a block
        # multiple (zero rows, exact math) so every shape takes this rung;
        # the check stays as defense for direct _lstm_pallas_core_fp callers,
        # whose padded shapes fall back to the drk rung (identical math).
        dx, dh0, dc0, drk_g, dw, db = _backward_call_full(
            z_seq, cp_seq, c_seq, hp_seq, x_t,
            dh_seq, dc_seq, rk.T.astype(wt), w.T.astype(wt))
        return dx, dw, db, drk_g.astype(wt), dh0, dc0
    if drk:
        dz_seq, dh0, dc0, drk_g = _backward_call_drk(
            z_seq, cp_seq, c_seq, hp_seq, dh_seq, dc_seq, rk.T.astype(wt))
    else:
        dz_seq, dh0, dc0 = _backward_call(z_seq, cp_seq, c_seq, dh_seq,
                                          dc_seq, rk.T.astype(wt))
        drk_g = jnp.dot(
            hp_seq.reshape(T * B, H).T.astype(wt),
            dz_seq.reshape(T * B, H4).astype(wt),
            preferred_element_type=jnp.float32, precision=prec,
        )
    dzf = dz_seq.reshape(T * B, H4)
    # projection backward: order-independent MXU matmuls, exactly what XLA
    # autodiff of the hoisted projection runs in the unfused path
    dw = jnp.dot(x_t.reshape(T * B, INp).T.astype(wt), dzf.astype(wt),
                 preferred_element_type=jnp.float32, precision=prec)
    db = dzf.astype(jnp.float32).sum(axis=0, keepdims=True)
    dx = jnp.dot(dzf.astype(wt), w.T.astype(wt),
                 preferred_element_type=jnp.float32,
                 precision=prec).reshape(T, B, INp).astype(x_t.dtype)
    return dx, dw, db, drk_g.astype(wt), dh0, dc0


_lstm_pallas_core_fp.defvjp(_core_fp_fwd, _core_fp_bwd)


def lstm_sequence_pallas(params, x, h0, c0, compute_dtype=None, fusion=None):
    """Drop-in for :func:`..ops.lstm.lstm_sequence` with the fused kernel.

    ``compute_dtype=jnp.bfloat16`` is the scaled mode: matmul operands in
    bf16 (f32 accumulation), and — decisive for VMEM at H>=512 — the resident
    recurrent weight stored bf16 inside the kernel.

    ``fusion`` is the static (proj, drk, full) kernel-fusion triple
    (:func:`resolve_fusion`); ``None`` takes the :func:`set_fusion` policy
    defaults. It is threaded into the custom_vjp cores as ``nondiff_argnums``
    so two traces with different fusion never alias a jit cache entry."""
    H = params["recurrent_kernel"].shape[0]
    proj, drk, full = resolve_fusion(fusion, hidden_dim=H)
    rk_bf16 = compute_dtype is not None and jnp.dtype(compute_dtype).itemsize == 2
    if not rk_fits_vmem(H, bf16=rk_bf16):
        raise ValueError(
            f"hidden dim {H}: recurrent weight does not fit the kernel's VMEM "
            "budget — use the XLA backend (resolve_lstm_backend 'auto' gates "
            "on rk_fits_vmem)")
    if proj:
        # experimental: the projection moves INSIDE the kernels — the
        # per-block matmul sits off the serial chain in training, and the
        # inference forward fuses it too (_forward_kernel_call_fp).
        # x and W are zero-padded to a 128-lane contraction dim — sub-128
        # lanes on a matmul operand get scalarized by Mosaic (CLAUDE.md).
        sd = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
        rk = params["recurrent_kernel"].astype(sd)
        IN = x.shape[-1]
        INp = -(-IN // 128) * 128
        x_t = jnp.swapaxes(x.astype(sd), 0, 1)
        w = params["kernel"].astype(jnp.float32)
        if INp != IN:
            x_t = jnp.pad(x_t, ((0, 0), (0, 0), (0, INp - IN)))
            w = jnp.pad(w, ((0, INp - IN), (0, 0)))
        b = params["bias"].astype(jnp.float32).reshape(1, -1)
        B = x_t.shape[1]
        Bp = B
        if full:
            # PAD-TO-DIVISIBLE (round 5, VERDICT r4 item 5): the fully-fused
            # backward crashes the TPU worker on padded cdiv grids through
            # the jit invocation path (tools/repro_full_bwd_fault.py — the
            # operand layouts XLA assigns to the custom call, not the kernel
            # body). Instead of falling back to the drk rung, pad the batch
            # UP to a multiple of the backward's block here: zero rows are
            # exact (their dh cotangent is 0 after the slice below, so every
            # gradient contribution they make is 0), and the fwd/bwd kernels
            # then run exactly-dividing grids. Fixpoint loop: the block pick
            # depends on B, so re-pick until the padded B divides (candidates
            # are divisors/powers-of-two <= 256, so this converges in <= 2).
            T_ = x_t.shape[0]
            for _ in range(4):
                bb = _full_bwd_block_b(T_, Bp, H, INp, sd)
                if Bp % bb == 0:
                    break
                Bp = -(-Bp // bb) * bb
        if Bp != B:
            x_t = jnp.pad(x_t, ((0, 0), (0, Bp - B), (0, 0)))
            h0 = jnp.pad(h0, ((0, Bp - B), (0, 0)))
            c0 = jnp.pad(c0, ((0, Bp - B), (0, 0)))
        h_seq, c_seq = _lstm_pallas_core_fp(drk, full, x_t, w, b, rk, h0, c0)
        if Bp != B:
            h_seq = h_seq[:, :B]
            c_seq = c_seq[:, :B]
        return jnp.swapaxes(h_seq, 0, 1), (h_seq[-1], c_seq[-1])

    # the FLOP-heavy input projection stays a single large XLA matmul
    if compute_dtype is not None:
        # the xz stream itself travels in compute_dtype (f32 accumulation in
        # the matmul, rounded once on output) — halves the widest HBM stream
        # into/out of the kernels and admits a larger batch block
        xz = jnp.dot(x.astype(compute_dtype), params["kernel"].astype(compute_dtype),
                     preferred_element_type=jnp.float32) + params["bias"]
        xz = xz.astype(compute_dtype)
        rk = params["recurrent_kernel"].astype(compute_dtype)
    else:
        xz = (jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32,
                      precision="highest") + params["bias"]).astype(jnp.float32)
        rk = params["recurrent_kernel"].astype(jnp.float32)
    xz_t = jnp.swapaxes(xz, 0, 1)
    h_seq, c_seq = _lstm_pallas_core(drk, xz_t, rk, h0, c0)
    return jnp.swapaxes(h_seq, 0, 1), (h_seq[-1], c_seq[-1])
