"""Two-cell (encoder ∥ decoder) fused cl_vrnn train kernel.

THE H512 training bottleneck is the serial recurrent-matmul chain: a lone
[bb, H] @ [H, 4H] chain runs at ~20% of the MXU peak (pipeline-fill latency,
artifacts/h512_ablation.json), and the flagship step runs TWO such chains —
encoder and decoder — as separate kernels, each paying the full chain
latency. But decoder step t-1 is data-independent of encoder step t, and the
round-5 full-width overlap probe measured a second full-width chain riding
the first's latency bubbles at ~90-96% efficiency (`chain_mm_x2_fullwidth` /
`chain_mm_encdec` rows). This module fuses the whole cl_vrnn recurrent core
— encoder LSTM, z heads, z sample, decoder LSTM (reference
cl_vrnn/model.py:196-228) — into ONE Pallas kernel with a one-step software
lag: grid step t issues enc[t] and dec[t-1], two mutually-independent
full-width chain matmuls per invocation, so the MXU pipelines them
back-to-back and the two chains share one latency budget instead of paying
two.

Design notes:
* grid (nb, T+1), block_t = 1 (the measured-best train blocking): the t axis
  is sequential on TPU, cell states live in VMEM scratch across steps;
  enc runs at t < T, dec at t > 0 (its streams index-map to t-1).
* the z heads are packed into one [H, 2*Lp] matmul (Lp = 128: sub-128-lane
  matmuls get scalarized — CLAUDE.md round-2 lesson); zm/zlv/eps/z all live
  as 128-lane arrays whose columns beyond L are exactly zero.
* the sampled z never leaves VMEM in the forward (z = zm + exp(zlv/2) * eps
  is recomputed in the backward from the zargs residual); the dec projection
  z @ k_z is one [bb, Lp] @ [Lp, 4H] bubble-rider.
* the backward mirrors the lag in reverse: grid step s issues enc_bwd[T-s]
  and dec_bwd[T-1-s]; dec_bwd[t] hands dh_e(t) (the z-head/sample backward)
  to enc_bwd[t] through a scratch one step later, so its chain matmuls stay
  mutually independent too. Every weight gradient accumulates in resident
  f32 blocks (constant-index outputs), dz never touches HBM.
* batch blocks must divide B exactly — the caller pads (the same
  pad-to-divisible machinery as lstm_sequence_pallas; padded rows are
  gradient-exact zeros).

Integration: models/cl_vrnn.apply routes here when
``cfg.lstm_backend == 'pallas'`` and :func:`should_use` holds; the concat/
pad/weight-packing happens OUTSIDE the custom_vjp, so JAX autodiff routes
the parameter cotangents back through the packing for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lstm import (
    _bwd_gate_grads,
    _compiler_params,
    _interpret,
    rk_fits_vmem,
)

LP = 128  # lane-padded latent width (L <= LP; zm/zlv/eps/z columns beyond L are 0)


def _budget_block_b(B: int, T: int, H: int, INp: int, sbytes: int) -> int:
    """Largest batch block (cap 256) whose BACKWARD fits the VMEM budget.

    The backward is the fat invocation: resident transposed weights
    (2 rk.T + w.T + wdx.T + kz.T + wz.T) + resident f32 gradient
    accumulators (2 drk + 2 dW + dkz + dwz) + double-buffered per-t streams.
    """
    H4 = 4 * H
    resid = (2 * H * H4 + 2 * INp * H4 + LP * H4 + 2 * LP * H) * sbytes
    accum = (2 * H * H4 + 2 * INp * H4 + LP * H4 + H * 2 * LP + 2 * H4 + 2 * LP) * 4
    budget = 100 * 1024 * 1024  # scoped-VMEM limit is lifted to 112 MB below

    def streams(bb):
        per_t = (
            2 * bb * H4 * sbytes      # ze, zd
            + 4 * bb * H * 4          # cpe, ce, cpd, cd (f32)
            + 3 * bb * H * sbytes     # hpe, he, hpd
            + 2 * bb * INp * sbytes   # xe, xd
            + bb * LP * 4             # eps (f32)
            + 2 * bb * 2 * LP * 4     # zargs, dzargs (f32)
            + bb * H * 4              # dhd (f32)
            + 2 * bb * INp * sbytes   # dxe, dxd out
        )
        return 2 * per_t  # double-buffered

    for bb in (256, 128, 64, 32, 16, 8):
        if bb <= B and resid + accum + streams(bb) < budget:
            return bb
    return 8


def _two_cell_compiler_params():
    p = _compiler_params()
    # the backward's resident accumulators + transposed weights are heavier
    # than the single-cell kernels'; v5e physical VMEM is 128 MB
    return pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)


def should_use(cfg, two_cell=None) -> bool:
    """Auto gate: the MEASURED win region (artifacts/two_cell_exp.json, v5e
    full optimizer step, differenced device time): two-cell beats the
    two-kernel step 1.09-1.12x at H256/512/768 — the chain-latency-bound
    regime where a second full-width chain rides the first's pipeline
    bubbles — but LOSES at H1024 (0.937x: the [256,1024]@[1024,4096]
    chain matmuls already fill the MXU, and the fused kernel's narrower
    batch blocks + heavier VMEM residency cost more than the overlap
    saves). So the gate is 256 <= H < 1024; at the reference's 88-wide
    layers the XLA scan wins outright (same shape of gate as the fused
    generation kernels). Both recurrent weights + accumulators must also
    fit VMEM and the lane-padded latent must hold L."""
    if two_cell is None:
        two_cell = getattr(cfg, "two_cell", None)
    if two_cell is not None:
        return bool(two_cell)
    H = cfg.intermediate_dim
    return (
        cfg.latent_dim <= LP
        and 256 <= H < 1024
        and rk_fits_vmem(H, bf16=cfg.bf16_compute)
        and H * 4 * H * (2 if cfg.bf16_compute else 4) * 4 <= 48 * 1024 * 1024
        and cfg.dropout == 0.0
    )


# ---------------------------------------------------------------- forward


def _fwd_kernel(T, xe_ref, xd_ref, eps_ref,
                we_ref, be_ref, rke_ref,
                wdx_ref, bd_ref, rkd_ref, kz_ref,
                wz_ref, bz_ref,
                h0e_ref, c0e_ref, h0d_ref, c0d_ref,
                hd_ref, zargs_ref,
                ze_ref, zd_ref,
                hpe_ref, cpe_ref, ce_ref, he_ref,
                hpd_ref, cpd_ref, cd_ref,
                he_scr, ce_scr, hd_scr, cd_scr, z_scr):
    """One grid step: enc[t] (t < T) ∥ dec[t-1] (t > 0).

    The two chain matmuls (h_e @ rk_e, h_d @ rk_d) are mutually independent
    within the invocation, so Mosaic issues them back-to-back into the MXU
    pipeline — the overlap the h512_ablation encdec probe measured at ~96%.
    """
    t = pl.program_id(1)
    H = he_scr.shape[-1]
    f32 = jnp.float32
    wt = rke_ref.dtype
    prec = "highest" if wt == f32 else None
    mm = lambda a, b: jnp.dot(a.astype(wt), b, preferred_element_type=f32,
                              precision=prec)

    @pl.when(t == 0)
    def _init():
        he_scr[:] = h0e_ref[:]
        ce_scr[:] = c0e_ref[:]
        hd_scr[:] = h0d_ref[:]
        cd_scr[:] = c0d_ref[:]

    def gates(z, c_prev):
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H:2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H:] + 0.5, 0.0, 1.0)
        c = f * c_prev + i * g
        return o * jnp.tanh(c), c

    # ---- decoder step t-1 (consumes z[t-1] from scratch, set last step)
    @pl.when(t > 0)
    def _dec():
        hp = hd_scr[:]
        cp = cd_scr[:]
        zd = (mm(xd_ref[0], wdx_ref[:]) + bd_ref[:].astype(f32)
              + mm(z_scr[:], kz_ref[:]) + mm(hp, rkd_ref[:]))
        h, c = gates(zd, cp)
        hd_scr[:] = h
        cd_scr[:] = c
        hd_ref[0] = h
        zd_ref[0] = zd.astype(zd_ref.dtype)
        hpd_ref[0] = hp.astype(hpd_ref.dtype)
        cpd_ref[0] = cp
        cd_ref[0] = c

    # ---- encoder step t + z head + z sample
    @pl.when(t < T)
    def _enc():
        hp = he_scr[:]
        cp = ce_scr[:]
        ze = (mm(xe_ref[0], we_ref[:]) + be_ref[:].astype(f32)
              + mm(hp, rke_ref[:]))
        h, c = gates(ze, cp)
        he_scr[:] = h
        ce_scr[:] = c
        ze_ref[0] = ze.astype(ze_ref.dtype)
        hpe_ref[0] = hp.astype(hpe_ref.dtype)
        cpe_ref[0] = cp
        ce_ref[0] = c
        he_ref[0] = h.astype(he_ref.dtype)
        # packed z heads: zargs[:, :LP] = zm (cols >= L zero), [:, LP:] = zlv
        zargs = mm(h, wz_ref[:]) + bz_ref[:].astype(f32)
        zargs_ref[0] = zargs
        # z = zm + exp(zlv/2) * eps; columns >= L: 0 + exp(0)*0 = 0 exactly
        z_scr[:] = zargs[:, :LP] + jnp.exp(zargs[:, LP:] / 2) * eps_ref[0].astype(f32)


def _fwd_call(xe, xd, eps, we, be, rke, wdx, bd, rkd, kz, wz, bz,
              h0e, c0e, h0d, c0d):
    """xe/xd: [T, B, INp] stream dtype; eps: [T, B, LP] f32. Returns
    (hd, zargs) + the backward's residual streams."""
    T, B, INp = xe.shape
    H = h0e.shape[-1]
    H4 = 4 * H
    sd = xe.dtype
    sb = jnp.dtype(sd).itemsize
    bb = _budget_block_b(B, T, H, INp, sb)
    assert B % bb == 0, (B, bb)  # caller pads (two_cell_sequence)
    nb = B // bb

    lag = lambda b, t: (jnp.maximum(t - 1, 0), b, 0)
    cur = lambda b, t: (jnp.minimum(t, T - 1), b, 0)
    const2 = lambda b, t: (0, 0)
    bconst = lambda b, t: (b, 0)

    in_specs = [
        pl.BlockSpec((1, bb, INp), cur, memory_space=pltpu.VMEM),   # xe
        pl.BlockSpec((1, bb, INp), lag, memory_space=pltpu.VMEM),   # xd
        pl.BlockSpec((1, bb, LP), cur, memory_space=pltpu.VMEM),    # eps
        pl.BlockSpec((INp, H4), const2, memory_space=pltpu.VMEM),   # we
        pl.BlockSpec((1, H4), const2, memory_space=pltpu.VMEM),     # be
        pl.BlockSpec((H, H4), const2, memory_space=pltpu.VMEM),     # rke
        pl.BlockSpec((INp, H4), const2, memory_space=pltpu.VMEM),   # wdx
        pl.BlockSpec((1, H4), const2, memory_space=pltpu.VMEM),     # bd
        pl.BlockSpec((H, H4), const2, memory_space=pltpu.VMEM),     # rkd
        pl.BlockSpec((LP, H4), const2, memory_space=pltpu.VMEM),    # kz
        pl.BlockSpec((H, 2 * LP), const2, memory_space=pltpu.VMEM), # wz
        pl.BlockSpec((1, 2 * LP), const2, memory_space=pltpu.VMEM), # bz
        pl.BlockSpec((bb, H), bconst, memory_space=pltpu.VMEM),     # h0e
        pl.BlockSpec((bb, H), bconst, memory_space=pltpu.VMEM),     # c0e
        pl.BlockSpec((bb, H), bconst, memory_space=pltpu.VMEM),     # h0d
        pl.BlockSpec((bb, H), bconst, memory_space=pltpu.VMEM),     # c0d
    ]
    out_specs = [
        pl.BlockSpec((1, bb, H), lag, memory_space=pltpu.VMEM),       # hd
        pl.BlockSpec((1, bb, 2 * LP), cur, memory_space=pltpu.VMEM),  # zargs
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        jax.ShapeDtypeStruct((T, B, 2 * LP), jnp.float32),
    ]
    out_specs += [
        pl.BlockSpec((1, bb, H4), cur, memory_space=pltpu.VMEM),  # ze
        pl.BlockSpec((1, bb, H4), lag, memory_space=pltpu.VMEM),  # zd
        pl.BlockSpec((1, bb, H), cur, memory_space=pltpu.VMEM),   # hpe
        pl.BlockSpec((1, bb, H), cur, memory_space=pltpu.VMEM),   # cpe
        pl.BlockSpec((1, bb, H), cur, memory_space=pltpu.VMEM),   # ce
        pl.BlockSpec((1, bb, H), cur, memory_space=pltpu.VMEM),   # he
        pl.BlockSpec((1, bb, H), lag, memory_space=pltpu.VMEM),   # hpd
        pl.BlockSpec((1, bb, H), lag, memory_space=pltpu.VMEM),   # cpd
        pl.BlockSpec((1, bb, H), lag, memory_space=pltpu.VMEM),   # cd
    ]
    out_shape += [
        jax.ShapeDtypeStruct((T, B, H4), sd),
        jax.ShapeDtypeStruct((T, B, H4), sd),
        jax.ShapeDtypeStruct((T, B, H), sd),
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        jax.ShapeDtypeStruct((T, B, H), sd),
        jax.ShapeDtypeStruct((T, B, H), sd),
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
    ]
    kernel = pl.pallas_call(
        functools.partial(_fwd_kernel, T),
        grid=(nb, T + 1),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, LP), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_two_cell_compiler_params(),
    )
    return kernel(xe, xd, eps, we, be, rke, wdx, bd, rkd, kz, wz, bz,
                  h0e, c0e, h0d, c0d)


# ---------------------------------------------------------------- backward


def _bwd_kernel(T, ze_ref, zd_ref, cpe_ref, ce_ref, cpd_ref, cd_ref,
                hpe_ref, he_ref, hpd_ref, eps_ref, zargs_ref,
                xe_ref, xd_ref, dhd_ref, dzargs_ref,
                rket_ref, rkdt_ref, wet_ref, wdxt_ref, kzt_ref, wzt_ref,
                dxe_ref, dxd_ref,
                dh0e_ref, dc0e_ref, dh0d_ref, dc0d_ref,
                drke_ref, drkd_ref, dwe_ref, dwdx_ref, dkz_ref,
                dwz_ref, dbe_ref, dbd_ref, dbz_ref,
                dhe_scr, dce_scr, dhd_scr, dcd_scr, dhez_scr):
    """Reverse lag: grid step s runs enc_bwd[T-s] THEN dec_bwd[T-1-s].

    enc_bwd[t] consumes dec_bwd[t]'s z-head contribution (``dhez_scr``, set
    one step earlier), so the two chain matmuls (dz_e @ rk_e.T, dz_d @ rk_d.T)
    are independent within every invocation — the same overlap as forward.
    Weight grads accumulate in resident f32 blocks; dz never leaves VMEM
    (the single-cell 'full' rung's design, doubled)."""
    s = pl.program_id(1)
    f32 = jnp.float32
    wt = rket_ref.dtype
    prec = "highest" if wt == f32 else None
    mm = lambda a, b: jnp.dot(a.astype(wt), b, preferred_element_type=f32,
                              precision=prec)
    acc = lambda a, b: jax.lax.dot_general(
        a.astype(wt), b.astype(wt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)
    colsum = lambda m: jnp.sum(m, axis=0, keepdims=True)

    @pl.when((pl.program_id(0) == 0) & (s == 0))
    def _zero_acc():
        drke_ref[:] = jnp.zeros_like(drke_ref)
        drkd_ref[:] = jnp.zeros_like(drkd_ref)
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dwdx_ref[:] = jnp.zeros_like(dwdx_ref)
        dkz_ref[:] = jnp.zeros_like(dkz_ref)
        dwz_ref[:] = jnp.zeros_like(dwz_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dbd_ref[:] = jnp.zeros_like(dbd_ref)
        dbz_ref[:] = jnp.zeros_like(dbz_ref)

    @pl.when(s == 0)
    def _init():
        dhe_scr[:] = jnp.zeros_like(dhe_scr)
        dce_scr[:] = jnp.zeros_like(dce_scr)
        dhd_scr[:] = jnp.zeros_like(dhd_scr)
        dcd_scr[:] = jnp.zeros_like(dcd_scr)
        dhez_scr[:] = jnp.zeros_like(dhez_scr)

    # ---- encoder backward at t_e = T - s (reads dhez_scr from step s-1)
    @pl.when(s > 0)
    def _enc_bwd():
        dz_e, dcf = _bwd_gate_grads(
            ze_ref[0].astype(f32), ce_ref[0], cpe_ref[0],
            dhe_scr[:] + dhez_scr[:], dce_scr[:])
        dhe_scr[:] = mm(dz_e, rket_ref[:])        # serial chain
        dce_scr[:] = dcf
        dxe_ref[0] = mm(dz_e, wet_ref[:]).astype(dxe_ref.dtype)
        drke_ref[:] += acc(hpe_ref[0], dz_e)
        dwe_ref[:] += acc(xe_ref[0], dz_e)
        dbe_ref[:] += colsum(dz_e)

    # ---- decoder backward at t_d = T - 1 - s (+ z sample + z head backward)
    @pl.when(s < T)
    def _dec_bwd():
        dz_d, dcf = _bwd_gate_grads(
            zd_ref[0].astype(f32), cd_ref[0], cpd_ref[0],
            dhd_scr[:] + dhd_ref[0], dcd_scr[:])
        dhd_scr[:] = mm(dz_d, rkdt_ref[:])        # serial chain
        dcd_scr[:] = dcf
        dxd_ref[0] = mm(dz_d, wdxt_ref[:]).astype(dxd_ref.dtype)
        drkd_ref[:] += acc(hpd_ref[0], dz_d)
        dwdx_ref[:] += acc(xd_ref[0], dz_d)
        dbd_ref[:] += colsum(dz_d)
        # z sample backward: z = zm + exp(zlv/2) * eps
        zargs = zargs_ref[0]
        sig = jnp.exp(zargs[:, LP:] / 2)
        eps = eps_ref[0].astype(f32)
        dz = mm(dz_d, kzt_ref[:])                 # [bb, LP]
        dzargs_in = dzargs_ref[0]
        dzm = dz + dzargs_in[:, :LP]
        dzlv = dz * eps * sig * 0.5 + dzargs_in[:, LP:]
        dzargs = jnp.concatenate([dzm, dzlv], axis=-1)
        # z-head backward (+ dkz needs z itself — recomputed, never streamed)
        z = zargs[:, :LP] + sig * eps
        dkz_ref[:] += acc(z, dz_d)
        dwz_ref[:] += acc(he_ref[0], dzargs)
        dbz_ref[:] += colsum(dzargs)
        dhez_scr[:] = mm(dzargs, wzt_ref[:])      # -> enc_bwd at step s+1

    @pl.when(s == T)
    def _final():
        dh0e_ref[:] = dhe_scr[:]
        dc0e_ref[:] = dce_scr[:]
        dh0d_ref[:] = dhd_scr[:]
        dc0d_ref[:] = dcd_scr[:]


def _bwd_call(ze, zd, cpe, ce, cpd, cd, hpe, he, hpd, eps, zargs, xe, xd,
              dhd, dzargs, rket, rkdt, wet, wdxt, kzt, wzt):
    T, B, H4 = ze.shape
    H = H4 // 4
    INp = xe.shape[-1]
    sd = ze.dtype
    sb = jnp.dtype(sd).itemsize
    bb = _budget_block_b(B, T, H, INp, sb)
    assert B % bb == 0, (B, bb)
    nb = B // bb
    Tm1 = T - 1

    enc = lambda b, s: (jnp.minimum(T - s, Tm1), b, 0)
    dec = lambda b, s: (jnp.maximum(Tm1 - s, 0), b, 0)
    const2 = lambda b, s: (0, 0)
    bconst = lambda b, s: (b, 0)

    kernel = pl.pallas_call(
        functools.partial(_bwd_kernel, T),
        grid=(nb, T + 1),
        in_specs=[
            pl.BlockSpec((1, bb, H4), enc, memory_space=pltpu.VMEM),     # ze
            pl.BlockSpec((1, bb, H4), dec, memory_space=pltpu.VMEM),     # zd
            pl.BlockSpec((1, bb, H), enc, memory_space=pltpu.VMEM),      # cpe
            pl.BlockSpec((1, bb, H), enc, memory_space=pltpu.VMEM),      # ce
            pl.BlockSpec((1, bb, H), dec, memory_space=pltpu.VMEM),      # cpd
            pl.BlockSpec((1, bb, H), dec, memory_space=pltpu.VMEM),      # cd
            pl.BlockSpec((1, bb, H), enc, memory_space=pltpu.VMEM),      # hpe
            pl.BlockSpec((1, bb, H), dec, memory_space=pltpu.VMEM),      # he (t_d)
            pl.BlockSpec((1, bb, H), dec, memory_space=pltpu.VMEM),      # hpd
            pl.BlockSpec((1, bb, LP), dec, memory_space=pltpu.VMEM),     # eps
            pl.BlockSpec((1, bb, 2 * LP), dec, memory_space=pltpu.VMEM), # zargs
            pl.BlockSpec((1, bb, INp), enc, memory_space=pltpu.VMEM),    # xe
            pl.BlockSpec((1, bb, INp), dec, memory_space=pltpu.VMEM),    # xd
            pl.BlockSpec((1, bb, H), dec, memory_space=pltpu.VMEM),      # dhd
            pl.BlockSpec((1, bb, 2 * LP), dec, memory_space=pltpu.VMEM), # dzargs
            pl.BlockSpec((H4, H), const2, memory_space=pltpu.VMEM),      # rket
            pl.BlockSpec((H4, H), const2, memory_space=pltpu.VMEM),      # rkdt
            pl.BlockSpec((H4, INp), const2, memory_space=pltpu.VMEM),    # wet
            pl.BlockSpec((H4, INp), const2, memory_space=pltpu.VMEM),    # wdxt
            pl.BlockSpec((H4, LP), const2, memory_space=pltpu.VMEM),     # kzt
            pl.BlockSpec((2 * LP, H), const2, memory_space=pltpu.VMEM),  # wzt
        ],
        out_specs=(
            pl.BlockSpec((1, bb, INp), enc, memory_space=pltpu.VMEM),    # dxe
            pl.BlockSpec((1, bb, INp), dec, memory_space=pltpu.VMEM),    # dxd
            pl.BlockSpec((bb, H), bconst, memory_space=pltpu.VMEM),      # dh0e
            pl.BlockSpec((bb, H), bconst, memory_space=pltpu.VMEM),      # dc0e
            pl.BlockSpec((bb, H), bconst, memory_space=pltpu.VMEM),      # dh0d
            pl.BlockSpec((bb, H), bconst, memory_space=pltpu.VMEM),      # dc0d
            pl.BlockSpec((H, H4), const2, memory_space=pltpu.VMEM),      # drke
            pl.BlockSpec((H, H4), const2, memory_space=pltpu.VMEM),      # drkd
            pl.BlockSpec((INp, H4), const2, memory_space=pltpu.VMEM),    # dwe
            pl.BlockSpec((INp, H4), const2, memory_space=pltpu.VMEM),    # dwdx
            pl.BlockSpec((LP, H4), const2, memory_space=pltpu.VMEM),     # dkz
            pl.BlockSpec((H, 2 * LP), const2, memory_space=pltpu.VMEM),  # dwz
            pl.BlockSpec((1, H4), const2, memory_space=pltpu.VMEM),      # dbe
            pl.BlockSpec((1, H4), const2, memory_space=pltpu.VMEM),      # dbd
            pl.BlockSpec((1, 2 * LP), const2, memory_space=pltpu.VMEM),  # dbz
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, INp), sd),
            jax.ShapeDtypeStruct((T, B, INp), sd),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
            jax.ShapeDtypeStruct((INp, H4), jnp.float32),
            jax.ShapeDtypeStruct((INp, H4), jnp.float32),
            jax.ShapeDtypeStruct((LP, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, 2 * LP), jnp.float32),
            jax.ShapeDtypeStruct((1, H4), jnp.float32),
            jax.ShapeDtypeStruct((1, H4), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * LP), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_two_cell_compiler_params(),
    )
    return kernel(ze, zd, cpe, ce, cpd, cd, hpe, he, hpd, eps, zargs, xe, xd,
                  dhd, dzargs, rket, rkdt, wet, wdxt, kzt, wzt)


# ----------------------------------------------------------- custom_vjp core


@jax.custom_vjp
def _two_cell_core(xe, xd, eps, we, be, rke, wdx, bd, rkd, kz, wz, bz,
                   h0e, c0e, h0d, c0d):
    out = _fwd_call(xe, xd, eps, we, be, rke, wdx, bd, rkd, kz, wz, bz,
                    h0e, c0e, h0d, c0d)
    return out[0], out[1]  # hd_seq, zargs_seq


def _core_fwd(xe, xd, eps, we, be, rke, wdx, bd, rkd, kz, wz, bz,
              h0e, c0e, h0d, c0d):
    (hd, zargs, ze, zd, hpe, cpe, ce, he, hpd, cpd, cd) = _fwd_call(
        xe, xd, eps, we, be, rke, wdx, bd, rkd, kz, wz, bz,
        h0e, c0e, h0d, c0d)
    res = (ze, zd, cpe, ce, cpd, cd, hpe, he, hpd, eps, zargs, xe, xd,
           we, rke, wdx, rkd, kz, wz)
    return (hd, zargs), res


def _core_bwd(res, grads):
    (ze, zd, cpe, ce, cpd, cd, hpe, he, hpd, eps, zargs, xe, xd,
     we, rke, wdx, rkd, kz, wz) = res
    dhd, dzargs = grads
    wt = rke.dtype
    (dxe, dxd, dh0e, dc0e, dh0d, dc0d, drke, drkd, dwe, dwdx, dkz,
     dwz, dbe, dbd, dbz) = _bwd_call(
        ze, zd, cpe, ce, cpd, cd, hpe, he, hpd, eps, zargs, xe, xd,
        dhd, dzargs,
        rke.T.astype(wt), rkd.T.astype(wt), we.T.astype(wt),
        wdx.T.astype(wt), kz.T.astype(wt), wz.T.astype(wt))
    return (dxe, dxd, jnp.zeros_like(eps), dwe.astype(wt), dbe,
            drke.astype(wt), dwdx.astype(wt), dbd, drkd.astype(wt),
            dkz.astype(wt), dwz.astype(wt), dbz, dh0e, dc0e, dh0d, dc0d)


_two_cell_core.defvjp(_core_fwd, _core_bwd)


# ----------------------------------------------------------------- entry


def two_cell_sequence(params, cfg, x, x_prev, W, eps, compute_dtype=None):
    """Fused encoder→z→decoder core over a window batch.

    Drop-in for the encode_z_sequence + sample + decode_sequence composition
    (and the XLA `_apply_fused` scan) at ``dropout == 0``: returns
    ``(h_d_seq [B,T,H], Z_mean [B,T,L], Z_log_var [B,T,L], Z [B,T,L])``.
    The X head stays outside (one wide MXU matmul).

    Weight packing/concat/padding happens here, outside the custom_vjp, so
    autodiff routes the parameter cotangents back through it for free.
    """
    B, T, D = x.shape
    H = cfg.intermediate_dim
    L = cfg.latent_dim
    K = cfg.n_classes
    assert L <= LP, (L, LP)
    sd = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
    f32 = jnp.float32

    enc = params["encoder_h"]
    dec = params["decoder_h"]
    w_rep = jnp.broadcast_to(W[:, None, :], (B, T, K))
    xe = jnp.concatenate([x, w_rep], axis=-1)
    n_xp = D if cfg.use_x_prev else 0
    if cfg.use_x_prev:
        xdc = jnp.concatenate([x_prev, w_rep], axis=-1)
        wdx = jnp.concatenate([dec["kernel"][:n_xp], dec["kernel"][n_xp + L:]], axis=0)
    else:
        xdc = w_rep
        wdx = dec["kernel"][n_xp + L:]
    kz = dec["kernel"][n_xp: n_xp + L]

    INp = -(-max(xe.shape[-1], xdc.shape[-1]) // 128) * 128
    padw = lambda m: jnp.pad(m.astype(sd), ((0, INp - m.shape[0]), (0, 0)))
    padx = lambda a: jnp.pad(
        jnp.swapaxes(a, 0, 1).astype(sd), ((0, 0), (0, 0), (0, INp - a.shape[-1])))
    xe_t = padx(xe)
    xd_t = padx(xdc)
    we = padw(enc["kernel"])
    wdx = padw(wdx)
    kz_p = jnp.pad(kz.astype(sd), ((0, LP - L), (0, 0)))
    # packed z heads [H, 2*LP]: cols [0:L] = Z_mean kernel, [LP:LP+L] = Z_log_var
    zm_k, zv_k = params["Z_mean"], params["Z_log_var"]
    wz = jnp.concatenate([
        jnp.pad(zm_k["kernel"].astype(sd), ((0, 0), (0, LP - L))),
        jnp.pad(zv_k["kernel"].astype(sd), ((0, 0), (0, LP - L))),
    ], axis=-1)
    bz = jnp.concatenate([
        jnp.pad(zm_k["bias"].astype(f32), (0, LP - L)),
        jnp.pad(zv_k["bias"].astype(f32), (0, LP - L)),
    ]).reshape(1, -1)
    eps_t = jnp.pad(jnp.swapaxes(eps, 0, 1).astype(f32),
                    ((0, 0), (0, 0), (0, LP - L)))
    be = enc["bias"].astype(f32).reshape(1, -1)
    bd = dec["bias"].astype(f32).reshape(1, -1)
    rke = enc["recurrent_kernel"].astype(sd)
    rkd = dec["recurrent_kernel"].astype(sd)

    # pad B to the block multiple (same pad-to-divisible scheme as
    # lstm_sequence_pallas — zero rows are gradient-exact)
    bb = _budget_block_b(B, T, H, INp, jnp.dtype(sd).itemsize)
    Bp = -(-B // bb) * bb
    zeros = jnp.zeros((Bp, H), f32)
    if Bp != B:
        padb = lambda a: jnp.pad(a, ((0, 0), (0, Bp - B), (0, 0)))
        xe_t, xd_t, eps_t = padb(xe_t), padb(xd_t), padb(eps_t)

    hd, zargs = _two_cell_core(xe_t, xd_t, eps_t, we, be, rke, wdx, bd, rkd,
                               kz_p, wz, bz, zeros, zeros, zeros, zeros)
    hd = jnp.swapaxes(hd[:, :B], 0, 1)
    zargs = jnp.swapaxes(zargs[:, :B], 0, 1)
    zm = zargs[..., :L]
    zlv = zargs[..., LP:LP + L]
    z = zm + jnp.exp(zlv / 2) * eps
    return hd, zm, zlv, z
