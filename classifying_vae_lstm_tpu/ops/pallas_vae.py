"""Fused cl_vae dense-stack train kernel (whole forward + whole backward).

The scaled cl_vae optimizer step (seq-concat regime, reference
``cl_vae/train.py:21-30``: original_dim ~1000, hidden >= 1024, B >= 1024)
measured 25-30% of its FLOP roofline under XLA
(``artifacts/vae_scale_bench.json``) — the gap is materialized-activation
HBM traffic and scheduling between XLA's fusion islands, recorded in round 4
as known headroom. This module closes it the same way the LSTM train kernels
do: the ENTIRE dense stack of the graph (reference ``cl_vae/model.py:130-224``)
— key encoder, logistic-normal w sample, latent encoder, z sample, decoder,
frame head — runs per batch block inside ONE Pallas program per direction,
with every layer weight VMEM-resident and, in the backward, every weight
gradient accumulated in a resident f32 block (constant-index output maps).
Between the matmuls nothing touches HBM; the only streams are the model's
true inputs/outputs and three thin per-block activation residuals.

Structure mirrors ``pallas_two_cell`` (simpler: no recurrence, grid is just
the batch blocks):

* grid = (nb,); weights use constant index maps so Mosaic keeps them (and
  the f32 grad accumulators) resident across blocks;
* all lane dims are padded to 128 (sub-128-lane matmuls scalarize —
  CLAUDE.md): the K-1-wide w heads and L-wide z heads pack into [.., 2*LP]
  matmuls whose mean/log_var halves sit at columns [0:LP) / [LP:2*LP);
  padded head columns are exactly zero (zero kernel columns + zero bias), so
  padded w_norm/z lanes come out 0 + exp(0)*0 = 0;
* the logistic-normal softmax runs over masked lanes: the padded column K-1
  of w_norm is the construction's appended zero logit
  (``nn/distributions.sample_logistic_normal``), lanes > K-1 get -inf;
* the backward recomputes z and the exp() factors from the streamed
  wargs/zargs residuals; relu masks come from the streamed post-activations
  (a > 0 ⟺ pre > 0 with the same zero-at-kink convention as autodiff);
* weight packing / splitting / padding happens OUTSIDE the custom_vjp
  (``vae_core``), so JAX autodiff routes parameter cotangents back through
  it for free, and the loss (Keras clip/reduction semantics, ``nn/losses``)
  stays in XLA on the kernel's [B, D]-and-smaller outputs.

MEASURED OUTCOME (v5e, round 5 — ``artifacts/vae_train_kernel_exp.json``,
``tools/exp_vae_train.py``, host-fetch-scalar sync): the fused kernel LOSES
to the XLA step at every probed scale — 0.848x at D976/H2048/B4096 (the
FLOP-bound config), 0.913x at H1024/B4096, 0.642x at H2048/B1024 (both
bandwidth-bound). Both backends sit at 20-31% of their rooflines; the
hand-written kernel does not recover the round-4 headroom because the
binding cost is streaming the [B, 976-padded-1024] frames and their
cotangents through VMEM, which the kernel pays exactly as XLA does, while
giving up XLA's cross-step overlap of that traffic with MXU work. Grad
parity vs XLA holds at <=1.7e-2 rel dev (bf16 accum noise; exact-f32 parity
is covered by tests/test_pallas_vae.py and the on-TPU verify rows).

Hence :func:`should_use`'s ``auto`` DECLINES the kernel everywhere and the
default stays XLA; ``--train_backend pallas`` keeps the kernel reachable as
the committed, verified evidence behind that design call (cited by
docs/KERNELS.md and PARITY.md, closing round-4 weak #5 / next #6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lstm import _interpret

LP = 128  # lane-padded latent/class width (K <= LP, L <= LP)


def _rup(n: int, m: int = 128) -> int:
    return -(-n // m) * m


def _sizes(Dp, Cwp, Hp, use_xp, sbytes):
    """(resident_bytes, per_row_stream_bytes) for the BACKWARD — the fat
    invocation (forward residency is a strict subset)."""
    nxp = Dp if use_xp else 0
    w_elems = (Dp * Cwp + Cwp * 2 * LP + Dp * Hp + LP * Hp + Hp * 2 * LP
               + LP * Hp + nxp * Hp + Hp * Dp)
    resident = w_elems * sbytes * 2 + w_elems * 4  # weights + transposed + f32 accum
    per_row = (
        (2 * Dp + Cwp + 2 * Hp) * sbytes      # x, x_prev, a1, a2, a3
        + (Dp + 3 * 2 * LP + LP + Dp) * 4     # xhat, wargs/zargs(+cots), w, dxhat
        + (2 * Dp) * sbytes                   # dx, dxp out
    )
    return resident, per_row


def _budget_block_b(B, Dp, Cwp, Hp, use_xp, sbytes):
    """Widest batch block (cap 512) whose backward fits the VMEM budget."""
    resident, per_row = _sizes(Dp, Cwp, Hp, use_xp, sbytes)
    budget = 100 * 1024 * 1024
    for bb in (512, 256, 128, 64, 32, 16, 8):
        if bb <= B and resident + 2 * bb * per_row < budget:
            return bb
    return 8


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)


def fits(cfg) -> bool:
    """Structural preconditions (independent of the win-region policy)."""
    resident, _ = _sizes(_rup(cfg.original_dim), _rup(cfg.intermediate_class_dim),
                         _rup(cfg.intermediate_dim), cfg.use_x_prev,
                         2 if cfg.bf16_compute else 4)
    return (
        cfg.has_hidden
        and 2 <= cfg.n_classes <= LP
        and cfg.latent_dim <= LP
        and resident + 16 * 1024 * 1024 < 100 * 1024 * 1024
    )


def should_use(cfg, train_backend=None) -> bool:
    """Train-path dispatch: 'pallas' = fused kernel (must :func:`fits`),
    'auto' = the measured win region — which is EMPTY: the v5e sweep
    (artifacts/vae_train_kernel_exp.json) has the kernel at 0.642-0.913x
    the XLA step at every probed scale, so 'auto' always resolves to XLA.
    'xla' (the default) = never. Explicit 'pallas' stays honored as the
    committed evidence path behind the design call (module docstring)."""
    if train_backend is None:
        train_backend = getattr(cfg, "train_backend", "xla")
    if train_backend == "pallas":
        return fits(cfg)
    return False


# ---------------------------------------------------------------- forward


def _fwd_kernel(K, use_xp, x_ref, xp_ref, epsw_ref, epsz_ref,
                whw_ref, bhw_ref, wwz_ref, bwz_ref,
                whx_ref, whw2_ref, bh_ref, wzz_ref, bzz_ref,
                wdw_ref, wdxp_ref, wdz_ref, bd_ref, wxh_ref, bxh_ref,
                xhat_ref, wargs_ref, zargs_ref, w_ref,
                a1_ref, a2_ref, a3_ref):
    f32 = jnp.float32
    wt = whw_ref.dtype
    prec = "highest" if wt == f32 else None
    mm = lambda a, b: jnp.dot(a.astype(wt), b, preferred_element_type=f32,
                              precision=prec)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LP), 1)

    # key encoder + logistic-normal w sample (cl_vae/model.py:140-156)
    a1 = jnp.maximum(mm(x_ref[:], whw_ref[:]) + bhw_ref[:].astype(f32), 0.0)
    wargs = mm(a1, wwz_ref[:]) + bwz_ref[:].astype(f32)
    w_norm = wargs[:, :LP] + jnp.exp(wargs[:, LP:] / 2) * epsw_ref[:].astype(f32)
    # lane K-1 of the padded w_norm is exactly 0 — the appended zero logit
    logits = jnp.where(lane <= K - 1, w_norm, -jnp.inf)
    e = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    w = e / jnp.sum(e, axis=-1, keepdims=True)

    # latent encoder + z sample (cl_vae/model.py:158-173)
    a2 = jnp.maximum(mm(x_ref[:], whx_ref[:]) + mm(w, whw2_ref[:])
                     + bh_ref[:].astype(f32), 0.0)
    zargs = mm(a2, wzz_ref[:]) + bzz_ref[:].astype(f32)
    z = zargs[:, :LP] + jnp.exp(zargs[:, LP:] / 2) * epsz_ref[:].astype(f32)

    # decoder + frame head (cl_vae/model.py:175-188)
    d_pre = mm(w, wdw_ref[:]) + mm(z, wdz_ref[:]) + bd_ref[:].astype(f32)
    if use_xp:
        d_pre = d_pre + mm(xp_ref[:], wdxp_ref[:])
    a3 = jnp.maximum(d_pre, 0.0)
    xhat_ref[:] = jax.nn.sigmoid(mm(a3, wxh_ref[:]) + bxh_ref[:].astype(f32))
    wargs_ref[:] = wargs
    zargs_ref[:] = zargs
    w_ref[:] = w
    a1_ref[:] = a1.astype(a1_ref.dtype)
    a2_ref[:] = a2.astype(a2_ref.dtype)
    a3_ref[:] = a3.astype(a3_ref.dtype)


def _fwd_call(K, use_xp, x, xp, epsw, epsz, *weights):
    B, Dp = x.shape
    sd = x.dtype
    (whw, bhw, wwz, bwz, whx, whw2, bh, wzz, bzz,
     wdw, wdxp, wdz, bd, wxh, bxh) = weights
    Cwp = whw.shape[1]
    Hp = whx.shape[1]
    bb = _budget_block_b(B, Dp, Cwp, Hp, use_xp, jnp.dtype(sd).itemsize)
    assert B % bb == 0, (B, bb)
    nb = B // bb

    row = lambda b: (b, 0)
    const = lambda b: (0, 0)
    vspec = lambda shape, ix: pl.BlockSpec(shape, ix, memory_space=pltpu.VMEM)

    in_specs = [
        vspec((bb, Dp), row), vspec((bb, Dp), row),
        vspec((bb, LP), row), vspec((bb, LP), row),
        vspec(whw.shape, const), vspec(bhw.shape, const),
        vspec(wwz.shape, const), vspec(bwz.shape, const),
        vspec(whx.shape, const), vspec(whw2.shape, const), vspec(bh.shape, const),
        vspec(wzz.shape, const), vspec(bzz.shape, const),
        vspec(wdw.shape, const), vspec(wdxp.shape, const), vspec(wdz.shape, const),
        vspec(bd.shape, const), vspec(wxh.shape, const), vspec(bxh.shape, const),
    ]
    out_specs = (
        vspec((bb, Dp), row), vspec((bb, 2 * LP), row), vspec((bb, 2 * LP), row),
        vspec((bb, LP), row),
        vspec((bb, Cwp), row), vspec((bb, Hp), row), vspec((bb, Hp), row),
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, Dp), jnp.float32),
        jax.ShapeDtypeStruct((B, 2 * LP), jnp.float32),
        jax.ShapeDtypeStruct((B, 2 * LP), jnp.float32),
        jax.ShapeDtypeStruct((B, LP), jnp.float32),
        jax.ShapeDtypeStruct((B, Cwp), sd),
        jax.ShapeDtypeStruct((B, Hp), sd),
        jax.ShapeDtypeStruct((B, Hp), sd),
    )
    kernel = pl.pallas_call(
        functools.partial(_fwd_kernel, K, use_xp),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )
    return kernel(x, xp, epsw, epsz, *weights)



# ---------------------------------------------------------------- backward


def _bwd_kernel(K, use_xp,
                x_ref, xp_ref, epsw_ref, epsz_ref,
                a1_ref, a2_ref, a3_ref, xhat_ref, wargs_ref, zargs_ref, w_ref,
                dxhat_ref, dwargs_ref, dzargs_ref, dw_ref,
                whwT_ref, wwzT_ref, whxT_ref, whw2T_ref, wzzT_ref,
                wdwT_ref, wdxpT_ref, wdzT_ref, wxhT_ref,
                dx_ref, dxp_ref,
                dwhw_ref, dbhw_ref, dwwz_ref, dbwz_ref,
                dwhx_ref, dwhw2_ref, dbh_ref, dwzz_ref, dbzz_ref,
                dwdw_ref, dwdxp_ref, dwdz_ref, dbd_ref, dwxh_ref, dbxh_ref):
    f32 = jnp.float32
    wt = whwT_ref.dtype
    prec = "highest" if wt == f32 else None
    mm = lambda a, b: jnp.dot(a.astype(wt), b, preferred_element_type=f32,
                              precision=prec)
    acc = lambda a, b: jax.lax.dot_general(
        a.astype(wt), b.astype(wt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)
    colsum = lambda m: jnp.sum(m, axis=0, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LP), 1)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for r in (dwhw_ref, dbhw_ref, dwwz_ref, dbwz_ref, dwhx_ref, dwhw2_ref,
                  dbh_ref, dwzz_ref, dbzz_ref, dwdw_ref, dwdxp_ref, dwdz_ref,
                  dbd_ref, dwxh_ref, dbxh_ref):
            r[:] = jnp.zeros_like(r)

    xhat = xhat_ref[:]
    a3 = a3_ref[:].astype(f32)
    # frame head: sigmoid backward (padded cols: dxhat is zero there)
    dxh_pre = dxhat_ref[:] * xhat * (1.0 - xhat)
    dwxh_ref[:] += acc(a3, dxh_pre)
    dbxh_ref[:] += colsum(dxh_pre)
    dd_pre = mm(dxh_pre, wxhT_ref[:]) * (a3 > 0)

    # decoder: z recomputed from the zargs residual (never streamed)
    zargs = zargs_ref[:]
    sig_z = jnp.exp(zargs[:, LP:] / 2)
    eps_z = epsz_ref[:].astype(f32)
    z = zargs[:, :LP] + sig_z * eps_z
    w = w_ref[:]
    dwdw_ref[:] += acc(w, dd_pre)
    dwdz_ref[:] += acc(z, dd_pre)
    dbd_ref[:] += colsum(dd_pre)
    if use_xp:
        dwdxp_ref[:] += acc(xp_ref[:], dd_pre)
        dxp_ref[:] = mm(dd_pre, wdxpT_ref[:]).astype(dxp_ref.dtype)
    else:
        dxp_ref[:] = jnp.zeros_like(dxp_ref)
    dw_tot = dw_ref[:] + mm(dd_pre, wdwT_ref[:])
    dz = mm(dd_pre, wdzT_ref[:])

    # z sample + z heads backward
    dzargs_in = dzargs_ref[:]
    dzargs = jnp.concatenate(
        [dz + dzargs_in[:, :LP],
         dz * eps_z * sig_z * 0.5 + dzargs_in[:, LP:]], axis=-1)
    a2 = a2_ref[:].astype(f32)
    dwzz_ref[:] += acc(a2, dzargs)
    dbzz_ref[:] += colsum(dzargs)
    dh_pre = mm(dzargs, wzzT_ref[:]) * (a2 > 0)

    # latent encoder backward
    dwhx_ref[:] += acc(x_ref[:], dh_pre)
    dwhw2_ref[:] += acc(w, dh_pre)
    dbh_ref[:] += colsum(dh_pre)
    dx = mm(dh_pre, whxT_ref[:])
    dw_tot = dw_tot + mm(dh_pre, whw2T_ref[:])

    # logistic-normal sample backward: softmax vjp, drop the pinned zero
    # logit (lane K-1) and the padded lanes
    dlogits = w * (dw_tot - jnp.sum(dw_tot * w, axis=-1, keepdims=True))
    dw_norm = jnp.where(lane < K - 1, dlogits, 0.0)
    wargs = wargs_ref[:]
    sig_w = jnp.exp(wargs[:, LP:] / 2)
    eps_w = epsw_ref[:].astype(f32)
    dwargs_in = dwargs_ref[:]
    dwargs = jnp.concatenate(
        [dw_norm + dwargs_in[:, :LP],
         dw_norm * eps_w * sig_w * 0.5 + dwargs_in[:, LP:]], axis=-1)

    # w heads + key encoder backward
    a1 = a1_ref[:].astype(f32)
    dwwz_ref[:] += acc(a1, dwargs)
    dbwz_ref[:] += colsum(dwargs)
    dhw_pre = mm(dwargs, wwzT_ref[:]) * (a1 > 0)
    dwhw_ref[:] += acc(x_ref[:], dhw_pre)
    dbhw_ref[:] += colsum(dhw_pre)
    dx_ref[:] = (dx + mm(dhw_pre, whwT_ref[:])).astype(dx_ref.dtype)


def _bwd_call(K, use_xp, x, xp, epsw, epsz, a1, a2, a3, xhat, wargs, zargs, w,
              dxhat, dwargs, dzargs, dw, *wT):
    B, Dp = x.shape
    sd = x.dtype
    Cwp = a1.shape[1]
    Hp = a2.shape[1]
    bb = _budget_block_b(B, Dp, Cwp, Hp, use_xp, jnp.dtype(sd).itemsize)
    assert B % bb == 0, (B, bb)
    nb = B // bb
    (whwT, wwzT, whxT, whw2T, wzzT, wdwT, wdxpT, wdzT, wxhT) = wT

    row = lambda b: (b, 0)
    const = lambda b: (0, 0)
    vspec = lambda shape, ix: pl.BlockSpec(shape, ix, memory_space=pltpu.VMEM)

    in_specs = (
        [vspec((bb, Dp), row), vspec((bb, Dp), row),
         vspec((bb, LP), row), vspec((bb, LP), row),
         vspec((bb, Cwp), row), vspec((bb, Hp), row), vspec((bb, Hp), row),
         vspec((bb, Dp), row), vspec((bb, 2 * LP), row),
         vspec((bb, 2 * LP), row), vspec((bb, LP), row),
         vspec((bb, Dp), row), vspec((bb, 2 * LP), row),
         vspec((bb, 2 * LP), row), vspec((bb, LP), row)]
        + [vspec(m.shape, const) for m in wT]
    )
    out_specs = (
        [vspec((bb, Dp), row), vspec((bb, Dp), row)]
        + [vspec(s, const) for s in [
            (Dp, Cwp), (1, Cwp), (Cwp, 2 * LP), (1, 2 * LP),
            (Dp, Hp), (LP, Hp), (1, Hp), (Hp, 2 * LP), (1, 2 * LP),
            (LP, Hp), (Dp, Hp), (LP, Hp), (1, Hp), (Hp, Dp), (1, Dp)]]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((B, Dp), sd), jax.ShapeDtypeStruct((B, Dp), sd)]
        + [jax.ShapeDtypeStruct(s.block_shape, jnp.float32) for s in out_specs[2:]]
    )
    kernel = pl.pallas_call(
        functools.partial(_bwd_kernel, K, use_xp),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )
    return kernel(x, xp, epsw, epsz, a1, a2, a3, xhat, wargs, zargs, w,
                  dxhat, dwargs, dzargs, dw, *wT)


# ----------------------------------------------------------- custom_vjp core


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _vae_core(K, use_xp, x, xp, epsw, epsz, *weights):
    out = _fwd_call(K, use_xp, x, xp, epsw, epsz, *weights)
    return out[0], out[1], out[2], out[3]  # xhat, wargs, zargs, w


def _core_fwd(K, use_xp, x, xp, epsw, epsz, *weights):
    xhat, wargs, zargs, w, a1, a2, a3 = _fwd_call(
        K, use_xp, x, xp, epsw, epsz, *weights)
    (whw, bhw, wwz, bwz, whx, whw2, bh, wzz, bzz,
     wdw, wdxp, wdz, bd, wxh, bxh) = weights
    res = (x, xp, epsw, epsz, a1, a2, a3, xhat, wargs, zargs, w,
           whw, wwz, whx, whw2, wzz, wdw, wdxp, wdz, wxh)
    return (xhat, wargs, zargs, w), res


def _core_bwd(K, use_xp, res, grads):
    (x, xp, epsw, epsz, a1, a2, a3, xhat, wargs, zargs, w,
     whw, wwz, whx, whw2, wzz, wdw, wdxp, wdz, wxh) = res
    dxhat, dwargs, dzargs, dw = grads
    wt = whw.dtype
    tT = lambda m: m.T.astype(wt)
    (dx, dxp, dwhw, dbhw, dwwz, dbwz, dwhx, dwhw2, dbh, dwzz, dbzz,
     dwdw, dwdxp, dwdz, dbd, dwxh, dbxh) = _bwd_call(
        K, use_xp, x, xp, epsw, epsz, a1, a2, a3, xhat, wargs, zargs, w,
        dxhat, dwargs, dzargs, dw,
        tT(whw), tT(wwz), tT(whx), tT(whw2), tT(wzz),
        tT(wdw), tT(wdxp), tT(wdz), tT(wxh))
    c = lambda g: g.astype(wt)
    return (dx, dxp, jnp.zeros_like(epsw), jnp.zeros_like(epsz),
            c(dwhw), dbhw, c(dwwz), dbwz, c(dwhx), c(dwhw2), dbh,
            c(dwzz), dbzz, c(dwdw), c(dwdxp), c(dwdz), dbd, c(dwxh), dbxh)


_vae_core.defvjp(_core_fwd, _core_bwd)


# ----------------------------------------------------------------- entry


def vae_apply_core(params, cfg, x, x_prev, eps_w, eps_z, compute_dtype=None):
    """Fused forward of the whole cl_vae graph over a batch [B, D].

    Drop-in for the ``encode_w`` → logistic-normal sample → ``encode_z`` →
    Gaussian sample → ``decode`` composition at ``cfg.has_hidden`` (noise
    passed explicitly). Returns the same named tensors as
    :func:`models.cl_vae.apply`. Weight packing/padding happens here, outside
    the custom_vjp, so parameter cotangents route back through it for free.
    """
    B, D = x.shape
    K = cfg.n_classes
    L = cfg.latent_dim
    H = cfg.intermediate_dim
    Cw = cfg.intermediate_class_dim
    assert K <= LP and L <= LP and cfg.has_hidden
    sd = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
    f32 = jnp.float32
    Dp, Cwp, Hp = _rup(D), _rup(Cw), _rup(H)

    padm = lambda m, r, c: jnp.pad(m.astype(sd),
                                   ((0, r - m.shape[0]), (0, c - m.shape[1])))
    padb = lambda v, c: jnp.pad(v.astype(f32), (0, c - v.shape[0])).reshape(1, -1)
    padx = lambda a: jnp.pad(a.astype(sd), ((0, 0), (0, Dp - a.shape[-1])))
    pade = lambda a: jnp.pad(a.astype(f32), ((0, 0), (0, LP - a.shape[-1])))

    packheads = lambda m_k, v_k, rows, cols: (
        jnp.concatenate([padm(m_k["kernel"], rows, cols),
                         padm(v_k["kernel"], rows, cols)], axis=-1),
        jnp.concatenate([padb(m_k["bias"], cols), padb(v_k["bias"], cols)],
                        axis=-1))

    wwz, bwz = packheads(params["w_mean"], params["w_log_var"], Cwp, LP)
    wzz, bzz = packheads(params["z_mean"], params["z_log_var"], Hp, LP)

    hk = params["h"]["kernel"]
    whx = padm(hk[:D], Dp, Hp)
    whw2 = padm(hk[D:], LP, Hp)
    dk = params["decoder_h"]["kernel"]
    n_xp = D if cfg.use_x_prev else 0
    wdw = padm(dk[:K], LP, Hp)
    if cfg.use_x_prev:
        wdxp = padm(dk[K:K + D], Dp, Hp)
    else:
        wdxp = jnp.zeros((Dp, Hp), sd)
    wdz = padm(dk[K + n_xp:], LP, Hp)

    weights = (
        padm(params["h_w"]["kernel"], Dp, Cwp), padb(params["h_w"]["bias"], Cwp),
        wwz, bwz, whx, whw2, padb(params["h"]["bias"], Hp), wzz, bzz,
        wdw, wdxp, wdz, padb(params["decoder_h"]["bias"], Hp),
        padm(params["x_decoded_mean"]["kernel"], Hp, Dp),
        padb(params["x_decoded_mean"]["bias"], Dp),
    )
    x_t = padx(x)
    xp_t = padx(x_prev) if cfg.use_x_prev else jnp.zeros_like(x_t)
    epsw_t = pade(eps_w)
    epsz_t = pade(eps_z)

    bb = _budget_block_b(B, Dp, Cwp, Hp, cfg.use_x_prev,
                                     jnp.dtype(sd).itemsize)
    Bp = -(-B // bb) * bb
    if Bp != B:
        padr = lambda a: jnp.pad(a, ((0, Bp - B), (0, 0)))
        x_t, xp_t, epsw_t, epsz_t = (padr(x_t), padr(xp_t),
                                     padr(epsw_t), padr(epsz_t))

    xhat, wargs, zargs, w = _vae_core(K, cfg.use_x_prev, x_t, xp_t,
                                      epsw_t, epsz_t, *weights)
    sl = lambda a, n: a[:B, :n]
    w_mean, w_log_var = sl(wargs, K - 1), sl(wargs[:, LP:], K - 1)
    z_mean, z_log_var = sl(zargs, L), sl(zargs[:, LP:], L)
    z = z_mean + jnp.exp(z_log_var / 2) * eps_z
    return {
        "x_decoded_mean": sl(xhat, D),
        "w": sl(w, K),
        "w_mean": w_mean,
        "w_log_var": w_log_var,
        "z": z,
        "z_mean": z_mean,
        "z_log_var": z_log_var,
    }
