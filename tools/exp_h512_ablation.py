"""Empirical time-budget decomposition of the fused train kernels at H512.

VERDICT r3 weak-#1: H512/B1024 training runs at ~25-30% MFU against a
FLOP-bound roofline and the breakdown labels the binding
"recurrence-latency" — an explanation that needs numbers behind it. Round-3
already established that neither wider batch blocks (bb 512 ~= 256,
vmem_budget_sweep.json) nor time-blocking (bt=2 loses at these shapes)
move it, so before building new kernels this tool measures WHERE the time
actually goes, with standalone microkernels that isolate one hardware unit
each (same (bb, T) grid and VMEM residency as the real kernels):

  chain_mm    T dependent [bb, H] @ [H, 4H] matmuls (h feeds the next step)
              -> the serial MXU chain, including per-step issue latency
  chain_mm_x2 the same chain with TWO independent interleaved [bb/2] halves
              -> how much of chain_mm is hideable latency (the ilv headroom)
  gates_fwd   the forward gate math alone (VPU; z read from a VMEM scratch)
  gates_bwd   the backward gate-grad math alone (VPU, ~25 passes)
  offchain_mm the drk/dw accumulation matmuls alone (independent per step,
              constant-index accumulators — the MXU work OFF the chain)

plus the real kernels, timed separately through the custom_vjp:

  fwd         the fused-projection training forward (scanned, chained)
  fwdbwd      value_and_grad through both kernels (the shipping grad step)

The analysis (printed + artifact): serial-sum = what a no-overlap execution
of the parts costs; overlap-floor = max(MXU-busy, VPU-busy) + chain latency;
measured fwdbwd against both says whether a smarter issue order (bt=1
half-block interleave) can win and by how much, or whether the serial chain
already lower-bounds the step at this width.

Protocol: CLAUDE.md kernel timing — K chained steps inside one jitted scan,
best-of-3 on the whole scan, quiet host, same-process A/Bs only.

Usage: python tools/exp_h512_ablation.py   (real TPU, ~10 min)
Writes artifacts/h512_ablation.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 16
K_SCAN = 30
PEAK = 197e12
PEAK_VPU = 3.85e12


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20)


def _sync(out) -> float:
    """Host-fetch one scalar: the only completion sync the remote backend
    honors (block_until_ready has returned before execution — first seen in
    bench_vae_scale round 4; in round 5 it let a chain_mm_x2_fullwidth H1024
    row read 232 TF/s, 18% ABOVE the chip's bf16 peak)."""
    return float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))


def _time_scan(make_jitted, carry, *args, k=None):
    """Per-call device seconds by TWO-LENGTH DIFFERENCING: time a K-call scan
    and a 3K-call scan (same body), report (t_3K - t_K) / 2K. The constant
    per-region overhead — host dispatch + the ~27 ms tunnel RTT the
    host-fetch sync pays — cancels exactly; a single synced region of ~30 ms
    would otherwise carry up to ~90% overhead. ``make_jitted(length)`` must
    return a jitted fn scanning ``length`` chained calls."""
    k = k or K_SCAN
    j1, j3 = make_jitted(k), make_jitted(3 * k)
    for attempt in range(3):
        try:
            out = j3(carry, *args)
            _sync(out)  # compile long
            break
        except Exception as e:  # transient tunnel drop on big remote compiles
            if attempt == 2:
                raise
            print(f"  compile retry ({type(e).__name__})", flush=True)
            time.sleep(30)
    out = j1(carry, *args)
    _sync(out)  # compile short
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o1 = j1(out, *args)
        _sync(o1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        o3 = j3(out, *args)
        _sync(o3)
        t3 = time.perf_counter() - t0
        best = min(best, (t3 - t1) / (2 * k))
        out = o1
    return best, out


# ---------------------------------------------------------------- microkernels


def _chain_mm_kernel(h0_ref, rk_ref, out_ref, h_scr):
    """T dependent matmuls: h <- (h @ rk)[:, :H] * 0.02 (bounded)."""
    H = h0_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[:] = h0_ref[:]

    def step(t, _):
        z = jnp.dot(h_scr[:].astype(rk_ref.dtype), rk_ref[:],
                    preferred_element_type=jnp.float32)
        h_scr[:] = z[:, :H] * 0.02
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    out_ref[:] = h_scr[:]


def _chain_mm_x2_kernel(h0_ref, rk_ref, out_ref, h_scr):
    """Two INDEPENDENT half-block chains, issue-interleaved: B's matmul can
    overlap the (tiny) post-processing of A and hides half the issue latency
    if the MXU pipelines back-to-back independent matmuls."""
    H = h0_ref.shape[-1]
    hb = h0_ref.shape[0] // 2

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[:] = h0_ref[:]

    def step(t, _):
        zA = jnp.dot(h_scr[:hb].astype(rk_ref.dtype), rk_ref[:],
                     preferred_element_type=jnp.float32)
        zB = jnp.dot(h_scr[hb:].astype(rk_ref.dtype), rk_ref[:],
                     preferred_element_type=jnp.float32)
        h_scr[:hb] = zA[:, :H] * 0.02
        h_scr[hb:] = zB[:, :H] * 0.02
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    out_ref[:] = h_scr[:]


def _chain_mm_x2_full_kernel(h0_ref, g0_ref, rkA_ref, rkB_ref,
                             outA_ref, outB_ref, hA_scr, hB_scr):
    """TWO independent FULL-WIDTH chains (2x the FLOPs of chain_mm), each with
    its own resident weight — the round-4 verdict's missing probe: the bb/2
    interleave manufactured independence by halving the block width (which
    starves the MXU); this one models the real two-cell (encoder || decoder)
    kernel where BOTH chains issue [bb, H] @ [H, 4H] at full width. Perfect
    pipelining would run both in ~chain_mm's time (the chain is latency-bound,
    the MXU idle between dependent steps); no pipelining costs 2x."""
    H = h0_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        hA_scr[:] = h0_ref[:]
        hB_scr[:] = g0_ref[:]

    def step(t, _):
        zA = jnp.dot(hA_scr[:].astype(rkA_ref.dtype), rkA_ref[:],
                     preferred_element_type=jnp.float32)
        zB = jnp.dot(hB_scr[:].astype(rkB_ref.dtype), rkB_ref[:],
                     preferred_element_type=jnp.float32)
        hA_scr[:] = zA[:, :H] * 0.02
        hB_scr[:] = zB[:, :H] * 0.02
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    outA_ref[:] = hA_scr[:]
    outB_ref[:] = hB_scr[:]


def _chain_mm_encdec_kernel(h0_ref, g0_ref, rkA_ref, rkB_ref,
                            outA_ref, outB_ref, hA_scr, hB_scr):
    """The same two full-width chains with the REAL two-cell coupling: chain
    B's step t consumes chain A's step-t output (dec[t] needs z_t from
    enc[t]). A[t+1] and B[t] are mutually independent, so a pipelining
    compiler can still overlap them — this measures whether Mosaic/the MXU
    actually does when the issue order is the natural program order."""
    H = h0_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        hA_scr[:] = h0_ref[:]
        hB_scr[:] = g0_ref[:]

    def step(t, _):
        zA = jnp.dot(hA_scr[:].astype(rkA_ref.dtype), rkA_ref[:],
                     preferred_element_type=jnp.float32)
        hA = zA[:, :H] * 0.02
        zB = jnp.dot((hB_scr[:] + 0.001 * hA).astype(rkB_ref.dtype), rkB_ref[:],
                     preferred_element_type=jnp.float32)
        hA_scr[:] = hA
        hB_scr[:] = zB[:, :H] * 0.02
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    outA_ref[:] = hA_scr[:]
    outB_ref[:] = hB_scr[:]


def _gates_fwd_kernel(z0_ref, out_ref, c_scr):
    """The forward gate math alone, T times, on a VMEM-resident z."""
    H = c_scr.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        c_scr[:] = jnp.zeros_like(c_scr)

    def step(t, _):
        z = z0_ref[:].astype(jnp.float32) + c_scr[:, :1]  # depend on carry
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H:2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H:] + 0.5, 0.0, 1.0)
        c = f * c_scr[:] + i * g
        c_scr[:] = o * jnp.tanh(c)
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    out_ref[:] = c_scr[:]


def _gates_bwd_kernel(z0_ref, out_ref, d_scr):
    """The backward gate-grad math alone (the VPU passes of the real bwd
    kernel: sigmoid/tanh derivatives, the dc chain, the dz pack)."""
    H = d_scr.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        d_scr[:] = jnp.ones_like(d_scr) * 0.1

    def step(t, _):
        z = z0_ref[:].astype(jnp.float32)
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H:2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H:] + 0.5, 0.0, 1.0)
        dh = d_scr[:]
        c = f * 0.5 + i * g
        tc = jnp.tanh(c)
        do = dh * tc
        dc = dh * o * (1.0 - tc * tc) + d_scr[:] * f
        di = dc * g
        dg = dc * i
        df = dc * 0.5
        mi = ((z[:, :H] > -2.5) & (z[:, :H] < 2.5)).astype(jnp.float32)
        mf = ((z[:, H:2 * H] > -2.5) & (z[:, H:2 * H] < 2.5)).astype(jnp.float32)
        mo = ((z[:, 3 * H:] > -2.5) & (z[:, 3 * H:] < 2.5)).astype(jnp.float32)
        dzi = 0.2 * di * mi
        dzf = 0.2 * df * mf
        dzg = dg * (1.0 - g * g)
        dzo = 0.2 * do * mo
        d_scr[:] = dzi + dzf + dzg + dzo  # fold so nothing is dead code
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    out_ref[:] = d_scr[:]


def _offchain_mm_kernel(hp_ref, dz_ref, xp_ref, drk_ref, dw_ref, d_scr):
    """The off-chain accumulation matmuls of the full bwd kernel (drk, dw),
    T times — independent per step, so the MXU can pipeline them fully."""

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        drk_ref[:] = jnp.zeros_like(drk_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        d_scr[:] = dz_ref[:].astype(jnp.float32)

    def step(t, _):
        dz = d_scr[:].astype(dz_ref.dtype)
        drk_ref[:] += jax.lax.dot_general(
            hp_ref[:], dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw_ref[:] += jax.lax.dot_general(
            xp_ref[:], dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, T, step, 0)


def run_micro(B, H, bb):
    sd = jnp.bfloat16
    H4 = 4 * H
    INp = 128
    nb = B // bb
    rows = {}

    def scan_pallas(call):
        def make(length):
            def many(c):
                def body(cc, _):
                    return call(cc), 0
                return jax.lax.scan(body, c, None, length=length)[0]
            return jax.jit(many)
        return make

    # chain_mm / chain_mm_x2
    for name, kern in [("chain_mm", _chain_mm_kernel),
                       ("chain_mm_x2", _chain_mm_x2_kernel)]:
        kernel = pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[pl.BlockSpec((bb, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((H, H4), lambda b: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bb, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
            compiler_params=_params(),
        )
        rk = jax.random.normal(jax.random.PRNGKey(1), (H, H4), sd) * 0.02
        h0 = jax.random.normal(jax.random.PRNGKey(0), (B, H))
        make = scan_pallas(lambda c, rk=rk, kernel=kernel: kernel(c, rk))
        sec, _ = _time_scan(make, h0)
        mm_flops = 2 * B * H * H4 * T
        rows[name] = {"us": round(sec * 1e6, 1),
                      "tflops": round(mm_flops / sec / 1e12, 2),
                      "us_per_block_step": round(sec * 1e6 / (T * nb), 3)}

    # full-width two-chain probes (round 5, VERDICT r4 next-#1): independent
    # pair + enc->dec coupled pair, each 2x chain_mm's FLOPs
    for name, kern in [("chain_mm_x2_fullwidth", _chain_mm_x2_full_kernel),
                       ("chain_mm_encdec", _chain_mm_encdec_kernel)]:
        kernel = pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[pl.BlockSpec((bb, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((bb, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((H, H4), lambda b: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((H, H4), lambda b: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((bb, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((bb, H), lambda b: (b, 0), memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((B, H), jnp.float32),
                       jax.ShapeDtypeStruct((B, H), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                            pltpu.VMEM((bb, H), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
            compiler_params=_params(),
        )
        rkA = jax.random.normal(jax.random.PRNGKey(1), (H, H4), sd) * 0.02
        rkB = jax.random.normal(jax.random.PRNGKey(2), (H, H4), sd) * 0.02
        h0 = jax.random.normal(jax.random.PRNGKey(0), (B, H))
        g0 = jax.random.normal(jax.random.PRNGKey(6), (B, H))

        def make(length, g0=g0, rkA=rkA, rkB=rkB, kernel=kernel):
            def many(c):
                def body(cc, _):
                    a, b2 = kernel(cc, g0 + cc * 1e-6, rkA, rkB)
                    return a + b2 * 1e-6, 0
                return jax.lax.scan(body, c, None, length=length)[0]
            return jax.jit(many)

        sec, _ = _time_scan(make, h0)
        mm_flops = 2 * 2 * B * H * H4 * T
        rows[name] = {"us": round(sec * 1e6, 1),
                      "tflops": round(mm_flops / sec / 1e12, 2),
                      "us_per_block_step": round(sec * 1e6 / (T * nb), 3)}

    # gates fwd / bwd (VPU)
    for name, kern, scr_h in [("gates_fwd", _gates_fwd_kernel, H),
                              ("gates_bwd", _gates_bwd_kernel, H)]:
        kernel = pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[pl.BlockSpec((bb, H4), lambda b: (b, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bb, scr_h), lambda b: (b, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, scr_h), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bb, scr_h), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
            compiler_params=_params(),
        )
        z0 = jax.random.normal(jax.random.PRNGKey(2), (B, H4))

        # carry keeps the (B, H4) shape: splice the (B, H) output back in so
        # each scan step depends on the previous (dedup/DCE-proof)
        def make(length, kernel=kernel):
            def many(c):
                def body(cc, _):
                    o = kernel(cc)
                    return jnp.concatenate([o, cc[:, o.shape[-1]:]], axis=-1), 0
                return jax.lax.scan(body, c, None, length=length)[0]
            return jax.jit(many)

        sec, _ = _time_scan(make, z0)
        rows[name] = {"us": round(sec * 1e6, 1),
                      "us_per_block_step": round(sec * 1e6 / (T * nb), 3)}

    # off-chain accumulations
    kernel = pl.pallas_call(
        _offchain_mm_kernel, grid=(nb,),
        in_specs=[pl.BlockSpec((bb, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((bb, H4), lambda b: (b, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((bb, INp), lambda b: (b, 0), memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((H, H4), lambda b: (0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((INp, H4), lambda b: (0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((H, H4), jnp.float32),
                   jax.ShapeDtypeStruct((INp, H4), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((bb, H4), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
        compiler_params=_params(),
    )
    hp = jax.random.normal(jax.random.PRNGKey(3), (B, H), sd)
    dz = jax.random.normal(jax.random.PRNGKey(4), (B, H4), sd)
    xp = jax.random.normal(jax.random.PRNGKey(5), (B, INp), sd)

    def make(length):
        def many(c, dz, xp):
            def body(cc, _):
                drk, dw = kernel(cc, dz, xp)
                # real (tiny) data dependency on both outputs — a *0 fold would
                # let XLA dead-code-eliminate the kernel entirely
                bump = (drk[0, 0] + dw[0, 0]) * 1e-20
                return (cc.astype(jnp.float32) * 0.999 + bump).astype(cc.dtype), 0
            return jax.lax.scan(body, c, None, length=length)[0]
        return jax.jit(many)

    sec, _ = _time_scan(make, hp, dz, xp)
    acc_flops = 2 * B * (H + INp) * H4 * T
    rows["offchain_mm"] = {"us": round(sec * 1e6, 1),
                           "tflops": round(acc_flops / sec / 1e12, 2),
                           "us_per_block_step": round(sec * 1e6 / (T * nb), 3)}
    return rows


# ------------------------------------------------------------- real kernels


def run_real(B, H):
    from classifying_vae_lstm_tpu.nn.core import init_lstm
    from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence

    IN = 98
    p0 = init_lstm(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    rows = {}

    def make_fwd(length):
        def fwd_many(p, x):
            def body(c, _):
                h, _ = lstm_sequence(c, x, backend="pallas",
                                     compute_dtype=jnp.bfloat16)
                return jax.tree.map(lambda a: a * 0.999 + jnp.mean(h) * 1e-6, c), 0
            return jax.lax.scan(body, p, None, length=length)[0]
        return jax.jit(fwd_many)

    sec, _ = _time_scan(make_fwd, p0, x)
    fwd_flops = 2 * B * T * (IN + H) * H * 4
    rows["fwd"] = {"us": round(sec * 1e6, 1),
                   "tflops": round(fwd_flops / sec / 1e12, 2)}

    def make_grad(length):
        def grad_many(p, x):
            def body(c, _):
                g = jax.grad(lambda q: jnp.mean(lstm_sequence(
                    q, x, backend="pallas", compute_dtype=jnp.bfloat16)[0] ** 2))(c)
                return jax.tree.map(lambda a, b: a - 1e-3 * b, c, g), 0
            return jax.lax.scan(body, p, None, length=length)[0]
        return jax.jit(grad_many)

    # k=10: the grad body is the full fused fwd+bwd — a 3x30-step chained
    # program's remote compile dropped the tunnel response; 10/30 suffices
    sec, _ = _time_scan(make_grad, p0, x, k=10)
    rows["fwdbwd"] = {"us": round(sec * 1e6, 1),
                      "tflops": round(3 * fwd_flops / sec / 1e12, 2)}
    rows["bwd_derived_us"] = round(rows["fwdbwd"]["us"] - rows["fwd"]["us"], 1)
    return rows


def main():
    global K_SCAN
    smoke = "--smoke" in sys.argv  # CPU-interpret shape/compile check only
    if smoke:
        K_SCAN = 2
    else:
        assert jax.default_backend() == "tpu", "budget numbers need a real TPU"
    out = {}
    for B, H, bb in ([(64, 128, 32)] if smoke
                     else [(1024, 512, 256), (1024, 1024, 256)]):
        tag = f"B{B} H{H} bb{bb}"
        micro = run_micro(B, H, bb)
        real = run_real(B, H)
        nb = B // bb
        # serial no-overlap sum of the parts that the real fwd does per step
        fwd_serial = micro["chain_mm"]["us"] + micro["gates_fwd"]["us"]
        bwd_serial = (micro["chain_mm"]["us"] + micro["gates_bwd"]["us"]
                      + micro["offchain_mm"]["us"])
        analysis = {
            "fwd_parts_serial_us": round(fwd_serial, 1),
            "bwd_parts_serial_us": round(bwd_serial, 1),
            "fwdbwd_parts_serial_us": round(fwd_serial + bwd_serial, 1),
            "fwdbwd_measured_us": real["fwdbwd"]["us"],
            "parts_vs_measured": round(
                real["fwdbwd"]["us"] / (fwd_serial + bwd_serial), 2),
            "chain_latency_hideable_pct": round(
                100 * (1 - micro["chain_mm_x2"]["us"] / micro["chain_mm"]["us"]), 1),
            # full-width pair: 100% = the second chain rides the first's
            # latency bubbles for free (two-cell kernel wins ~2x on the chain
            # term); 0% = chains execute back-to-back serially (no headroom)
            "fullwidth_second_chain_hidden_pct": round(
                100 * (2 - micro["chain_mm_x2_fullwidth"]["us"]
                       / micro["chain_mm"]["us"]), 1),
            "encdec_second_chain_hidden_pct": round(
                100 * (2 - micro["chain_mm_encdec"]["us"]
                       / micro["chain_mm"]["us"]), 1),
            # any row above the chip's bf16 peak means the sync lied
            "roofline_ok": all(
                r.get("tflops", 0.0) <= PEAK / 1e12 * 1.02
                for r in list(micro.values()) + [real["fwd"], real["fwdbwd"]]),
        }
        out[tag] = {"micro": micro, "real": real, "analysis": analysis}
        print(json.dumps({tag: out[tag]}, indent=1), flush=True)

    if smoke:
        print("smoke ok (artifact NOT written — interpret numbers are meaningless)")
        return
    with open(os.path.join(REPO, "artifacts", "h512_ablation.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/h512_ablation.json", flush=True)


if __name__ == "__main__":
    main()
