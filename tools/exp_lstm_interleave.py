"""Experiment: MXU/VPU software pipelining in the Pallas LSTM forward.

The mfu_breakdown (artifacts/mfu_breakdown.json) shows the LSTM kernels at
35-55% of their FLOP roof. Analysis: per step the recurrent matmul (MXU,
2*bb*H*4H flops) and the gate math (VPU, ~15 elementwise passes over
[bb, H] incl. two tanh) are SERIALIZED by the recurrence — gates(t) feed
matmul(t+1). Their cost ratio is ~H/1000, so at H=512 the kernel is
~2:1 VPU-bound and at H=1024 roughly balanced; either way one unit idles
while the other works.

Rows are independent, so splitting the batch block into two halves A/B and
software-pipelining

    gates_A(t)  ||  matmul_B(t)
    gates_B(t)  ||  matmul_A(t+1)

lets the in-order core issue the B matmul to the MXU before the A gates
occupy the VPU — steady-state cost per step drops from (mm + vpu) to
~max(mm, vpu) per half. This tool measures the baseline train-forward
kernel against the interleaved variant at the scaled configs. Run on TPU:

    python tools/exp_lstm_interleave.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from classifying_vae_lstm_tpu.ops.pallas_lstm import (
    _forward_train_call,
    _interpret,
    _pick_blocks,
)


def _interleaved_kernel(xz_ref, rk_ref, h0_ref, c0_ref,
                        hseq_ref, cseq_ref, zseq_ref, h_scr, c_scr):
    """Two-half pipelined variant of _lstm_seq_train_kernel."""
    T_blk = xz_ref.shape[0]
    bb = h_scr.shape[0]
    hb = bb // 2
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

    # preamble: A's step-0 pre-activation
    zA0 = xz_ref[0, :hb].astype(f32) + mm(h_scr[:hb])

    def step(t, zA):
        # issue B's matmul (MXU) ...
        zB = xz_ref[t, hb:].astype(f32) + mm(h_scr[hb:])
        # ... while A's gates run (VPU; depends only on zA)
        hA, cA = gates(zA, c_scr[:hb])
        h_scr[:hb] = hA
        c_scr[:hb] = cA
        hseq_ref[t, :hb] = hA
        cseq_ref[t, :hb] = cA
        zseq_ref[t, :hb] = zA.astype(zseq_ref.dtype)
        # issue A's NEXT matmul (needs hA) ...
        tn = jnp.minimum(t + 1, T_blk - 1)
        zA_next = xz_ref[tn, :hb].astype(f32) + mm(hA)
        # ... while B's gates run
        hB, cB = gates(zB, c_scr[hb:])
        h_scr[hb:] = hB
        c_scr[hb:] = cB
        hseq_ref[t, hb:] = hB
        cseq_ref[t, hb:] = cB
        zseq_ref[t, hb:] = zB.astype(zseq_ref.dtype)
        return zA_next

    jax.lax.fori_loop(0, T_blk, step, zA0)


def _interleaved_call(xz_t, rk, h0, c0, block_b=None, block_t=None):
    T, B, H4 = xz_t.shape
    H = H4 // 4
    sd = xz_t.dtype
    stream_bytes = 8 * jnp.dtype(sd).itemsize + 8
    bb0, bt0 = _pick_blocks(B, T, H, rk.dtype.itemsize, stream_bytes,
                            min_sublane=16 if jnp.dtype(sd).itemsize == 2 else 8)
    block_b = block_b or bb0
    block_t = block_t or bt0
    if block_t is None:
        block_t = T
    nb = pl.cdiv(B, block_b)
    nt = pl.cdiv(T, block_t)
    kernel = pl.pallas_call(
        _interleaved_kernel,
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
    )
    return kernel(xz_t, rk, h0, c0)


def _time(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best, out


def run(H, B, T=16):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    xz = jax.random.normal(k1, (T, B, 4 * H), jnp.bfloat16)
    rk = (jax.random.normal(k2, (H, 4 * H)) * 0.05).astype(jnp.bfloat16)
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)

    base_fn = jax.jit(_forward_train_call)
    t_base, out_base = _time(base_fn, xz, rk, h0, c0)
    # the interleaved kernel carries extra f32 z temporaries (zA, zB, zA_next
    # + per-half gate intermediates): try the baseline blocks, then shrink
    # until Mosaic's scoped-vmem stack fits
    t_int = out_int = None
    blocks_used = None
    for bb, bt in [(None, None), (None, 1), (128, 1), (64, 1), (32, 1)]:
        try:
            int_fn = jax.jit(functools.partial(_interleaved_call, block_b=bb, block_t=bt))
            t_int, out_int = _time(int_fn, xz, rk, h0, c0)
            blocks_used = (bb, bt)
            break
        except Exception as e:
            print(f"  blocks (bb={bb}, bt={bt}) failed: {str(e)[:120]}", flush=True)
    if t_int is None:
        print(json.dumps({"H": H, "B": B, "error": "no block config fit"}), flush=True)
        return {"H": H, "B": B, "error": "no block config fit"}
    for a, b in zip(out_base, out_int):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   atol=1e-5, rtol=1e-5)
    flops = 3 * B * T * 2 * H * 4 * H / 3  # fwd only: B*T*2*H*4H
    row = {
        "H": H, "B": B, "T": T, "interleave_blocks": blocks_used,
        "baseline_ms": round(t_base * 1e3, 3),
        "interleaved_ms": round(t_int * 1e3, 3),
        "speedup": round(t_base / t_int, 3),
        "baseline_tflops": round(flops / t_base / 1e12, 1),
        "interleaved_tflops": round(flops / t_int / 1e12, 1),
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    import jax

    assert jax.default_backend() == "tpu", "this experiment must run on a real TPU"
    rows = [run(512, 1024), run(1024, 1024), run(512, 200), run(768, 1024)]
    with open("artifacts/lstm_interleave_exp.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote artifacts/lstm_interleave_exp.json")
