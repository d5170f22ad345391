"""Minimal repro ladder for the padded-grid fully-fused-backward TPU fault.

Round-3 on-hardware observation (commit dc31119): `_lstm_bwd_kernel_full`
crashes the TPU worker when the batch grid is PADDED (B % bb != 0) while
`_lstm_bwd_kernel_drk` — same reverse-walk grid, same out-of-range row
masking idiom — is clean at the identical shape. The shipping gate in
`_core_fp_bwd` routes padded batches to the drk fallback, but the mechanism
was never diagnosed. This tool reduces the delta between the two kernels to
one feature at a time, running EVERY case in a subprocess (a faulting kernel
kills the worker, sometimes the whole client process) and recording which
rung introduces the fault.

The deltas from drk -> full are exactly:
  A. an extra streamed INPUT (x stream, reverse index map)      [min_dx_in]
  B. an extra streamed OUTPUT (dx stream, reverse index map)    [min_dx_out]
  C. a second constant-index-map f32 accumulator OUTPUT (dw)    [min_dw]
  D. a 1-sublane (1, 4H) f32 accumulator OUTPUT (db)            [min_db]
plus the combination (everything together = the real kernel)    [real_full]
plus the INVOCATION delta (round-4 finding, the decisive one):
  E. the real kernel via jit(grad(lstm_sequence)) — the production
     custom_vjp path, gate bypassed                             [jit_full]
     with the drk control through the same path                 [jit_drk]
Round-4 result: every direct-call rung INCLUDING real_full is clean;
jit_full alone crashes the worker. The fault therefore lives in the
layouts/tilings the surrounding jitted program assigns to the custom
call's operands (forward-kernel-produced streams), not in the kernel
body — which is why it is invisible to CPU interpret AND to direct-call
hardware repros.

Usage:
  python tools/repro_full_bwd_fault.py           # run the ladder (real TPU)
  python tools/repro_full_bwd_fault.py --case X  # one case, in-process

Writes artifacts/full_bwd_fault_repro.json. ~5 min total. Do not run while
another TPU process is active.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The observed faulting configuration (verify round-3: B500 H512 bf16) and a
# deliberately small minimal shape — if the fault reproduces at the small
# shape it is a lowering/addressing bug, not a VMEM-pressure one.
REAL = dict(B=500, H=512, T=16, IN=98)
MINI = dict(B=40, H=256, T=8, IN=128, bb=16, bt=2)  # 40 % 16 = 8 -> padded


def _mini_kernel(case, nt, B, zref, href, xref, dzref, drkref, dwref, dbref,
                 dh_scr):
    """Reverse-walk toy kernel: serial dz@rk-style chain stub + the
    accumulator/stream features under test. Shapes: z [T,B,4H], h/x [T,B,H*]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    T_blk = zref.shape[0]
    bb = dh_scr.shape[0]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        drkref[:] = jnp.zeros_like(drkref)
        if case in ("min_dw", "min_all"):
            dwref[:] = jnp.zeros_like(dwref)
        if case in ("min_db", "min_all"):
            dbref[:] = jnp.zeros_like(dbref)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (bb, 1), 0)
    valid = (rows + bb * pl.program_id(0)) < B

    def step(s, _):
        t = T_blk - 1 - s
        dz = jnp.tanh(zref[t].astype(f32)) + dh_scr[:] @ jnp.ones(
            (dh_scr.shape[1], zref.shape[2]), f32)
        hp = href[t].astype(f32)
        dz = jnp.where(valid, dz, 0.0)
        hp = jnp.where(valid, hp, 0.0)
        if case in ("min_dx_in", "min_dx_out", "min_all"):
            xp = jnp.where(valid, xref[t].astype(f32), 0.0)
        if case in ("min_dx_out", "min_all"):
            dzref[t] = (dz[:, : dzref.shape[2]] + xp).astype(dzref.dtype)
        dh_scr[:] = dz[:, : dh_scr.shape[1]]
        drkref[:] += jax.lax.dot_general(
            hp, dz, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        if case in ("min_dw", "min_all"):
            op = xp if case == "min_all" else hp
            dwref[:] += jax.lax.dot_general(
                op, dz, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        if case in ("min_db", "min_all"):
            dbref[:] += jnp.sum(dz, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, T_blk, step, 0)


def run_mini(case: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, IN, bb, bt = (MINI[k] for k in ("B", "H", "T", "IN", "bb", "bt"))
    H4 = 4 * H
    nb, nt = pl.cdiv(B, bb), T // bt
    sd = jnp.bfloat16
    rev = lambda b, t: (nt - 1 - t, b, 0)
    const = lambda b, t: (0, 0)

    in_specs = [
        pl.BlockSpec((bt, bb, H4), rev, memory_space=pltpu.VMEM),   # z
        pl.BlockSpec((bt, bb, H), rev, memory_space=pltpu.VMEM),    # h
        pl.BlockSpec((bt, bb, IN), rev, memory_space=pltpu.VMEM),   # x
    ]
    out_specs = (
        pl.BlockSpec((bt, bb, IN), rev, memory_space=pltpu.VMEM),   # dx
        pl.BlockSpec((H, H4), const, memory_space=pltpu.VMEM),      # drk acc
        pl.BlockSpec((IN if case == "min_all" else H, H4), const,
                     memory_space=pltpu.VMEM),                      # dw acc
        pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),      # db acc
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, B, IN), sd),
        jax.ShapeDtypeStruct((H, H4), jnp.float32),
        jax.ShapeDtypeStruct((IN if case == "min_all" else H, H4), jnp.float32),
        jax.ShapeDtypeStruct((1, H4), jnp.float32),
    )
    kernel = pl.pallas_call(
        functools.partial(_mini_kernel, case, nt, B),
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (T, B, H4), sd)
    h = jax.random.normal(jax.random.PRNGKey(1), (T, B, H), sd)
    x = jax.random.normal(jax.random.PRNGKey(2), (T, B, IN), sd)
    outs = kernel(z, h, x)
    jax.block_until_ready(outs)
    import numpy as np
    # only outputs the case actually writes are meaningful (dx/dw/db are
    # uninitialized memory otherwise)
    written = {0: case in ("min_dx_out", "min_all"), 1: True,
               2: case in ("min_dw", "min_all"), 3: case in ("min_db", "min_all")}
    finite = all(bool(np.isfinite(np.asarray(o, np.float32)).all())
                 for i, o in enumerate(outs) if written[i])
    print(json.dumps({"case": case, "ok": True, "finite": finite}), flush=True)


def run_real(case: str):
    """The framework's actual kernels at the round-3 faulting shape, padded
    grid forced (the shipping gate is bypassed by calling the kernel-call
    helpers directly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from classifying_vae_lstm_tpu.ops import pallas_lstm as pk

    B, H, T, IN = (REAL[k] for k in ("B", "H", "T", "IN"))
    H4 = 4 * H
    INp = -(-IN // 128) * 128
    sd = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    z = jax.random.normal(ks[0], (T, B, H4), sd)
    cp = jax.random.normal(ks[1], (T, B, H), jnp.float32)
    c = jax.random.normal(ks[2], (T, B, H), jnp.float32)
    hp = jax.random.normal(ks[3], (T, B, H), sd)
    x = jax.random.normal(ks[4], (T, B, INp), sd)
    dh = jax.random.normal(ks[5], (T, B, H), jnp.float32)
    dc = jax.random.normal(ks[6], (T, B, H), jnp.float32)
    rkt = jax.random.normal(ks[7], (H4, H), sd)
    wt = jax.random.normal(ks[8], (H4, INp), sd)

    bb = pk._full_bwd_block_b(T, B, H, INp, sd)
    print(f"# shape B{B} H{H} bf16: full-bwd bb={bb}, padded={B % bb != 0}",
          flush=True)
    if case == "real_drk":
        outs = pk._backward_call_drk(z, cp, c, hp, dh, dc, rkt)
    else:
        outs = pk._backward_call_full(z, cp, c, hp, x, dh, dc, rkt, wt)
    jax.block_until_ready(outs)
    finite = all(bool(np.isfinite(np.asarray(o, np.float32)).all()) for o in outs)
    print(json.dumps({"case": case, "ok": True, "finite": finite}), flush=True)


def run_jit(case: str):
    """The PRODUCTION invocation: jit(grad(lstm_sequence)) at the faulting
    shape. Round-4 finding — this is the rung that actually crashes:
    `real_full` (the identical kernel `pallas_call`'d directly on
    identically-shaped fresh arrays) is clean, but through jit-of-grad the
    surrounding XLA program hands the custom call forward-kernel-produced
    operands whose layouts/tilings trip Mosaic's padded-grid handling.
    The shipping gate in `_core_fp_bwd` is bypassed by patching the
    gate-side block helper only (`_full_bwd_block_b`); the kernel itself
    still runs its real padded pick."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from classifying_vae_lstm_tpu.nn.core import init_lstm
    from classifying_vae_lstm_tpu.ops import pallas_lstm as pk
    from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence

    B, H, T, IN = (REAL[k] for k in ("B", "H", "T", "IN"))
    if case == "jit_full":
        pk._full_bwd_block_b = lambda *a: B  # defeat ONLY the gate
    fusion = (True, True, case == "jit_full")
    p = init_lstm(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))

    def loss(q):
        h, _ = lstm_sequence(q, x, backend="pallas",
                             compute_dtype=jnp.bfloat16, fusion=fusion)
        return jnp.mean(h**2)

    g = jax.jit(jax.grad(loss))(p)
    finite = all(bool(np.isfinite(np.asarray(v, np.float32)).all())
                 for v in jax.tree.leaves(g))
    print(json.dumps({"case": case, "ok": True, "finite": finite}), flush=True)


CASES = ["min_base", "min_dx_in", "min_dx_out", "min_dw", "min_db", "min_all",
         "real_drk", "real_full", "jit_drk", "jit_full"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=CASES)
    args = ap.parse_args()
    if args.case:
        if args.case.startswith("real"):
            run_real(args.case)
        elif args.case.startswith("jit"):
            run_jit(args.case)
        else:
            run_mini(args.case)
        return

    rows = []
    for case in CASES:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", case],
            capture_output=True, text=True, timeout=900, cwd=REPO)
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        row = {"case": case, "returncode": r.returncode,
               "crashed": r.returncode != 0, "tail": tail}
        print(json.dumps(row), flush=True)
        rows.append(row)

    out = os.path.join(REPO, "artifacts", "full_bwd_fault_repro.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
