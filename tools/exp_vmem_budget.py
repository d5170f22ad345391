"""Sweep the Pallas block-selection VMEM budget on real TPU.

The MFU breakdown (artifacts/mfu_breakdown.json) pinned the train kernels as
recurrence-latency bound: the serial per-step chain (matmul -> gates) is the
binding roof, so fewer/fatter grid steps should win. Block shapes come from
`_pick_blocks` under a byte budget that was historically 14 MB (to fit the
compiler's default 16 MB scoped-VMEM stack) — but v5e has 128 MB physical
VMEM and `ops.pallas_lstm.set_vmem_budget` now lifts both knobs. At
H1024/B1024 bf16 a 14 MB budget forces (bb=64, bt=1): 256 sequential
half-utilized-MXU matmuls with the interleave pipeline gated off; ~40 MB
admits (bb=256, bt=2) and ~64 MB (bb=256, bt=4).

For each (config, budget) this times value_and_grad over `lstm_sequence`
(backend=pallas, bf16 streams) — the stage that is ~80% of the scaled train
step — and records the blocks each budget picked for the train-forward and
backward kernels. Inputs are chained between timed calls (params nudged by
the previous grad) so jit result-dedup cannot fake the timing (CLAUDE.md
timing gotchas).

Usage: python tools/exp_vmem_budget.py        (real TPU, ~10 min)
Writes artifacts/vmem_budget_sweep.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MB = 1024 * 1024
BUDGETS_MB = [14, 28]  # old default vs new default, under the shipping policy
T = 16


def blocks_for(B: int, H: int):
    """What _pick_blocks chooses for the bf16 train fwd / bwd at the
    CURRENT budget (mirrors the stream_bytes math at the two call sites)."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm as pk

    fwd = pk._pick_blocks(B, T, H, 2, stream_bytes=8 * 2 + 8, min_sublane=16,
                          prefer_bt1=True)
    bwd = pk._pick_blocks(B, T, H, 2, stream_bytes=8 * 2 + 16, min_sublane=16,
                          prefer_bt1=True)
    return {"fwd_train": fwd, "bwd": bwd}


def time_grad(B: int, H: int, k: int = 30) -> float:
    """Per-step seconds for the train fwd+bwd grad, measured dispatch-free.

    K grad steps run inside ONE jitted lax.scan (the regime Trainer compiles)
    with params chained step-to-step, so a timing rep is a single device
    program: no per-call tunnel RTT (CLAUDE.md timing gotcha (c) — per-call
    timings at small batch measure host dispatch, not kernels; a first cut of
    this sweep produced 20-30x-inflated, rank-UNSTABLE numbers at B200)."""
    import jax
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.nn.core import init_lstm
    from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence

    IN = 98
    params = init_lstm(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))

    # Fresh wrapper per call site: block shapes are baked in at trace time.
    def many(p, x):
        def body(c, _):
            g = jax.grad(lambda q: jnp.mean(lstm_sequence(
                q, x, backend="pallas", compute_dtype=jnp.bfloat16)[0] ** 2))(c)
            # chain: each step's params depend on the previous grad
            return jax.tree.map(lambda a, b: a - 1e-3 * b, c, g), 0
        return jax.lax.scan(body, p, None, length=k)[0]

    jitted = jax.jit(many)
    p = jitted(params, x)
    jax.block_until_ready(p)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p = jitted(p, x)
        jax.block_until_ready(p)
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def time_grad_forced(B: int, H: int, blocks: tuple[int, int]) -> float:
    """Time the train grad with _pick_blocks pinned to `blocks` — used to A/B
    the bt=1 policy against the old multi-step-interleave choice at batch
    sizes where the budget alone cannot reproduce the old selection."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm as pk

    orig = pk._pick_blocks
    pk._pick_blocks = lambda *a, **kw: blocks
    try:
        return time_grad(B, H)
    finally:
        pk._pick_blocks = orig


def main():
    import jax

    from classifying_vae_lstm_tpu.ops import pallas_lstm as pk

    phases = set(sys.argv[1:]) or {"budget", "b200"}
    print(f"backend: {jax.default_backend()}", flush=True)
    rows = []
    for B, H in [(1024, 1024), (1024, 512)] if "budget" in phases else []:
        fl = 3 * 2 * B * T * (98 + H) * 4 * H  # fwd + ~2x bwd matmul FLOPs
        for mb in BUDGETS_MB:
            pk.set_vmem_budget(block_budget=mb * MB,
                               limit=min(mb * MB + 32 * MB, 110 * MB))
            row = {"config": f"B{B} H{H} bf16", "budget_mb": mb,
                   "blocks": blocks_for(B, H)}
            try:
                sec = time_grad(B, H)
                row.update(fwdbwd_us=round(sec * 1e6, 1),
                           tflops=round(fl / sec / 1e12, 2))
            except Exception as e:  # Mosaic VMEM OOM etc.
                row["error"] = repr(e)[:200]
            print(json.dumps(row), flush=True)
            rows.append(row)
    pk.set_vmem_budget(block_budget=28 * MB, limit=110 * MB)  # restore defaults

    # Forced-block A/B at the reference batch size: the old 14 MB budget
    # picked multi-step time blocks (interleave ON) at B200; the bt=1 policy
    # picks (200, 1). Pin both and time them so the policy change is
    # evidence-backed in the small-batch train regime too.
    forced_grid = [
        # reference batch: full-dim 200-row blocks are sublane-UNALIGNED
        # (200 % 16 != 0) and measured far slower than aligned padded blocks
        ((200, 512), [(200, 1), (200, 2), (64, 1), (128, 1)]),
        ((200, 1024), [(200, 1), (200, 2), (64, 1), (128, 1)]),
        # scaled batch: widest-bb-at-bt1 policy vs the old picks and bb=512
        ((1024, 512), [(64, 1), (256, 1), (512, 1), (256, 2)]),
        ((1024, 1024), [(64, 1), (256, 1), (512, 1), (256, 2)]),
    ]
    for (B, H), cand in forced_grid if "b200" in phases else []:
        for blocks in cand:
            fl = 3 * 2 * B * T * (98 + H) * 4 * H
            row = {"config": f"B{B} H{H} bf16 forced", "blocks": list(blocks)}
            try:
                sec = time_grad_forced(B, H, blocks)
                row.update(fwdbwd_us=round(sec * 1e6, 1),
                           tflops=round(fl / sec / 1e12, 2))
            except Exception as e:
                row["error"] = repr(e)[:200]
            print(json.dumps(row), flush=True)
            rows.append(row)
    out_path = os.path.join(REPO, "artifacts", "vmem_budget_sweep.json")
    if phases != {"budget", "b200"} and os.path.exists(out_path):
        with open(out_path) as f:  # partial run: keep the other phase's rows
            rows = json.load(f) + rows
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
