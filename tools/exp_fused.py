"""A/B the experimental kernel fusions (static `fusion` triples) on real TPU.

Three candidate train-step fusions (ops/pallas_lstm.py):
* proj — input projection computed inside the training forward kernel
  (kills the [T, B, 4H] xz HBM round-trip between the hoisted matmul and
  the kernel); also fuses the inference forward's projection;
* drk  — recurrent weight gradient accumulated inside the backward kernel
  (kills the separate [H, B*T] @ [B*T, 4H] matmul and its h_seq/dz_seq
  re-reads; the per-step accumulate rides the measured latency bubbles);
* full — the backward kernel additionally folds in dW/db/dx, so dz never
  leaves VMEM at all (requires proj; implies drk).

Protocol: the scanned-epoch regime (CLAUDE.md kernel timing protocol — K=30
chained grad steps in ONE device program, best of 3; per-dispatch A/Bs on
this tunnel are 20-30x inflated and rank-unstable). All four combinations
per config, same process.

Usage: python tools/exp_fused.py          (real TPU, ~10 min)
Writes artifacts/fused_kernel_exp.json.

NOTE (round 5): the fullstep rows here are same-process A/B RATIOS between
fusion triples — valid for picking a winner, but their absolute MFU is not
the headline number (they sync with block_until_ready and chain dispatches).
The canonical MFU instrument is bench.py's `scaled_flop_bound`.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T = 16
IN = 98


def time_grad(B: int, H: int, k: int = 30, backend: str = "pallas",
              fusion=None) -> float:
    """Per-step seconds for the train fwd+bwd grad, dispatch-free
    (K chained steps inside one jitted lax.scan, best of 3)."""
    import jax
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.nn.core import init_lstm
    from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence

    params = init_lstm(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    fusion = fusion if backend == "pallas" else None

    def many(p, x):
        def body(c, _):
            g = jax.grad(lambda q: jnp.mean(lstm_sequence(
                q, x, backend=backend, compute_dtype=jnp.bfloat16,
                fusion=fusion)[0] ** 2))(c)
            return jax.tree.map(lambda a, b: a - 1e-3 * b, c, g), 0
        return jax.lax.scan(body, p, None, length=k)[0]

    jitted = jax.jit(many)  # fusion is an explicit static arg — no globals
    p = jitted(params, x)
    jax.block_until_ready(p)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p = jitted(p, x)
        jax.block_until_ready(p)
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def check_numerics(B: int, H: int, fusion=None) -> float:
    """Max relative grad deviation vs the XLA scan at this config (quick
    sanity alongside the timing; the full sweep lives in
    verify_kernels_tpu.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from classifying_vae_lstm_tpu.nn.core import init_lstm
    from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence

    p = init_lstm(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))

    def g(backend, fu=None):
        return jax.jit(jax.grad(lambda q: jnp.mean(lstm_sequence(
            q, x, backend=backend, compute_dtype=jnp.bfloat16,
            fusion=fu)[0] ** 2)))(p)

    ga, gb = g("xla"), g("pallas", fusion)
    worst = 0.0
    for k in ga:
        a = np.asarray(ga[k], np.float32)
        b = np.asarray(gb[k], np.float32)
        worst = max(worst, float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9)))
    return worst


def _probe_row(variant: str, H: int = 2048):
    """One H{H}/B1024 bf16 measurement (child process of the h2048/h2560
    phases; invoked as `exp_fused.py _probe_row <variant> [H]`).

    variant: 'xla' | 'unfused' | 'proj' | 'fused'. Pallas variants lift the
    rk_fits_vmem gate and grant rk_cost + 20 MB of block budget (the h1536
    recipe); the Mosaic scoped-VMEM limit rises to 110 MB for the probe
    (physical v5e VMEM is 128 MB) because the full rung's f32 drk
    accumulator (16·H² B) + resident rk_t (8·H² B) exceed the shipping
    96 MB limit at these sizes."""
    import jax

    from classifying_vae_lstm_tpu.ops import pallas_lstm as pk

    assert jax.default_backend() == "tpu"
    B = 1024
    fl = 3 * 2 * B * T * (IN + H) * 4 * H
    row = {"phase": f"h{H}", "variant": variant, "config": f"B{B} H{H} bf16"}
    try:
        if variant == "xla":
            sec = time_grad(B, H, backend="xla")
        else:
            fu = {"unfused": (False, False, False),
                  "proj": (True, False, False),
                  "fused": (True, True, True)}[variant]
            rk_cost = H * 4 * H * 2
            pk.set_vmem_budget(block_budget=rk_cost + 20 * 1024 * 1024,
                               limit=110 * 1024 * 1024)
            pk.rk_fits_vmem = lambda hidden_dim, bf16=True: True
            sec = time_grad(B, H, fusion=fu)
            row["rel_grad_dev"] = round(check_numerics(B, H, fu), 5)
        row.update(fwdbwd_us=round(sec * 1e6, 1),
                   tflops=round(fl / sec / 1e12, 2))
    except Exception as e:
        row["error"] = repr(e)[:300]
    print("ROW:" + json.dumps(row), flush=True)


def main():
    import jax

    from classifying_vae_lstm_tpu.ops import pallas_lstm as pk

    if len(sys.argv) >= 3 and sys.argv[1] == "_probe_row":
        _probe_row(sys.argv[2],
                   int(sys.argv[3]) if len(sys.argv) >= 4 else 2048)
        return

    assert jax.default_backend() == "tpu", "this A/B must run on a real TPU"
    print(f"backend: {jax.default_backend()}", flush=True)

    phases = set(sys.argv[1:]) or {"grad", "fwd", "fullstep"}

    rows = []
    for B, H in [(1024, 1024), (1024, 512), (200, 512)] if "grad" in phases else []:
        fl = 3 * 2 * B * T * (IN + H) * 4 * H  # fwd + ~2x bwd matmul FLOPs
        base = None
        for proj, drk, full in [(False, False, False), (True, False, False),
                                (False, True, False), (True, True, False),
                                (True, True, True)]:
            fu = (proj, drk, full)
            row = {"config": f"B{B} H{H} bf16", "proj": proj, "drk": drk,
                   "full": full}
            try:
                sec = time_grad(B, H, fusion=fu)
                row.update(fwdbwd_us=round(sec * 1e6, 1),
                           tflops=round(fl / sec / 1e12, 2),
                           rel_grad_dev=round(check_numerics(B, H, fu), 5))
                if not proj and not drk:
                    base = sec
                elif base:
                    row["speedup_vs_unfused"] = round(base / sec, 3)
            except Exception as e:
                row["error"] = repr(e)[:300]
            print(json.dumps(row), flush=True)
            rows.append(row)

    # Inference forward (evaluate/serve path): proj fusion only.
    if "fwd" in phases:
        import jax.numpy as jnp

        from classifying_vae_lstm_tpu.nn.core import init_lstm
        from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence

        for B, H in [(1024, 1024), (1024, 512)]:
            params = init_lstm(jax.random.PRNGKey(0), IN, H)
            x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
            for proj in [False, True]:
                fu = (proj, False, False)

                def many(p, x, k=30):
                    def body(c, _):
                        h, _ = lstm_sequence(p, x, backend="pallas",
                                             compute_dtype=jnp.bfloat16,
                                             fusion=fu)
                        # chain via the bias so steps cannot dedup
                        c = dict(c, bias=c["bias"] + 1e-6 * h.mean())
                        return c, 0
                    return jax.lax.scan(body, p, None, length=k)[0]

                jitted = jax.jit(many)
                p = jitted(params, x)
                jax.block_until_ready(p)
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    p = jitted(p, x)
                    jax.block_until_ready(p)
                    best = min(best, (time.perf_counter() - t0) / 30)
                row = {"phase": "fwd", "config": f"B{B} H{H} bf16",
                       "proj": proj, "fwd_us": round(best * 1e6, 1)}
                print(json.dumps(row), flush=True)
                rows.append(row)

    # Full cl_vrnn optimizer step (the adoption metric — the fusions also
    # change what XLA schedules OUTSIDE the kernels), scanned-epoch regime
    # via bench_train_scale.bench_step.
    if "fullstep" in phases:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_train_scale import bench_step

        for B, H in [(1024, 1024), (1024, 512)]:
            for proj, drk, full in [(False, False, False), (True, True, False),
                                    (True, True, True)]:
                row = {"phase": "fullstep", "proj": proj, "drk": drk,
                       "full": full}
                try:
                    row.update(bench_step("pallas", B, H,
                                          fusion=(proj, drk, full)))
                except Exception as e:
                    row["error"] = repr(e)[:300]
                print(json.dumps(row), flush=True)
                rows.append(row)

    # Exploratory (round 4, since adopted): does the pallas train path win at
    # H1536 bf16 with a lifted scoped-VMEM limit? This phase lifts the gate
    # and the block budget locally to find out whether the cap should move
    # (it did — rk_fits_vmem now admits H1536, and the round-5 h2048 phase
    # moved it again). Not run by default.
    if "h1536" in phases:
        import jax.numpy as jnp

        from classifying_vae_lstm_tpu.nn.core import init_lstm
        from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence

        H, B = 1536, 1024
        rk_cost = H * 4 * H * 2
        orig_gate = pk.rk_fits_vmem
        prev_budget = pk.set_vmem_budget(block_budget=rk_cost + 20 * 1024 * 1024)
        pk.rk_fits_vmem = lambda hidden_dim, bf16=True: True
        try:
            fl = 3 * 2 * B * T * (IN + H) * 4 * H
            for fused in [False, True]:
                fu = (fused, fused, fused)
                row = {"phase": "h1536", "config": f"B{B} H{H} bf16",
                       "backend": "pallas", "fused": fused}
                try:
                    sec = time_grad(B, H, fusion=fu)
                    row.update(fwdbwd_us=round(sec * 1e6, 1),
                               tflops=round(fl / sec / 1e12, 2),
                               rel_grad_dev=round(check_numerics(B, H, fu), 5))
                except Exception as e:
                    row["error"] = repr(e)[:300]
                print(json.dumps(row), flush=True)
                rows.append(row)
        finally:
            pk.rk_fits_vmem = orig_gate
            pk.set_vmem_budget(block_budget=prev_budget[0])
        # XLA reference at the same shape, same protocol
        try:
            sec = time_grad(B, H, backend="xla")
            row = {"phase": "h1536", "config": f"B{B} H{H} bf16",
                   "backend": "xla",
                   "fwdbwd_us": round(sec * 1e6, 1),
                   "tflops": round(3 * 2 * B * T * (IN + H) * 4 * H / sec / 1e12, 2)}
        except Exception as e:
            row = {"phase": "h1536", "backend": "xla", "error": repr(e)[:300]}
        print(json.dumps(row), flush=True)
        rows.append(row)

    # Exploratory: H2048 bf16 (rk 33.5 MB resident) — the shape above the
    # round-4 ceiling that rk_fits_vmem gates without a number behind it
    # (VERDICT r4 missing #3). Each variant runs in its OWN SUBPROCESS: an
    # unprobed shape can hard-crash the TPU worker (the round-4 padded-grid
    # fault killed same-process sweeps), and a crash must cost one row, not
    # the phase. Ratios across subprocesses are coarser than same-process
    # A/Bs (~10% session drift, CLAUDE.md) — fine for a keep/gate call at
    # the expected ~3x separation, not for <1.2x calls.
    # h2560: one step further up (rk 52.4 MB bf16 resident; the f32 dRk
    # accumulator is 105 MB so only xla/unfused/proj are candidates there).
    probe_phases = [(ph, int(ph[1:])) for ph in sorted(phases)
                    if ph.startswith("h") and ph[1:].isdigit()
                    and ph != "h1536"]
    for phase_name, H in probe_phases:
        import subprocess

        variants = (["xla", "unfused", "proj", "fused"] if H <= 2048
                    else ["xla", "unfused", "proj"])
        for variant in variants:
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "_probe_row", variant, str(H)],
                    capture_output=True, text=True, timeout=1800)
                row = None
                for ln in out.stdout.splitlines():
                    if ln.startswith("ROW:"):
                        row = json.loads(ln[4:])
                if row is None:
                    row = {"phase": phase_name, "variant": variant,
                           "error": (out.stderr or out.stdout)[-400:]}
            except Exception as e:
                row = {"phase": phase_name, "variant": variant,
                       "error": repr(e)[:300]}
            print(json.dumps(row), flush=True)
            rows.append(row)

    # merge with prior runs: re-running one phase (e.g. `exp_fused.py h1536`)
    # must not clobber the others' committed rows
    out_path = os.path.join(REPO, "artifacts", "fused_kernel_exp.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            old = json.load(f)
        kept = [r for r in old if r.get("phase", "grad") not in phases]
        rows = kept + rows
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote artifacts/fused_kernel_exp.json", flush=True)


if __name__ == "__main__":
    main()
