"""Per-stage breakdown + roofline accounting for the scaled train step.

NOT the headline MFU instrument (round 5): this tool's stage sums use
`jax.block_until_ready`, which on the remote backend can return before
execution — its full-step number is a DIAGNOSTIC decomposition. The one
canonical MFU figure is bench.py's `scaled_flop_bound` (scanned steps,
host-fetch completion sync, roofline guard); quote that everywhere.

VERDICT round 2, item 4: "the 44.5% MFU number has no accounting behind it".
This tool decomposes the pallas cl_vrnn train step at the scaled configs
(hidden 1024 / batch 1024 and hidden 512 / batch 1024, bf16 streams) into
additively-timed stages, and puts an analytic roofline (FLOPs vs bytes
moved against the chip's bf16 peak and HBM bandwidth) next to each:

  stage            how it is timed
  ---------------  -----------------------------------------------------------
  full_step_fused  20 train steps scanned into ONE device program (how
                   production runs — Trainer.train_epoch/train_epochs scan
                   the step body), timed end to end and divided by 20.
                   This is the number behind mfu_full_step.
  full_step        Trainer.train_step dispatched per call. On this machine
                   every dispatch crosses a remote-TPU tunnel (~27 ms RTT)
                   and re-uploads a fresh PRNG key, so for short steps this
                   measures host dispatch, not device time (CLAUDE.md timing
                   gotchas) — kept for comparison as full_step_dispatched.
  loss_fwd_bwd     jax.value_and_grad of the loss alone (no optimizer)
  adamwn_update    opt.update + apply_updates on captured grads
  lstm_fwd_bwd     both LSTM recurrences (fwd+bwd) through the Pallas
                   custom_vjp on precomputed input projections
  other_fwd_bwd    loss_fwd_bwd - lstm_fwd_bwd: input projections, z/x heads,
                   sampling, ELBO reductions, dz->weight-grad matmuls

Writes artifacts/mfu_breakdown.json. Run on the real TPU:

    python tools/mfu_breakdown.py [--configs 1024,512]

The same decomposition runs on CPU for a smoke test (tests/test_bench.py);
numbers are only meaningful on TPU.
"""

from __future__ import annotations

import argparse
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

# v5e public spec: 197 TFLOP/s bf16 peak, 819 GB/s HBM bandwidth
PEAK_BW = {"TPU v5 lite": 819e9, "TPU v5e": 819e9, "TPU v4": 1228e9,
           "TPU v6 lite": 1640e9, "TPU v6e": 1640e9}
# VPU throughput estimate: 4 ALUs x (8, 128) lanes x ~940 MHz ~= 3.85e12
# elementwise ops/s per core — the LSTM gate math (hard-sigmoids, two tanh,
# cell update; ~15 elementwise passes over [B, H] per step per direction)
# runs here, and its cost scales with B*H while the matmul scales with
# B*H*4H, so below hidden ~1000 the kernels are VPU-bound, not MXU-bound.
PEAK_VPU = 3.85e12
GATE_PASSES_FWD = 15   # i/f/o hard-sigmoids, tanh(g), c update, tanh(c), h
GATE_PASSES_BWD = 25   # gate grads, hard-sigmoid derivative masks, dz pack


def _lstm_vpu_seconds(B, H):
    """Analytic VPU floor for both LSTMs' fwd+bwd gate math."""
    elems = B * T * H
    return 2 * elems * (GATE_PASSES_FWD + GATE_PASSES_BWD) / PEAK_VPU

T, D, L, K = 16, 88, 2, 10
K_FUSED = 20  # steps per fused program (CPU smoke runs can shrink this)


def _time_fn(fn, *args, n=20, **kwargs):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def _lstm_flops_bytes(B, H, in_dim):
    """One LSTM (fwd+bwd) at bf16 streams: FLOPs counted for the recurrent
    matmuls + input projection + their backward; bytes for the HBM streams
    of the UNFUSED pallas path (xz/z/dz bf16, h/c f32 outputs) — under the
    adopted full fusion the kernels stream the narrow raw x/dx instead of
    the 4H-wide xz/dz, so these bytes are a conservative upper bound (the
    binding roof at these shapes is FLOPs/latency either way)."""
    fwd = B * T * (2 * in_dim * 4 * H + 2 * H * 4 * H)
    flops = 3 * fwd  # bwd ~ 2x fwd
    bt = B * T
    bytes_moved = (
        2 * bt * 4 * H      # xz stream in, bf16 (fwd)
        + 4 * bt * H * 2    # h_seq + c_seq out, f32 (fwd)
        + 2 * bt * 4 * H    # z pre-activation stream out, bf16 (fwd)
        + 2 * bt * 4 * H    # z stream read back (bwd)
        + 2 * bt * 4 * H    # dz stream out, bf16 (bwd)
        + 4 * bt * H * 3    # h_seq/c_seq reads + dh chain (bwd, f32)
        + 2 * bt * in_dim * 3  # x in (fwd) + x re-read + dx out (bwd)
    )
    return flops, bytes_moved


def run_config(hid: int, batch: int):
    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.optim import init_optimizer
    from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence
    from classifying_vae_lstm_tpu.train import Trainer
    from bench import _cl_vrnn_train_flops, _peak_flops

    cfg = cl_vrnn.Config(original_dim=D, intermediate_dim=hid, latent_dim=L,
                         seq_length=T, n_classes=K, use_x_prev=True,
                         bf16_compute=True, lstm_backend="pallas")
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    opt, _ = init_optimizer("adam-wn")
    loss_fn = functools.partial(
        lambda c, p, b, k, klw, cw, wklw: cl_vrnn.loss_and_metrics(p, c, b, k, klw, cw, wklw), cfg
    )
    trainer = Trainer(loss_fn, opt, batch_size=batch)
    opt_state = opt.init(params)
    kx, kp, kw = jax.random.split(jax.random.PRNGKey(1), 3)
    data = {
        "x": (jax.random.uniform(kx, (batch, T, D)) < 0.1).astype(jnp.float32),
        "x_prev": (jax.random.uniform(kp, (batch, T, D)) < 0.1).astype(jnp.float32),
        "w": jax.nn.one_hot(jax.random.randint(kw, (batch,), 0, K), K),
    }
    data["y"] = data["x"]
    one = jnp.float32(1.0)

    # full step (train_step donates params/opt_state: give the loop its own
    # copies and thread them through, so `params` stays alive for the other
    # stage timings below)
    p = jax.tree.map(jnp.copy, params)
    s = jax.tree.map(jnp.copy, opt_state)
    p, s, m = trainer.train_step(p, s, data, jax.random.PRNGKey(2),
                                 one, one, one)
    jax.block_until_ready(m)
    t_full = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(20):
            p, s, m = trainer.train_step(p, s, data, jax.random.PRNGKey(3 + i),
                                         one, one, one)
        jax.block_until_ready(m)
        t_full = min(t_full, (time.perf_counter() - t0) / 20)

    # K steps fused into one program, like Trainer.train_epoch's scan: no
    # per-step dispatch, no per-step host->device key upload. Each rep gets
    # its own key set and threads (params, opt_state) through, so no two
    # calls see identical inputs (jit result-dedup would fake the timing).
    import optax

    step_grad = jax.value_and_grad(
        lambda p, b, k: loss_fn(p, b, k, one, one, one), has_aux=True)

    def fused_steps(p, s, batch, keys):
        def body(carry, k):
            p, s = carry
            (_, m), g = step_grad(p, batch, k)
            u, s = opt.update(g, s, p)
            p = optax.apply_updates(p, u)
            return (p, s), m

        (p, s), ms = jax.lax.scan(body, (p, s), keys)
        return p, s, jax.tree.map(jnp.mean, ms)

    fused_jit = jax.jit(fused_steps, donate_argnums=(0, 1))
    rep_keys = jax.random.split(jax.random.PRNGKey(11), 4 * K_FUSED).reshape(
        4, K_FUSED, -1)
    p = jax.tree.map(jnp.copy, params)
    s = jax.tree.map(jnp.copy, opt_state)
    p, s, m = fused_jit(p, s, data, rep_keys[0])
    jax.block_until_ready(m)
    t_fused = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        p, s, m = fused_jit(p, s, data, rep_keys[1 + r])
        jax.block_until_ready(m)
        t_fused = min(t_fused, (time.perf_counter() - t0) / K_FUSED)

    # fwd+bwd only
    grad_fn = jax.jit(jax.value_and_grad(lambda p, b, k: loss_fn(p, b, k, one, one, one)[0]))
    t_grad = _time_fn(grad_fn, params, data, jax.random.PRNGKey(2), n=20)

    # optimizer update only (on captured grads)
    _, grads = grad_fn(params, data, jax.random.PRNGKey(2))
    upd_fn = jax.jit(lambda g, s, p: opt.update(g, s, p))
    t_opt = _time_fn(upd_fn, grads, opt_state, params, n=20)

    # both LSTMs fwd+bwd through the pallas custom_vjp, on precomputed
    # input projections (what the kernels actually consume)
    enc_in, dec_in = D + K, D + L + K
    kxz = jax.random.PRNGKey(3)
    x_enc = jax.random.normal(kxz, (batch, T, enc_in))
    x_dec = jax.random.normal(kxz, (batch, T, dec_in))

    def two_lstms(p, xe, xd):
        he, _ = lstm_sequence(p["encoder_h"], xe, backend="pallas",
                              compute_dtype=jnp.bfloat16)
        hd, _ = lstm_sequence(p["decoder_h"], xd, backend="pallas",
                              compute_dtype=jnp.bfloat16)
        return jnp.sum(he) + jnp.sum(hd)

    lstm_grad = jax.jit(jax.grad(two_lstms))
    t_lstm = _time_fn(lstm_grad, params, x_enc, x_dec, n=20)

    kind = jax.devices()[0].device_kind
    peak = _peak_flops(kind) or 197e12
    bw = next((v for k, v in PEAK_BW.items() if k.lower() in kind.lower()), 819e9)

    step_flops = _cl_vrnn_train_flops(batch, T, D, hid, L, K)
    fe, be = _lstm_flops_bytes(batch, hid, enc_in)
    fd, bd = _lstm_flops_bytes(batch, hid, dec_in)
    lstm_flops, lstm_bytes = fe + fd, be + bd
    # AdamWN: per param, read p/m/v/g + write p/m/v (+ g/V split temporaries)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    opt_bytes = 4 * n_params * 8

    def roof(flops, bytes_moved, secs):
        t_flop = flops / peak
        t_bw = bytes_moved / bw
        bound = "flops" if t_flop > t_bw else "bandwidth"
        return {
            "seconds": round(secs, 6),
            "tflops": round(flops / 1e12, 3),
            "gbytes": round(bytes_moved / 1e9, 3),
            "roofline_seconds": round(max(t_flop, t_bw), 6),
            "roofline_bound": bound,
            "pct_of_roof": round(100 * max(t_flop, t_bw) / secs, 1) if secs else None,
        }

    from classifying_vae_lstm_tpu.ops.pallas_lstm import resolve_fusion

    out = {
        "config": f"cl_vrnn hidden {hid}, batch {batch}, seq {T}, bf16, pallas",
        "fusion": list(resolve_fusion(None)),  # adopted defaults in effect
        "device_kind": kind,
        "peak_bf16_tflops": peak / 1e12,
        "hbm_bandwidth_gbs": bw / 1e9,
        "mfu_full_step": round(step_flops / (t_fused * peak), 4),
        "mfu_full_step_dispatched": round(step_flops / (t_full * peak), 4),
        "stages": {
            "full_step_fused": roof(step_flops, None or 0, t_fused)
            | {"gbytes": None},
            "full_step_dispatched": roof(step_flops, None or 0, t_full)
            | {"gbytes": None},
            "loss_fwd_bwd": {"seconds": round(t_grad, 6),
                             "share_of_step": round(t_grad / t_fused, 3)},
            "adamwn_update": roof(0, opt_bytes, t_opt)
            | {
                "tflops": None,
                # standalone t_opt is dispatch-dominated (a tiny program per
                # call through the tunnel); what the update actually adds
                # inside the scanned step is fused-step minus grad-only:
                "in_program_seconds": round(t_fused - t_grad, 6),
                "share_of_step": round(
                    max(t_fused - t_grad, 0.0) / t_fused, 3),
            },
            "lstm_fwd_bwd": roof(lstm_flops, lstm_bytes, t_lstm)
            | {
                "share_of_step": round(t_lstm / t_fused, 3),
                # three independent roofs; the binding one explains the gap
                # between measured time and the FLOP roof alone
                "vpu_roofline_seconds": round(_lstm_vpu_seconds(batch, hid), 6),
                "serial_mxu_plus_vpu_seconds": round(
                    lstm_flops / peak + _lstm_vpu_seconds(batch, hid), 6),
                "binding": (
                    # measured >> every throughput roof (flops, bytes, vpu):
                    # the gap is the recurrence's serial latency — per-step
                    # [block_b, H] matmuls are too small-M to hide MXU
                    # latency, and the dependent gate math cannot overlap
                    # its own matmul (see docs/KERNELS.md 2b)
                    "recurrence-latency"
                    if t_lstm > 1.4 * (lstm_flops / peak + _lstm_vpu_seconds(batch, hid))
                    else "mxu-throughput"),
            },
            "other_fwd_bwd": {
                "seconds": round(t_grad - t_lstm, 6),
                "share_of_step": round((t_grad - t_lstm) / t_fused, 3),
                "what": "z/x heads, sampling, ELBO reductions (under full "
                        "fusion the input projections and dz->weight-grad "
                        "matmuls run inside the lstm kernels)",
            },
        },
        "dispatch_overhead_seconds_per_step": round(t_full - t_fused, 6),
    }
    print(json.dumps(out, indent=2), flush=True)
    return out


def main():
    import jax

    assert jax.default_backend() == "tpu", "this tool must run on a real TPU"
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="1024,512")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out", type=str, default="artifacts/mfu_breakdown.json")
    args = ap.parse_args()
    results = [run_config(int(h), args.batch) for h in args.configs.split(",")]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
