"""Scaled TRAINING step: XLA fused scan vs Pallas forward (+custom-VJP bwd).

Round-1 verdict weak #4 asked for a FLOP-bound training MFU number; round 2
recorded 14.1% MFU for the all-XLA step at hidden 1024 / batch 1024 bf16 while
the Pallas FORWARD kernel reaches 41% of peak (`bench_pallas_scale.py`).  This
tool measures the full optimizer step (fwd + bwd + AdamWN) per backend so the
training-path backend choice is settled by data, like the forward one was.

Primary timing is Trainer.train_epoch — minibatch steps scanned into one
device program (the production regime); per-dispatch train_step timing is
kept as a secondary column (on this machine it measures the remote-TPU
tunnel at small sizes, not the device).

Usage: JAX_PLATFORMS=tpu python tools/bench_train_scale.py
Writes artifacts/train_scale_bench.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_step(backend: str, batch: int, hid: int, seq: int = 16, n_steps: int = 20,
               fusion=None):
    import jax
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.optim import init_optimizer
    from classifying_vae_lstm_tpu.train import Trainer

    D, L, K = 88, 2, 10
    cfg = cl_vrnn.Config(original_dim=D, intermediate_dim=hid, latent_dim=L,
                         seq_length=seq, n_classes=K, use_x_prev=True,
                         bf16_compute=True, lstm_backend=backend,
                         fusion=fusion if backend == 'pallas' else None)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    opt, _ = init_optimizer("adam-wn")
    loss_fn = functools.partial(
        lambda c, p, b, k, klw, cw, wklw: cl_vrnn.loss_and_metrics(p, c, b, k, klw, cw, wklw), cfg
    )
    trainer = Trainer(loss_fn, opt, batch_size=batch)
    opt_state = opt.init(params)
    kx, kp, kw = jax.random.split(jax.random.PRNGKey(1), 3)
    batch_data = {
        "x": (jax.random.uniform(kx, (batch, seq, D)) < 0.1).astype(jnp.float32),
        "x_prev": (jax.random.uniform(kp, (batch, seq, D)) < 0.1).astype(jnp.float32),
        "w": jax.nn.one_hot(jax.random.randint(kw, (batch,), 0, K), K),
    }
    batch_data["y"] = batch_data["x"]
    one = jnp.float32(1.0)

    # Primary number: Trainer.train_epoch — n_steps minibatches scanned into
    # ONE device program, exactly how production epochs compile. Per-dispatch
    # step timing on this machine measures the remote-TPU tunnel, not the
    # device (20-30x inflation at B200, ~10% session drift — CLAUDE.md
    # timing gotchas), and once inverted the pallas/xla ranking at B200.
    k_scan = min(n_steps, 8)
    data = {k: jnp.concatenate([v] * k_scan, axis=0)
            for k, v in batch_data.items() if k != "y"}
    data["y"] = data["x"]  # keep the alias — a separate concat would double HBM
    params, opt_state, m = trainer.train_epoch(params, opt_state, data,
                                               jax.random.PRNGKey(2), one, one, one)
    jax.block_until_ready(m)  # compile
    dt = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        params, opt_state, m = trainer.train_epoch(params, opt_state, data,
                                                   jax.random.PRNGKey(3 + i), one, one, one)
        jax.block_until_ready(m)
        dt = min(dt, (time.perf_counter() - t0) / k_scan)

    # kept for continuity with earlier artifacts: per-dispatch train_step
    params, opt_state, m = trainer.train_step(params, opt_state, batch_data,
                                              jax.random.PRNGKey(2), one, one, one)
    jax.block_until_ready(m)  # compile
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, m = trainer.train_step(params, opt_state, batch_data,
                                                  jax.random.PRNGKey(30 + i), one, one, one)
    jax.block_until_ready(m)
    dt_disp = (time.perf_counter() - t0) / n_steps

    sys.path.insert(0, REPO)
    from bench import _cl_vrnn_train_flops, _peak_flops

    flops = _cl_vrnn_train_flops(batch, seq, D, hid, L, K)
    achieved = flops / dt
    kind = jax.devices()[0].device_kind
    peak = _peak_flops(kind)
    row = {
        "config": f"B{batch} T{seq} H{hid} bf16 train-step",
        "backend": backend,
        "us_per_step": round(dt * 1e6, 1),          # scanned-epoch regime
        "us_per_step_dispatched": round(dt_disp * 1e6, 1),
        "achieved_tflops": round(achieved / 1e12, 2),
        "device_kind": kind,
    }
    if peak:
        row["mfu"] = round(achieved / peak, 4)
    return row


def main():
    import jax

    assert jax.default_backend() == "tpu", "this bench must run on a real TPU"
    rows = []
    # last rows probe the 'auto' policy boundary: pallas wins at every
    # hidden>=512 config measured, including the reference batch 200
    for batch, hid, seq in [(1024, 1024, 16), (1024, 512, 16), (256, 1024, 64),
                            (512, 1024, 16), (200, 512, 16)]:
        for backend in ["xla", "pallas"]:
            row = bench_step(backend, batch, hid, seq)
            print(json.dumps(row))
            rows.append(row)
    out = os.path.join(REPO, "artifacts", "train_scale_bench.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
