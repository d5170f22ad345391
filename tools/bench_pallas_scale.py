"""Measure the Pallas LSTM kernel vs the fused XLA scan across scales.

VERDICT round 1 weak #2 / next-round #5: find the regime where the fused
kernel wins and wire it in, or retire it with numbers. Run on the TPU:

    python tools/bench_pallas_scale.py

Prints one JSON line per (config, backend). Forward-only timing (the kernel's
target paths — IW evaluation and serving — are forward-dominated).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from classifying_vae_lstm_tpu.nn.core import init_lstm
from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence


def bench_one(B, T, D, H, backend, bf16, n_iters=50):
    params = init_lstm(jax.random.PRNGKey(0), D, H)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, T, D)) < 0.2).astype(jnp.float32)

    fn = jax.jit(functools.partial(
        lstm_sequence, backend=backend,
        compute_dtype=jnp.bfloat16 if bf16 else None,
    ))
    h, _ = fn(params, x)
    jax.block_until_ready(h)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        h, _ = fn(params, x)
    jax.block_until_ready(h)
    dt = (time.perf_counter() - t0) / n_iters
    # recurrent + input-proj matmul FLOPs per forward
    flops = 2 * B * T * (D * 4 * H + H * 4 * H)
    return {
        "config": f"B{B} T{T} D{D} H{H} {'bf16' if bf16 else 'f32'}",
        "backend": backend,
        "us_per_forward": round(dt * 1e6, 1),
        "achieved_tflops": round(flops / dt / 1e12, 2),
    }


def main():
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "backend": jax.default_backend()}))
    cases = [
        # reference size, f32 (round-1 regime)
        (200, 16, 98, 88, False),
        # scaled: H=512 and H=1024, bf16 (MXU-native; bf16 weights resident)
        (1024, 16, 128, 512, True),
        (1024, 16, 128, 1024, True),
        (256, 64, 128, 1024, True),  # longer sequence, smaller batch
    ]
    results = []
    for B, T, D, H, bf16 in cases:
        for backend in ("xla", "pallas"):
            r = bench_one(B, T, D, H, backend, bf16)
            print(json.dumps(r), flush=True)
            results.append(r)
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts", "pallas_scale_bench.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
