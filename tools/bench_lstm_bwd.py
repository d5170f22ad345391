"""Isolate LSTM forward/backward cost per backend at scaled sizes.

Times (a) forward only, (b) value_and_grad of a scalar loss over the LSTM
sequence, for the XLA scan and the Pallas kernel (custom-VJP XLA backward).
This locates the training-step bottleneck seen in bench_train_scale.py.

Usage: python tools/bench_lstm_bwd.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(backend: str, B: int, T: int, IN: int, H: int, n: int = 30):
    import jax
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.nn.core import init_lstm
    from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence

    params = init_lstm(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))

    @jax.jit
    def fwd(params, x):
        h_seq, _ = lstm_sequence(params, x, backend=backend, compute_dtype=jnp.bfloat16)
        return jnp.sum(h_seq)

    @jax.jit
    def fwdbwd(params, x):
        return jax.grad(lambda p: fwd(p, x))(params)

    out = {}
    for name, f in [("fwd", lambda: fwd(params, x)), ("fwd+bwd", lambda: fwdbwd(params, x))]:
        r = f(); jax.block_until_ready(r)  # compile
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        jax.block_until_ready(r)
        out[name] = round((time.perf_counter() - t0) / n * 1e6, 1)
    # matmul FLOPs: fwd = 2*B*T*(IN*4H + H*4H); bwd ~ 2x fwd
    fl = 2 * B * T * (IN + H) * 4 * H
    out["fwd_tflops"] = round(fl / out["fwd"] / 1e6, 2)
    out["fwdbwd_tflops"] = round(3 * fl / out["fwd+bwd"] / 1e6, 2)
    return out


def main():
    import jax

    assert jax.default_backend() == "tpu", "this bench must run on a real TPU"
    rows = []
    for B, T, IN, H in [(1024, 16, 98, 1024)]:
        for backend in ["xla", "pallas"]:
            row = {"config": f"B{B} T{T} IN{IN} H{H} bf16", "backend": backend}
            row.update(run(backend, B, T, IN, H))
            print(json.dumps(row))
            rows.append(row)
    with open(os.path.join(REPO, "artifacts", "lstm_bwd_bench.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
