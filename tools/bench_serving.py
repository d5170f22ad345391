"""Serving tail latency under concurrent load, on real TPU (VERDICT r3 #7).

N client threads fire generate(n=1, nsteps=64) requests at a
GenerationEngine for both families at reference and scaled sizes, with
dynamic batching ON vs OFF (the OFF rows are the serialized-dispatch
baseline the DynamicBatcher load test beats on CPU). Records p50/p95/p99
request latency and songs/sec from the engine's own latency_stats() —
completion-timestamp throughput, so coalescing is counted against
wall-clock.

Weights are randomly initialized (latency does not depend on their values);
the scaled cl_vrnn row runs the fused whole-generation Pallas kernel
(lstm_backend='pallas' selects it through generate_cl_vrnn_batch's
dispatch), and the scaled cl_vae row the fused vae kernel
(gen_backend='pallas').

Usage: python tools/bench_serving.py  (real TPU, ~15 min; do not run
concurrently with another TPU process). Writes artifacts/serving_latency.json.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLIENTS = 16
REQUESTS_PER_CLIENT = 10
NSTEPS = 64
STEP_BUCKETS = (64,)  # one step bucket keeps the warmup grid small


def build_engine(family: str, hidden: int, dyn: bool):
    import jax
    import numpy as np

    from classifying_vae_lstm_tpu.models import cl_vae, cl_vrnn
    from classifying_vae_lstm_tpu.serving.engine import GenerationEngine

    rng = np.random.default_rng(0)
    D, K = 88, 10
    if family == "cl_vrnn":
        cfg = cl_vrnn.Config(
            original_dim=D, intermediate_dim=hidden, latent_dim=2,
            seq_length=16, n_classes=K, use_x_prev=True,
            lstm_backend="pallas" if hidden >= 512 else "xla",
            bf16_compute=hidden >= 512)
        params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
        seed_bank = (rng.random((64, 16, D)) < 0.1).astype(np.float32)
    else:
        cfg = cl_vae.Config(
            original_dim=D, intermediate_dim=hidden, latent_dim=2,
            intermediate_class_dim=D, n_classes=K, use_x_prev=True,
            # mirror resolve_gen_backend's shipping 'auto' gate: the fused
            # kernel wins at hidden>=512 only (generate_bench.json vae rows)
            gen_backend="pallas" if hidden >= 512 else "xla")
        params = cl_vae.init(jax.random.PRNGKey(0), cfg)
        seed_bank = (rng.random((64, D)) < 0.1).astype(np.float32)
    seed_keys = np.arange(64) % K
    return GenerationEngine(params, cfg, seed_bank, seed_keys=seed_keys,
                            dynamic_batching=dyn)


def _reset_stats(engine):
    """Bench-only: clear the engine's latency window/counters between the
    solo and concurrent drives of one warmed engine (no public reset API —
    warmup cost would otherwise be paid twice per scenario)."""
    engine._latencies = []
    for k in ("requests", "songs", "gen_seconds", "batches", "batched_songs"):
        if k in engine.stats:
            engine.stats[k] = 0 if k != "gen_seconds" else 0.0


def drive(engine, clients: int = CLIENTS, requests_per_client: int = None) -> dict:
    errors = []
    rpc = requests_per_client or REQUESTS_PER_CLIENT

    def client(i):
        try:
            for _ in range(rpc):
                engine.generate(n=1, nsteps=NSTEPS, infer_w=True)
        except Exception as e:  # pragma: no cover - surfaced in the row
            errors.append(repr(e)[:200])

    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    row = dict(engine.latency_stats())
    row.update(wall_s=round(wall, 2), clients=clients,
               requests=clients * rpc,
               batches=engine.stats["batches"],
               batched_songs=engine.stats["batched_songs"],
               fused_gen=engine._use_fused_gen)
    if errors:
        row["errors"] = errors[:3]
    return row


def main():
    import jax

    assert jax.default_backend() == "tpu", "serving latency must run on TPU"
    rows = []
    for family, hidden, label in [
        ("cl_vrnn", 88, "reference"),
        ("cl_vrnn", 512, "scaled"),
        ("cl_vae", 88, "reference"),
        ("cl_vae", 512, "scaled"),
    ]:
        for dyn in (False, True):
            eng = build_engine(family, hidden, dyn)
            t0 = time.perf_counter()
            eng.warmup(step_buckets=STEP_BUCKETS)
            warm_s = time.perf_counter() - t0
            # solo pattern first (one client, serialized requests): the
            # regime where round-4's coalescing window LOST on p95
            # (cl_vae@512: 339.5 vs 281.5 ms) and the round-5 solo-warm
            # bypass must win back
            row = {"family": family, "hidden": hidden, "size": label,
                   "dynamic_batching": dyn, "pattern": "solo",
                   "warmup_s": round(warm_s, 1),
                   **drive(eng, clients=1, requests_per_client=30)}
            print(json.dumps(row), flush=True)
            rows.append(row)
            _reset_stats(eng)
            row = {"family": family, "hidden": hidden, "size": label,
                   "dynamic_batching": dyn, "pattern": "concurrent",
                   **drive(eng)}
            print(json.dumps(row), flush=True)
            rows.append(row)

    out = os.path.join(REPO, "artifacts", "serving_latency.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
