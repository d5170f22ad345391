"""A/B the fused cl_vae dense-stack train kernel (ops/pallas_vae.py) on TPU.

Round-4 verdict item: the scaled cl_vae optimizer step measured 25-30% of
its FLOP roofline under XLA (artifacts/vae_scale_bench.json) — materialized-
activation HBM traffic between fusion islands, recorded as known headroom.
This measures the round-5 answer: the whole dense stack fwd+bwd in one
VMEM-resident Pallas kernel per direction, against the XLA step, at the
exact shapes of the round-4 rows.

Protocol: tools/bench_vae_scale.bench_step — the full optimizer step
(loss grad + adam-wn) scanned n_steps minibatches into ONE device program
(Trainer.train_epoch, the production regime), best-of-3, host-fetch-scalar
sync, quiet host REQUIRED. A quick grad-parity check runs per config before
timing.

Usage: python tools/exp_vae_train.py          (real TPU, ~10 min)
Writes artifacts/vae_train_kernel_exp.json.

OUTCOME (v5e, round 5): the kernel LOST every config — 0.848x (H2048/B4096,
flop-bound), 0.913x (H1024/B4096), 0.642x (H2048/B1024) — so
`--train_backend auto` resolves to XLA everywhere (ops/pallas_vae.should_use)
and this artifact is the evidence behind declining the round-4 headroom
(docs/KERNELS.md "cl_vae train backend" design call).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def grad_parity(batch, hid, D=976, Cw=256, K=13, L=16):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from classifying_vae_lstm_tpu.models import cl_vae

    base = cl_vae.Config(original_dim=D, intermediate_dim=hid, latent_dim=L,
                         intermediate_class_dim=Cw, n_classes=K,
                         use_x_prev=True, bf16_compute=True)
    params = cl_vae.init(jax.random.PRNGKey(0), base)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    n = min(batch, 1024)
    batch_data = {
        "x": (jax.random.uniform(ks[0], (n, D)) < 0.1).astype(jnp.float32),
        "x_prev": (jax.random.uniform(ks[1], (n, D)) < 0.1).astype(jnp.float32),
        "w": jax.nn.one_hot(jax.random.randint(ks[2], (n,), 0, K), K),
    }
    batch_data["y"] = batch_data["x"]

    def g(cfg):
        return jax.jit(jax.grad(lambda p: cl_vae.loss_and_metrics(
            p, cfg, batch_data, jax.random.PRNGKey(7))[0]))(params)

    ga = g(base)
    gb = g(dataclasses.replace(base, train_backend="pallas"))
    return max(
        float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))
              / (np.abs(np.asarray(a, np.float32)).max() + 1e-6))
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)))


def main():
    import jax

    from bench_vae_scale import bench_step

    assert jax.default_backend() == "tpu", "A/B needs the real TPU"
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    rows = []
    for batch, hid in [(4096, 2048), (4096, 1024), (1024, 2048)]:
        dev = grad_parity(batch, hid)
        print(f"B{batch} H{hid} max_rel_grad_dev={dev:.5f}", flush=True)
        pair = {}
        for tb in ("xla", "pallas"):
            row = bench_step(batch, hid, train_backend=tb)
            row["max_rel_grad_dev_vs_xla"] = round(dev, 5) if tb == "pallas" else 0.0
            print(json.dumps(row), flush=True)
            rows.append(row)
            pair[tb] = row
        rows.append({
            "config": pair["xla"]["config"],
            "pallas_speedup_vs_xla": round(
                pair["xla"]["step_seconds"] / pair["pallas"]["step_seconds"], 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    with open(os.path.join(REPO, "artifacts", "vae_train_kernel_exp.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote artifacts/vae_train_kernel_exp.json", flush=True)


if __name__ == "__main__":
    main()
