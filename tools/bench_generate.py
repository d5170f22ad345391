"""Serving-scale generation: vmap-scan vs batched-scan vs fused Pallas kernel.

The fused kernel's claim: under lax.scan XLA re-fetches the weights from HBM
every timestep; the kernel loads them once into VMEM. Measures songs/sec and
note-cells/sec at reference size and at scaled serving sizes.

Usage: python tools/bench_generate.py   (real TPU)
Writes artifacts/generate_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(B, Tseed, nsteps, H, D=88, L=2, K=10, bf16=False, n=20,
        force_mode=None, skip_scans=False):
    import jax
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.ops.pallas_generate import (
        fits, generate_cl_vrnn_batch_pallas)
    from classifying_vae_lstm_tpu.sampling.generate import (
        draw_generation_noise, generate_cl_vrnn, generate_cl_vrnn_batch_noise)

    cfg = cl_vrnn.Config(original_dim=D, intermediate_dim=H, latent_dim=L,
                         seq_length=16, n_classes=K, use_x_prev=True,
                         bf16_compute=bf16)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    seeds = (jax.random.uniform(jax.random.PRNGKey(1), (B, Tseed, D)) < 0.1).astype(jnp.float32)
    ws = jax.nn.one_hot(jnp.arange(B) % K, K).astype(jnp.float32)
    eps, u = draw_generation_noise(jax.random.PRNGKey(2), B, Tseed + nsteps, L, D)

    # the round-1 vmap-of-per-song-scans form, kept HERE (the shipping batch
    # sampler was rewritten to the batched scan) so the comparison that
    # motivated the rewrite stays reproducible
    def vmap_scan():
        keys = jax.random.split(jax.random.PRNGKey(3), B)
        fn = lambda s, k, w: generate_cl_vrnn(params, cfg, s, nsteps, k, w)
        return jax.vmap(fn)(seeds, keys, ws)

    variants = {} if skip_scans else {
        "vmap_scan": vmap_scan,
        "batched_scan_noise": lambda: generate_cl_vrnn_batch_noise(
            params, cfg, seeds, nsteps, eps, u, ws),
    }
    if fits(cfg):
        # force_mode pins the weight precision (bf16-vs-int8 policy A/B at
        # sizes where both fit VMEM) via the kernel's STATIC mode argument —
        # patching pick_mode would be ignored by an already-cached trace for
        # the same shapes and silently re-time the default-precision kernel.
        tag = f"pallas_fused[{force_mode}]" if force_mode else "pallas_fused"
        variants[tag] = lambda: generate_cl_vrnn_batch_pallas(
            params, cfg, seeds, nsteps, eps, u, ws, mode=force_mode)

    rows = []
    for name, f in variants.items():
        out = f(); jax.block_until_ready(out)  # compile
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        rows.append({
            "config": f"B{B} seed{Tseed}+{nsteps} H{H} {'bf16' if bf16 else 'f32'}",
            "variant": name,
            "ms": round(dt * 1e3, 3),
            "songs_per_sec": round(B / dt, 1),
            "note_cells_per_sec": round(B * nsteps * D / dt, 0),
        })
        print(json.dumps(rows[-1]))
    return rows


def run_vae(B, nsteps, H, D=88, L=2, K=10, n=20, force_mode=None, bf16=False):
    """cl_vae family: batched scan vs the fused whole-generation kernel
    (ops/pallas_generate_vae). Same protocol as the cl_vrnn rows."""
    import jax
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.models import cl_vae
    from classifying_vae_lstm_tpu.ops.pallas_generate_vae import (
        fits, generate_cl_vae_batch_pallas)
    from classifying_vae_lstm_tpu.sampling.generate import (
        draw_generation_noise, generate_cl_vae_batch_noise)

    cfg = cl_vae.Config(original_dim=D, intermediate_dim=H, latent_dim=L,
                        intermediate_class_dim=88, n_classes=K, use_x_prev=True,
                        bf16_compute=bf16)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    seeds = (jax.random.uniform(jax.random.PRNGKey(1), (B, D)) < 0.1).astype(jnp.float32)
    ws = jax.nn.one_hot(jnp.arange(B) % K, K).astype(jnp.float32)
    eps, u = draw_generation_noise(jax.random.PRNGKey(2), B, nsteps, L, D)

    variants = {
        "batched_scan_noise": lambda: generate_cl_vae_batch_noise(
            params, cfg, seeds, nsteps, eps, u, ws),
    }
    if fits(cfg):
        tag = f"pallas_fused[{force_mode}]" if force_mode else "pallas_fused"
        variants[tag] = lambda: generate_cl_vae_batch_pallas(
            params, cfg, seeds, nsteps, eps, u, ws, mode=force_mode)

    rows = []
    for name, f in variants.items():
        out = f(); jax.block_until_ready(out)  # compile
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        rows.append({
            "family": "cl_vae",
            "config": f"B{B} steps{nsteps} D{D} H{H}",
            "variant": name,
            "ms": round(dt * 1e3, 3),
            "songs_per_sec": round(B / dt, 1),
            "note_cells_per_sec": round(B * nsteps * D / dt, 0),
        })
        print(json.dumps(rows[-1]))
    return rows


def main():
    import jax

    assert jax.default_backend() == "tpu", "this bench must run on a real TPU"
    rows = []
    rows += run(32, 16, 64, 88)                      # reference/demo size
    rows += run(256, 16, 240, 512, bf16=True)        # scaled serving
    rows += run(64, 16, 240, 512, bf16=True)         # small batch at scale
    rows += run(256, 16, 240, 768, bf16=True)        # bf16 resident
    rows += run(256, 16, 240, 1024, bf16=True)       # bf16 resident (28 MB budget)
    # bf16-vs-int8 policy A/B at hidden 1024 (both fit; pick_mode prefers
    # bf16 for accuracy — this row checks what that preference costs)
    rows += run(256, 16, 240, 1024, bf16=True, force_mode="int8",
                skip_scans=True)
    rows += run(128, 16, 240, 1536, bf16=True)       # int8 escalation regime
    # cl_vae family (ops/pallas_generate_vae): reference frame mode, the
    # seq-concat shape (pruned-pitches x seq_length ~ 976-wide frames), and
    # scaled serving; one bf16 A/B rung
    rows += run_vae(32, 64, 88)                      # reference/demo size
    rows += run_vae(32, 64, 88, D=976)               # seq-concat reference
    rows += run_vae(256, 240, 512)                   # scaled serving
    rows += run_vae(256, 240, 1024)
    rows += run_vae(256, 240, 1024, force_mode="bf16")
    # int8 rungs: policy A/B at a bf16-resident size + the escalation regime
    # (seq-concat D=976, H=5120: bf16 outgrows VMEM, int8 still resident)
    rows += run_vae(256, 240, 1024, force_mode="int8")
    rows += run_vae(128, 240, 5120, D=976, L=16, force_mode="int8", bf16=True)
    with open(os.path.join(REPO, "artifacts", "generate_bench.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
