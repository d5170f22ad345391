"""A/B the two-cell fused train kernel (ops/pallas_two_cell.py) on real TPU.

The candidate: encoder LSTM + z heads + z sample + decoder LSTM in ONE
Pallas program with a one-step lag, so the two serial chain matmuls overlap
in the MXU pipeline (the round-5 h512_ablation full-width probes). Baselines,
same process: the shipping pallas two-kernel path (fusion triple defaults)
and the XLA fused scan.

What is timed: the FULL optimizer step (cl_vrnn.loss_and_metrics grad +
adam-wn update) — the production unit — K steps scanned into one device
program with the params/opt carry threaded through (CLAUDE.md kernel timing
protocol), best-of-3, with TWO-LENGTH DIFFERENCING (t(3K)-t(K))/2K and
host-fetch completion sync (block_until_ready returns before execution on
this remote backend; a single synced region carries one ~27 ms tunnel RTT
that the differencing cancels). Quiet host REQUIRED: a concurrent CPU-heavy
job starves the tunnel proxy and inflated a previous run of the ablation
10-20x.

Usage: python tools/exp_two_cell.py          (real TPU, ~10 min)
Writes artifacts/two_cell_exp.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
import optax

K_SCAN = 20
PEAK = 197e12  # v5e bf16


def _sync(x) -> float:
    return float(np.asarray(jax.tree.leaves(x)[0].ravel()[0]))


def _time_diff(make_jitted, *args, k=K_SCAN):
    j1, j3 = make_jitted(k), make_jitted(3 * k)
    for attempt in range(3):
        try:
            _sync(j3(*args))
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"  compile retry ({type(e).__name__})", flush=True)
            time.sleep(30)
    _sync(j1(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(j1(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(j3(*args))
        t3 = time.perf_counter() - t0
        best = min(best, (t3 - t1) / (2 * k))
    return best


def _train_flops(B, T, D, H, L, K):
    sys.path.insert(0, REPO)
    from bench import _cl_vrnn_train_flops

    return _cl_vrnn_train_flops(B, T, D, H, L, K)


def run_config(hid, batch, bf16=True):
    import dataclasses

    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.optim import init_optimizer

    T, D, L, K = 16, 88, 2, 10
    base = cl_vrnn.Config(original_dim=D, intermediate_dim=hid, latent_dim=L,
                          seq_length=T, n_classes=K, use_x_prev=True,
                          bf16_compute=bf16)
    variants = {
        "xla": dataclasses.replace(base, lstm_backend="xla"),
        "pallas_two_kernel": dataclasses.replace(
            base, lstm_backend="pallas", two_cell=False),
        "pallas_two_cell": dataclasses.replace(
            base, lstm_backend="pallas", two_cell=True),
    }
    params0 = cl_vrnn.init(jax.random.PRNGKey(0), base)
    opt, _ = init_optimizer("adam-wn")
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch_data = {
        "x": (jax.random.uniform(ks[0], (batch, T, D)) < 0.1).astype(jnp.float32),
        "x_prev": (jax.random.uniform(ks[1], (batch, T, D)) < 0.1).astype(jnp.float32),
        "w": jax.nn.one_hot(jax.random.randint(ks[2], (batch,), 0, K), K),
    }
    batch_data["y"] = batch_data["x"]
    one = jnp.float32(1.0)
    flops = _train_flops(batch, T, D, hid, L, K)
    rows = {}
    grads_ref = None
    for name, cfg in variants.items():
        loss_fn = functools.partial(
            lambda c, p, b, k, klw, cw, wklw: cl_vrnn.loss_and_metrics(
                p, c, b, k, klw, cw, wklw), cfg)
        step_grad = jax.value_and_grad(
            lambda p, b, k: loss_fn(p, b, k, one, one, one), has_aux=True)

        def make(length, step_grad=step_grad):
            def fused(p, s, b, keys):
                def body(carry, k):
                    p, s = carry
                    (_, m), g = step_grad(p, b, k)
                    u, s = opt.update(g, s, p)
                    return (optax.apply_updates(p, u), s), m
                (p, s), ms = jax.lax.scan(body, (p, s), keys)
                return jax.tree.map(jnp.mean, ms), p, s
            return jax.jit(fused)

        # numerics cross-check (same key; the two-cell path must match the
        # two-kernel pallas path within bf16 tolerance)
        (_, _), g = jax.jit(step_grad)(params0, batch_data, jax.random.PRNGKey(7))
        if grads_ref is None:
            grads_ref = g
            gdev = 0.0
        else:
            gdev = max(
                float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))
                      / (np.abs(np.asarray(a, np.float32)).max() + 1e-6))
                for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(g)))

        opt_state = opt.init(params0)
        # _time_diff passes identical args to both lengths, so the per-step
        # keys are baked per length (sliced from one pool)
        keys3 = jax.random.split(jax.random.PRNGKey(11), 3 * K_SCAN)

        def make_sized(length, make=make):
            f = make(length)

            def wrapped(p, s, b):
                return f(p, s, b, keys3[:length])

            return jax.jit(wrapped)

        sec = _time_diff(make_sized, params0, opt_state, batch_data)
        tf = flops / sec / 1e12
        rows[name] = {
            "us_per_step": round(sec * 1e6, 1),
            "achieved_tflops": round(tf, 2),
            "mfu": round(tf * 1e12 / PEAK, 4),
            "max_rel_grad_dev_vs_xla": round(gdev, 5),
        }
        print(f"H{hid} B{batch} {name}: {rows[name]}", flush=True)
        assert tf * 1e12 <= PEAK * 1.02, (name, tf, "roofline violated — bad sync")
    rows["two_cell_speedup_vs_two_kernel"] = round(
        rows["pallas_two_kernel"]["us_per_step"]
        / rows["pallas_two_cell"]["us_per_step"], 3)
    rows["two_cell_speedup_vs_xla"] = round(
        rows["xla"]["us_per_step"] / rows["pallas_two_cell"]["us_per_step"], 3)
    return rows


def main():
    assert jax.default_backend() == "tpu", "A/B needs the real TPU"
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    configs = ([tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
               or [(512, 1024), (1024, 1024)])
    path = os.path.join(REPO, "artifacts", "two_cell_exp.json")
    out = {}
    if os.path.exists(path):  # merge: boundary probes extend the grid
        with open(path) as f:
            out = json.load(f)
    for hid, batch in configs:
        out[f"H{hid}_B{batch}_bf16"] = run_config(hid, batch, bf16=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
