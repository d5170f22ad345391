"""Converged quality parity: repo vs reference-semantics oracle, test NLL.

Trains BASELINE config 1 (cl_vae, JSB-Cs, --latent_dim 4 --use_x_prev) and
config 4 (cl_vrnn, JSB defaults) twice each:

* the JAX framework (this repo), and
* the torch/f64 transcription of the reference Keras semantics
  (:mod:`tools.ref_oracle`),

with the same epoch budget and independent shuffles, then evaluates BOTH
trained weight sets with the same importance-sampled NLL estimator
(:mod:`classifying_vae_lstm_tpu.evaluation.nll`). The |delta| <= 0.1
nats/frame target is BASELINE.json's "quality parity" north star — the paper
(arXiv:1711.07050) is unreachable offline (BASELINE.md), so the oracle stands
in as the executable reference.

Run:  JAX_PLATFORM_NAME=cpu python tools/run_oracle_parity.py [--epochs 30]
Writes artifacts/oracle_nll_parity.json and prints one JSON line per family.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from classifying_vae_lstm_tpu.cli import common
from classifying_vae_lstm_tpu.data import PianoData
from classifying_vae_lstm_tpu.evaluation.nll import iw_nll_dataset
from classifying_vae_lstm_tpu.models import cl_vae, cl_vrnn
from classifying_vae_lstm_tpu.optim import init_optimizer
from classifying_vae_lstm_tpu.train import Trainer
from tools.ref_oracle import RefAdamWN, RefCLVAE, RefCLVRNN, train_steps

JSB_CS = "/root/reference/data/input/JSB Chorales_Cs.pickle"
JSB_ALL = "/root/reference/data/input/JSB Chorales_all.pickle"


def _oracle_params_to_jax(oracle):
    return {name: {k: jnp.asarray(np.asarray(t.detach(), dtype=np.float32))
                   for k, t in layer.items()}
            for name, layer in oracle.p.items()}


def _train_oracle(oracle, data, batch_size, epochs, family, cfg, seed=123):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    opt = RefAdamWN(oracle.parameters())
    n = data["x"].shape[0]
    nb = n // batch_size
    last = None
    for e in range(epochs):
        perm = rng.permutation(n)[: nb * batch_size]
        batches, noises = [], []
        for i in range(nb):
            ix = perm[i * batch_size:(i + 1) * batch_size]
            batches.append({k: np.asarray(v)[ix] for k, v in data.items()})
            key, kw, kz = jax.random.split(key, 3)
            B = batch_size
            if family == "cl_vae":
                noises.append((np.asarray(jax.random.normal(kw, (B, cfg.n_classes - 1))),
                               np.asarray(jax.random.normal(kz, (B, cfg.latent_dim)))))
            else:
                noises.append((np.asarray(jax.random.normal(kw, (B, cfg.n_classes - 1))),
                               np.asarray(jax.random.normal(
                                   kz, (B, cfg.seq_length, cfg.latent_dim)))))
        losses = train_steps(oracle, opt, batches, noises)
        last = float(np.mean(losses))
        print(f"  oracle epoch {e + 1}/{epochs} loss={last:.3f}", flush=True)
    return last


def _train_jax(cfg, params, data, batch_size, epochs, family, seed=321):
    opt, _ = init_optimizer("adam-wn")
    mod = cl_vae if family == "cl_vae" else cl_vrnn
    loss_fn = lambda p, b, k, klw, cw, wklw: mod.loss_and_metrics(p, cfg, b, k, klw, cw, wklw)
    trainer = Trainer(loss_fn, opt, batch_size=batch_size)
    opt_state = opt.init(params)
    one = jnp.float32(1.0)
    key = jax.random.PRNGKey(seed)
    params = jax.tree.map(jnp.copy, params)
    for e in range(epochs):
        key, k = jax.random.split(key)
        params, opt_state, m = trainer.train_epoch(params, opt_state, data, k, one, one, one)
    print(f"  jax final epoch loss={float(m['loss']):.3f}", flush=True)
    return params


def run_family(family: str, epochs: int, n_iw: int = 64):
    t0 = time.time()
    if family == "cl_vae":
        P = PianoData(JSB_CS, batch_size=100, seq_length=1, return_y_next=True,
                      squeeze_x=True, squeeze_y=True)
        K = int(len(np.unique(P.train_song_keys)))
        cfg = cl_vae.Config(original_dim=88, intermediate_dim=88, latent_dim=4,
                            intermediate_class_dim=88, n_classes=K, use_x_prev=True)
        datasets = common.build_cl_vae_datasets(P, K, use_x_prev=True)
        batch_size = 100
        params0 = cl_vae.init(jax.random.PRNGKey(0), cfg)
        oracle = RefCLVAE(jax.tree.map(np.asarray, params0), 88, 88, 4, K, use_x_prev=True)
    else:
        P = PianoData(JSB_ALL, batch_size=200, seq_length=16, return_y_next=False,
                      return_y_hist=True, squeeze_x=False, squeeze_y=False)
        K = int(len(np.unique(P.train_song_keys)))
        cfg = cl_vrnn.Config(original_dim=88, intermediate_dim=88, latent_dim=2,
                             seq_length=16, n_classes=K)
        datasets = common.build_cl_vrnn_datasets(P, K, use_x_prev=False)
        batch_size = 200
        params0 = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
        oracle = RefCLVRNN(jax.tree.map(np.asarray, params0), 88, 88, 2, 16, K)

    train = {k: np.asarray(v) for k, v in datasets["train"].items()}
    print(f"[{family}] {K} classes, {train['x'].shape[0]} train windows", flush=True)

    print(f"[{family}] training oracle ({epochs} epochs)...", flush=True)
    _train_oracle(oracle, train, batch_size, epochs, family, cfg)
    print(f"[{family}] training jax ({epochs} epochs)...", flush=True)
    jax_params = _train_jax(cfg, params0, datasets["train"], batch_size, epochs, family)

    test = {k: v for k, v in datasets["test"].items() if k in ("x", "y", "x_prev")}
    oracle_params = _oracle_params_to_jax(oracle)
    kwargs = dict(n_samples=n_iw, batch_size=500, family=family)
    nll_jax = float(np.mean(iw_nll_dataset(jax_params, cfg, test,
                                           jax.random.PRNGKey(5), **kwargs)))
    nll_ref = float(np.mean(iw_nll_dataset(oracle_params, cfg, test,
                                           jax.random.PRNGKey(5), **kwargs)))
    out = {
        "family": family,
        "epochs": epochs,
        "n_importance_samples": n_iw,
        "test_nll_jax": round(nll_jax, 4),
        "test_nll_reference_oracle": round(nll_ref, 4),
        "delta_nats_per_frame": round(nll_jax - nll_ref, 4),
        "within_0.1": bool(abs(nll_jax - nll_ref) <= 0.1),
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--families", type=str, default="cl_vae,cl_vrnn")
    ap.add_argument("--out", type=str, default="artifacts/oracle_nll_parity.json")
    args = ap.parse_args()
    results = [run_family(f, args.epochs) for f in args.families.split(",")]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
