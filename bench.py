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

Extras: the training headline is best-of-3 five-epoch reps with the per-rep
rates and spread recorded (`train_steps_spread`); batched-generation
notes/sec at TWO fixed definitions (`gen_notes_per_sec_reference_size` =
32 songs x 64 steps, `gen_notes_per_sec_serving_scale` = 256 x 256 —
`sampled_notes_per_sec` aliases the serving-scale number for r02 continuity);
and a FLOP-bound scaled config with achieved TFLOP/s and MFU
(`scaled_flop_bound`; Pallas fwd+bwd kernels).

TIMING PROTOCOL (round 5, VERDICT r4 weak #2): every timed region is a
DEVICE-side program — generation reps are `lax.scan`-chained inside ONE jit
(each rep consumes the previous output, dedup-proof), training reps are the
scanned epoch/step programs — and every region is closed by HOST-FETCHING a
scalar from the result (`_sync`), the only completion sync this remote
backend honors (`jax.block_until_ready` has returned before execution here;
CLAUDE.md round-4 lesson). Host wall-clock therefore brackets device time to
one tunnel round-trip per timed region, amortized over the scanned reps.
The scaled MFU number carries a roofline guard: achieved > peak would mean
the sync lied, and the row is re-measured / flagged instead of reported.
bench_mfu's scanned protocol is THE canonical MFU instrument (the round-4
38.8/48.6/50.7% three-instrument disagreement is retired: exp_fused fullstep
rows timed per-dispatch chains, mfu_breakdown block_until_ready'd — both now
defer to this number for the headline claim).
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

import classifying_vae_lstm_tpu  # noqa: E402,F401  — applies the JAX_PLATFORM_NAME
# override before any backend init, so `JAX_PLATFORM_NAME=cpu python bench.py`
# works even when an ambient TPU plugin has clobbered JAX_PLATFORMS.
JSB = "/root/reference/data/input/JSB Chorales_all.pickle"
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")

BATCH = 200
SEQ = 16
DIM = 88
HID = 88
LAT = 2


def _sync(x) -> float:
    """Device-completion sync: host-fetch ONE scalar derived from ``x``.

    The only sync this remote backend honors — ``jax.block_until_ready``
    has returned BEFORE execution through the tunnel (measured 22x above
    the FLOP roofline in round 4, tools/bench_vae_scale.py). Fetching a
    scalar cannot complete until the producing program has."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


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
    _sync(m)  # warmup/compile (host-fetch: the only honored completion sync)
    # regression-grade headline: best-of-N reps with recorded spread, so a
    # 1-2% round-to-round drift is distinguishable from noise (VERDICT
    # round 2, item 7). Each rep chains n_epochs one-epoch device programs
    # through the params/opt_state carry (dedup-proof) and host-fetches once.
    n_epochs, n_reps = 5, 3
    rep_rates = []
    for rep in range(n_reps):
        t0 = time.perf_counter()
        for e in range(n_epochs):
            params, opt_state, m = trainer.train_epoch(
                params, opt_state, train, jax.random.PRNGKey(2 + rep * n_epochs + e),
                one, one, one)
        _sync(m)
        rep_rates.append(n_epochs * steps_per_epoch / (time.perf_counter() - t0))
    steps_per_sec = max(rep_rates)
    train_spread = {
        "reps_steps_per_sec": [round(r, 1) for r in rep_rates],
        "best": round(max(rep_rates), 1),
        "worst": round(min(rep_rates), 1),
        "spread_pct": round(100 * (max(rep_rates) - min(rep_rates)) / max(rep_rates), 2),
    }

    def _gen_rate(n_songs, n_steps, n_calls):
        """Best-of-3 batched-generation notes/sec at a fixed (songs, steps).

        DEVICE-TIME protocol (round 5): the n_calls reps are `lax.scan`-
        chained inside ONE jitted program — each rep generates from a fresh
        key AND its seeds are xor-perturbed by the previous rep's output (a
        true data dependency, so neither XLA nor the runtime can dedup or
        overlap reps) — and the timed region closes with a host-fetched
        scalar. Per-call host dispatch (the ~27 ms tunnel RTT that made this
        metric swing 61.7M -> 100.1M -> 55.2M notes/s across rounds 2-4) is
        out of the loop: one dispatch + one fetch per n_calls reps."""
        idx = np.arange(n_songs) % train["x"].shape[0]
        seeds = jnp.asarray(train["x"][idx])
        ws = jnp.asarray(train["w"][idx])

        def reps(seeds0, keys):
            def body(carry, k):
                out = generate_cl_vrnn_batch(params, cfg, carry, n_steps, k, ws)
                # chain: feed a bit of rep i's output into rep i+1's seeds
                # (same shapes; generation input is a binary roll, xor keeps it one)
                nxt = jnp.logical_xor(seeds0 > 0.5, out[:, : seeds0.shape[1]] > 0.5
                                      ).astype(seeds0.dtype)
                return nxt, out[0, 0, 0]
            last, outs = jax.lax.scan(body, seeds0, keys)
            return last, outs

        reps_jit = jax.jit(reps, static_argnums=())
        keys = jax.random.split(jax.random.PRNGKey(9), n_calls)
        _sync(reps_jit(seeds, keys))  # compile + warm
        gen_dt = float("inf")
        for rep in range(3):
            k2 = jax.random.split(jax.random.PRNGKey(10 + rep), n_calls)
            t0 = time.perf_counter()
            out = reps_jit(seeds, k2)
            _sync(out)
            gen_dt = min(gen_dt, (time.perf_counter() - t0) / n_calls)
        return n_songs * n_steps * DIM / gen_dt

    # BOTH generation metrics, definitions fixed across rounds (item 7):
    # reference-size = the r01 definition (32 songs x 64 steps, single-call
    # scale), serving-scale = the r02 definition (256 x 256, queued).
    notes_ref_size = _gen_rate(32, 64, n_calls=20)
    notes_serving = _gen_rate(256, 256, n_calls=10)

    backend = jax.default_backend()
    return steps_per_sec, train_spread, notes_ref_size, notes_serving, backend, float(m["loss"])


# bf16 peak FLOP/s per chip by device kind (public spec sheets); used for MFU
_PEAK_BF16 = {
    "TPU v2": 45e12,
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
    "TPU7x": 2307e12,
}


def _peak_flops(device_kind: str):
    for k in sorted(_PEAK_BF16, key=len, reverse=True):
        if k.lower() in device_kind.lower():
            return _PEAK_BF16[k]
    return None


def _cl_vrnn_train_flops(B, T, D, H, L, K, use_x_prev=True):
    """Analytic FLOPs per optimizer step (fwd + ~2x for bwd), matmuls only."""
    dec_in = L + K + (D if use_x_prev else 0)
    fwd_per_ex = (
        2 * (T * D) * D          # hW
        + 2 * D * 2 * (K - 1)    # Wargs
        + T * (2 * (D + K) * 4 * H + 2 * H * 4 * H)  # encoder LSTM
        + T * 2 * 2 * H * L      # Z_mean + Z_log_var heads
        + T * (2 * dec_in * 4 * H + 2 * H * 4 * H)   # decoder LSTM
        + T * 2 * H * D          # X head
    )
    return 3 * B * fwd_per_ex


def bench_mfu(batch=1024, hid=1024):
    """FLOP-bound config: hidden 1024, batch 1024, bf16 operands (MXU-native).

    The parity config (88-wide) is overhead-bound (~12 MFLOP/step, DESIGN.md);
    this config demonstrates the framework sustains the MXU when given
    MXU-sized shapes, reported as achieved FLOP/s and MFU vs the chip's bf16
    peak (VERDICT round 1, weak #4). Uses the Pallas fwd+bwd LSTM kernels —
    what `--lstm_backend auto` selects at this size; 1.9-2.3x the XLA scan
    step (comparison recorded in artifacts/train_scale_bench.json)."""
    import jax
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.optim import init_optimizer
    from classifying_vae_lstm_tpu.train import Trainer

    T, D, L, K = SEQ, DIM, 2, 10
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
    batch_data = {
        "x": (jax.random.uniform(kx, (batch, T, D)) < 0.1).astype(jnp.float32),
        "x_prev": (jax.random.uniform(kp, (batch, T, D)) < 0.1).astype(jnp.float32),
        "w": jax.nn.one_hot(jax.random.randint(kw, (batch,), 0, K), K),
    }
    batch_data["y"] = batch_data["x"]
    one = jnp.float32(1.0)
    # scanned-epoch regime (how Trainer.train_epoch compiles the step):
    # K steps fused into one device program, params/opt_state threaded
    # through so no two calls see identical inputs, best-of-3 whole-scan
    # reps (CLAUDE.md kernel timing protocol — per-dispatch loops measure
    # host dispatch through the remote tunnel and drift rank-unstably)
    import optax

    step_grad = jax.value_and_grad(
        lambda p, b, k: loss_fn(p, b, k, one, one, one), has_aux=True)
    n_steps = 20

    def fused_steps(p, s, b, keys):
        def body(carry, k):
            p, s = carry
            (_, m), g = step_grad(p, b, k)
            u, s = opt.update(g, s, p)
            return (optax.apply_updates(p, u), s), m
        (p, s), ms = jax.lax.scan(body, (p, s), keys)
        return p, s, jax.tree.map(jnp.mean, ms)

    fused_jit = jax.jit(fused_steps, donate_argnums=(0, 1))
    rep_keys = jax.random.split(jax.random.PRNGKey(11), 7 * n_steps).reshape(
        7, n_steps, -1)
    params, opt_state, m = fused_jit(params, opt_state, batch_data, rep_keys[0])
    _sync(m)  # compile (host-fetch: the only honored completion sync here)
    flops = _cl_vrnn_train_flops(batch, T, D, hid, L, K)
    kind = jax.devices()[0].device_kind
    peak = _peak_flops(kind)

    def _measure(rep_slice):
        nonlocal params, opt_state
        best = float("inf")
        for r in rep_slice:
            t0 = time.perf_counter()
            params, opt_state, m = fused_jit(params, opt_state, batch_data,
                                             rep_keys[r])
            _sync(m)
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best

    best = _measure(range(1, 4))
    # ROOFLINE GUARD (round-5): a measurement above the chip's bf16 peak is
    # wrong by definition — it means the sync did not cover execution. One
    # re-measure; if still impossible, report the row as invalid rather than
    # publish a fantasy MFU (CLAUDE.md round-4 lesson: 22x-over-roof reading).
    guard_violated = False
    if peak and flops / best > peak:
        best = _measure(range(4, 7))
        guard_violated = peak is not None and flops / best > peak
    steps_per_sec = 1.0 / best
    achieved = flops * steps_per_sec
    out = {
        "config": f"cl_vrnn hidden {hid}, batch {batch}, seq {T}, bf16_compute, pallas",
        "protocol": "CANONICAL MFU: 20 optimizer steps scanned into one device "
                     "program, params/opt carry chained, best-of-3, host-fetch sync",
        "steps_per_sec": round(steps_per_sec, 2),
        "model_tflops_per_step": round(flops / 1e12, 4),
        "achieved_tflops_per_sec": round(achieved / 1e12, 2),
        "device_kind": kind,
    }
    if peak:
        out["peak_bf16_tflops"] = peak / 1e12
        out["mfu"] = None if guard_violated else round(achieved / peak, 4)
        if guard_violated:
            out["error"] = "roofline violated twice: sync not covering execution"
    return out


def _env_fingerprint():
    """CPU-baseline environment; a changed machine invalidates the cache
    (VERDICT round 1, weak #5)."""
    import platform

    import torch

    cpu = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    cpu = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {
        "cpu_model": cpu,
        "n_cpus": os.cpu_count(),
        "torch_version": torch.__version__,
        "platform": platform.platform(),
    }


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


def _require_backend(timeout_s: float = 300.0, _init_fn=None) -> dict:
    """Probe device-backend init under a watchdog.

    Returns ``{'backend': name}`` on success, ``{'error': traceback}`` if init
    raised, or ``{}`` if it is still hanging after ``timeout_s``. A half-dead
    TPU tunnel can accept connections but never answer, hanging backend init
    indefinitely; a bench that detects that and errors is recoverable by the
    driver, one that hangs is not. Init runs in a daemon thread so the
    timeout works even though jax's init is not interruptible. ``_init_fn``
    is a test seam (must set ``result['backend']`` on success).
    """
    import threading

    result = {}

    def init(result=result):
        try:
            import jax

            result["backend"] = jax.default_backend()
        except Exception as e:  # fast hard failure ≠ hang: report the cause
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=_init_fn or init, daemon=True,
                         kwargs={"result": result} if _init_fn else {})
    t.start()
    t.join(timeout_s)
    return result


def _probe_backend_subprocess(timeout_s: float) -> dict:
    """Backend-init probe in a FRESH subprocess. Retrying init inside one
    process is useless — jax's backend singleton stays poisoned once an init
    thread hangs on a half-dead tunnel — so transient-flap retries must probe
    out-of-process and only let the parent import jax after a probe succeeds."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             # the package import applies the same platform-selection fixes
             # the parent relies on (JAX_PLATFORM_NAME honored under an
             # ambient plugin's JAX_PLATFORMS clobber)
             "import classifying_vae_lstm_tpu, jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return {}
    if out.returncode == 0 and out.stdout.strip():
        return {"backend": out.stdout.strip().splitlines()[-1]}
    return {"error": (out.stderr or "probe subprocess failed").strip()[-400:]}


def main():
    timeout_s = float(os.environ.get("CVL_BENCH_INIT_TIMEOUT_S", "300"))
    # Transient tunnel flaps: probe out-of-process with bounded retries
    # before committing this process to a jax import it cannot un-hang.
    retries = int(os.environ.get("CVL_BENCH_INIT_RETRIES", "2"))
    wait_s = float(os.environ.get("CVL_BENCH_INIT_RETRY_WAIT_S", "90"))
    probe = _probe_backend_subprocess(timeout_s)
    for _ in range(retries):
        if "backend" in probe:
            break
        time.sleep(wait_s)
        probe = _probe_backend_subprocess(timeout_s)
    if "backend" in probe:
        # tunnel answers; now init in-process under the original watchdog
        probe = _require_backend(timeout_s)
    if "backend" not in probe:
        print(json.dumps({
            "metric": "cl_vrnn train steps/sec per chip (JSB-all, batch 200, seq 16)",
            "value": 0,
            "unit": "steps/sec",
            "vs_baseline": 0,
            "error": probe.get(
                "error",
                f"device backend init did not complete within {timeout_s:.0f}s "
                "(TPU tunnel unreachable?)"),
            "note": "hardware unreachable this run; last measured numbers live "
                    "in BENCH_r*.json and artifacts/{train_scale_bench,"
                    "generate_bench,lstm_bwd_bench,mfu_breakdown}.json",
        }), flush=True)  # flush: os._exit skips interpreter io cleanup
        # the hung init thread may hold runtime locks — hard-exit, not sys.exit
        os._exit(1)
    env = _env_fingerprint()
    base = None
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        # a cached number from a different machine/torch silently skews the
        # headline ratio — re-measure on any environment change
        if cached.get("environment") == env:
            base = cached["cpu_steps_per_sec"]
    if base is None:
        base = bench_cpu_baseline()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"cpu_steps_per_sec": base, "environment": env}, f, indent=1)
    steps, train_spread, notes_ref, notes_serving, backend, loss = bench_tpu()
    mfu = bench_mfu()
    print(json.dumps({
        "metric": "cl_vrnn train steps/sec per chip (JSB-all, batch 200, seq 16)",
        "value": round(steps, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps / base, 2),
        "baseline_cpu_steps_per_sec": round(base, 2),
        "baseline_environment": env,
        "train_steps_spread": train_spread,  # best-of-N + variance (item 7)
        # fixed definitions, comparable across rounds:
        "sampled_notes_per_sec": round(notes_serving, 1),  # = serving-scale (r02 def)
        "gen_notes_per_sec_reference_size": round(notes_ref, 1),  # 32x64 (r01 def)
        "gen_notes_per_sec_serving_scale": round(notes_serving, 1),  # 256x256
        "backend": backend,
        "final_epoch_loss": round(loss, 3),
        "scaled_flop_bound": mfu,  # the CANONICAL MFU instrument (round 5)
        "timing_protocol": "device-time: scan-chained reps in one program, "
                           "host-fetch-scalar completion sync (round 5)",
    }))


if __name__ == "__main__":
    main()
