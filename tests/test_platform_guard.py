"""Robustness guards around device-backend selection.

Two failure modes seen on real infrastructure, both caused by an ambient TPU
plugin whose remote tunnel went half-dead (accepts connections, never
answers):

1. env-var platform selection (``JAX_PLATFORMS=cpu``) stopped working because
   the plugin's sitecustomize pre-imports jax and overwrites ``JAX_PLATFORMS``
   in ``os.environ`` — the package now honors ``JAX_PLATFORM_NAME`` (which
   survives the clobbering) via ``jax.config.update`` at import;
2. ``bench.py`` hung forever in backend init — it now fails fast with an
   error JSON line (``_require_backend`` watchdog).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_import_honors_jax_platform_name():
    """JAX_PLATFORM_NAME=cpu must pin the backend even if JAX_PLATFORMS says
    otherwise at import time (subprocess: conftest already configured this
    interpreter)."""
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "bogus_platform"  # stands in for the plugin's clobber
    out = subprocess.run(
        [sys.executable, "-c",
         "import classifying_vae_lstm_tpu, jax; print(jax.default_backend())"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"


def test_bench_require_backend_returns_backend():
    sys.path.insert(0, REPO)
    import bench

    # conftest pinned this process to CPU; init completes immediately
    assert bench._require_backend(timeout_s=60.0) == {"backend": "cpu"}


def test_bench_require_backend_times_out_on_hung_init():
    sys.path.insert(0, REPO)
    import bench

    def hung_init(result):
        time.sleep(30)
        result["backend"] = "too_late"

    t0 = time.monotonic()
    assert bench._require_backend(timeout_s=0.2, _init_fn=hung_init) == {}
    assert time.monotonic() - t0 < 5


def test_bench_require_backend_reports_fast_failure(monkeypatch, capsys):
    """A backend that errors out quickly is reported as its own error, not as
    a watchdog timeout."""
    sys.path.insert(0, REPO)
    import json as _json

    import bench

    def failing_init(result):
        result["error"] = "RuntimeError: no such platform"

    # the out-of-process pre-probe must be stubbed too: unpatched it spawns a
    # real subprocess that inherits the harness JAX_PLATFORMS and hangs
    # against a dead tunnel (this stalled a full suite run for real)
    monkeypatch.setattr(bench, "_probe_backend_subprocess",
                        lambda *a, **k: {"backend": "cpu"})
    monkeypatch.setattr(bench, "_require_backend",
                        lambda *a, **k: {"error": "RuntimeError: no such platform"})
    monkeypatch.setattr(bench.os, "_exit",
                        lambda code: (_ for _ in ()).throw(SystemExit(code)))
    try:
        bench.main()
    except SystemExit:
        pass
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["error"] == "RuntimeError: no such platform"


def test_bench_main_emits_error_schema_on_timeout(monkeypatch, capsys):
    """When backend init times out, main() prints ONE JSON line in the driver
    schema (metric/value/unit/vs_baseline + error) and hard-exits nonzero
    instead of hanging. (The ambient TPU plugin clobbers JAX_PLATFORMS in
    subprocesses, so the hang itself can't be staged deterministically —
    the timeout decision is injected instead.)"""
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setenv("CVL_BENCH_INIT_RETRIES", "1")
    monkeypatch.setenv("CVL_BENCH_INIT_RETRY_WAIT_S", "0")
    probes = []
    monkeypatch.setattr(bench, "_probe_backend_subprocess",
                        lambda *a, **k: (probes.append(1), {})[-1])
    monkeypatch.setattr(bench, "_require_backend", lambda *a, **k: {})
    exit_codes = []
    monkeypatch.setattr(bench.os, "_exit",
                        lambda code: (exit_codes.append(code),
                                      (_ for _ in ()).throw(SystemExit(code))))
    try:
        bench.main()
    except SystemExit:
        pass
    assert exit_codes == [1]
    assert len(probes) == 2  # initial probe + CVL_BENCH_INIT_RETRIES=1 retry
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] == 0 and rec["vs_baseline"] == 0
    assert "error" in rec and rec["unit"] == "steps/sec"
