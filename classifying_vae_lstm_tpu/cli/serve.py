"""HTTP serving frontend for trained cl_vrnn models.

    python -m classifying_vae_lstm_tpu.cli.serve -i data/models/run.npz --port 8787

Endpoints (JSON):
  GET  /healthz          -> {"ok": true}
  GET  /stats            -> engine counters (requests, songs, compiles, ...)
  POST /generate         -> {"n": 2, "t": 64, "infer_w": true, "key": "C",
                             "format": "roll" | "midi_base64"}
                            returns rolls (nested lists) or base64 .mid files

Deployment counterpart the reference lacks: generation is the compiled
whole-song scan, bucketed and pre-warmed by :class:`..serving.GenerationEngine`
so steady-state requests never trigger XLA compilation.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..data import PianoData
from ..data.midi import MidiWriter
from ..serving import DynamicBatcher, GenerationEngine
from . import common


def build_engine(args) -> tuple[GenerationEngine, dict]:
    from ..train.checkpoint import load_model_args

    family = args.family
    if family == "auto":
        family = "cl_vae" if "intermediate_class_dim" in load_model_args(args.model_file) else "cl_vrnn"
    params, cfg, margs = common.load_model(args.model_file, family)
    if family == "cl_vrnn":
        # serving is forward-dominated: at hidden>=512 on TPU the Pallas
        # fused kernel + bf16 wins 1.2-1.4x (pallas_scale_bench.json)
        cfg = common.resolve_lstm_backend(cfg, getattr(args, "lstm_backend", "auto"))
    else:
        # cl_vae generation backend: 'auto' = the fused whole-generation
        # kernel at hidden>=512 on TPU (1.3-5.8x measured,
        # artifacts/generate_bench.json); XLA at reference sizes
        choice = getattr(args, "gen_backend", "auto")
        cfg = common.resolve_gen_backend(cfg, choice)
        if choice == "auto":
            print(f"gen_backend=auto -> {cfg.gen_backend}")
    squeeze = family == "cl_vae"
    P = PianoData(args.train_file, batch_size=1, seq_length=args.seed_len, squeeze_x=squeeze)
    seeds = P.x_test[:, 0] if family == "cl_vae" and P.x_test.ndim == 3 else P.x_test
    if family == "cl_vae" and seeds.ndim == 3:
        seeds = seeds[:, 0]
    mesh = None
    if getattr(args, "dp", 1) > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(n_data=args.dp, n_model=1)
    engine = GenerationEngine(params, cfg, seeds, P.test_song_keys, mesh=mesh,
                              dynamic_batching=getattr(args, 'dynamic_batching', False),
                              batch_window_ms=getattr(args, 'batch_window_ms',
                                                       DynamicBatcher.DEFAULT_WINDOW_MS))
    key_map = dict(P.key_map)
    return engine, key_map


def _midi_b64(roll, is_jsb: bool) -> str:
    if is_jsb:
        roll = np.repeat(roll, 2, axis=0)
    with tempfile.NamedTemporaryFile(suffix=".mid", delete=False) as f:
        path = f.name
    try:
        MidiWriter().dump_sequence_to_midi(roll, path)
        with open(path, "rb") as f:
            return base64.b64encode(f.read()).decode()
    finally:
        os.unlink(path)


def make_handler(engine: GenerationEngine, key_map: dict, is_jsb: bool):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/stats":
                # resolved backend decisions surface here the way the train
                # path records them in args.json
                resolved = {"family": engine.family,
                            "fused_gen": bool(engine._use_fused_gen)}
                if engine.family == "cl_vae":
                    resolved["gen_backend"] = engine.cfg.gen_backend
                else:
                    resolved["lstm_backend"] = engine.cfg.lstm_backend
                self._send(200, {**engine.stats, **engine.latency_stats(),
                                 **resolved})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError as e:
                    self._send(400, {"error": f"invalid JSON body: {e}"})
                    return
                n = int(req.get("n", 1))
                t = int(req.get("t", 64))
                fmt = req.get("format", "roll")
                if n < 1 or t < 1:
                    self._send(400, {"error": "n and t must be >= 1"})
                    return
                max_n = engine.BATCH_BUCKETS[-1]
                max_t = engine.STEP_BUCKETS[-1]
                if n > max_n or t > max_t:
                    self._send(400, {"error": f"n <= {max_n} and t <= {max_t} "
                                              f"(largest warmed buckets)"})
                    return
                if fmt not in ("roll", "midi_base64"):
                    self._send(400, {"error": f"unknown format {fmt!r}",
                                     "known": ["roll", "midi_base64"]})
                    return
                key_idx = key_map.get(req["key"]) if "key" in req else None
                if "key" in req and key_idx is None:
                    self._send(400, {"error": f"unknown key {req['key']!r}",
                                     "known": sorted(key_map)})
                    return
                seed_rolls = None
                if "seed_midi_base64" in req:
                    from ..data.midi import roll_from_smf_bytes

                    try:
                        seed_rolls = roll_from_smf_bytes(
                            base64.b64decode(req["seed_midi_base64"]))
                    except Exception as e:  # noqa: BLE001 — malformed client bytes
                        self._send(400, {"error": f"bad seed MIDI: {e}"})
                        return
                    if len(seed_rolls) == 0:
                        self._send(400, {"error": "seed MIDI contains no notes"})
                        return
                rolls = engine.generate(n=n, nsteps=t, key_name_index=key_idx,
                                        infer_w=bool(req.get("infer_w", True)),
                                        seed_rolls=seed_rolls)
                if fmt == "midi_base64":
                    out = {"midi_base64": [_midi_b64(r, is_jsb) for r in rolls]}
                else:
                    out = {"rolls": rolls.astype(int).tolist()}
                self._send(200, {"n": n, "t": t, **out})
            except Exception as e:  # noqa: BLE001 — report to client
                self._send(500, {"error": str(e)})

    return Handler


def serve(args):
    engine, key_map = build_engine(args)
    if args.warmup == "full":
        print("warming full bucket grid (no request will ever compile)...")
        engine.warmup()
    elif args.warmup == "background":
        engine.warmup(background=True)
    is_jsb = "jsb" in args.train_file.lower()
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(engine, key_map, is_jsb))
    print(f"serving on http://{args.host}:{args.port} (keys: {sorted(key_map)})")
    httpd.serve_forever()


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--model_file", type=str, required=True)
    parser.add_argument("--train_file", type=str, default=common.DEFAULT_TRAIN_FILE,
                        help="corpus providing seed windows")
    parser.add_argument("--seed_len", type=int, default=32, help="seed window length")
    parser.add_argument("--family", type=str, default="auto",
                        choices=["auto", "cl_vae", "cl_vrnn"])
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--lstm_backend", type=str, default="auto",
                        choices=["auto", "keep", "xla", "pallas"],
                        help="'auto' = Pallas fused kernel + bf16 at hidden>=512 on TPU")
    parser.add_argument("--gen_backend", type=str, default="auto",
                        choices=["auto", "keep", "xla", "pallas"],
                        help="cl_vae generation backend (extension): 'pallas' = "
                             "fused whole-generation kernel; 'auto' (default) = "
                             "pallas on TPU at hidden>=512 when the model fits "
                             "VMEM (1.3-5.8x, artifacts/generate_bench.json; at "
                             "sizes where f32 weights overflow VMEM, auto "
                             "escalates to bf16/int8-resident kernels — not "
                             "bit-identical to 'xla')")
    parser.add_argument("--dp", type=int, default=1,
                        help="shard generation over N devices "
                             "(data axis, both families; extension)")
    parser.add_argument("--dynamic_batching", action="store_true",
                        help="coalesce concurrent /generate requests into one "
                             "bucketed device call (bounded wait window)")
    parser.add_argument("--batch_window_ms", type=float,
                        default=DynamicBatcher.DEFAULT_WINDOW_MS,
                        help="max queueing wait for request coalescing (ms); "
                             "default sized to the remote-TPU dispatch stagger "
                             "(solo traffic bypasses the window entirely)")
    parser.add_argument("--warmup", type=str, default="full",
                        choices=["full", "background", "off"],
                        help="pre-compile the bucket grid: 'full' blocks until every "
                             "bucket is compiled; 'background' serves immediately while "
                             "a daemon thread warms largest-first; 'off' compiles lazily")
    return parser


def _main():
    common.enable_compile_cache()
    serve(build_parser().parse_args())


if __name__ == "__main__":
    _main()
