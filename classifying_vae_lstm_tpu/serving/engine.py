"""Serving engine: pre-compiled, bucketed, batched music generation.

Production serving needs stable latency, which under XLA means stable shapes:
every (batch, nsteps) pair is a separate compilation. The engine rounds
requests up to a fixed grid of buckets (powers of two), pre-warms the buckets
at startup, and pads/slices at the edges — so steady-state requests never
compile. Generation itself is the compiled whole-song scan from
:mod:`..sampling.generate` (one device program per request, `vmap`-batched).

The reference has no serving story at all (its sampler crosses Python<->TF 2-3
times per generated timestep, SURVEY §3.5); this module is the deployment
counterpart the rebuild adds.
"""

from __future__ import annotations

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import cl_vae, cl_vrnn
from ..sampling.generate import (
    generate_cl_vae_batch,
    generate_cl_vrnn_batch,
    infer_w_cl_vrnn,
)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class _PendingRequest:
    """One caller's songs waiting to be coalesced into a device batch."""

    __slots__ = ("seeds", "ws", "t", "event", "result", "error")

    def __init__(self, seeds, ws, t):
        self.seeds = seeds  # np [k, ...]
        self.ws = ws        # np [k, K]
        self.t = t          # step bucket
        self.event = threading.Event()
        self.result = None
        self.error = None


class DynamicBatcher:
    """Coalesces concurrent generate() calls into ONE bucketed device call.

    Under concurrent clients the per-request dispatch serializes on the
    device; the generation scan's cost is nearly flat in the batch dimension
    (it is bucket-padded anyway), so a batch of coalesced requests costs
    about one request. The worker takes the oldest pending request, waits
    ``window_ms`` for same-step-bucket company (bounded added latency),
    stacks the songs, runs the engine's bucketed ``_run`` once, and splits
    the rows back per caller. Requests with different step buckets stay
    queued for the next round — shapes inside a batch are uniform, so no
    recompilation is ever triggered by coalescing (the bucket grid is the
    same one ``warmup`` precompiles).
    """

    def __init__(self, engine: "GenerationEngine", window_ms: float = 3.0,
                 max_songs: int | None = None):
        self.engine = engine
        self.window_s = window_ms / 1e3
        self.max_songs = max_songs or engine.BATCH_BUCKETS[-1]
        self._queue: list[_PendingRequest] = []
        self._cv = threading.Condition()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, seeds: np.ndarray, ws: np.ndarray, t: int) -> np.ndarray:
        """Block until the request's songs are generated; returns [k, t, D]."""
        req = _PendingRequest(np.asarray(seeds), np.asarray(ws), t)
        with self._cv:
            self._queue.append(req)
            self._cv.notify()
        req.event.wait()
        if req.error is not None:
            raise req.error
        # result rows are a (possibly still-computing) device array slice;
        # the host fetch — and therefore the wait — happens per caller here
        return np.asarray(req.result)

    def idle(self) -> bool:
        """True when no request is queued — the engine's solo-warm BYPASS
        predicate: coalescing an unaccompanied request can only add window
        latency (and possibly padding), so ``generate()`` runs it directly
        (round-4 serving bench: dynamic batching LOST p95 at cl_vae@512,
        artifacts/serving_latency.json — this removes the loss mode)."""
        with self._cv:
            return not self._queue

    def _take_group(self) -> list[_PendingRequest]:
        """Oldest request + every same-step-bucket request that arrives within
        the window (or until ``max_songs`` rows are gathered)."""
        with self._cv:
            while not self._queue:
                self._cv.wait()
            t = self._queue[0].t
            deadline = time.perf_counter() + self.window_s
            while True:
                group, songs = [], 0
                for r in self._queue:
                    # never overshoot max_songs: a later request only joins if
                    # it FITS (the first always fits — generate() chunks
                    # oversized requests to the max bucket)
                    if r.t == t and songs + len(r.seeds) <= self.max_songs:
                        group.append(r)
                        songs += len(r.seeds)
                now = time.perf_counter()
                if songs >= self.max_songs or now >= deadline:
                    for r in group:
                        self._queue.remove(r)
                    return group
                self._cv.wait(timeout=deadline - now)

    def _loop(self):
        while True:
            group = self._take_group()
            try:
                self._run_group(group)
            except Exception as e:  # surface to every caller, keep serving
                for r in group:
                    r.error = e
                    r.event.set()

    def _run_group(self, group: list[_PendingRequest]):
        eng = self.engine
        t = group[0].t
        seeds = np.concatenate([r.seeds for r in group], axis=0)
        ws = np.concatenate([r.ws for r in group], axis=0)
        n = len(seeds)
        b = _bucket(n, eng.BATCH_BUCKETS)
        pad = b - n
        assert pad >= 0, "oversized group — generate() must chunk to the max bucket"
        if pad:
            seeds = np.concatenate([seeds, np.repeat(seeds[:1], pad, axis=0)])
            ws = np.concatenate([ws, np.repeat(ws[:1], pad, axis=0)])
        eng._mark_bucket(b, t)
        # DISPATCH ONLY — do not host-sync in the worker. The jitted call
        # returns a future-like device array; each caller fetches its own rows
        # (np.asarray blocks there). The worker immediately coalesces the next
        # group, so consecutive groups pipeline on the device exactly like the
        # serialized path's per-thread dispatch — on a remote-TPU deployment a
        # per-group block_until_ready put one tunnel round-trip BETWEEN groups.
        out = eng._run(jnp.asarray(seeds), t, jnp.asarray(ws))
        with eng._lock:
            eng.stats["batches"] += 1
            eng.stats["batched_songs"] += n
        i = 0
        for r in group:
            k = len(r.seeds)
            r.result = out[i : i + k]
            i += k
            r.event.set()


class GenerationEngine:
    """Thread-safe generation service over a loaded checkpoint.

    Serves both families: cl_vrnn (seed = a window, teacher-forced) and
    cl_vae (seed = a single frame). The family is inferred from the config
    type. Requests pad up to (batch, nsteps) buckets so steady state never
    compiles."""

    BATCH_BUCKETS = (1, 4, 16, 64)
    STEP_BUCKETS = (32, 64, 128, 256)

    def __init__(self, params, cfg, seed_bank: np.ndarray,
                 seed_keys: np.ndarray | None = None, key=None, mesh=None,
                 dynamic_batching: bool = False, batch_window_ms: float = 3.0):
        """seed_bank: [N, Tseed, D] (cl_vrnn) or [N, D] (cl_vae) test-set
        seeds; seed_keys: optional integer key label per seed (for
        key-conditioned requests and true-key conditioning); mesh: optional
        device mesh — both families shard songs over its 'data' axis
        (embarrassingly parallel, zero collectives; composes with the fused
        Pallas kernels inside shard_map); dynamic_batching: coalesce
        concurrent requests into one bucketed device call (see
        :class:`DynamicBatcher`), adding at most ``batch_window_ms`` of
        queueing latency per request."""
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            n_data = mesh.shape["data"]
            if not any(b % n_data == 0 for b in self.BATCH_BUCKETS):
                raise ValueError(
                    f"dp={n_data} divides no batch bucket {self.BATCH_BUCKETS}: "
                    "every request would silently fall back to single-device")
            # replicate ONCE so per-request device_put in the DP path is a no-op
            from jax.sharding import NamedSharding, PartitionSpec

            self.params = jax.device_put(
                params, NamedSharding(mesh, PartitionSpec()))
        self.family = "cl_vae" if isinstance(cfg, cl_vae.Config) else "cl_vrnn"
        self.seed_bank = np.asarray(seed_bank, dtype=np.float32)
        self.seed_keys = seed_keys
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "songs": 0, "gen_seconds": 0.0, "compiles": 0,
                      "batches": 0, "batched_songs": 0}
        # count of solo BYPASS dispatches currently on the device: the bypass
        # predicate (generate()) claims this under the lock so that in a
        # concurrent burst exactly ONE request runs solo and the rest queue
        # into the batcher and coalesce (without it, every burst client sees
        # an empty queue and all of them bypass — fully serialized dispatch)
        self._inflight = 0
        self._compiled: set = set()
        self._latencies: list = []  # per-request seconds (bounded ring)
        self._completions: list = []  # (completion time, songs) bounded ring
        # fused whole-generation Pallas kernel (weights resident in VMEM):
        # generate_cl_vrnn_batch dispatches to it per-request via the same
        # predicate; this attribute just surfaces the decision for /stats
        from ..ops import pallas_generate, pallas_generate_vae

        self._use_fused_gen = (
            pallas_generate.should_use(cfg, self.BATCH_BUCKETS[-1])
            if self.family == "cl_vrnn"
            else pallas_generate_vae.should_use(cfg, self.BATCH_BUCKETS[-1]))
        self._batcher = (
            DynamicBatcher(self, window_ms=batch_window_ms) if dynamic_batching else None
        )
        self._infer_ws_jit = self._make_infer_ws_jit()

    def _next_key(self):
        with self._lock:
            self._key, k = jax.random.split(self._key)
            return k

    def warmup(self, batch_buckets=None, step_buckets=None, background=False):
        """Pre-compile the FULL (batch, nsteps) bucket grid by default, so no
        request — including a worst-case 64x256 first request — ever has an
        XLA compile in its latency. ``background=True`` compiles in a daemon
        thread (largest bucket first, so the worst case is covered earliest)
        and returns the thread; the server can accept requests meanwhile.
        """
        bb = batch_buckets or self.BATCH_BUCKETS
        sb = step_buckets or self.STEP_BUCKETS
        pairs = sorted(((b, t) for b in bb for t in sb),
                       key=lambda p: -(p[0] * p[1]))

        def _all():
            for b, t in pairs:
                self._generate_bucket(b, t)
            # the infer_w request path (jitted, one entry per batch bucket)
            for b in sorted(bb, reverse=True):
                jax.block_until_ready(self._infer_ws(
                    jnp.asarray(self.seed_bank[np.arange(b) % len(self.seed_bank)]), b))

        if background:
            th = threading.Thread(target=_all, daemon=True)
            th.start()
            return th
        _all()
        return None

    def _mark_bucket(self, b: int, t: int) -> None:
        with self._lock:
            if (b, t) not in self._compiled:
                self._compiled.add((b, t))
                self.stats["compiles"] += 1

    def _generate_bucket(self, b: int, t: int):
        idx = np.arange(b) % len(self.seed_bank)
        seeds = jnp.asarray(self.seed_bank[idx])
        # explicit dtype: a weak-typed full() would compile a different cache
        # entry than the strong-f32 ws real requests (and the batcher) pass
        ws = jnp.full((b, self.cfg.n_classes), 1.0 / self.cfg.n_classes,
                      dtype=jnp.float32)
        self._mark_bucket(b, t)
        out = self._run(seeds, t, ws)
        if self.family == "cl_vae":
            # the solo infer_w request path runs the SAME program with
            # w_vals=None (w inferred in-graph) — a distinct jit entry that
            # must be warm too, or the first infer_w request compiles. Under
            # dynamic batching the empty-queue BYPASS makes this path
            # reachable as well, so warm it unconditionally.
            out = (out, self._run(seeds, t, None))
        return jax.block_until_ready(out)

    def _run(self, seeds, t, ws):
        if self.family == "cl_vae":
            # both families shard songs over the mesh's data axis (zero
            # collectives; exact vs single-device for the same key)
            if self.mesh is not None and seeds.shape[0] % self.mesh.shape["data"] == 0:
                from ..sampling.generate import generate_cl_vae_batch_dp

                return generate_cl_vae_batch_dp(
                    self.params, self.cfg, seeds, t, self._next_key(), ws, self.mesh)
            return generate_cl_vae_batch(self.params, self.cfg, seeds, t, self._next_key(),
                                         w_vals=ws)
        # generate_cl_vrnn_batch dispatches to the fused whole-generation
        # Pallas kernel itself when cfg selects it (see self._use_fused_gen)
        if self.mesh is not None and seeds.shape[0] % self.mesh.shape["data"] == 0:
            from ..sampling.generate import generate_cl_vrnn_batch_dp

            return generate_cl_vrnn_batch_dp(
                self.params, self.cfg, seeds, t, self._next_key(), ws, self.mesh)
        return generate_cl_vrnn_batch(self.params, self.cfg, seeds, t, self._next_key(), ws)

    def _make_infer_ws_jit(self):
        """One JITTED w-inference function per engine. This path MUST be
        jitted and bucket-shaped: it runs in the request path (infer_w
        requests, both families), and on a remote-TPU deployment an eager
        version costs one per-op compile + tunnel round-trip per primitive —
        measured as a ~76 s first-request stall in the round-4 serving bench
        (artifacts/serving_latency.json, cl_vae@88 dyn row) before this fix."""
        if self.family == "cl_vae":
            from ..nn.distributions import logistic_normal_from_eps

            def f(params, seeds):
                # deterministic mean-logit simplex point, the value the
                # sampler uses for w_val=None (sample_w(..., add_noise=False),
                # reference cl_vae/model.py:24-27,55-58)
                w_mean, w_log_var = cl_vae.encode_w(params, seeds)
                return logistic_normal_from_eps(w_mean, w_log_var, None,
                                                add_noise=False)

            return jax.jit(f)
        cfg = self.cfg

        def f(params, seeds, keys):
            return jax.vmap(
                lambda s, k: infer_w_cl_vrnn(params, cfg, s, k))(seeds, keys)

        return jax.jit(f)

    def _infer_ws(self, seeds, m: int):
        """Infer per-seed w for the first ``m`` seeds, padded to a batch
        bucket so warmup covers every request shape."""
        b = _bucket(m, self.BATCH_BUCKETS)
        pad = b - seeds.shape[0]
        if pad:
            seeds = jnp.concatenate(
                [seeds, jnp.repeat(seeds[:1], pad, axis=0)], axis=0)
        if self.family == "cl_vae":
            ws = self._infer_ws_jit(self.params, seeds)
        else:
            ws = self._infer_ws_jit(self.params, seeds,
                                    jax.random.split(self._next_key(), b))
        return ws[:m]

    def _coerce_seed_rolls(self, rolls: np.ndarray) -> np.ndarray:
        """Fit user rolls to the seed-bank shape (front-pad/trim the time
        axis for cl_vrnn; take the last frame for cl_vae)."""
        rolls = np.asarray(rolls, dtype=np.float32)
        if rolls.ndim == 2:  # single roll [T, D]
            rolls = rolls[None]
        if self.family == "cl_vae":
            return rolls[:, -1] if rolls.ndim == 3 else rolls
        t_seed = self.seed_bank.shape[1]
        out = np.zeros((len(rolls), t_seed, self.seed_bank.shape[2]), np.float32)
        for i, r in enumerate(rolls):
            take = min(t_seed, len(r))
            out[i, -take:] = r[-take:, : out.shape[2]]
        return out

    def generate(self, n: int = 1, nsteps: int = 64, key_name_index: int | None = None,
                 infer_w: bool = True, seed_indices=None, seed_rolls=None) -> np.ndarray:
        """Generate n songs of nsteps frames; returns [n, nsteps, 88].

        Requests are padded up to bucket sizes; the extra songs/steps are
        sliced off before returning. ``seed_rolls`` ([T, D] or [k, T, D])
        seeds from user piano-rolls (e.g. parsed MIDI) instead of the bank.
        """
        maxb = self.BATCH_BUCKETS[-1]
        if n > maxb:
            # chunk oversized requests to the max bucket (the bucket grid —
            # and the batcher — cannot represent them; pre-fix they silently
            # truncated to maxb songs on the solo path and crashed the batcher)
            outs, done = [], 0
            while done < n:
                k = min(maxb, n - done)
                si = None if seed_indices is None else np.asarray(seed_indices)[done : done + k]
                sr = None
                if seed_rolls is not None:
                    sr = self._coerce_seed_rolls(seed_rolls)
                    sr = sr[done % len(sr) : done % len(sr) + k] if len(sr) > 1 else sr
                outs.append(self.generate(k, nsteps, key_name_index, infer_w, si, sr))
                done += k
            return np.concatenate(outs, axis=0)

        t0 = time.perf_counter()
        b = _bucket(n, self.BATCH_BUCKETS)
        t = _bucket(nsteps, self.STEP_BUCKETS)
        # BYPASS: with dynamic batching but an empty queue, nothing in flight,
        # and a warm bucket, coalescing can only add window latency (+ padding
        # to the coalesced bucket) — run the one-dispatch solo path instead.
        # Round-4 measured the loss mode this removes (cl_vae@512: dyn p95
        # 339.5 vs 281.5 ms, artifacts/serving_latency.json). The in-flight
        # claim is atomic under the lock: in a concurrent burst exactly one
        # request bypasses and the rest coalesce in the batcher.
        batcher = self._batcher
        solo_claim = False
        if batcher is not None and (b, t) in self._compiled and batcher.idle():
            with self._lock:
                if self._inflight == 0:
                    self._inflight += 1
                    solo_claim = True
                    batcher = None
        # with dynamic batching, build exactly n songs and let the batcher
        # pad the COALESCED batch to a bucket; solo requests pad here
        m = n if batcher is not None else b

        user_seeds = None
        if seed_rolls is not None:
            user_seeds = self._coerce_seed_rolls(seed_rolls)
            seed_indices = np.zeros(m, dtype=np.int64)  # placeholder keys
        elif seed_indices is None:
            rng = np.random.default_rng(int(self._next_key()[0]))
            pool = np.arange(len(self.seed_bank))
            if key_name_index is not None and self.seed_keys is not None:
                pool = pool[self.seed_keys == key_name_index]
                if len(pool) == 0:
                    raise ValueError(f"no seeds with key index {key_name_index}")
            seed_indices = rng.choice(pool, size=m, replace=len(pool) < m)
        else:
            seed_indices = np.resize(np.asarray(seed_indices), m)

        if user_seeds is not None:
            seeds = jnp.asarray(np.resize(user_seeds, (m,) + user_seeds.shape[1:]))
        else:
            seeds = jnp.asarray(self.seed_bank[seed_indices])
        if user_seeds is not None and key_name_index is not None:
            # user seed + requested key: condition on the named key directly
            ws = jnp.broadcast_to(
                jax.nn.one_hot(key_name_index, self.cfg.n_classes),
                (m, self.cfg.n_classes))
        elif infer_w or user_seeds is not None:
            if self.family == "cl_vae" and batcher is None:
                # solo path: the jitted generate program infers w itself
                # (w_vals=None) — ONE device dispatch per request; warmup
                # compiles this entry per bucket too
                ws = None
            else:
                # the batcher needs one coalesced ws array (and cl_vrnn's
                # sampler always takes w explicitly): jitted + batch-bucketed
                # so warmup covers every request shape — for cl_vae the value
                # equals what the sampler computes for w_val=None, the
                # deterministic mean-logit point
                ws = self._infer_ws(seeds, m)
        else:
            if self.seed_keys is None:
                raise ValueError("true-key conditioning needs seed_keys")
            ws = jax.nn.one_hot(jnp.asarray(self.seed_keys[seed_indices]), self.cfg.n_classes)

        try:
            if batcher is not None:
                out = batcher.submit(np.asarray(seeds), np.asarray(ws), t)[:n, :nsteps]
            else:
                self._mark_bucket(b, t)
                out = self._run(seeds, t, ws)
                out = np.asarray(jax.block_until_ready(out))[:n, :nsteps]
        finally:
            if solo_claim:
                with self._lock:
                    self._inflight -= 1
        dt = time.perf_counter() - t0
        with self._lock:
            self.stats["requests"] += 1
            self.stats["songs"] += n
            self.stats["gen_seconds"] += dt
            self._latencies.append(dt)
            self._completions.append((time.perf_counter(), n))
            if len(self._latencies) > 1024:  # bounded window
                self._latencies = self._latencies[-1024:]
                self._completions = self._completions[-1024:]
        return out

    def latency_stats(self) -> dict:
        """p50/p95/p99 request latency (ms) + songs/sec over the recent window.

        Throughput uses completion timestamps, so overlapping (concurrent or
        coalesced) requests are counted against wall-clock, not summed
        per-request time."""
        with self._lock:
            lats = list(self._latencies)
            comps = list(self._completions)
        out = {"p50_ms": None, "p95_ms": None, "p99_ms": None, "songs_per_sec": None}
        if lats:
            q = np.percentile(np.asarray(lats) * 1e3, [50, 95, 99])
            out.update(p50_ms=round(float(q[0]), 2), p95_ms=round(float(q[1]), 2),
                       p99_ms=round(float(q[2]), 2))
        if len(comps) >= 2:
            span = comps[-1][0] - comps[0][0]
            if span > 0:
                # first completion's songs were in flight before the window
                out["songs_per_sec"] = round(sum(n for _, n in comps[1:]) / span, 2)
        return out
