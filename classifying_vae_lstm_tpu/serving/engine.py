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

    __slots__ = ("seeds", "ws", "t", "event", "result", "error", "arrival")

    def __init__(self, seeds, ws, t):
        self.seeds = seeds  # np [k, ...]
        self.ws = ws        # np [k, K], or None -> infer w in the batch
        self.t = t          # step bucket
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.arrival = time.perf_counter()  # anchors the coalescing deadline


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

    # Default coalescing window, in ms. Sized to the remote-TPU deployment's
    # dispatch/transfer stagger (~27 ms tunnel RTT): re-firing clients of a
    # concurrent burst arrive spread over tens of ms, and a 3 ms window
    # splintered them into ~3-song groups (round-5 TPU bench). Solo traffic
    # never pays this window — the engine's solo-warm bypass short-circuits
    # the batcher when the queue is empty.
    DEFAULT_WINDOW_MS = 25.0

    def __init__(self, engine: "GenerationEngine",
                 window_ms: float = DEFAULT_WINDOW_MS,
                 max_songs: int | None = None):
        self.engine = engine
        self.window_s = window_ms / 1e3
        self.max_songs = max_songs or engine.BATCH_BUCKETS[-1]
        self._queue: list[_PendingRequest] = []
        self._cv = threading.Condition()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        # delivery pipeline: the dispatch worker must NOT host-sync between
        # groups (a per-group fetch puts a tunnel round-trip between device
        # programs), but handing each caller a lazy device-array SLICE is
        # worse on a remote deployment — every out[i:i+k] is its own device
        # dispatch (and each new (i, k) signature a mini-compile) in the
        # caller's request path. So the worker passes the WHOLE batch output
        # to this thread, which fetches it in ONE transfer and splits numpy
        # rows per caller, while the worker is already coalescing the next
        # group: dispatch and delivery pipeline, one transfer per group.
        self._delivery: list = []
        self._delivery_cv = threading.Condition()
        self._deliverer = threading.Thread(target=self._deliver_loop,
                                           daemon=True)
        self._deliverer.start()

    def submit(self, seeds: np.ndarray, ws: np.ndarray | None,
               t: int) -> np.ndarray:
        """Block until the request's songs are generated; returns [k, t, D].

        ``ws=None`` defers w-inference into the coalesced batch: ONE jitted
        ``_infer_ws`` dispatch per GROUP instead of one per request — on the
        remote-TPU deployment a per-request inference put a tunnel round-trip
        in every caller's path before it even reached the queue."""
        req = _PendingRequest(np.asarray(seeds),
                              None if ws is None else np.asarray(ws), t)
        with self._cv:
            self._queue.append(req)
            self._cv.notify()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result  # numpy rows, already fetched by the deliverer

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
        the window (or until ``max_songs`` rows are gathered).

        The deadline is anchored at the OLDEST request's arrival, not at the
        worker's loop entry: the round-5 TPU bench showed the sync-free
        worker re-entering fast and re-waiting a fresh window over a trickle
        of staggered re-arrivals, splintering a 16-client burst into ~3-song
        groups (56 batches / 160 requests). Arrival anchoring both caps the
        added latency at exactly ``window_ms`` per request and lets a group
        that already aged past the window dispatch immediately."""
        with self._cv:
            while not self._queue:
                self._cv.wait()
            t = self._queue[0].t
            infer = self._queue[0].ws is None
            deadline = self._queue[0].arrival + self.window_s
            while True:
                group, songs = [], 0
                for r in self._queue:
                    # never overshoot max_songs: a later request only joins if
                    # it FITS (the first always fits — generate() chunks
                    # oversized requests to the max bucket). Groups are
                    # homogeneous in (step bucket, w-inference): inferred-w
                    # groups run ONE batched _infer_ws, explicit-w groups
                    # concatenate caller ws — never merged.
                    if (r.t == t and (r.ws is None) == infer
                            and songs + len(r.seeds) <= self.max_songs):
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

    def _deliver_loop(self):
        while True:
            with self._delivery_cv:
                while not self._delivery:
                    self._delivery_cv.wait()
                out, group = self._delivery.pop(0)
            try:
                host = np.asarray(out)  # ONE transfer for the whole batch
            except Exception as e:  # pragma: no cover - device-side failure
                for r in group:
                    r.error = e
                    r.event.set()
                continue
            i = 0
            for r in group:
                k = len(r.seeds)
                r.result = host[i : i + k]
                i += k
                r.event.set()

    def _run_group(self, group: list[_PendingRequest]):
        eng = self.engine
        t = group[0].t
        seeds = np.concatenate([r.seeds for r in group], axis=0)
        n = len(seeds)
        b = _bucket(n, eng.BATCH_BUCKETS)
        pad = b - n
        assert pad >= 0, "oversized group — generate() must chunk to the max bucket"
        if pad:
            seeds = np.concatenate([seeds, np.repeat(seeds[:1], pad, axis=0)])
        seeds_dev = jnp.asarray(seeds)
        if group[0].ws is None:
            # inferred-w group (homogeneous, see _take_group): ONE batched
            # jitted w-inference for the whole coalesced batch, device-side —
            # no per-request dispatch, no host round-trip
            ws_dev = eng._infer_ws(seeds_dev, b)
        else:
            ws = np.concatenate([r.ws for r in group], axis=0)
            if pad:
                ws = np.concatenate([ws, np.repeat(ws[:1], pad, axis=0)])
            ws_dev = jnp.asarray(ws)
        eng._mark_bucket(b, t)
        # DISPATCH ONLY — do not host-sync in the worker (a per-group fetch
        # puts a tunnel round-trip between device programs). The jitted call
        # returns a future-like device array that the delivery thread fetches
        # whole and splits per caller; the worker immediately coalesces the
        # next group, so consecutive groups pipeline on the device.
        out = eng._run(seeds_dev, t, ws_dev)
        with eng._lock:
            eng.stats["batches"] += 1
            eng.stats["batched_songs"] += n
        with self._delivery_cv:
            self._delivery.append((out, group))
            self._delivery_cv.notify()


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
                 dynamic_batching: bool = False,
                 batch_window_ms: float = DynamicBatcher.DEFAULT_WINDOW_MS):
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

        # the pre-dispatch path stays NUMPY: on the remote-TPU deployment an
        # eager jnp op here is a per-op dispatch (+ possible per-op compile)
        # in every caller's path; the jitted _run/_infer_ws calls transfer
        # their operands themselves, once, at dispatch
        if user_seeds is not None:
            seeds = np.resize(user_seeds, (m,) + user_seeds.shape[1:])
        else:
            seeds = self.seed_bank[seed_indices]
        eye = np.eye(self.cfg.n_classes, dtype=np.float32)
        if user_seeds is not None and key_name_index is not None:
            # user seed + requested key: condition on the named key directly
            ws = np.broadcast_to(eye[key_name_index],
                                 (m, self.cfg.n_classes))
        elif infer_w or user_seeds is not None:
            if batcher is not None:
                # batcher path: defer w-inference into the coalesced group —
                # _run_group runs ONE batched jitted _infer_ws per group
                # (groups are homogeneous in needs-infer), removing a
                # per-request device dispatch from the caller's path
                ws = None
            elif self.family == "cl_vae":
                # solo path: the jitted generate program infers w itself
                # (w_vals=None) — ONE device dispatch per request; warmup
                # compiles this entry per bucket too
                ws = None
            else:
                # cl_vrnn's solo sampler takes w explicitly: jitted +
                # batch-bucketed so warmup covers every request shape
                ws = self._infer_ws(seeds, m)
        else:
            if self.seed_keys is None:
                raise ValueError("true-key conditioning needs seed_keys")
            ws = eye[np.asarray(self.seed_keys)[seed_indices]]

        try:
            if batcher is not None:
                out = batcher.submit(
                    np.asarray(seeds),
                    None if ws is None else np.asarray(ws), t)[:n, :nsteps]
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
