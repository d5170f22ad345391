"""Compiled autoregressive generation.

The reference generates one frame at a time from Python, crossing the
Python<->runtime boundary 2-3 times per timestep (``cl_vae/model.py:28-41``,
``cl_vrnn/model.py:47-59``; SURVEY §3.5 calls this the dominant inefficiency).
Here whole songs are ONE device program: a ``jax.lax.scan`` over timesteps
with on-device PRNG draws (Bernoulli frame sampling, Gaussian z, Logistic-
Normal w), and ``jax.vmap`` over songs for batched multi-song sampling
(BASELINE.json config 5).

Semantics parity notes:

* cl_vae: w is inferred ONCE from the seed frame (deterministic softmax of the
  mean logits unless ``w_sample``), the decoder history input lags one step
  (``x_prev_t``, reference ``cl_vae/model.py:23,40``), and ``use_z_prior``
  samples z from N(0, I) (reference :30-33);
* cl_vrnn: w is the average of Logistic-Normal draws over seq_length-sized
  chunks of the seed. The reference iterates chunks over ``x_seed.shape[1]``
  — the *pitch* axis, quirk Q7 — which accidentally works for t <= 88; we
  chunk the time axis (the evident intent). LSTM state is carried explicitly
  through the scan (the reference carries it implicitly in stateful Keras
  submodels, and its z-encoder LSTM weights were never copied — quirk Q3 —
  which we fix by sharing the trained params).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import cl_vae, cl_vrnn
from ..nn.distributions import (
    logistic_normal_from_eps,
    sample_gaussian,
    sample_logistic_normal,
    sample_w_discrete,
    sample_w_discrete_from_u,
)


@functools.partial(
    jax.jit, static_argnames=("cfg", "nsteps", "use_z_prior", "w_sample", "return_probs")
)
def generate_cl_vae(params, cfg: cl_vae.Config, x_seed, nsteps: int, key, w_val=None,
                    use_z_prior: bool = False, w_sample: bool = False,
                    return_probs: bool = False):
    """Generate ``nsteps`` frames from a single seed frame ``x_seed [D]``.

    Returns ``[nsteps, D]`` binary frames. ``w_val`` ([K] one-hot or simplex
    point) overrides key inference (reference ``cl_vae/model.py:24-27``).
    """
    key, kw = jax.random.split(key)
    x0 = x_seed[None, :]
    if w_val is None:
        w_mean, w_log_var = cl_vae.encode_w(params, x0)
        w = sample_logistic_normal(kw, w_mean, w_log_var, add_noise=w_sample)
    else:
        w = w_val[None, :]

    def step(carry, k):
        x_prev, x_prev_t = carry
        kz, kx = jax.random.split(k)
        z_mean, z_log_var = cl_vae.encode_z(params, cfg, x_prev, w)
        if use_z_prior:
            z = sample_gaussian(kz, jnp.zeros_like(z_mean), jnp.zeros_like(z_log_var))
        else:
            z = sample_gaussian(kz, z_mean, z_log_var)
        x_mean = cl_vae.decode(params, cfg, w, z, x_prev_t if cfg.use_x_prev else None)
        x_t = jax.random.bernoulli(kx, x_mean).astype(x_mean.dtype)
        return (x_t, x_prev), (x_mean[0] if return_probs else x_t[0])

    keys = jax.random.split(key, nsteps)
    _, xs = jax.lax.scan(step, (x0, x0), keys)
    return xs


@functools.partial(
    jax.jit, static_argnames=("cfg", "nsteps", "use_z_prior", "return_probs")
)
def generate_cl_vae_batch_noise(params, cfg: cl_vae.Config, x_seeds, nsteps: int,
                                eps, u, ws, use_z_prior: bool = False,
                                return_probs: bool = False):
    """Batched cl_vae generation with explicit pre-drawn noise.

    Same math as :func:`generate_cl_vae` batched directly over songs:
    ``x_seeds [B, D]``, ``eps [B, nsteps, L]`` Gaussian draws for z (used as
    the prior sample itself under ``use_z_prior``), ``u [B, nsteps, D]``
    Bernoulli uniforms, ``ws [B, K]`` simplex points. The decoder history
    input lags one step (``x_prev_t``, reference ``cl_vae/model.py:23,40``).
    """
    if eps.shape[1] != nsteps or u.shape[1] != nsteps:
        raise ValueError(
            f"noise drawn for {eps.shape[1]}/{u.shape[1]} steps, nsteps={nsteps}")

    def step(carry, xs):
        x_prev, x_prev_t = carry
        eps_t, u_t = xs
        z_mean, z_log_var = cl_vae.encode_z(params, cfg, x_prev, ws)
        z = eps_t if use_z_prior else z_mean + jnp.exp(z_log_var / 2) * eps_t
        x_mean = cl_vae.decode(params, cfg, ws, z, x_prev_t if cfg.use_x_prev else None)
        x_t = (u_t < x_mean).astype(x_mean.dtype)
        return (x_t, x_prev), (x_mean if return_probs else x_t)

    xs_t = (jnp.swapaxes(eps, 0, 1), jnp.swapaxes(u, 0, 1))
    _, out = jax.lax.scan(step, (x_seeds, x_seeds), xs_t)
    return jnp.swapaxes(out, 0, 1)


def generate_cl_vae_batch(params, cfg, x_seeds, nsteps, key, w_vals=None,
                          use_z_prior: bool = False, w_sample: bool = False,
                          return_probs: bool = False):
    """Batched cl_vae generation: [N, D] -> [N, nsteps, D].

    One batched scan over explicit pre-drawn noise (the vmap-of-per-song-
    scans form was measured 5x slower at these degenerate [1, D] shapes —
    `artifacts/generate_bench.json`, cl_vrnn row; same structure here).
    ``w_vals`` overrides per-song key inference, as in the reference driver.
    When the config selects the pallas generation backend and the model fits
    VMEM (:mod:`..ops.pallas_generate_vae`), the whole loop runs in one
    fused kernel with the weights resident, like the cl_vrnn family.
    """
    from ..ops import pallas_generate_vae

    use_fused = pallas_generate_vae.should_use(cfg, x_seeds.shape[0])
    return _vae_batch_with_drawn_noise(
        params, cfg, x_seeds, nsteps, key, w_vals, use_z_prior, w_sample,
        return_probs, use_fused)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "nsteps", "use_z_prior", "w_sample", "return_probs", "use_fused"))
def _vae_batch_with_drawn_noise(params, cfg, x_seeds, nsteps: int, key, w_vals,
                                use_z_prior: bool, w_sample: bool,
                                return_probs: bool, use_fused: bool = False):
    """One device dispatch per request: w inference, noise draws, and the
    generation scan all inside a single jitted call."""
    from ..ops import pallas_generate_vae

    B = x_seeds.shape[0]
    kw, kn = jax.random.split(key)
    if w_vals is None:
        w_mean, w_log_var = cl_vae.encode_w(params, x_seeds)
        ws = sample_logistic_normal(kw, w_mean, w_log_var, add_noise=w_sample)
    else:
        ws = w_vals
    eps, u = draw_generation_noise(kn, B, nsteps, cfg.latent_dim, cfg.original_dim)
    if use_fused:
        return pallas_generate_vae.generate_cl_vae_batch_pallas(
            params, cfg, x_seeds, nsteps, eps, u, ws,
            use_z_prior=use_z_prior, return_probs=return_probs)
    return generate_cl_vae_batch_noise(params, cfg, x_seeds, nsteps, eps, u, ws,
                                       use_z_prior=use_z_prior,
                                       return_probs=return_probs)


@functools.partial(jax.jit, static_argnames=("cfg", "w_sample", "w_discrete"))
def infer_w_cl_vrnn(params, cfg: cl_vrnn.Config, x_seed, key,
                    w_sample: bool = False, w_discrete: bool = False):
    """Infer the key simplex point w from a seed roll ``[T, D]``.

    Averages Logistic-Normal samples over seq_length chunks of the seed
    (reference ``cl_vrnn/model.py:34-44``; time-axis chunking, Q7 fixed).
    """
    T = x_seed.shape[0]
    n_chunks = max(T // cfg.seq_length, 1)
    chunks = x_seed[: n_chunks * cfg.seq_length].reshape(n_chunks, cfg.seq_length, -1)
    w_mean, w_log_var = cl_vrnn.encode_w(params, cfg, chunks)
    kw, kd = jax.random.split(key)
    keys = jax.random.split(kw, n_chunks)
    ws = jax.vmap(lambda m, lv, k: sample_logistic_normal(k, m, lv, add_noise=w_sample))(
        w_mean, w_log_var, keys
    )
    w = jnp.mean(ws, axis=0)
    if w_discrete:
        w = sample_w_discrete(kd, w)
    return w


@functools.partial(jax.jit, static_argnames=("cfg", "w_sample", "w_discrete"))
def infer_w_cl_vrnn_noise(params, cfg: cl_vrnn.Config, x_seed, eps_w_chunks,
                          w_sample: bool = False, w_discrete: bool = False,
                          u_discrete=None):
    """:func:`infer_w_cl_vrnn` with the random draws passed in explicitly.

    ``eps_w_chunks [n_chunks, K-1]`` Gaussian draws (one per seq_length chunk
    of the seed), ``u_discrete`` a scalar uniform for the ``--discrete_w``
    inverse-CDF draw. Same math as the key-based variant; used to drive this
    sampler and ``tools/ref_oracle.RefGenCLVRNN.infer_w`` with identical noise
    (generation-semantics parity, reference ``cl_vrnn/model.py:34-44``).
    """
    T = x_seed.shape[0]
    n_chunks = max(T // cfg.seq_length, 1)
    chunks = x_seed[: n_chunks * cfg.seq_length].reshape(n_chunks, cfg.seq_length, -1)
    w_mean, w_log_var = cl_vrnn.encode_w(params, cfg, chunks)
    ws = logistic_normal_from_eps(w_mean, w_log_var, eps_w_chunks, add_noise=w_sample)
    w = jnp.mean(ws, axis=0)
    if w_discrete:
        w = sample_w_discrete_from_u(u_discrete, w)
    return w


@functools.partial(jax.jit, static_argnames=("cfg", "nsteps", "return_probs"))
def generate_cl_vrnn(params, cfg: cl_vrnn.Config, x_seed, nsteps: int, key, w,
                     return_probs: bool = False):
    """Teacher-force the seed ``[Tseed, D]``, then free-run ``nsteps`` frames.

    Returns ``[nsteps, D]`` (the post-seed frames only, reference
    ``cl_vrnn/model.py:60``). ``w`` is a [K] simplex point (from
    :func:`infer_w_cl_vrnn` or a one-hot true key).
    """
    Tseed, D = x_seed.shape
    total = Tseed + nsteps
    H = params["encoder_h"]["recurrent_kernel"].shape[0]
    w_b = w[None, :]
    seed_pad = jnp.concatenate([x_seed, jnp.zeros((nsteps, D), x_seed.dtype)], axis=0)

    def step(carry, xs):
        h_e, c_e, h_d, c_d, x_prev = carry
        t, seed_t, k = xs
        kz, kx = jax.random.split(k)
        x_in = jnp.where(t < Tseed, seed_t[None, :], x_prev)
        z_mean, z_log_var, h_e, c_e = cl_vrnn.encode_z_step(params, x_in, w_b, h_e, c_e)
        z = sample_gaussian(kz, z_mean, z_log_var)
        x_mean, h_d, c_d = cl_vrnn.decode_step(
            params, cfg, z, w_b, h_d, c_d, x_prev=x_in if cfg.use_x_prev else None
        )
        x_t = jax.random.bernoulli(kx, x_mean).astype(x_mean.dtype)
        return (h_e, c_e, h_d, c_d, x_t), (x_mean[0] if return_probs else x_t[0])

    zeros = jnp.zeros((1, H), x_seed.dtype)
    keys = jax.random.split(key, total)
    init = (zeros, zeros, zeros, zeros, jnp.zeros((1, D), x_seed.dtype))
    _, xs = jax.lax.scan(step, init, (jnp.arange(total), seed_pad, keys))
    return xs[Tseed:]


def generate_cl_vrnn_batch(params, cfg, x_seeds, nsteps, key, ws):
    """Batched generation: [N, Tseed, D] -> [N, nsteps, D].

    Pre-draws the sampling noise and runs the noise-explicit batched scan —
    measured 5x the vmap-of-per-song-scans form even at reference sizes
    (1.5 vs 7.8 ms for 32x64 frames; `artifacts/generate_bench.json`). When
    the config selects the pallas backend and the model fits the fused
    whole-generation kernel's VMEM budget (:mod:`..ops.pallas_generate`),
    the entire loop runs in one kernel with the weights resident — another
    3.7x at hidden 512 serving scale.
    """
    from ..ops import pallas_generate

    use_fused = pallas_generate.should_use(cfg, x_seeds.shape[0])
    # the noise draw happens INSIDE the jitted call: one device dispatch per
    # request instead of three (matters over a remote-dispatch link, and
    # lets XLA overlap the draws with the seed prep)
    return _batch_with_drawn_noise(params, cfg, x_seeds, nsteps, key, ws, use_fused)


@functools.partial(jax.jit, static_argnames=("cfg", "nsteps", "use_fused"))
def _batch_with_drawn_noise(params, cfg, x_seeds, nsteps: int, key, ws,
                            use_fused: bool):
    from ..ops import pallas_generate

    B, Tseed, D = x_seeds.shape
    eps, u = draw_generation_noise(key, B, Tseed + nsteps, cfg.latent_dim, D)
    if use_fused:
        return pallas_generate.generate_cl_vrnn_batch_pallas(
            params, cfg, x_seeds, nsteps, eps, u, ws)
    return generate_cl_vrnn_batch_noise(params, cfg, x_seeds, nsteps, eps, u, ws)


@functools.partial(jax.jit, static_argnames=("cfg", "nsteps", "return_probs"))
def generate_cl_vrnn_batch_noise(params, cfg: cl_vrnn.Config, x_seeds, nsteps: int,
                                 eps, u, ws, return_probs: bool = False):
    """Batched generation with EXPLICIT pre-drawn noise (deterministic).

    Same math as :func:`generate_cl_vrnn` but batched directly over songs
    (one scan, [B, .] carries) and parameterized by its random draws:
    ``eps [B, total, L]`` Gaussian for z, ``u [B, total, D]`` uniforms for the
    Bernoulli frame draws (``x_t = (u_t < x_mean)`` — the same comparison
    ``jax.random.bernoulli`` performs). This is the sampling-noise analog of a
    functional PRNG: the sampler becomes a pure function, which lets the
    Pallas fused-generation kernel (:mod:`..ops.pallas_generate`) be verified
    EXACTLY against this reference and makes any sampled artifact replayable.
    """
    B, Tseed, D = x_seeds.shape
    total = Tseed + nsteps
    H = params["encoder_h"]["recurrent_kernel"].shape[0]
    seed_pad = jnp.concatenate(
        [x_seeds, jnp.zeros((B, nsteps, D), x_seeds.dtype)], axis=1)

    def step(carry, xs):
        h_e, c_e, h_d, c_d, x_prev = carry
        t, seed_t, eps_t, u_t = xs
        x_in = jnp.where(t < Tseed, seed_t, x_prev)
        z_mean, z_log_var, h_e, c_e = cl_vrnn.encode_z_step(params, x_in, ws, h_e, c_e)
        z = z_mean + jnp.exp(z_log_var / 2) * eps_t
        x_mean, h_d, c_d = cl_vrnn.decode_step(
            params, cfg, z, ws, h_d, c_d, x_prev=x_in if cfg.use_x_prev else None
        )
        x_t = (u_t < x_mean).astype(x_mean.dtype)
        return (h_e, c_e, h_d, c_d, x_t), (x_mean if return_probs else x_t)

    zeros = jnp.zeros((B, H), x_seeds.dtype)
    init = (zeros, zeros, zeros, zeros, jnp.zeros((B, D), x_seeds.dtype))
    xs_t = (jnp.arange(total), jnp.swapaxes(seed_pad, 0, 1),
            jnp.swapaxes(eps, 0, 1), jnp.swapaxes(u, 0, 1))
    _, out = jax.lax.scan(step, init, xs_t)
    return jnp.swapaxes(out, 0, 1)[:, Tseed:]


def draw_generation_noise(key, B: int, total: int, latent_dim: int, D: int):
    """(eps [B, total, L], u [B, total, D]) for the noise-explicit samplers."""
    ke, ku = jax.random.split(key)
    return (jax.random.normal(ke, (B, total, latent_dim)),
            jax.random.uniform(ku, (B, total, D)))


def generate_cl_vrnn_batch_dp(params, cfg, x_seeds, nsteps: int, key, ws, mesh):
    """Data-parallel batched generation over a device mesh.

    Songs shard over the mesh's ``'data'`` axis via ``jax.shard_map`` — the
    sampler is embarrassingly parallel across songs, so the per-device program
    has ZERO collectives; params replicate, each device generates its shard.
    Because the noise is pre-drawn globally and sharded with the songs, the
    output is EXACTLY what the single-device sampler produces for the same key
    (tested on the 8-device CPU mesh). Inside ``shard_map`` every device sees
    its local shard shapes, so this composes with the fused Pallas generation
    kernel (:mod:`..ops.pallas_generate`) — the multi-chip serving story.

    ``x_seeds.shape[0]`` must divide by the data-axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops import pallas_generate

    B, Tseed, D = x_seeds.shape
    n_data = mesh.shape["data"]
    if B % n_data != 0:
        raise ValueError(f"batch {B} not divisible by data axis {n_data}")
    eps, u = draw_generation_noise(key, B, Tseed + nsteps, cfg.latent_dim, D)
    use_fused = pallas_generate.should_use(cfg, B // n_data)
    fn = _dp_generate_fn(cfg, mesh, nsteps, use_fused)
    # no-op when already replicated on this mesh (the serving engine
    # pre-replicates once); a one-time transfer otherwise
    params = jax.device_put(params, NamedSharding(mesh, P()))
    return fn(params, x_seeds, eps, u, ws)


def generate_cl_vae_batch_dp(params, cfg, x_seeds, nsteps: int, key, ws, mesh):
    """Data-parallel cl_vae batched generation over a device mesh.

    Same design as :func:`generate_cl_vrnn_batch_dp`: songs shard over the
    mesh's ``'data'`` axis via ``jax.shard_map`` with ZERO collectives
    (params replicate, each device generates its shard), and the globally
    pre-drawn noise shards with the songs so the output is EXACTLY the
    single-device sampler's for the same key. Composes with the fused
    cl_vae generation kernel (:mod:`..ops.pallas_generate_vae`) inside
    shard_map. ``x_seeds.shape[0]`` must divide by the data-axis size;
    ``ws=None`` infers the deterministic mean-logit simplex point per seed
    (the sampler's ``w_val=None`` default, reference cl_vae/model.py:24-27).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..nn.distributions import logistic_normal_from_eps
    from ..ops import pallas_generate_vae

    B, D = x_seeds.shape
    n_data = mesh.shape["data"]
    if B % n_data != 0:
        raise ValueError(f"batch {B} not divisible by data axis {n_data}")
    if ws is None:
        w_mean, w_log_var = cl_vae.encode_w(params, x_seeds)
        ws = logistic_normal_from_eps(w_mean, w_log_var, None, add_noise=False)
    eps, u = draw_generation_noise(key, B, nsteps, cfg.latent_dim, D)
    use_fused = pallas_generate_vae.should_use(cfg, B // n_data)
    fn = _dp_vae_generate_fn(cfg, mesh, nsteps, use_fused)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    return fn(params, x_seeds, eps, u, ws)


@functools.lru_cache(maxsize=64)
def _dp_vae_generate_fn(cfg, mesh, nsteps: int, use_fused: bool):
    """Cached jitted shard_map cl_vae sampler (see :func:`_dp_generate_fn`)."""
    from jax.sharding import PartitionSpec as P

    from ..ops import pallas_generate_vae

    def per_device(params, seeds, eps, u, ws):
        if use_fused:
            return pallas_generate_vae.generate_cl_vae_batch_pallas(
                params, cfg, seeds, nsteps, eps, u, ws)
        return generate_cl_vae_batch_noise(params, cfg, seeds, nsteps, eps, u, ws)

    repl, shard = P(), P("data")
    return jax.jit(jax.shard_map(per_device, mesh=mesh,
                                 in_specs=(repl, shard, shard, shard, shard),
                                 out_specs=shard, check_vma=False))


@functools.lru_cache(maxsize=64)
def _dp_generate_fn(cfg, mesh, nsteps: int, use_fused: bool):
    """Cached jitted shard_map sampler per (cfg, mesh, nsteps, backend) —
    rebuilding the closure per request would miss jax's trace cache (function
    identity is part of the key) and recompile on every serving call."""
    from jax.sharding import PartitionSpec as P

    from ..ops import pallas_generate

    def per_device(params, seeds, eps, u, ws):
        if use_fused:
            return pallas_generate.generate_cl_vrnn_batch_pallas(
                params, cfg, seeds, nsteps, eps, u, ws)
        return generate_cl_vrnn_batch_noise(params, cfg, seeds, nsteps, eps, u, ws)

    repl, shard = P(), P("data")
    return jax.jit(jax.shard_map(per_device, mesh=mesh,
                                 in_specs=(repl, shard, shard, shard, shard),
                                 out_specs=shard, check_vma=False))
