"""classifying_vae_lstm_tpu — a TPU-native JAX framework with the capabilities of
`mobeets/classifying-vae-lstm`.

Two model families (reference: /root/reference/README.md:3-9):

* **Classifying VAE** (:mod:`.models.cl_vae`) — per-frame VAE over 88-pitch binary
  piano-roll vectors with a discrete latent *key* class modeled as a Logistic-Normal
  distribution (reference ``cl_vae/model.py:130-224``).
* **Classifying VAE+LSTM** (:mod:`.models.cl_vrnn`) — STORN-style sequence model:
  LSTM encoder -> per-timestep Gaussian latents -> LSTM decoder, plus the same
  Logistic-Normal key latent (reference ``cl_vrnn/model.py:164-267``).

Design stance (TPU-first, not a port):

* all compute paths are pure functions over explicit parameter pytrees, compiled
  with ``jax.jit`` — no graph surgery, no stateful submodels;
* the time axis runs under ``jax.lax.scan`` (training BPTT and autoregressive
  generation alike), with an optional Pallas fused-LSTM kernel in :mod:`.ops`;
* whole epochs execute as a single device program (shuffle + minibatch scan),
  eliminating the per-batch Python<->runtime crossing of the reference;
* data parallelism is expressed with ``jax.sharding.Mesh`` + ``NamedSharding``;
  XLA inserts the gradient all-reduce over ICI (:mod:`.parallel`).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORM_NAME"):
    # Honor an explicit platform request even under ambient TPU plugins that
    # pre-import jax and overwrite JAX_PLATFORMS in os.environ (the env-var
    # selection path then reads the plugin's value, and a half-dead plugin
    # backend can HANG initialization instead of failing over to CPU).
    # JAX_PLATFORM_NAME survives such clobbering, and config.update works any
    # time before first backend use.
    # Precedence note: when both are set, JAX_PLATFORM_NAME wins for this
    # package. The ambient-plugin environment exports JAX_PLATFORMS
    # unconditionally (shell profile), so its presence carries no signal
    # about user intent and warning on the conflict would fire on every
    # documented `JAX_PLATFORM_NAME=cpu` run. The harmful misuse — a TPU
    # measurement tool silently landing on CPU — is caught instead by
    # `assert jax.default_backend() == "tpu"` in every TPU-only tool.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORM_NAME"])
    except RuntimeError:
        # backend already initialized — too late to redirect; say so instead
        # of silently running on whatever backend won the race
        import warnings as _warnings

        _warnings.warn(
            f"JAX_PLATFORM_NAME={_os.environ['JAX_PLATFORM_NAME']!r} was set but the "
            "jax backend was already initialized before classifying_vae_lstm_tpu was "
            "imported; the platform request is being IGNORED. Import this package "
            "(or set jax.config.update('jax_platforms', ...)) before first device use.",
            RuntimeWarning,
            stacklevel=2,
        )

from . import data, models, nn, ops, optim, parallel, sampling, train, utils  # noqa: E402,F401


def __getattr__(name):
    # heavier optional subsystems load lazily
    if name in ("evaluation", "serving", "runtime", "cli"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
