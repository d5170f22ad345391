"""Core layers as pure functions over explicit parameter pytrees.

The reference builds Keras graphs (``cl_vae/model.py:130-224``,
``cl_vrnn/model.py:164-267``); here every layer is ``init_*`` (returns a param
dict) + an apply function. This dissolves the reference's "model surgery"
(``make_w_encoder``/``make_z_encoder``/``make_decoder``) — extracting a decoder
is just passing the decoder's sub-pytree to its apply function.

Initializers match Keras 2.0.0 defaults for training-dynamics parity
(SURVEY §7 hard part (c)): ``glorot_uniform`` kernels, ``orthogonal`` recurrent
kernels, zero biases with a unit forget-gate bias for LSTM, and the explicit
``RandomNormal(0, 0.1)`` heads the cl_vrnn model uses
(``cl_vrnn/model.py:200-207,229-233``).

Matmul convention: activations are row-major ``[batch..., features]`` and
kernels are ``[in, out]`` so every dense/LSTM input projection is a single MXU
matmul; parameters are stored float32 and compute can run bfloat16 via the
``dtype`` argument on apply functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def glorot_uniform(key, shape, dtype=jnp.float32):
    """Keras 2.0 default kernel initializer: U(-l, l), l = sqrt(6/(fan_in+fan_out))."""
    fan_in, fan_out = shape[0], shape[1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def orthogonal(key, shape, dtype=jnp.float32):
    """Keras 2.0 recurrent initializer: orthogonal via QR of a standard normal.

    QR runs on host in float64 (init-time only) — float32 QR on some backends
    loses orthogonality at the 1e-3 level, which hurts early training dynamics.
    """
    n_rows, n_cols = shape
    big = max(n_rows, n_cols)
    a = np.asarray(jax.random.normal(key, (big, big), jnp.float32), dtype=np.float64)
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diagonal(r))
    return jnp.asarray(q[:n_rows, :n_cols], dtype)


def random_normal_init(stddev=0.1):
    """The explicit RandomNormal(0, stddev) head initializer (cl_vrnn/model.py:202)."""

    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


def init_dense(key, in_dim, out_dim, kernel_init=glorot_uniform):
    return {
        "kernel": kernel_init(key, (in_dim, out_dim)),
        "bias": jnp.zeros((out_dim,), jnp.float32),
    }


def dense(params, x, activation=None, dtype=None):
    """y = act(x @ kernel + bias); runs on the MXU as one batched matmul."""
    kernel, bias = params["kernel"], params["bias"]
    if dtype is not None:
        x, kernel, bias = x.astype(dtype), kernel.astype(dtype), bias.astype(dtype)
    # f32 parity path: precision='highest' keeps f32 accumulation on TPU (the
    # default would drop the matmul inputs to bf16); the reference layers are
    # <=176 wide, so the extra MXU passes are free and nats/frame parity is
    # preserved. bf16 compute path (dtype=bf16, the scaled --bf16_compute
    # mode): precision must be None — 'highest' on bf16 operands forces the
    # multi-pass emulation and runs at the f32 rate, silently defeating the
    # cast (measured: the cl_vae scaled train step sat at ~40 TF, exactly
    # the f32 matmul rate, artifacts/vae_scale_bench.json round-4 first run).
    prec = "highest" if dtype is None else None
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32, precision=prec) + bias.astype(
        jnp.float32
    )
    if activation is not None:
        y = activation(y)
    return y


def init_lstm(key, in_dim, hidden_dim, unit_forget_bias=True):
    """LSTM parameters in Keras layout: fused kernels [in, 4H] / [H, 4H].

    Gate order (i, f, c, o) matches Keras 2.0 so weight tensors are directly
    comparable; forget-gate bias initialized to 1 (Keras ``unit_forget_bias``).
    """
    k1, k2 = jax.random.split(key)
    bias = jnp.zeros((4 * hidden_dim,), jnp.float32)
    if unit_forget_bias:
        bias = bias.at[hidden_dim : 2 * hidden_dim].set(1.0)
    return {
        "kernel": glorot_uniform(k1, (in_dim, 4 * hidden_dim)),
        "recurrent_kernel": orthogonal(k2, (hidden_dim, 4 * hidden_dim)),
        "bias": bias,
    }


def hard_sigmoid(x):
    """Keras 2.0 default recurrent activation: clip(0.2x + 0.5, 0, 1)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)
