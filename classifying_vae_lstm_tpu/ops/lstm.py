"""TPU-native LSTM: `lax.scan` over time with the input projection hoisted.

The reference's LSTM is Keras's symbolic unroll (``cl_vrnn/model.py:196-199,
225-228``). The TPU-first formulation here:

* the input projection ``x @ W_k`` for ALL timesteps is computed as one large
  ``[B*T, in] @ [in, 4H]`` matmul before the scan — this is where the FLOPs
  are, and batching it keeps the MXU fed instead of issuing T skinny matmuls;
* the scan body then does only the recurrent ``[B, H] @ [H, 4H]`` matmul plus
  the fused elementwise gate block (XLA fuses these into a handful of kernels);
* the same cell function serves training (scan) and autoregressive generation
  (single step with explicit carried state), which fixes reference quirk Q3 by
  construction — there are no separate stateful submodels whose weights could
  be forgotten (``cl_vrnn/model.py:122-133``).

Gate order and activations match Keras 2.0: (i, f, c, o), tanh activation,
hard-sigmoid recurrent activation.

An optional Pallas path (:mod:`.pallas_lstm`) runs the whole sequence in one
kernel with h/c resident in VMEM; select with ``backend='pallas'``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.core import hard_sigmoid


def _gates(z, c_prev, hidden_dim, recurrent_activation, activation):
    i = recurrent_activation(z[..., :hidden_dim])
    f = recurrent_activation(z[..., hidden_dim : 2 * hidden_dim])
    g = activation(z[..., 2 * hidden_dim : 3 * hidden_dim])
    o = recurrent_activation(z[..., 3 * hidden_dim :])
    c = f * c_prev + i * g
    h = o * activation(c)
    return h, c


def lstm_step(
    params,
    x,
    h_prev,
    c_prev,
    recurrent_activation=hard_sigmoid,
    activation=jnp.tanh,
):
    """One LSTM cell step: x [B, in], h/c [B, H] -> (h, c)."""
    hidden_dim = h_prev.shape[-1]
    z = (
        jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32, precision="highest")
        + jnp.dot(h_prev, params["recurrent_kernel"], preferred_element_type=jnp.float32, precision="highest")
        + params["bias"]
    )
    return _gates(z, c_prev, hidden_dim, recurrent_activation, activation)


def keras_lstm_dropout_masks(key, rate: float, batch: int, in_dim: int, dtype=jnp.float32):
    """Keras 2.0 LSTM ``dropout`` masks: FOUR independent input masks (one per
    gate i/f/c/o), each [B, in], CONSTANT over time, inverted-scaled by
    1/(1-rate) (``keras/layers/recurrent.py`` ``get_constants``: the masks are
    built once per forward from ``ones_like(input[:, 0, :])``). Returns
    [4, B, in]."""
    keep = jax.random.bernoulli(key, 1.0 - rate, (4, batch, in_dim))
    return keep.astype(dtype) / (1.0 - rate)


def lstm_sequence(
    params,
    x,
    h0=None,
    c0=None,
    recurrent_activation=hard_sigmoid,
    activation=jnp.tanh,
    backend: str = "xla",
    unroll: int = 4,
    remat: bool = False,
    compute_dtype=None,
    dropout: float = 0.0,
    dropout_key=None,
    fusion=None,
):
    """Run an LSTM over a full sequence. x: [B, T, in] -> h_seq [B, T, H].

    Returns ``(h_seq, (h_T, c_T))``. The input projection for all timesteps is
    one batched matmul; the scan carries (h, c) and is unrolled ``unroll`` steps
    to amortize loop overhead on TPU.

    Scaling knobs (defaults preserve reference parity):

    * ``remat=True`` wraps the scan body in ``jax.checkpoint`` — BPTT memory
      drops from O(T) activations to O(1) per step at the cost of recompute,
      the lever for long-context training (SURVEY §2: the RNN analog of
      blockwise/context-parallel scaling);
    * ``compute_dtype=jnp.bfloat16`` casts the matmul operands (accumulation
      stays f32 via ``preferred_element_type``) — the MXU-native mode for
      scaled-up hidden sizes;
    * ``fusion``: static (proj, drk, full) kernel-fusion triple for the
      pallas backend (see :func:`..ops.pallas_lstm.resolve_fusion`); ``None``
      takes the set_fusion policy defaults. Rejected on other backends;
    * ``dropout``/``dropout_key``: Keras-2.0 LSTM constructor-``dropout``
      semantics (per-gate input masks, constant over time — see
      :func:`keras_lstm_dropout_masks`); the masks only reshape the hoisted
      projection into four per-gate MXU matmuls, the scan is unchanged.
    """
    B, T, _ = x.shape
    hidden_dim = params["recurrent_kernel"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, hidden_dim), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((B, hidden_dim), x.dtype)

    if backend == "pallas":
        if dropout > 0 and dropout_key is not None:
            raise ValueError("dropout is not supported on the pallas backend")
        if remat:
            # the kernel's residuals (z/h/c streams) are already its memory
            # plan; silently ignoring the flag would misreport memory behavior
            raise ValueError("remat is not supported on the pallas backend")
        from .pallas_lstm import lstm_sequence_pallas

        return lstm_sequence_pallas(params, x, h0, c0, compute_dtype=compute_dtype,
                                    fusion=fusion)

    if fusion is not None:
        raise ValueError("fusion is a pallas-backend knob; backend is "
                         f"{backend!r}")

    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = params["kernel"].astype(compute_dtype)
        precision = None  # bf16 inputs: single MXU pass, f32 accumulation
    else:
        kernel = params["kernel"]
        precision = "highest"

    if dropout > 0 and dropout_key is not None:
        masks = keras_lstm_dropout_masks(dropout_key, dropout, B, x.shape[-1], x.dtype)
        H = hidden_dim
        xz = jnp.concatenate(
            [
                jnp.dot(x * masks[g][:, None, :], kernel[:, g * H : (g + 1) * H],
                        preferred_element_type=jnp.float32, precision=precision)
                for g in range(4)
            ],
            axis=-1,
        ) + params["bias"]
    else:
        # Hoist the input projection: [B*T, in] @ [in, 4H] in one MXU pass.
        xz = (
            jnp.dot(x, kernel, preferred_element_type=jnp.float32, precision=precision)
            + params["bias"]
        )
    xz_t = jnp.swapaxes(xz, 0, 1)  # time-major for the scan: [T, B, 4H]

    rk = params["recurrent_kernel"]
    if compute_dtype is not None:
        rk = rk.astype(compute_dtype)

    def body(carry, xz_step):
        h_prev, c_prev = carry
        h_in = h_prev.astype(compute_dtype) if compute_dtype is not None else h_prev
        z = xz_step + jnp.dot(h_in, rk, preferred_element_type=jnp.float32, precision=precision)
        h, c = _gates(z, c_prev, hidden_dim, recurrent_activation, activation)
        return (h, c), h

    if remat:
        body = jax.checkpoint(body)
    (h_T, c_T), h_seq = jax.lax.scan(body, (h0, c0), xz_t, unroll=unroll)
    return jnp.swapaxes(h_seq, 0, 1), (h_T, c_T)
