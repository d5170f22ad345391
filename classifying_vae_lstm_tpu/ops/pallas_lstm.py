"""Pallas fused LSTM sequence kernel.

Runs the ENTIRE recurrence in one TPU kernel: the carried (h, c) state lives
in VMEM scratch across all T steps, the per-step work is the recurrent
``[B, H] @ [H, 4H]`` MXU matmul plus the fused gate elementwise block, and the
only HBM traffic is streaming the precomputed input projection in and the
hidden sequence out. Under ``lax.scan`` XLA round-trips the carry through HBM
each step; at these sizes (H=88-176) that HBM latency dominates, which is
exactly what this kernel removes.

Layout notes (see /opt/skills/guides/pallas_guide.md):

* time-major ``xz [T, B, 4H]`` so each step's slice is a contiguous (B, 4H)
  VMEM tile; last dim 4H lands on the 128-lane axis;
* the input projection (where the FLOPs are) stays OUTSIDE the kernel as one
  large batched matmul — the MXU is happiest with [B*T, in] @ [in, 4H];
* grid over batch blocks when B is large; each program owns its (h, c) block;
* matmuls use ``preferred_element_type=jnp.float32``.

Training support: ``lstm_sequence_pallas`` carries a ``jax.custom_vjp`` whose
forward saves (h_seq, c_seq) from the kernel and whose backward is an XLA
reverse-time scan recomputing the gates — forward fusion is where the win is;
the backward is matmul-bound and XLA handles it well.

Measured on TPU v5e at reference sizes (B=200, T=16, H=88): forward ~1.9x the
XLA scan (350 us vs 648 us); full training step is a wash (~1220 vs ~1230
steps/s — the backward recompute offsets the forward win) with a much longer
compile. Default backend therefore stays 'xla' for training; 'pallas' pays off
for forward-dominated paths (evaluation, encoder-only serving).

Falls back to interpret mode automatically off-TPU so tests run on the CPU
mesh. Select with ``lstm_backend='pallas'`` (cl_vrnn Config / CLI flag).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lstm_seq_kernel(xz_ref, rk_ref, h0_ref, c0_ref, hseq_ref, cseq_ref, h_scr, c_scr):
    """One batch-block: scan T steps with (h, c) resident in VMEM scratch."""
    T = xz_ref.shape[0]
    H = h0_ref.shape[-1]
    h_scr[:] = h0_ref[:]
    c_scr[:] = c0_ref[:]

    def step(t, _):
        z = xz_ref[t] + jnp.dot(
            h_scr[:], rk_ref[:], preferred_element_type=jnp.float32, precision="highest"
        )
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        hseq_ref[t] = h
        cseq_ref[t] = c
        return 0

    jax.lax.fori_loop(0, T, step, 0)


def _forward_kernel_call(xz_t, rk, h0, c0, block_b: int):
    """xz_t: [T, B, 4H] time-major -> (h_seq, c_seq) [T, B, H]."""
    T, B, H4 = xz_t.shape
    H = H4 // 4
    nb = pl.cdiv(B, block_b)
    grid = (nb,)
    kernel = pl.pallas_call(
        _lstm_seq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, block_b, H4), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, block_b, H), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, block_b, H), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=_interpret(),
    )
    return kernel(xz_t, rk, h0, c0)


def _pick_block_b(B: int, T: int, H: int) -> int:
    """Largest batch block whose VMEM footprint stays under ~8 MB."""
    for bb in (512, 256, 128, 64, 32, 16, 8):
        if B % bb != 0:
            continue
        bytes_needed = 4 * (T * bb * 4 * H + T * bb * 2 * H + 2 * bb * H + H * 4 * H)
        if bytes_needed < 8 * 1024 * 1024:
            return bb
    return B


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _lstm_pallas_core(xz_t, rk, h0, c0):
    h_seq, c_seq = _forward_kernel_call(xz_t, rk, h0, c0, _pick_block_b(xz_t.shape[1], xz_t.shape[0], h0.shape[-1]))
    return h_seq, c_seq


def _core_fwd(xz_t, rk, h0, c0):
    h_seq, c_seq = _lstm_pallas_core(xz_t, rk, h0, c0)
    return (h_seq, c_seq), (xz_t, rk, h0, c0, h_seq, c_seq)


def _core_bwd(res, grads):
    """Reverse-time BPTT recomputing gates from saved (xz, h, c) sequences."""
    xz_t, rk, h0, c0, h_seq, c_seq = res
    dh_seq, dc_seq = grads
    T, B, H4 = xz_t.shape
    H = H4 // 4

    h_prev_seq = jnp.concatenate([h0[None], h_seq[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)

    def step(carry, xs):
        dh_next, dc_next, drk = carry
        xz, h_prev, c_prev, c, dh_out, dc_out = xs
        z = xz + jnp.dot(h_prev, rk, preferred_element_type=jnp.float32, precision="highest")
        i = jnp.clip(0.2 * z[:, :H] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * z[:, H : 2 * H] + 0.5, 0.0, 1.0)
        g = jnp.tanh(z[:, 2 * H : 3 * H])
        o = jnp.clip(0.2 * z[:, 3 * H :] + 0.5, 0.0, 1.0)
        tanh_c = jnp.tanh(c)

        dh = dh_next + dh_out
        dc = dc_next + dc_out + dh * o * (1 - tanh_c**2)
        do = dh * tanh_c
        di = dc * g
        dg = dc * i
        df = dc * c_prev
        # hard-sigmoid derivative: 0.2 inside the clip, 0 outside
        hsd = lambda gate: jnp.where((gate > 0.0) & (gate < 1.0), 0.2, 0.0)
        dz = jnp.concatenate(
            [di * hsd(i), df * hsd(f), dg * (1 - g**2), do * hsd(o)], axis=-1
        )
        dh_prev = jnp.dot(dz, rk.T, preferred_element_type=jnp.float32, precision="highest")
        drk = drk + jnp.dot(h_prev.T, dz, preferred_element_type=jnp.float32, precision="highest")
        dc_prev = dc * f
        return (dh_prev, dc_prev, drk), dz

    init = (jnp.zeros_like(h0), jnp.zeros_like(c0), jnp.zeros_like(rk))
    xs = (xz_t, h_prev_seq, c_prev_seq, c_seq, dh_seq, dc_seq)
    (dh0, dc0, drk), dxz = jax.lax.scan(step, init, xs, reverse=True)
    return dxz, drk, dh0, dc0


_lstm_pallas_core.defvjp(_core_fwd, _core_bwd)


def lstm_sequence_pallas(params, x, h0, c0):
    """Drop-in for :func:`..ops.lstm.lstm_sequence` with the fused kernel."""
    # the FLOP-heavy input projection stays a single large XLA matmul
    xz = (
        jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32, precision="highest")
        + params["bias"]
    )
    xz_t = jnp.swapaxes(xz, 0, 1).astype(jnp.float32)
    h_seq, c_seq = _lstm_pallas_core(xz_t, params["recurrent_kernel"].astype(jnp.float32), h0, c0)
    return jnp.swapaxes(h_seq, 0, 1), (h_seq[-1], c_seq[-1])
