"""Pallas fused LSTM kernel vs the XLA scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from classifying_vae_lstm_tpu.nn.core import init_lstm
from classifying_vae_lstm_tpu.ops import lstm_sequence


def _setup(B=8, T=7, IN=12, H=16):
    p = init_lstm(jax.random.PRNGKey(0), IN, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    return p, x, jnp.zeros((B, H)), jnp.zeros((B, H))


def test_forward_matches_xla():
    p, x, h0, c0 = _setup()
    a, (ha, ca) = lstm_sequence(p, x, h0, c0, backend="xla")
    b, (hb, cb) = lstm_sequence(p, x, h0, c0, backend="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), rtol=1e-5, atol=1e-6)


def test_forward_nonzero_initial_state():
    p, x, _, _ = _setup()
    h0 = jax.random.normal(jax.random.PRNGKey(2), (8, 16))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (8, 16))
    a, _ = lstm_sequence(p, x, h0, c0, backend="xla")
    b, _ = lstm_sequence(p, x, h0, c0, backend="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_gradients_match_xla():
    p, x, h0, c0 = _setup()

    def loss(p, x, backend):
        h, _ = lstm_sequence(p, x, h0, c0, backend=backend)
        return jnp.sum(h**2 * jnp.sin(jnp.arange(h.shape[-1])))

    ga = jax.grad(loss)(p, x, "xla")
    gb = jax.grad(loss)(p, x, "pallas")
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]), rtol=1e-4, atol=1e-5)
    dxa = jax.grad(loss, argnums=1)(p, x, "xla")
    dxb = jax.grad(loss, argnums=1)(p, x, "pallas")
    np.testing.assert_allclose(np.asarray(dxa), np.asarray(dxb), rtol=1e-4, atol=1e-5)


def test_cl_vrnn_pallas_backend_trains():
    import dataclasses
    import optax

    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.optim import init_optimizer

    cfg = cl_vrnn.Config(original_dim=12, intermediate_dim=8, latent_dim=2,
                         seq_length=4, n_classes=3, lstm_backend="pallas")
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (6, 4, 12)) < 0.2).astype(jnp.float32)
    batch = {"x": x, "y": x, "w": jax.nn.one_hot(jnp.arange(6) % 3, 3)}
    opt, _ = init_optimizer("adam-wn")
    state = opt.init(params)
    loss0 = None
    for i in range(5):
        (loss, _), grads = jax.value_and_grad(
            lambda p: cl_vrnn.loss_and_metrics(p, cfg, batch, jax.random.PRNGKey(7)),
            has_aux=True,
        )(params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        loss0 = loss0 or float(loss)
    assert float(loss) < loss0


def test_tblocked_kernel_matches_xla_scan():
    """The scaled (time-tiled, scratch-carried) kernel path is numerically
    identical to the XLA scan — carry survives across t-blocks."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from classifying_vae_lstm_tpu.nn.core import init_lstm
    from classifying_vae_lstm_tpu.ops.lstm import lstm_sequence
    from classifying_vae_lstm_tpu.ops.pallas_lstm import _forward_kernel_call

    B, T, D, H = 16, 8, 12, 16
    params = init_lstm(jax.random.PRNGKey(0), D, H)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    ref, (hT, cT) = lstm_sequence(params, x, backend="xla")

    xz = jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32,
                 precision="highest") + params["bias"]
    xz_t = jnp.swapaxes(xz, 0, 1)
    h0 = jnp.zeros((B, H))
    for block_b, block_t in [(8, 2), (16, 4), (8, 1)]:
        h_seq, c_seq = _forward_kernel_call(
            xz_t, params["recurrent_kernel"], h0, h0, block_b, block_t)
        np.testing.assert_allclose(np.asarray(jnp.swapaxes(h_seq, 0, 1)),
                                   np.asarray(ref), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h_seq[-1]), np.asarray(hT),
                                   rtol=1e-5, atol=1e-6)


def test_pallas_bf16_mode_close_to_f32():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from classifying_vae_lstm_tpu.nn.core import init_lstm
    from classifying_vae_lstm_tpu.ops.pallas_lstm import lstm_sequence_pallas

    B, T, D, H = 8, 6, 10, 16
    params = init_lstm(jax.random.PRNGKey(0), D, H)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    h0 = jnp.zeros((B, H))
    h32, _ = lstm_sequence_pallas(params, x, h0, h0)
    h16, _ = lstm_sequence_pallas(params, x, h0, h0, compute_dtype=jnp.bfloat16)
    assert h16.dtype == jnp.float32  # f32 accumulation/state
    np.testing.assert_allclose(np.asarray(h16), np.asarray(h32), rtol=0.05, atol=0.03)


def test_gradients_tblocked_matches_xla(monkeypatch):
    """Backward kernel with time tiling: forces (block_b, block_t) so the
    reversed-grid (dh, dc) scratch carry crosses t-block boundaries."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (8, 2),
    )
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 12))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (16, 16))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (16, 16))

    def loss(p, x, h0, c0, backend):
        h, (hT, cT) = lstm_sequence(p, x, h0, c0, backend=backend)
        return jnp.sum(h**2 * jnp.cos(jnp.arange(h.shape[-1]))) + jnp.sum(cT * hT)

    for argnums in [0, 1, 2, 3]:
        ga = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "xla")
        gb = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "pallas")
        flat_a, _ = jax.tree.flatten(ga)
        flat_b, _ = jax.tree.flatten(gb)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_gradients_bf16_mode_close_to_f32():
    """bf16 stream mode: grads stay close to the f32 pallas path (rounding in
    the xz/z/dz streams only — state and accumulation remain f32)."""
    p, x, h0, c0 = _setup()

    def loss(p, cd):
        h, _ = lstm_sequence(p, x, h0, c0, backend="pallas", compute_dtype=cd)
        return jnp.mean(h**2)

    g32 = jax.grad(loss)(p, None)
    g16 = jax.grad(loss)(p, jnp.bfloat16)
    for k in g32:
        a, b = np.asarray(g32[k], np.float32), np.asarray(g16[k], np.float32)
        assert np.all(np.abs(a - b) <= 0.05 * np.abs(a).max() + 1e-4), k


def test_gradients_bf16_tblocked(monkeypatch):
    """bf16 streams + batch/time-tiled grids together (the configuration the
    scaled training mode actually runs): grads close to the f32 XLA scan."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (16, 2),
    )
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 8, 12))

    def loss(p, backend, cd):
        h, _ = lstm_sequence(p, x, backend=backend, compute_dtype=cd)
        return jnp.mean(h**2)

    ga = jax.grad(loss)(p, "xla", None)
    gb = jax.grad(loss)(p, "pallas", jnp.bfloat16)
    for k in ga:
        a, b = np.asarray(ga[k], np.float32), np.asarray(gb[k], np.float32)
        assert np.all(np.abs(a - b) <= 0.05 * np.abs(a).max() + 1e-4), k


def test_padded_batch_blocks_match_xla(monkeypatch):
    """block_b need not divide B: the cdiv grid pads the last batch block
    (rows are independent) — this is what keeps batches like the reference's
    500 (no 8-aligned divisor) inside the VMEM budget on real TPUs."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (8, 2),
    )
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (20, 8, 12))  # 20 % 8 != 0

    def loss(p, backend):
        h, _ = lstm_sequence(p, x, backend=backend)
        return jnp.mean(h**2)

    a, _ = lstm_sequence(p, x, backend="xla")
    b, _ = lstm_sequence(p, x, backend="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    ga = jax.grad(loss)(p, "xla")
    gb = jax.grad(loss)(p, "pallas")
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                   rtol=1e-4, atol=1e-5)


def test_interleaved_kernels_match_xla(monkeypatch):
    """Force blocks that select the interleaved (half-block MXU/VPU
    pipelined) fwd + bwd kernels and pin forward AND gradients against the
    XLA scan — the pipelined issue order must be numerically identical."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (32, 4),
    )
    assert pallas_lstm._use_interleave(32, 4)
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 8, 12))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (64, 16))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (64, 16))

    ha, _ = lstm_sequence(p, x, h0, c0, backend="xla")
    hb, _ = lstm_sequence(p, x, h0, c0, backend="pallas")
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), rtol=1e-5, atol=1e-6)

    def loss(p, x, h0, c0, backend):
        h, (hT, cT) = lstm_sequence(p, x, h0, c0, backend=backend)
        return jnp.sum(h**2 * jnp.cos(jnp.arange(h.shape[-1]))) + jnp.sum(cT * hT)

    for argnums in [0, 1, 2, 3]:
        ga = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "xla")
        gb = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "pallas")
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_interleave_gate():
    """bt=1 (cross-step pipeline degenerates), tiny/odd blocks -> plain
    kernel; bt>=2 with even blocks >=32 -> interleaved."""
    from classifying_vae_lstm_tpu.ops.pallas_lstm import _use_interleave

    assert _use_interleave(200, 2)
    assert _use_interleave(32, 16)
    assert not _use_interleave(256, 1)
    assert not _use_interleave(16, 4)
    assert not _use_interleave(33, 4)


def test_interleaved_inference_kernels_match_xla(monkeypatch):
    """The inference forward (whole-T and t-blocked) interleaved variants
    must match the XLA scan exactly, including a nonzero initial state and
    t-block boundaries."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 8, 12))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (64, 16))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (64, 16))
    ha, (hTa, cTa) = lstm_sequence(p, x, h0, c0, backend="xla")

    # whole-T single-grid path
    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (32, None),
    )
    hb_, (hTb, cTb) = lstm_sequence(p, x, h0, c0, backend="pallas")
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb_), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cTa), np.asarray(cTb), rtol=1e-5, atol=1e-6)

    # t-blocked path (scratch carry crosses t-block boundaries)
    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (32, 4),
    )
    hc, (hTc, cTc) = lstm_sequence(p, x, h0, c0, backend="pallas")
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hc), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cTa), np.asarray(cTc), rtol=1e-5, atol=1e-6)


def test_fused_proj_matches_xla(monkeypatch):
    """fusion=(proj,): the training forward computes x @ W + b inside the
    kernel (lane-padded to 128); forward, every grad, and the inference
    primal must match the XLA scan. Forces multi-block grids plus a PADDED
    batch block."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (8, 2),
    )
    fu = (True, False, False)
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (20, 8, 12))  # 20 % 8 != 0
    h0 = jax.random.normal(jax.random.PRNGKey(2), (20, 16))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (20, 16))

    ha, (hTa, cTa) = lstm_sequence(p, x, h0, c0, backend="xla")
    hb, (hTb, cTb) = lstm_sequence(p, x, h0, c0, backend="pallas", fusion=fu)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cTa), np.asarray(cTb), rtol=1e-5, atol=1e-6)

    def loss(p, x, h0, c0, backend, fusion=None):
        h, (hT, cT) = lstm_sequence(p, x, h0, c0, backend=backend, fusion=fusion)
        return jnp.sum(h**2 * jnp.cos(jnp.arange(h.shape[-1]))) + jnp.sum(cT * hT)

    for argnums in [0, 1, 2, 3]:
        ga = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "xla")
        gb = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "pallas", fu)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_fused_drk_matches_xla(monkeypatch):
    """fusion=(drk,): the backward kernel accumulates the recurrent weight
    grad across b-blocks AND reversed t-blocks; a padded batch block
    exercises the out-of-range row mask that protects the reduction."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (8, 2),
    )
    fu = (False, True, False)
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (20, 8, 12))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (20, 16))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (20, 16))

    def loss(p, x, h0, c0, backend, fusion=None):
        h, (hT, cT) = lstm_sequence(p, x, h0, c0, backend=backend, fusion=fusion)
        return jnp.sum(h**2 * jnp.cos(jnp.arange(h.shape[-1]))) + jnp.sum(cT * hT)

    for argnums in [0, 1, 2, 3]:
        ga = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "xla")
        gb = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "pallas", fu)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_fused_both_bf16_close_to_f32(monkeypatch):
    """Both fusions together in the bf16 stream mode (the scaled training
    configuration they target): grads stay close to the f32 XLA scan."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (16, 1),
    )
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 8, 12))

    def loss(p, backend, cd, fusion=None):
        h, _ = lstm_sequence(p, x, backend=backend, compute_dtype=cd, fusion=fusion)
        return jnp.mean(h**2)

    ga = jax.grad(loss)(p, "xla", None)
    gb = jax.grad(loss)(p, "pallas", jnp.bfloat16, (True, True, False))
    for k in ga:
        a, b = np.asarray(ga[k], np.float32), np.asarray(gb[k], np.float32)
        assert np.all(np.abs(a - b) <= 0.05 * np.abs(a).max() + 1e-4), k


def test_set_fusion_roundtrip():
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    # adopted defaults: the full triple won every fused_kernel_exp.json config
    prev = pallas_lstm.set_fusion(proj=False, drk=False, full=False)
    assert prev == (True, True, True)
    # the globals are only the fusion=None policy defaults
    assert pallas_lstm.resolve_fusion(None) == (False, False, False)
    assert pallas_lstm.set_fusion(*prev) == (False, False, False)
    assert (pallas_lstm._FUSE_PROJ, pallas_lstm._FUSE_DRK,
            pallas_lstm._FUSE_BWD_FULL) == (True, True, True)
    assert pallas_lstm.resolve_fusion(None) == (True, True, True)
    # canonicalization: full implies drk; full without proj is dropped (it
    # only exists on the fused-projection path)
    assert pallas_lstm.resolve_fusion((True, False, True)) == (True, True, True)
    assert pallas_lstm.resolve_fusion((False, False, True)) == (False, False, False)


def test_fused_bwd_full_matches_xla(monkeypatch):
    """fusion=(proj, drk, full): dW/db/dx/drk all computed inside the backward
    kernel (dz never leaves VMEM); every grad must match the XLA scan.

    Round 5 (VERDICT r4 item 5): non-dividing batches no longer fall back to
    the drk rung — lstm_sequence_pallas PADS the batch up to a block multiple
    (zero rows, exact math) so EVERY shape takes the full rung: B=16 divides
    bb=8 directly; B=20 pads to 24 (grads must still be exact — the padded
    rows' cotangent is zero). The drk fallback remains only for direct
    _lstm_pallas_core_fp callers (the padded-grid full kernel crashes real
    TPUs through jit-of-grad — commit dc31119; see _core_fp_bwd)."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (8, 2),
    )
    calls = {"full": 0, "drk": 0}
    real_full = pallas_lstm._backward_call_full
    real_drk = pallas_lstm._backward_call_drk

    def spy_full(*a, **k):
        calls["full"] += 1
        return real_full(*a, **k)

    def spy_drk(*a, **k):
        calls["drk"] += 1
        return real_drk(*a, **k)

    monkeypatch.setattr(pallas_lstm, "_backward_call_full", spy_full)
    monkeypatch.setattr(pallas_lstm, "_backward_call_drk", spy_drk)

    fu = (True, True, True)
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)

    def loss(p, x, h0, c0, backend, fusion=None):
        h, (hT, cT) = lstm_sequence(p, x, h0, c0, backend=backend, fusion=fusion)
        return jnp.sum(h**2 * jnp.cos(jnp.arange(h.shape[-1]))) + jnp.sum(cT * hT)

    for B in (16, 20):  # 16 % 8 == 0; 20 pads to 24 at the entry
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 12))
        h0 = jax.random.normal(jax.random.PRNGKey(2), (B, 16))
        c0 = jax.random.normal(jax.random.PRNGKey(3), (B, 16))
        before = dict(calls)
        for argnums in [0, 1, 2, 3]:
            ga = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "xla")
            gb = jax.grad(loss, argnums=argnums)(p, x, h0, c0, "pallas", fu)
            for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-5)
        took = {k: calls[k] - before[k] for k in calls}
        assert took == {"full": 4, "drk": 0}, (B, took)

    # defense path: a DIRECT _lstm_pallas_core_fp caller at a non-dividing
    # batch (no entry padding) must still fall back to the drk rung
    x_t = jax.random.normal(jax.random.PRNGKey(4), (8, 20, 128))
    w = jax.random.normal(jax.random.PRNGKey(5), (128, 64)) * 0.1
    b = jnp.zeros((1, 64))
    rk = jax.random.normal(jax.random.PRNGKey(6), (16, 64)) * 0.1
    h0 = jnp.zeros((20, 16))
    before = dict(calls)
    jax.grad(lambda rk: jnp.sum(pallas_lstm._lstm_pallas_core_fp(
        True, True, x_t, w, b, rk, h0, h0)[0] ** 2))(rk)
    took = {k: calls[k] - before[k] for k in calls}
    assert took == {"full": 0, "drk": 1}, took


def test_fused_proj_inference_interleaved(monkeypatch):
    """_FUSE_PROJ inference forward through the interleaved fp kernel
    (blocks spanning >= 2 steps engage the half-block pipeline) and the
    plain fp kernel (whole-T as nt=1) — both must match the XLA scan."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    fu = (True, False, False)
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 8, 12))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (64, 16))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (64, 16))
    ha, (hTa, cTa) = lstm_sequence(p, x, h0, c0, backend="xla")

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (32, 4),
    )
    assert pallas_lstm._use_interleave(32, 4)
    hb_, (hTb, cTb) = lstm_sequence(p, x, h0, c0, backend="pallas", fusion=fu)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb_), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cTa), np.asarray(cTb), rtol=1e-5, atol=1e-6)

    # 16-row blocks keep _use_interleave off -> the PLAIN fp kernel at a
    # whole-T nt=1 grid
    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (16, None),
    )
    assert not pallas_lstm._use_interleave(16, 8)
    hc, (hTc, cTc) = lstm_sequence(p, x, h0, c0, backend="pallas", fusion=fu)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hc), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cTa), np.asarray(cTc), rtol=1e-5, atol=1e-6)


def test_fused_scanned_donated_grad(monkeypatch):
    """The fused rungs inside a multi-step lax.scan with a donated carry —
    the regime Trainer.train_epoch compiles (it caught a real scoped-VMEM
    bug in the unfused kernels). CPU interpret cannot see VMEM, but this
    pins the custom_vjp tracing path (accumulator outputs under scan +
    donation) for every rung."""
    from classifying_vae_lstm_tpu.ops import pallas_lstm

    monkeypatch.setattr(
        pallas_lstm, "_pick_blocks",
        lambda B, T, H, nbytes, stream_bytes=24, min_sublane=8, prefer_bt1=False: (8, 2),
    )
    p = init_lstm(jax.random.PRNGKey(0), 12, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 12))

    def scanned(p, x):
        def body(carry, _):
            g = jax.grad(lambda q: jnp.mean(lstm_sequence(
                q, x, backend="pallas", compute_dtype=jnp.bfloat16,
                fusion=(True, True, True))[0] ** 2))(carry)
            return jax.tree.map(lambda a, b: a - 1e-3 * b, carry, g), 0
        return jax.lax.scan(body, p, None, length=2)[0]

    out = jax.jit(scanned, donate_argnums=0)(p, x)
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(out))
