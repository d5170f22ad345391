"""Streaming loader tests: iteration, prefetch, and streaming-epoch parity."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from classifying_vae_lstm_tpu.data.loader import batch_iterator, device_prefetch
from classifying_vae_lstm_tpu.models import cl_vae
from classifying_vae_lstm_tpu.optim import init_optimizer
from classifying_vae_lstm_tpu.train import Trainer


def test_batch_iterator_shapes_and_remainder():
    data = {"x": np.arange(23 * 4, dtype=np.float32).reshape(23, 4)}
    batches = list(batch_iterator(data, 5))
    assert len(batches) == 4  # 23 -> 20, remainder dropped
    assert all(b["x"].shape == (5, 4) for b in batches)


def test_batch_iterator_shuffle_covers_all():
    data = {"x": np.arange(20, dtype=np.float32)[:, None]}
    rng = np.random.default_rng(0)
    batches = list(batch_iterator(data, 5, rng))
    seen = np.sort(np.concatenate([b["x"].ravel() for b in batches]))
    np.testing.assert_array_equal(seen, np.arange(20))


def test_device_prefetch_yields_all():
    data = {"x": np.arange(12, dtype=np.float32)[:, None]}
    out = list(device_prefetch(batch_iterator(data, 3), prefetch=2))
    assert len(out) == 4
    assert all(isinstance(b["x"], jax.Array) for b in out)


def test_streaming_epoch_trains():
    cfg = cl_vae.Config(original_dim=12, intermediate_dim=8, latent_dim=2,
                        intermediate_class_dim=6, n_classes=3)
    params = cl_vae.init(jax.random.PRNGKey(0), cfg)
    x = (np.random.default_rng(1).random((60, 12)) < 0.25).astype(np.float32)
    w = np.eye(3, dtype=np.float32)[np.arange(60) % 3]
    host_data = {"x": x, "y": x, "w": w}
    loss_fn = functools.partial(
        lambda c, p, b, k, klw, cw, wklw: cl_vae.loss_and_metrics(p, c, b, k, klw, cw, wklw), cfg
    )
    opt, _ = init_optimizer("adam-wn")
    trainer = Trainer(loss_fn, opt, batch_size=10)
    opt_state = opt.init(params)
    one = jnp.float32(1.0)
    losses = []
    rng = np.random.default_rng(2)
    for e in range(4):
        params, opt_state, m = trainer.train_epoch_streaming(
            params, opt_state, host_data, jax.random.PRNGKey(e), one, one, one, rng
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_batch_iterator_keep_remainder():
    data = {"x": np.arange(13, dtype=np.float32)[:, None]}
    batches = list(batch_iterator(data, 5, drop_remainder=False))
    assert [len(b["x"]) for b in batches] == [5, 5, 3]


def test_device_prefetch_explicit_device():
    dev = jax.devices()[0]
    data = {"x": np.arange(6, dtype=np.float32)[:, None]}
    out = list(device_prefetch(batch_iterator(data, 3), prefetch=1, device=dev))
    assert all(list(b["x"].devices())[0] == dev for b in out)
