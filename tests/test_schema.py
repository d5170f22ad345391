"""Corpus-schema drop-in test: the loader must accept any pickle with the
reference schema ({split, split_key, split_mode}) — e.g. the Piano-midi
corpora that are absent from this mount (BASELINE.md note)."""

import pickle

import numpy as np
import pytest

from classifying_vae_lstm_tpu.data import PianoData


def _fake_corpus(path, n_train=6, n_valid=3, n_test=3, song_len=30, seed=0):
    rng = np.random.default_rng(seed)
    keys = ["C", "g", "D", "a", "B-", "f#"]

    def song():
        return [sorted(rng.choice(np.arange(40, 90), size=rng.integers(1, 5),
                                  replace=False).tolist()) for _ in range(song_len)]

    D = {}
    for split, n in [("train", n_train), ("valid", n_valid), ("test", n_test)]:
        D[split] = [song() for _ in range(n)]
        D[f"{split}_key"] = [keys[i % len(keys)] for i in range(n)]
        D[f"{split}_mode"] = [bool(i % 2) for i in range(n)]
    with open(path, "wb") as f:
        pickle.dump(D, f, protocol=2)  # the reference pickles are protocol<=2
    return D


def test_pianodata_accepts_schema(tmp_path):
    path = str(tmp_path / "Piano-midi_fake.pickle")
    _fake_corpus(path)
    P = PianoData(path, batch_size=4, seq_length=8, return_y_hist=True,
                  squeeze_x=False, squeeze_y=False)
    assert P.x_train.shape[1:] == (8, 88)
    assert P.x_train.shape[0] % 4 == 0
    assert hasattr(P, "train_song_modes")
    # minor keys map to relative major: 'g'->'B-', 'a'->'C', 'f#'->'A'
    assert set(P.key_map) == {"A", "B-", "C", "D"}


def test_train_on_fake_corpus(tmp_path):
    """One cl_vrnn epoch end-to-end on a drop-in corpus."""
    import functools

    import jax
    import jax.numpy as jnp

    from classifying_vae_lstm_tpu.cli import common
    from classifying_vae_lstm_tpu.models import cl_vrnn
    from classifying_vae_lstm_tpu.optim import init_optimizer
    from classifying_vae_lstm_tpu.train import Trainer

    path = str(tmp_path / "Piano-midi_fake.pickle")
    _fake_corpus(path, n_train=8, song_len=40)
    P = PianoData(path, batch_size=8, seq_length=8, return_y_hist=True,
                  squeeze_x=False, squeeze_y=False)
    n_classes = len(np.unique(P.train_song_keys))
    data = common.build_cl_vrnn_datasets(P, n_classes, use_x_prev=False)
    cfg = cl_vrnn.Config(original_dim=88, intermediate_dim=16, latent_dim=2,
                         seq_length=8, n_classes=n_classes)
    params = cl_vrnn.init(jax.random.PRNGKey(0), cfg)
    opt, _ = init_optimizer("adam-wn")
    loss_fn = functools.partial(
        lambda c, p, b, k, klw, cw, wklw: cl_vrnn.loss_and_metrics(p, c, b, k, klw, cw, wklw), cfg
    )
    trainer = Trainer(loss_fn, opt, batch_size=8)
    one = jnp.float32(1.0)
    _, _, m = trainer.train_epoch(params, opt.init(params), data["train"],
                                  jax.random.PRNGKey(1), one, one, one)
    assert np.isfinite(float(m["loss"]))
