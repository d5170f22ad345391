"""Native C++ runtime vs NumPy reference: bit-identical results."""

import numpy as np
import pytest

from classifying_vae_lstm_tpu.runtime import (
    gather_rows,
    is_available,
    sliding_window_native,
    song_to_roll_native,
)

needs_native = pytest.mark.skipif(not is_available(), reason="native runtime not built")


@needs_native
def test_sliding_window_matches_numpy():
    from classifying_vae_lstm_tpu.data.pianoroll import sliding_inds

    rng = np.random.default_rng(0)
    roll = (rng.random((300, 88)) < 0.1).astype(np.float32)
    for seq, step in [(1, 1), (2, 1), (16, 1), (16, 4), (17, 3)]:
        starts = sliding_inds(300, seq, step)
        oracle = roll[starts[:, None] + np.arange(seq)[None, :]]
        native = sliding_window_native(roll, seq, step)
        np.testing.assert_array_equal(native, oracle)


@needs_native
def test_sliding_window_short_roll():
    roll = np.ones((3, 88), dtype=np.float32)
    assert len(sliding_window_native(roll, 5)) == 0
    assert len(sliding_window_native(roll, 3)) == 0  # quirk Q1: arange(0) empty


@needs_native
def test_song_to_roll_matches_numpy():
    rng = np.random.default_rng(1)
    song = [sorted(rng.choice(np.arange(30, 100), size=rng.integers(1, 6), replace=False).tolist())
            for _ in range(200)]
    native = song_to_roll_native(song)
    # numpy oracle (same rule as data.pianoroll.song_to_pianoroll)
    offset = 21
    all_notes = [n for s in song for n in s]
    if min(all_notes) - offset < 0:
        offset -= 12
    if max(all_notes) - offset > 87:
        offset += 12
    oracle = np.zeros((len(song), 88), dtype=np.float32)
    for t, notes in enumerate(song):
        oracle[t, [n - offset for n in notes]] = 1.0
    np.testing.assert_array_equal(native, oracle)


@needs_native
def test_song_to_roll_octave_shift():
    roll = song_to_roll_native([[15, 40]])
    assert roll[0, 15 - 9] == 1.0 and roll[0, 40 - 9] == 1.0


@needs_native
def test_gather_rows():
    rng = np.random.default_rng(2)
    src = rng.random((500, 16, 88)).astype(np.float32)
    perm = rng.permutation(500)
    np.testing.assert_array_equal(gather_rows(src, perm), src[perm])


def test_pianodata_consistent_with_and_without_native(jsb_cs_path):
    """PianoData output must not depend on whether the native path kicked in."""
    from classifying_vae_lstm_tpu.data import PianoData
    from classifying_vae_lstm_tpu.data import pianoroll as pr

    P1 = PianoData(jsb_cs_path, batch_size=100, seq_length=16, return_y_hist=True,
                   squeeze_x=False, squeeze_y=False)
    old = pr._native
    pr._native = lambda: None  # force pure NumPy
    try:
        P2 = PianoData(jsb_cs_path, batch_size=100, seq_length=16, return_y_hist=True,
                       squeeze_x=False, squeeze_y=False)
    finally:
        pr._native = old
    np.testing.assert_array_equal(P1.x_train, P2.x_train)
    np.testing.assert_array_equal(P1.y_train, P2.y_train)
    np.testing.assert_array_equal(P1.train_song_keys, P2.train_song_keys)
