"""Data-pipeline tests against golden facts measured from the shipped pickles.

Golden numbers from SURVEY §4 / BASELINE.md (derived by executing the reference
windowing rules ``utils/pianoroll.py:49-71,113-130`` on the shipped data):

* JSB-all: 209/68/70 songs; 10 key classes after relative-major mapping;
  13,648 train windows at seq_length=1/return_y_next/batch 100;
* JSB-all seq16/batch 200 (cl_vrnn defaults): 10,513 train windows -> 52 batches;
* JSB-Cs: 229/76/77 songs; 2 classes {C, E-}; 13,349 windows at cl_vae defaults.
"""

import numpy as np
import pytest

from classifying_vae_lstm_tpu.data import (
    PianoData,
    pianoroll_to_song,
    relative_major,
    sliding_inds,
    sliding_window,
    song_to_pianoroll,
)
from classifying_vae_lstm_tpu.data.pianoroll import to_categorical


def test_relative_major_mapping():
    assert relative_major("C") == "C"
    assert relative_major("a") == "C"
    assert relative_major("c") == "E-"  # quirk Q2: JSB-Cs becomes {C, E-}
    assert relative_major("g") == "B-"


def test_song_roundtrip():
    song = [[60, 72, 79], [72, 79], [67, 70, 76, 84]]
    roll = song_to_pianoroll(song)
    assert roll.shape == (3, 88)
    assert pianoroll_to_song(roll) == song


def test_song_octave_shift():
    # a note below the offset octave-shifts the whole song down (reference :37-40)
    roll = song_to_pianoroll([[15, 40]])
    assert roll[0, 15 - 9] == 1.0 and roll[0, 40 - 9] == 1.0
    # a note above 87+offset shifts up
    roll = song_to_pianoroll([[30, 110]])
    assert roll[0, 110 - 33] == 1.0


def test_sliding_window_drops_final_window():
    # quirk Q1: starts are arange(n - seq_length) -> final valid window dropped
    assert list(sliding_inds(10, 3, 1)) == list(range(7))
    roll = np.arange(10)[:, None] * np.ones((1, 88))
    win = sliding_window(roll, 3)
    assert win.shape == (7, 3, 88)
    np.testing.assert_array_equal(win[0, :, 0], [0, 1, 2])
    np.testing.assert_array_equal(win[-1, :, 0], [6, 7, 8])
    # overlap property documented at reference :54-55
    np.testing.assert_array_equal(win[2, 1:], win[3, :-1])


def test_sliding_window_short_song_empty():
    roll = np.ones((2, 88))
    assert len(sliding_window(roll, 5)) == 0


def test_to_categorical():
    out = to_categorical([0, 2, 1], 3)
    np.testing.assert_array_equal(out, np.eye(3, dtype=np.float32)[[0, 2, 1]])


@pytest.mark.parametrize(
    "fixture_name,n_songs,n_classes,n_train_seq1",
    [("jsb_all_path", (209, 68, 70), 10, 13648), ("jsb_cs_path", (229, 76, 77), 2, 13349)],
)
def test_golden_counts_seq1(request, fixture_name, n_songs, n_classes, n_train_seq1):
    path = request.getfixturevalue(fixture_name)
    P = PianoData(path, batch_size=None, seq_length=1, step_length=1, return_y_next=True)
    assert P.x_train.shape == (n_train_seq1, 88)
    assert P.y_train.shape == (n_train_seq1, 88)
    assert len(np.unique(P.train_song_inds)) == n_songs[0]
    assert len(np.unique(P.train_song_keys)) == n_classes
    assert len(P.key_map) == n_classes
    assert set(P.x_train.ravel()) <= {0.0, 1.0}
    # batch truncation drops the remainder (reference :154-158)
    Pb = PianoData(path, batch_size=100, seq_length=1, step_length=1, return_y_next=True)
    assert Pb.x_train.shape[0] == (n_train_seq1 // 100) * 100


def test_golden_counts_seq16(jsb_all_path):
    # cl_vrnn defaults: batch 200, seq_length 16, y = per-timestep next frame
    P = PianoData(
        jsb_all_path,
        batch_size=200,
        seq_length=16,
        step_length=1,
        return_y_next=True,
        return_y_hist=True,
        squeeze_x=False,
        squeeze_y=False,
    )
    assert P.x_train.shape == (10400, 16, 88)  # 10,513 truncated to batch multiple
    assert P.y_train.shape == (10400, 16, 88)
    # y is x shifted by one step within the window
    np.testing.assert_array_equal(P.x_train[:, 1:, :], P.y_train[:, :-1, :])


def test_jsb_cs_classes_are_C_and_Eflat(jsb_cs_path):
    P = PianoData(jsb_cs_path, batch_size=100, seq_length=1)
    assert sorted(P.key_map) == ["C", "E-"]


def test_batch_truncation(jsb_cs_path):
    P = PianoData(jsb_cs_path, batch_size=1000, seq_length=1)
    assert P.x_train.shape[0] % 1000 == 0


def test_y_next_semantics(jsb_all_path):
    P = PianoData(jsb_all_path, batch_size=None, seq_length=1, return_y_next=True)
    # with seq_length=1 and return_y_next, y[t] is the frame after x[t] within a song
    same_song = P.train_song_inds[:-1] == P.train_song_inds[1:]
    idx = np.where(same_song)[0][:200]
    np.testing.assert_array_equal(P.y_train[idx], P.x_train[idx + 1])


def test_use_rel_major_false(jsb_all_path):
    """Raw keys (17 for JSB-all). The reference crashes here (its update_keys
    returns None when use_rel_major=False); we fix the plumbing."""
    P = PianoData(jsb_all_path, batch_size=None, seq_length=1, use_rel_major=False)
    assert len(P.key_map) == 18  # raw keys across all three splits
    # minor keys survive unmapped
    assert any(k.islower() for k in P.key_map)


def test_song_modes_exposed(jsb_all_path):
    # *_mode arrays are loaded and exposed (consumed by no driver — quirk Q9 parity)
    P = PianoData(jsb_all_path, batch_size=None, seq_length=1)
    assert P.train_song_modes.shape == P.train_song_inds.shape
    assert P.train_song_modes.dtype == bool
