"""MIDI writer tests: structural validity + round-trip through our parser."""

import numpy as np

from classifying_vae_lstm_tpu.data.midi import MidiWriter, read_midi_roll, write_sample


def _random_roll(rng, t=24, density=0.08):
    return (rng.random((t, 88)) < density).astype(np.float64)


def test_write_sample_creates_file(tmp_path):
    rng = np.random.default_rng(0)
    roll = _random_roll(rng)
    path = write_sample(roll, str(tmp_path), "out", isHalfAsSlow=False)
    data = open(path, "rb").read()
    assert data[:4] == b"MThd"
    # format 1, two tracks, resolution 480 (reference utils/midi_utils.py:34,26)
    assert data[8:14] == bytes.fromhex("0001 0002 01e0".replace(" ", ""))


def test_half_as_slow_doubles_frames(tmp_path):
    roll = np.zeros((4, 88))
    roll[0, 10] = 1
    p1 = write_sample(roll, str(tmp_path), "fast", isHalfAsSlow=False)
    p2 = write_sample(roll, str(tmp_path), "slow", isHalfAsSlow=True)
    r1 = read_midi_roll(p1)
    r2 = read_midi_roll(p2)
    assert r2[:, 10 + 21 - 21].sum() == 2 * r1[:, 10].sum()


def test_roundtrip_preserves_notes(tmp_path):
    rng = np.random.default_rng(1)
    roll = _random_roll(rng, t=16)
    # avoid trailing all-zero frames (writer emits nothing for them)
    roll[-1, 40] = 1
    path = write_sample(roll, str(tmp_path), "rt")
    back = read_midi_roll(path)  # undoes the +21 pitch offset
    assert back.shape[0] == roll.shape[0]
    np.testing.assert_array_equal(back, roll)


def test_sustained_note_single_event(tmp_path):
    roll = np.zeros((6, 88))
    roll[1:5, 30] = 1  # held note -> one NoteOn + one NoteOff
    path = write_sample(roll, str(tmp_path), "hold")
    data = open(path, "rb").read()
    assert data.count(bytes([0x90, 30 + 21, 100])) == 1
    assert data.count(bytes([0x80, 30 + 21, 0])) == 1


def test_icml_format(tmp_path):
    # 'icml' input: list of per-timestep active MIDI-note lists (reference :48-52)
    seq = [[60, 64], [60], []]
    path = str(tmp_path / "icml.mid")
    MidiWriter().dump_sequence_to_midi(seq, path, format="icml", offset=0)
    back = read_midi_roll(path, offset=0, note_range=128)
    assert back[0, 60] == 1 and back[0, 64] == 1
    assert back[1, 60] == 1 and back[1, 64] == 0


def test_flat_format(tmp_path):
    rng = np.random.default_rng(0)
    roll = (rng.random((4, 128)) < 0.05).astype(float)
    roll[-1, 70] = 1
    path = str(tmp_path / "flat.mid")
    MidiWriter().dump_sequence_to_midi(roll.ravel(), path, format="flat", offset=0)
    back = read_midi_roll(path, offset=0, note_range=128)
    np.testing.assert_array_equal(back, roll)
