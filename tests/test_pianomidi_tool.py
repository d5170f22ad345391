"""Piano-midi corpus builder: SMF parsing, quantization, key labeling, and
drop-in compatibility of the emitted pickle with PianoData (BASELINE configs
3/5 readiness; the public corpus itself is unreachable offline)."""

import pickle

import pytest
import struct
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.make_pianomidi_pickle import (
    build_corpus,
    estimate_key,
    key_from_midi,
    parse_smf,
    quantize_to_song,
    transpose_corpus,
    transpose_song,
)


def _vlq(n):
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.insert(0, 0x80 | (n & 0x7F))
        n >>= 7
    return bytes(out)


def _smf(events, division=480, key_sig=None, fmt=0):
    """Build a one-track SMF. events: list of (delta, status_or_None, data...)
    — status None reuses running status."""
    track = bytearray()
    if key_sig is not None:
        sf, mi = key_sig
        track += _vlq(0) + bytes([0xFF, 0x59, 0x02, sf & 0xFF, mi])
    for ev in events:
        delta, status, *data = ev
        track += _vlq(delta)
        if status is not None:
            track.append(status)
        track += bytes(data)
    track += _vlq(0) + bytes([0xFF, 0x2F, 0x00])
    head = b"MThd" + struct.pack(">IHHH", 6, fmt, 1, division)
    return head + b"MTrk" + struct.pack(">I", len(track)) + bytes(track)


def test_parse_smf_running_status_and_keysig():
    data = _smf([
        (0, 0x90, 60, 100),     # C4 on
        (240, None, 60, 0),     # running status: vel-0 -> off
        (0, None, 64, 100),     # E4 on (running status)
        (480, 0x80, 64, 64),    # explicit off
    ], key_sig=(0, 0))
    division, notes, key_sig = parse_smf(data)
    assert division == 480 and key_sig == (0, 0)
    assert sorted(notes) == [(0, 240, 60), (240, 720, 64)]


def test_quantize_eighth_notes():
    # division 480 -> eighth = 240 ticks
    song = quantize_to_song(480, [(0, 240, 60), (240, 720, 64)])
    assert song == [[60], [64], [64]]
    # a note shorter than a frame still lands in exactly one frame
    assert quantize_to_song(480, [(0, 100, 72)]) == [[72]]


def test_key_from_keysig_tables():
    assert key_from_midi((0, 0), []) == "C"
    assert key_from_midi((-3, 0), []) == "E-"
    assert key_from_midi((-3, 1), []) == "c"
    assert key_from_midi((3, 1), []) == "f#"


def test_key_estimate_c_major():
    # long C-E-G-C content -> C major
    notes = [(0, 960, 60), (0, 960, 64), (0, 960, 67), (960, 1920, 72),
             (960, 1920, 65), (1920, 2400, 62), (1920, 2400, 59)]
    assert estimate_key(notes) == "C"


def test_transpose_song_to_c():
    song = [[62, 66, 69]]  # D major triad
    out, key = transpose_song(song, "D")
    assert key == "C" and out == [[60, 64, 67]]
    out, key = transpose_song([[67]], "g")  # minor stays minor; g (pc 7) -> +5
    assert key == "c" and out == [[72]]


def test_build_corpus_and_pianodata_dropin(tmp_path):
    """End to end: .mid dir -> pickle -> PianoData loads it like JSB."""
    rng = np.random.default_rng(0)
    for i in range(8):
        sf = [0, -3, 1][i % 3]
        mi = 1 if i % 3 == 1 else 0
        events = []
        pitch_base = 55 + (i % 4)
        for j in range(20):  # 20 quarter notes
            p = pitch_base + int(rng.integers(0, 12))
            events.append((0 if j == 0 else 480, 0x90, p, 90))
            events.append((480, 0x80, p, 64))
        (tmp_path / f"piece{i}.mid").write_bytes(
            _smf(events[:-1] + [events[-1]], key_sig=(sf, mi)))
    D = build_corpus(str(tmp_path))
    assert len(D["train"]) == 5 and len(D["valid"]) == 1 and len(D["test"]) == 2
    assert all(isinstance(k, str) for k in D["train_key"])

    out = tmp_path / "Piano-test_all.pickle"
    with open(out, "wb") as f:
        pickle.dump(D, f, protocol=2)

    from classifying_vae_lstm_tpu.data import PianoData

    P = PianoData(str(out), batch_size=2, seq_length=4, return_y_next=False,
                  return_y_hist=True, squeeze_x=False, squeeze_y=False)
    assert P.x_train.shape[1:] == (4, 88)
    assert P.x_train.shape[0] > 0
    assert len(np.unique(P.train_song_keys)) >= 1  # key labels flowed through

    Dc = transpose_corpus(D)
    assert set(Dc["train_key"]) <= {"C", "c"}


def test_parse_smf_format1_multitrack():
    """Format-1 file: notes merged across tracks, key sig from track 0."""
    div = 480
    t0 = _vlq(0) + bytes([0xFF, 0x59, 0x02, 2, 0])  # D major
    t0 += _vlq(0) + bytes([0xFF, 0x2F, 0x00])
    t1 = _vlq(0) + bytes([0x90, 62, 90]) + _vlq(480) + bytes([0x80, 62, 64])
    t1 += _vlq(0) + bytes([0xFF, 0x2F, 0x00])
    t2 = _vlq(240) + bytes([0x91, 66, 90]) + _vlq(480) + bytes([0x81, 66, 64])
    t2 += _vlq(0) + bytes([0xFF, 0x2F, 0x00])
    data = b"MThd" + struct.pack(">IHHH", 6, 1, 3, div)
    for t in (t0, t1, t2):
        data += b"MTrk" + struct.pack(">I", len(t)) + t
    division, notes, key_sig = parse_smf(data)
    assert key_sig == (2, 0)
    assert sorted(notes) == [(0, 480, 62), (240, 720, 66)]
    assert key_from_midi(key_sig, notes) == "D"


def test_parse_smf_ignores_percussion_and_other_events():
    ev = [
        (0, 0xC0, 5),            # program change (1 data byte)
        (0, 0xB0, 7, 100),       # controller
        (0, 0x99, 36, 100),      # ch10 percussion on: ignored
        (0, 0x90, 60, 100),
        (480, 0xE0, 0, 64),      # pitch bend
        (0, 0x80, 60, 0),
        (0, 0x89, 36, 0),        # percussion off: ignored
    ]
    division, notes, _ = parse_smf(_smf(ev))
    assert notes == [(0, 480, 60)]


def _write_test_corpus(tmp_path, n=8, quarters=30):
    rng = np.random.default_rng(0)
    for i in range(n):
        sf = [0, -3, 1][i % 3]
        mi = 1 if i % 3 == 1 else 0
        events = []
        for j in range(quarters):
            p = 55 + (i % 4) + int(rng.integers(0, 12))
            events.append((0 if j == 0 else 480, 0x90, p, 90))
            events.append((480, 0x80, p, 64))
        (tmp_path / f"p{i}.mid").write_bytes(_smf(events, key_sig=(sf, mi)))


def test_pianodata_loads_midi_directory(tmp_path):
    """--train_file can be a raw .mid directory: PianoData builds the corpus
    in memory with the same schema as the pickles."""
    _write_test_corpus(tmp_path)
    from classifying_vae_lstm_tpu.data import PianoData

    P = PianoData(str(tmp_path), batch_size=2, seq_length=4, return_y_next=False,
                  return_y_hist=True, squeeze_x=False, squeeze_y=False)
    assert P.x_train.shape[1:] == (4, 88) and P.x_train.shape[0] > 0
    assert hasattr(P, "key_map") and len(P.key_map) >= 1
    assert P.train_song_keys.shape[0] == P.x_train.shape[0]


@pytest.mark.slow
def test_train_directly_on_midi_directory(tmp_path):
    """Full train -> sample on a raw MIDI directory, zero pickle steps."""
    from classifying_vae_lstm_tpu.cli import cl_vrnn_sample, cl_vrnn_train

    midi_dir = tmp_path / "midis"
    midi_dir.mkdir()
    _write_test_corpus(midi_dir, n=10, quarters=40)
    args = cl_vrnn_train.build_parser().parse_args([
        "md", "--num_epochs", "2", "--patience", "0", "--seq_length", "4",
        "--batch_size", "8", "--intermediate_dim", "8",
        "--model_dir", str(tmp_path), "--train_file", str(midi_dir),
    ])
    _, best = cl_vrnn_train.train(args)
    assert np.isfinite(best["val_loss"])
    sargs = cl_vrnn_sample.build_parser().parse_args([
        "md", "-i", str(tmp_path / "md.npz"), "-n", "1", "-t", "4", "--infer_w",
        "--sample_dir", str(tmp_path / "out"), "--train_file", str(midi_dir),
    ])
    cl_vrnn_sample.sample(sargs)
    import os as _os

    assert any(f.startswith("md_") for f in _os.listdir(tmp_path / "out"))
