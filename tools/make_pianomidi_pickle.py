"""Build reference-schema corpus pickles from a directory of MIDI files.

The Piano-midi pickles (`Piano-midi_all.pickle`, `Piano-midi_Cs.pickle`) are
missing from the reference mount (`/root/reference/.MISSING_LARGE_BLOBS:1-2`)
and the public corpus (piano-midi.de) is unreachable from this offline
environment (no DNS egress — verified round 2). This tool closes the gap from
the other side: point it at a directory of `.mid` files and it emits pickles
in the exact schema `utils/pianoroll.py:80,92-111` consumes —

    {'train'|'valid'|'test':       [song], song = [frame], frame = [midi note numbers],
     'train_key'|...:              [key string per song; lowercase=minor, '-'=flat],
     'train_mode'|...:             [True for major, False for minor]}

so BASELINE configs 3 and 5 run as written the moment the corpus is dropped
in:

    python tools/make_pianomidi_pickle.py --midi_dir /path/to/piano-midi \\
        --out "data/input/Piano-midi_all.pickle" [--transpose_to_c --out_cs ...]

Pieces:

* a general SMF (Standard MIDI File) parser — running status, meta events
  (key signature FF 59, tempo FF 51, end-of-track), sysex, all channel
  voice messages; notes collected as (start_tick, end_tick, pitch) across
  tracks (percussion channel 10 ignored);
* eighth-note quantization: the corpus convention of the pickled piano-roll
  datasets (Boulanger-Lewandowski et al. 2012) that the JSB pickles follow —
  a note is active in frame f if it sounds at tick f * (division/2);
* key labeling: the file's first key-signature meta event when present,
  otherwise a Krumhansl-Schmuckler pitch-class-profile estimate;
* deterministic 70/15/15 split over the sorted file list (or explicit
  ``--train_list/--valid_list/--test_list`` files, one basename per line);
* ``--transpose_to_c``: additionally emit the `_Cs` variant with every piece
  shifted to C major / c minor (shift chosen within [-6, +5] semitones).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- SMF parsing: the general parser lives in the package ---------------------

from classifying_vae_lstm_tpu.data.midi import parse_smf, quantize_notes  # noqa: E402

quantize_to_song = quantize_notes  # corpus-schema alias

_MAJOR_BY_SF = {0: "C", 1: "G", 2: "D", 3: "A", 4: "E", 5: "B", 6: "F#", 7: "C#",
                -1: "F", -2: "B-", -3: "E-", -4: "A-", -5: "D-", -6: "G-", -7: "C-"}
_MINOR_BY_SF = {0: "a", 1: "e", 2: "b", 3: "f#", 4: "c#", 5: "g#", 6: "d#", 7: "a#",
                -1: "d", -2: "g", -3: "c", -4: "f", -5: "b-", -6: "e-", -7: "a-"}

_PITCH_CLASS = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}


def key_pitch_class(key: str) -> int:
    pc = _PITCH_CLASS[key[0].upper()]
    if key.endswith("#"):
        pc += 1
    elif key.endswith("-"):
        pc -= 1
    return pc % 12


# --- key estimation ---------------------------------------------------------

# Krumhansl-Kessler major/minor profiles
_KS_MAJOR = np.array([6.35, 2.23, 3.48, 2.33, 4.38, 4.09, 2.52, 5.19, 2.39, 3.66, 2.29, 2.88])
_KS_MINOR = np.array([6.33, 2.68, 3.52, 5.38, 2.60, 3.53, 2.54, 4.75, 3.98, 2.69, 3.34, 3.17])
_MAJOR_NAMES = ["C", "D-", "D", "E-", "E", "F", "F#", "G", "A-", "A", "B-", "B"]
_MINOR_NAMES = ["c", "c#", "d", "e-", "e", "f", "f#", "g", "g#", "a", "b-", "b"]


def estimate_key(notes) -> str:
    """Krumhansl-Schmuckler: correlate the duration-weighted pitch-class
    histogram against all 24 rotated profiles."""
    hist = np.zeros(12)
    for start, endt, pitch in notes:
        hist[pitch % 12] += endt - start
    if hist.sum() == 0:
        return "C"
    best, best_r = "C", -2.0
    for rot in range(12):
        h = np.roll(hist, -rot)
        for prof, names in ((_KS_MAJOR, _MAJOR_NAMES), (_KS_MINOR, _MINOR_NAMES)):
            r = np.corrcoef(h, prof)[0, 1]
            if r > best_r:
                best_r, best = r, names[rot]
    return best


def key_from_midi(key_sig, notes) -> str:
    if key_sig is not None:
        sf, mi = key_sig
        table = _MINOR_BY_SF if mi else _MAJOR_BY_SF
        if sf in table:
            return table[sf]
    return estimate_key(notes)


def transpose_song(song, key: str):
    """Shift a song to C major / c minor; returns (song, new_key)."""
    pc = key_pitch_class(key)
    shift = -pc if pc <= 6 else 12 - pc  # within [-6, +5]
    return ([[n + shift for n in frame] for frame in song],
            "c" if key.islower() else "C")


# --- corpus assembly ---------------------------------------------------------

def build_corpus(midi_dir: str, split_lists=None, frames_per_beat: int = 2):
    files = sorted(f for f in os.listdir(midi_dir) if f.lower().endswith((".mid", ".midi")))
    if not files:
        raise SystemExit(f"no .mid files in {midi_dir}")
    songs, keys = {}, {}
    for f in files:
        with open(os.path.join(midi_dir, f), "rb") as fh:
            division, notes, key_sig = parse_smf(fh.read())
        song = quantize_to_song(division, notes, frames_per_beat)
        if not song:
            print(f"skipping empty {f}", file=sys.stderr)
            continue
        songs[f] = song
        keys[f] = key_from_midi(key_sig, notes)

    names = sorted(songs)
    if split_lists:
        split = {s: [n for n in split_lists[s] if n in songs] for s in ("train", "valid", "test")}
    else:  # deterministic 70/15/15 over the sorted list
        n = len(names)
        n_tr, n_va = int(0.7 * n), int(0.15 * n)
        split = {"train": names[:n_tr], "valid": names[n_tr : n_tr + n_va],
                 "test": names[n_tr + n_va :]}

    D = {}
    for s in ("train", "valid", "test"):
        D[s] = [songs[f] for f in split[s]]
        D[f"{s}_key"] = [keys[f] for f in split[s]]
        D[f"{s}_mode"] = [not keys[f].islower() for f in split[s]]
    return D


def transpose_corpus(D):
    out = {}
    for s in ("train", "valid", "test"):
        pairs = [transpose_song(song, key) for song, key in zip(D[s], D[f"{s}_key"])]
        out[s] = [p[0] for p in pairs]
        out[f"{s}_key"] = [p[1] for p in pairs]
        out[f"{s}_mode"] = list(D[f"{s}_mode"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--midi_dir", required=True, help="directory of .mid files")
    ap.add_argument("--out", required=True, help="output pickle (original keys)")
    ap.add_argument("--out_cs", default=None, help="output pickle transposed to C")
    ap.add_argument("--transpose_to_c", action="store_true")
    ap.add_argument("--frames_per_beat", type=int, default=2, help="2 = eighth notes")
    for s in ("train", "valid", "test"):
        ap.add_argument(f"--{s}_list", default=None,
                        help=f"file of basenames for the {s} split (one per line)")
    args = ap.parse_args()

    split_lists = None
    if args.train_list or args.valid_list or args.test_list:
        split_lists = {}
        for s in ("train", "valid", "test"):
            path = getattr(args, f"{s}_list")
            split_lists[s] = [l.strip() for l in open(path)] if path else []

    D = build_corpus(args.midi_dir, split_lists, args.frames_per_beat)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(D, f, protocol=2)  # py2-compatible, like the originals
    print(f"wrote {args.out}: " + ", ".join(
        f"{s} {len(D[s])} songs" for s in ("train", "valid", "test")))
    if args.transpose_to_c or args.out_cs:
        out_cs = args.out_cs or args.out.replace("_all", "_Cs")
        Dc = transpose_corpus(D)
        with open(out_cs, "wb") as f:
            pickle.dump(Dc, f, protocol=2)
        print(f"wrote {out_cs} (transposed to C)")


if __name__ == "__main__":
    main()
