"""Build reference-schema corpus pickles from a directory of MIDI files.

The Piano-midi pickles (`Piano-midi_all.pickle`, `Piano-midi_Cs.pickle`) are
missing from the reference mount (`/root/reference/.MISSING_LARGE_BLOBS:1-2`)
and the public corpus (piano-midi.de) is unreachable from this offline
environment (no DNS egress — verified round 2). This tool closes the gap from
the other side: point it at a directory of `.mid` files and it emits pickles
in the exact schema `utils/pianoroll.py:80,92-111` consumes, so BASELINE
configs 3 and 5 run as written the moment the corpus is dropped in:

    python tools/make_pianomidi_pickle.py --midi_dir /path/to/piano-midi \\
        --out "data/input/Piano-midi_all.pickle" [--transpose_to_c --out_cs ...]

All the machinery lives in the package — SMF parsing / quantization / key
labeling in :mod:`classifying_vae_lstm_tpu.data.midi`, corpus assembly in
:mod:`classifying_vae_lstm_tpu.data.corpus` — and ``PianoData`` can also
consume a MIDI directory DIRECTLY as ``--train_file`` (no pickle step); this
script only persists the py2-compatible pickle for drop-in reference parity.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from classifying_vae_lstm_tpu.data.corpus import (  # noqa: E402
    corpus_from_midi_dir as build_corpus_from_dir,
    key_pitch_class,
    transpose_corpus,
    transpose_song,
)
from classifying_vae_lstm_tpu.data.midi import (  # noqa: E402
    estimate_key,
    key_from_midi,
    parse_smf,
    quantize_notes,
)

quantize_to_song = quantize_notes  # legacy alias

__all__ = ["build_corpus", "transpose_corpus", "transpose_song", "estimate_key",
           "key_from_midi", "key_pitch_class", "parse_smf", "quantize_to_song"]


def build_corpus(midi_dir: str, split_lists=None, frames_per_beat: int = 2):
    return build_corpus_from_dir(midi_dir, split_lists, frames_per_beat)


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
