"""Synthesize a Piano-midi-SCALE tonal corpus with the framework's own tools.

The real Piano-midi pickles are absent from the reference mount
(`/root/reference/.MISSING_LARGE_BLOBS:1-2`) and piano-midi.de is unreachable
offline (no DNS egress, verified rounds 1-3). BASELINE configs 3/5 need a
multi-song, multi-key, realistic-length corpus to run AS WRITTEN (VERDICT
round 2, item 5). This tool generates one:

* 120 songs (default), one per (key, index) pair over all 12 major and 12
  minor keys — the full circle of fifths, both modes;
* realistic lengths (240-720 eighth-note frames, i.e. 1-3 minutes at 120 bpm
  — Piano-midi pieces are full works, unlike the ~60-frame JSB chorales);
* polyphonic piano texture: a functional chord progression (I-vi-IV-V family
  in major, i-VI-iv-V in harmonic minor) in the left hand — root + triad,
  arpeggiated or block per half-bar — and a scale-tone random-walk melody
  with passing chromatics in the right hand;
* written as REAL .mid files through :class:`..data.midi.MidiWriter` (the
  same writer the samplers use), then ingested by the standard corpus path
  (`tools/make_pianomidi_pickle.py` / `data/corpus.py`): SMF parse,
  quantization, key-signature-free Krumhansl-Schmuckler key labeling — so
  the whole labeling pipeline is exercised end to end, not bypassed.

Usage:
    python tools/synth_pianomidi_corpus.py --out_dir data/input/pm_synth_midi \
        --pickle data/input/Piano-midi_all.pickle [--n_songs 120] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from classifying_vae_lstm_tpu.data.midi import write_sample  # noqa: E402

MAJOR_SCALE = [0, 2, 4, 5, 7, 9, 11]
MINOR_SCALE = [0, 2, 3, 5, 7, 8, 11]  # harmonic minor (raised 7th -> V works)
# functional progressions as scale-degree indices (0-based)
MAJOR_PROGS = [
    [0, 5, 3, 4], [0, 3, 4, 0], [0, 4, 5, 3], [0, 1, 4, 0], [5, 3, 0, 4],
]
MINOR_PROGS = [
    [0, 5, 3, 4], [0, 3, 4, 0], [0, 6, 2, 4], [0, 4, 0, 4],
]
KEYS = [  # (name as the corpus labels it, tonic pitch class, is_minor)
    ("C", 0, False), ("C#", 1, False), ("D", 2, False), ("E-", 3, False),
    ("E", 4, False), ("F", 5, False), ("F#", 6, False), ("G", 7, False),
    ("A-", 8, False), ("A", 9, False), ("B-", 10, False), ("B", 11, False),
    ("c", 0, True), ("c#", 1, True), ("d", 2, True), ("e-", 3, True),
    ("e", 4, True), ("f", 5, True), ("f#", 6, True), ("g", 7, True),
    ("a-", 8, True), ("a", 9, True), ("b-", 10, True), ("b", 11, True),
]


def _triad(scale, degree):
    """Stacked thirds on a scale degree (pitch classes relative to tonic)."""
    return [scale[degree % 7], scale[(degree + 2) % 7], scale[(degree + 4) % 7]]


def synth_song(rng: np.random.Generator, tonic_pc: int, minor: bool) -> np.ndarray:
    """One song as a binary [T, 88] eighth-note piano roll (A0 = row 0)."""
    scale = MINOR_SCALE if minor else MAJOR_SCALE
    progs = MINOR_PROGS if minor else MAJOR_PROGS
    bars = int(rng.integers(30, 91))  # 8 frames/bar -> 240-720 frames
    T = bars * 8
    roll = np.zeros((T, 88), dtype=np.float32)

    def put(t, midi_pitch, dur=1):
        p = midi_pitch - 21  # MIDI note -> 88-key row
        if 0 <= p < 88:
            roll[t : min(t + dur, T), p] = 1.0

    # left hand: per-half-bar harmony from a progression random walk
    prog = list(rng.choice(len(progs), size=1))
    degrees = []
    while len(degrees) * 4 < bars + 4:
        degrees.extend(progs[int(rng.choice(len(progs)))])
    bass_oct, chord_oct = 36, 48  # C2 / C3 regions
    for half in range(bars * 2):
        t = half * 4
        deg = degrees[half // 2 % len(degrees)]
        tri = _triad(scale, deg)
        root = bass_oct + (tonic_pc + tri[0]) % 12
        put(t, root, dur=4)
        if rng.random() < 0.5:  # block chord
            for pc in tri:
                put(t, chord_oct + (tonic_pc + pc) % 12, dur=4)
        else:  # arpeggio
            for i, pc in enumerate(tri + [tri[0]]):
                put(t + i, chord_oct + (tonic_pc + pc) % 12 + (12 if i == 3 else 0))

    # right hand: scale-tone random walk with occasional chromatics/rests
    pos = 14  # scale-step index; 7 steps/octave, base octave C4-ish
    melody_base = 60
    t = 0
    while t < T:
        dur = int(rng.choice([1, 1, 1, 2, 2, 4], p=[0.3, 0.2, 0.1, 0.2, 0.1, 0.1]))
        if rng.random() < 0.08:  # rest
            t += dur
            continue
        pos = int(np.clip(pos + rng.choice([-2, -1, -1, 1, 1, 2, 3, -3]), 7, 21))
        pitch = melody_base + 12 * (pos // 7 - 1) + scale[pos % 7] + tonic_pc - 60 + 60
        if rng.random() < 0.04:  # passing chromatic
            pitch += int(rng.choice([-1, 1]))
        put(t, pitch, dur=dur)
        if rng.random() < 0.15:  # parallel third
            put(t, melody_base + 12 * (pos // 7 - 1)
                + scale[(pos + 2) % 7] + tonic_pc, dur=dur)
        t += dur
    return roll


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True, help="directory for the .mid files")
    ap.add_argument("--pickle", default=None,
                    help="also build the reference-schema pickle (original keys)")
    ap.add_argument("--pickle_cs", default=None,
                    help="also build the transposed-to-C pickle")
    ap.add_argument("--n_songs", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n_songs):
        name, pc, minor = KEYS[i % len(KEYS)]
        roll = synth_song(rng, pc, minor)
        safe = name.replace("#", "s").replace("-", "b")
        fnm = f"pm_{i:03d}_{'min' if minor else 'maj'}_{safe}"
        write_sample(roll, args.out_dir, fnm, isHalfAsSlow=False)
        if (i + 1) % 24 == 0:
            print(f"  {i + 1}/{args.n_songs} songs written", flush=True)
    print(f"wrote {args.n_songs} .mid files to {args.out_dir}")

    if args.pickle or args.pickle_cs:
        from classifying_vae_lstm_tpu.data.corpus import corpus_from_midi_dir

        D = corpus_from_midi_dir(args.out_dir)
        labeled = sorted(set(D["train_key"]))
        print(f"train keys labeled by the pipeline: {labeled}")
        if args.pickle:
            with open(args.pickle, "wb") as f:
                pickle.dump(D, f, protocol=2)
            print(f"wrote {args.pickle}")
        if args.pickle_cs:
            from classifying_vae_lstm_tpu.data.corpus import transpose_corpus

            with open(args.pickle_cs, "wb") as f:
                pickle.dump(transpose_corpus(D), f, protocol=2)
            print(f"wrote {args.pickle_cs}")


if __name__ == "__main__":
    main()
