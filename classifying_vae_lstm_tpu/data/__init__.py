from .pianoroll import (
    PianoData,
    pianoroll_to_song,
    relative_major,
    rel_keys,
    sliding_inds,
    sliding_window,
    song_to_pianoroll,
    songs_to_pianoroll,
)
from .corpus import corpus_from_midi_dir, transpose_corpus
from .midi import MidiWriter, midi_to_roll, parse_smf, write_sample
from .wav import render_roll, write_sample_wav

__all__ = [
    "PianoData",
    "corpus_from_midi_dir",
    "midi_to_roll",
    "parse_smf",
    "transpose_corpus",
    "MidiWriter",
    "pianoroll_to_song",
    "rel_keys",
    "relative_major",
    "sliding_inds",
    "sliding_window",
    "render_roll",
    "song_to_pianoroll",
    "songs_to_pianoroll",
    "write_sample",
    "write_sample_wav",
]
