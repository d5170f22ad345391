"""WAV synth tests: file validity, duration, spectral peak at note frequency."""

import wave

import numpy as np

from classifying_vae_lstm_tpu.data.wav import midi_to_hz, render_roll, write_sample_wav


def test_midi_to_hz_a440():
    # pitch index 48 -> MIDI 69 -> 440 Hz
    np.testing.assert_allclose(midi_to_hz(48), 440.0)


def test_render_duration_and_range():
    roll = np.zeros((8, 88))
    roll[2:6, 48] = 1
    sig = render_roll(roll, frame_sec=0.1, sr=8000)
    assert sig.shape == (8 * 800,)
    assert np.abs(sig).max() <= 1.0


def test_spectral_peak_at_note():
    roll = np.zeros((4, 88))
    roll[:, 48] = 1  # A440 held
    sr = 8000
    sig = render_roll(roll, frame_sec=0.25, sr=sr)
    spec = np.abs(np.fft.rfft(sig))
    freqs = np.fft.rfftfreq(len(sig), 1 / sr)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 440.0) < 5.0


def test_write_sample_wav(tmp_path):
    roll = np.zeros((4, 88))
    roll[:, 40] = 1
    path = write_sample_wav(roll, str(tmp_path), "out", isHalfAsSlow=True, sr=8000)
    with wave.open(path, "rb") as f:
        assert f.getnchannels() == 1
        assert f.getframerate() == 8000
        # half-as-slow doubles frames: 8 frames * 0.25 s * 8000 Hz
        assert f.getnframes() == 8 * 2000


def test_silence_renders_zero():
    sig = render_roll(np.zeros((4, 88)), frame_sec=0.1, sr=8000)
    assert np.abs(sig).max() == 0.0
