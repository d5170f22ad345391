"""ctypes bindings for the native host-runtime library (cvl_runtime.cpp).

Lazily builds ``libcvl_runtime.so`` with g++ on first use (cached next to the
source); every entry point has a NumPy fallback with identical semantics, so
the framework works without a compiler. The data pipeline
(:mod:`..data.pianoroll`) calls these for large corpora.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libcvl_runtime.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            src = os.path.join(_HERE, "cvl_runtime.cpp")
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
                     "-o", _SO, src],
                    check=True, capture_output=True, timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.cvl_sliding_window_f32.restype = ctypes.c_int64
        lib.cvl_sliding_window_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.cvl_song_to_roll_f32.restype = ctypes.c_int32
        lib.cvl_song_to_roll_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.cvl_gather_rows_f32.restype = None
        lib.cvl_gather_rows_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def sliding_window_native(roll: np.ndarray, seq_length: int, step_length: int = 1):
    """Native sliding windows; semantics of data.pianoroll.sliding_window
    (including quirk Q1's dropped final window). Returns None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    roll = np.ascontiguousarray(roll, dtype=np.float32)
    T, D = roll.shape
    n = len(range(0, max(T - seq_length, 0), step_length)) if T - seq_length > 0 else 0
    if n == 0:
        return np.array([])
    out = np.empty((n, seq_length, D), dtype=np.float32)
    got = lib.cvl_sliding_window_f32(
        roll.ctypes.data, T, D, seq_length, step_length, out.ctypes.data
    )
    assert got == n, (got, n)
    return out


def song_to_roll_native(song, offset: int = 21):
    """Native song -> [T, 88] binary roll (octave-shift rule included)."""
    lib = _load()
    if lib is None:
        return None
    offsets = np.zeros(len(song) + 1, dtype=np.int64)
    for t, step in enumerate(song):
        offsets[t + 1] = offsets[t] + len(step)
    notes = np.fromiter(
        (n for step in song for n in step), dtype=np.int32, count=int(offsets[-1])
    )
    out = np.zeros((len(song), 88), dtype=np.float32)
    lib.cvl_song_to_roll_f32(
        notes.ctypes.data, offsets.ctypes.data, len(song), offset, out.ctypes.data
    )
    return out


def gather_rows(src: np.ndarray, perm: np.ndarray):
    """out[i] = src[perm[i]]; threaded native gather with NumPy fallback."""
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.float32)
    if lib is None:
        return src[perm]
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    flat = src.reshape(len(src), -1)
    out = np.empty_like(flat[: len(perm)])
    lib.cvl_gather_rows_f32(flat.ctypes.data, perm.ctypes.data, len(perm),
                            flat.shape[1], out.ctypes.data)
    return out.reshape((len(perm),) + src.shape[1:])
