"""ctypes bindings to the native C++ helpers (native/twt_native.cpp).

Compiled lazily with g++ on first use and cached beside the source; every
entry point has a pure-Python fallback so the framework degrades gracefully
where no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRCS = [
    os.path.join(_REPO_ROOT, "native", "twt_native.cpp"),
    os.path.join(_REPO_ROOT, "native", "flac_codec.cpp"),
]
_LIB = os.path.join(_REPO_ROOT, "native", "libtwt_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            srcs = [s for s in _SRCS if os.path.exists(s)]
            stale = (not os.path.exists(_LIB)) or any(
                os.path.getmtime(s) > os.path.getmtime(_LIB) for s in srcs
            )
            if stale:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _LIB, *srcs],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.tw_edit_distance_u32.restype = ctypes.c_int32
            lib.tw_edit_distance_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
            ]
            lib.tw_max_ngram_count_u32.restype = ctypes.c_int32
            lib.tw_max_ngram_count_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32, ctypes.c_int32,
            ]
            lib.tw_flac_decode_file.restype = ctypes.c_int32
            lib.tw_flac_decode_file.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.tw_flac_encode_file.restype = ctypes.c_int32
            lib.tw_flac_encode_file.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ]
            lib.tw_free.restype = None
            lib.tw_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def _intern(seq: Sequence, table: dict) -> np.ndarray:
    out = np.empty(len(seq), dtype=np.uint32)
    for i, tok in enumerate(seq):
        out[i] = table.setdefault(tok, len(table))
    return out


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance between two token sequences (str units)."""
    lib = _load()
    if lib is None:
        from ..text.metrics import edit_distance_py

        return edit_distance_py(a, b)
    table: dict = {}
    aa = _intern(a, table)
    bb = _intern(b, table)
    return int(
        lib.tw_edit_distance_u32(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb),
        )
    )


def max_ngram_count(text: str, n: int = 6) -> int:
    """Max character-n-gram repetition count (marker spans skipped)."""
    lib = _load()
    if lib is None:
        from collections import defaultdict

        counts = defaultdict(int)
        for i in range(max(len(text) - n + 1, 0)):
            gram = text[i : i + n]
            if "|>" in gram or "<|" in gram:
                continue
            counts[gram] += 1
        return max(counts.values()) if counts else 0
    arr = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).copy()
    return int(
        lib.tw_max_ngram_count_u32(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(arr), n
        )
    )


def flac_decode(path: str):
    """Decode a FLAC file -> (float32 array [T] or [T, C], sample_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native FLAC decoder unavailable (g++ build failed)")
    pcm = ctypes.POINTER(ctypes.c_int32)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    bps = ctypes.c_int32()
    rc = lib.tw_flac_decode_file(
        path.encode(), ctypes.byref(pcm), ctypes.byref(frames),
        ctypes.byref(channels), ctypes.byref(rate), ctypes.byref(bps),
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed (rc={rc}): {path}")
    n = frames.value * channels.value
    try:
        arr = np.ctypeslib.as_array(pcm, shape=(n,)).copy()
    finally:
        lib.tw_free(pcm)
    scale = float(1 << (bps.value - 1))
    data = arr.astype(np.float32) / scale
    if channels.value > 1:
        data = data.reshape(frames.value, channels.value)
    return data, rate.value


def flac_encode(path: str, audio: np.ndarray, sample_rate: int = 16000):
    """Encode float32 audio ([T] or [T, C]) to 16-bit FLAC."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native FLAC encoder unavailable (g++ build failed)")
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        frames, channels = audio.shape[0], 1
    else:
        frames, channels = audio.shape
    pcm = np.clip(np.round(audio * 32767.0), -32768, 32767).astype(np.int32)
    pcm = np.ascontiguousarray(pcm.reshape(-1))
    rc = lib.tw_flac_encode_file(
        path.encode(), pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        frames, channels, sample_rate,
    )
    if rc != 0:
        raise ValueError(f"FLAC encode failed (rc={rc}): {path}")
