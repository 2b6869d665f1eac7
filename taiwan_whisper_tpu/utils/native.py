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
_SRC = os.path.join(_REPO_ROOT, "native", "twt_native.cpp")
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
            if (not os.path.exists(_LIB)) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _LIB, _SRC],
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
