"""Basic text normalizer, equivalent to the normalizer the reference applies
before cross-model MER checks (utils/hallucination_detector.py:180
BasicTextNormalizer): lowercase, drop bracketed asides, replace
symbol/punctuation/mark characters with spaces, collapse whitespace.

Implemented from the published Whisper normalization recipe so the framework
has no transformers dependency at runtime.
"""

from __future__ import annotations

import re
import unicodedata


_BRACKETED = re.compile(r"[<\[][^>\]]*[>\]]")
_PARENS = re.compile(r"\(([^)]+?)\)")
_WS = re.compile(r"\s+")


def _remove_symbols(s: str) -> str:
    out = []
    for c in unicodedata.normalize("NFKC", s):
        if unicodedata.category(c)[0] in "MSP":
            out.append(" ")
        else:
            out.append(c)
    return "".join(out)


def basic_normalize(text: str, remove_diacritics: bool = False) -> str:
    s = text.lower()
    s = _BRACKETED.sub("", s)
    s = _PARENS.sub("", s)
    if remove_diacritics:
        s = "".join(
            c for c in unicodedata.normalize("NFKD", s)
            if unicodedata.category(c) != "Mn"
        )
    s = _remove_symbols(s)
    # NB: HF's BasicTextNormalizer does not strip leading/trailing space;
    # match it byte-for-byte
    return _WS.sub(" ", s)


class BasicTextNormalizer:
    """Callable wrapper matching the HF class interface used by the reference."""

    def __init__(self, remove_diacritics: bool = False, split_letters: bool = False):
        self.remove_diacritics = remove_diacritics
        self.split_letters = split_letters

    def __call__(self, text: str) -> str:
        s = basic_normalize(text, self.remove_diacritics)
        if self.split_letters:
            s = " ".join(c for c in s if not c.isspace())
        return s
