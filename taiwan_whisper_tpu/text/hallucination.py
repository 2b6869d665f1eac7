"""Hallucination detectors: n-gram repetition, blocklists, cross-model MER.

Behavioral port of the reference's prefiltering stack
(utils/hallucination_detector.py:85-249, prefiltering/
common_hallucination_removal.py:22-100) operating on in-memory strings
instead of the filesystem; the pipeline drivers layer file IO on top.
"""

from __future__ import annotations

import dataclasses
import re
from collections import defaultdict
from typing import Iterable, List, Optional, Tuple

from .metrics import MixErrorRate
from .normalizer import BasicTextNormalizer

TIMESTAMP_RE = re.compile(r"<\|\d{1,2}\.\d{2}\|>")


def char_ngram_hallucinated(text: str, n: int = 6, threshold: int = 5) -> bool:
    """True when any character n-gram repeats more than ``threshold`` times
    (skipping '<|'/'|>' marker spans) — the reference's 6-gram x5 detector
    (utils/hallucination_detector.py:95-114, strict > comparison)."""
    if len(text) < n:
        return False
    counts = defaultdict(int)
    for i in range(len(text) - n + 1):
        gram = text[i : i + n]
        if "|>" in gram or "<|" in gram:
            continue
        counts[gram] += 1
    return bool(counts) and max(counts.values()) > threshold


# the reference's exact-match and substring blocklists
# (prefiltering/common_hallucination_removal.py:22-37)
BLOCK_MATCH_LIST = ["Okay.", "...", ".", "Mm."]
BLOCK_CONTAIN_LIST = [
    "請不吝",
    r"(?<!\w)org(?!\w)",
    "點贊",
    "點讚",
    "字幕提供",
    "支持明鏡",
    "點點欄目",
]


def blocklist_hits(normalized_text: str) -> Tuple[List[str], List[str]]:
    """(matched substrings, matched standalone words) for the static
    blocklists. Input should already be normalizer output."""
    contains = [
        kw for kw in BLOCK_CONTAIN_LIST
        if (re.search(kw, normalized_text) if kw.startswith("(?") or "(?<" in kw
            else kw in normalized_text)
    ]
    words = re.findall(r"\b\w+\b|\.\.\.|[^\s\w]", normalized_text)
    matches = [w for w in words if w in BLOCK_MATCH_LIST]
    return contains, matches


def clean_segment_transcript(transcript: str) -> str:
    """Strip <|endoftext|>/<|continued|> tails and timestamp markers from a
    segment transcript string (the reference's read path,
    utils/hallucination_detector.py:118-128)."""
    t = transcript.strip().split("<|endoftext|>")[0]
    t = t.split("<|continued|>")[0]
    t = TIMESTAMP_RE.sub(" ", t)
    return t.strip().replace("  ", " ")


@dataclasses.dataclass
class FilterDecision:
    index: int
    hallucinated: bool
    mer: Optional[float] = None
    reason: str = ""


class CrossModelFilter:
    """Teacher-vs-validator prefilter (the K2D paper's novel contribution).

    For each 30 s chunk: teacher transcript (timestamp-stripped, normalized)
    vs validator hypothesis; drop when MER > threshold. ``mix_detection``
    reproduces utils/hallucination_detector.py:131-139: drop immediately if
    the teacher text n-gram-hallucinates; keep if only the validator does.
    """

    def __init__(
        self,
        threshold: float = 0.4,
        mix_detection: bool = False,
        phonemize: bool = False,
        empty_error_rate: float = 1.0,
        lexicon_path: Optional[str] = None,
    ):
        self.threshold = threshold
        self.mix_detection = mix_detection
        self.empty_error_rate = empty_error_rate
        self.metric = MixErrorRate(phonemize=phonemize, lexicon_path=lexicon_path)
        self.normalizer = BasicTextNormalizer()

    def check(
        self, index: int, teacher_transcript: str, validator_hyp: str
    ) -> FilterDecision:
        teacher = clean_segment_transcript(teacher_transcript)
        teacher = self.normalizer(teacher)
        hyp = self.normalizer(validator_hyp.strip())
        if self.mix_detection:
            if char_ngram_hallucinated(teacher):
                return FilterDecision(index, True, reason="teacher-ngram")
            if char_ngram_hallucinated(hyp):
                return FilterDecision(index, False, reason="validator-ngram")
        mer = self.metric.compute(
            [teacher], [hyp], empty_error_rate=self.empty_error_rate
        )
        return FilterDecision(
            index, bool(mer > self.threshold), mer=float(mer), reason="mer"
        )

    def check_batch(
        self, items: Iterable[Tuple[int, str, str]]
    ) -> List[FilterDecision]:
        return [self.check(i, t, h) for i, t, h in items]


def wer_filter_in_range(
    pred: str,
    ref: str,
    metric: MixErrorRate,
    max_wer_percent: float,
    normalizer: Optional[BasicTextNormalizer] = None,
) -> bool:
    """Training-time WER-threshold filter against ground truth (reference:
    training/run_distillation.py:1183-1186, threshold in percent)."""
    normalizer = normalizer or BasicTextNormalizer()
    p, r = normalizer(pred), normalizer(ref)
    if not r.strip():
        return False
    mer = metric.compute([p], [r])
    return float(mer) * 100.0 < max_wer_percent
