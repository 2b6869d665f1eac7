"""Energy-based voice activity detection (VAD-lite).

The reference's stage 1 leans on faster-whisper's bundled VAD model
(pseudo-labelling/initial_inference.py:84-90, use_vad_model=True) to skip
silence before transcription. This is a dependency-free equivalent: frame
RMS energies with an adaptive noise floor, hysteresis thresholds and
min-duration/merge smoothing. It feeds the labelling driver (skip silent
files/regions) and complements the on-device no-speech probe
(decode/greedy.py no_speech_probs).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

SAMPLE_RATE = 16000


@dataclasses.dataclass
class VadConfig:
    frame_ms: float = 20.0
    # hysteresis: enter speech above `high`, leave below `low` (relative to
    # the adaptive noise floor, in dB)
    enter_db_above_floor: float = 9.0
    exit_db_above_floor: float = 6.0
    floor_percentile: float = 10.0
    min_speech_s: float = 0.25
    min_silence_s: float = 0.5
    pad_s: float = 0.2  # margin added around each region
    abs_floor_db: float = -60.0  # absolute silence level (dBFS)
    abs_speech_db: float = -35.0  # anything above this is speech regardless
    # of the adaptive floor (handles continuously-voiced audio where the
    # "noise floor" percentile lands on speech itself)


def frame_energies_db(audio: np.ndarray, cfg: VadConfig) -> np.ndarray:
    hop = int(SAMPLE_RATE * cfg.frame_ms / 1000.0)
    n = (len(audio) // hop) * hop
    if n == 0:
        return np.full((1,), -120.0, np.float32)
    frames = audio[:n].reshape(-1, hop)
    rms = np.sqrt(np.mean(np.square(frames.astype(np.float64)), axis=1) + 1e-12)
    return (20.0 * np.log10(rms + 1e-12)).astype(np.float32)


def speech_regions(
    audio: np.ndarray, cfg: VadConfig = VadConfig()
) -> List[Tuple[float, float]]:
    """(start_s, end_s) speech regions, padded and smoothed."""
    e = frame_energies_db(audio, cfg)
    hop_s = cfg.frame_ms / 1000.0
    floor = max(float(np.percentile(e, cfg.floor_percentile)), cfg.abs_floor_db - 20.0)
    enter = max(min(floor + cfg.enter_db_above_floor, cfg.abs_speech_db),
                cfg.abs_floor_db)
    exit_ = max(min(floor + cfg.exit_db_above_floor, cfg.abs_speech_db - 3.0),
                cfg.abs_floor_db)

    regions: List[Tuple[int, int]] = []
    in_speech = False
    start = 0
    silence_run = 0
    min_sil_frames = int(cfg.min_silence_s / hop_s)
    for i, db in enumerate(e):
        if not in_speech:
            if db > enter:
                in_speech = True
                start = i
                silence_run = 0
        else:
            if db < exit_:
                silence_run += 1
                if silence_run >= min_sil_frames:
                    regions.append((start, i - silence_run + 1))
                    in_speech = False
            else:
                silence_run = 0
    if in_speech:
        regions.append((start, len(e)))

    # frames -> seconds, pad, merge, filter
    out: List[Tuple[float, float]] = []
    total_s = len(audio) / SAMPLE_RATE
    for s, t in regions:
        a = max(s * hop_s - cfg.pad_s, 0.0)
        b = min(t * hop_s + cfg.pad_s, total_s)
        if b - a < cfg.min_speech_s:
            continue
        if out and a - out[-1][1] < cfg.min_silence_s:
            out[-1] = (out[-1][0], b)
        else:
            out.append((a, b))
    return out


def speech_ratio(audio: np.ndarray, cfg: VadConfig = VadConfig()) -> float:
    regions = speech_regions(audio, cfg)
    total = len(audio) / SAMPLE_RATE
    if total <= 0:
        return 0.0
    return sum(b - a for a, b in regions) / total


def extract_speech(
    audio: np.ndarray, cfg: VadConfig = VadConfig()
) -> Tuple[np.ndarray, List[Tuple[float, float]]]:
    """Concatenate speech regions; returns (speech audio, original regions)
    so downstream timestamps can be mapped back."""
    regions = speech_regions(audio, cfg)
    if not regions:
        return np.zeros((0,), np.float32), []
    parts = [
        audio[int(a * SAMPLE_RATE) : int(b * SAMPLE_RATE)] for a, b in regions
    ]
    return np.concatenate(parts).astype(np.float32), regions
