"""Energy VAD: detects tone bursts in silence, ignores pure silence/noise."""

import numpy as np

from taiwan_whisper_tpu.pipeline.vad import (
    VadConfig,
    extract_speech,
    speech_ratio,
    speech_regions,
)

SR = 16000


def _signal(segments):
    """segments: list of (duration_s, amplitude)."""
    parts = []
    rng = np.random.RandomState(0)
    for dur, amp in segments:
        n = int(dur * SR)
        t = np.arange(n) / SR
        parts.append((amp * np.sin(2 * np.pi * 220 * t)
                      + 1e-4 * rng.randn(n)).astype(np.float32))
    return np.concatenate(parts)


def test_detects_speech_bursts():
    audio = _signal([(2.0, 0.0), (3.0, 0.3), (2.0, 0.0), (1.5, 0.3), (1.0, 0.0)])
    regions = speech_regions(audio)
    assert len(regions) == 2
    (a0, b0), (a1, b1) = regions
    assert abs(a0 - 2.0) < 0.5 and abs(b0 - 5.0) < 0.5
    assert abs(a1 - 7.0) < 0.5 and abs(b1 - 8.5) < 0.5


def test_silence_has_no_speech():
    audio = np.zeros(SR * 5, np.float32)
    assert speech_regions(audio) == []
    assert speech_ratio(audio) == 0.0


def test_constant_tone_is_one_region():
    audio = _signal([(4.0, 0.2)])
    regions = speech_regions(audio)
    assert len(regions) == 1
    assert speech_ratio(audio) > 0.9


def test_extract_speech_concatenates():
    audio = _signal([(1.0, 0.0), (2.0, 0.3), (1.0, 0.0)])
    speech, regions = extract_speech(audio)
    assert len(regions) == 1
    assert 1.5 * SR < len(speech) < 3.0 * SR
