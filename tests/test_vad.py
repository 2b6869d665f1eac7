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


# ---------------------------------------------------------------------------
# Spectral VAD: rejects the music/steady-noise the energy VAD passes
# (reference parity target: faster-whisper's VAD model,
# initial_inference.py:84-90)
# ---------------------------------------------------------------------------

from taiwan_whisper_tpu.pipeline.vad import (
    detect_speech_regions,
    spectral_block_scores,
    spectral_speech_regions,
)


def synth_speech(dur=6.0, seed=0, level=0.15):
    """Formant-synthesized pseudo-speech: glottal pulse train with drifting
    f0 through per-syllable formant resonators, syllabic (3-5 Hz) amplitude
    envelopes, occasional pauses."""
    rng = np.random.RandomState(seed)
    n = int(dur * SR)
    out = np.zeros(n, np.float64)
    t = 0
    while t < n:
        syl = int(rng.uniform(0.12, 0.28) * SR)
        if rng.rand() < 0.15:
            t += int(rng.uniform(0.05, 0.25) * SR)
            continue
        f0 = rng.uniform(90, 220)
        seg = np.zeros(syl)
        seg[:: max(int(SR / f0), 1)] = 1.0
        y = seg
        for fc, bw in [(rng.uniform(300, 900), 80),
                       (rng.uniform(1000, 2600), 120)]:
            k = np.arange(int(SR * 0.02))
            h = np.exp(-np.pi * bw * k / SR) * np.sin(2 * np.pi * fc * k / SR)
            y = np.convolve(y, h)[:syl]
        y *= np.hanning(syl) ** 0.7
        end = min(t + syl, n)
        out[t:end] += y[: end - t]
        t = end
    return (out / (np.abs(out).max() + 1e-9) * level).astype(np.float32)


def synth_music(dur=6.0, seed=0, level=0.2):
    """Sustained chords (3 notes x 4 harmonics, 1.5 s each, fast attack)."""
    rng = np.random.RandomState(seed)
    n = int(dur * SR)
    out = np.zeros(n, np.float64)
    t = 0
    while t < n:
        seg = int(1.5 * SR)
        root = rng.choice([220.0, 261.6, 329.6, 392.0])
        tt = np.arange(seg) / SR
        y = sum(np.sin(2 * np.pi * f * h * tt) / h
                for f in (root, root * 5 / 4, root * 3 / 2)
                for h in (1, 2, 3, 4))
        y *= np.minimum(tt / 0.05, 1.0)
        end = min(t + seg, n)
        out[t:end] += y[: end - t]
        t = end
    return (out / (np.abs(out).max() + 1e-9) * level).astype(np.float32)


def white_noise(dur=6.0, seed=0, level=0.1):
    return (np.random.RandomState(seed).randn(int(dur * SR)) * level / 3
            ).astype(np.float32)


def pink_noise(dur=6.0, seed=0, level=0.1):
    rng = np.random.RandomState(seed)
    n = int(dur * SR)
    spec = rng.randn(n // 2 + 1) + 1j * rng.randn(n // 2 + 1)
    f = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
    x = np.fft.irfft(spec / np.sqrt(f), n)
    return (x / (np.abs(x).max() + 1e-9) * level).astype(np.float32)


def _coverage(regions, dur):
    return sum(b - a for a, b in regions) / dur


def test_energy_vad_passes_music_and_noise():
    """The energy VAD's known blindness — exactly what the spectral gate
    exists to fix."""
    assert len(speech_regions(synth_music())) > 0
    assert len(speech_regions(white_noise())) > 0


def test_spectral_rejects_music_and_noise():
    for seed in range(4):
        assert spectral_speech_regions(synth_music(seed=seed)) == []
        assert spectral_speech_regions(white_noise(seed=seed)) == []
        assert spectral_speech_regions(pink_noise(seed=seed)) == []
    assert spectral_speech_regions(np.zeros(SR * 6, np.float32)) == []


def test_spectral_accepts_speech():
    for seed in range(4):
        cov = _coverage(spectral_speech_regions(synth_speech(seed=seed)), 6.0)
        assert cov > 0.6, f"seed {seed}: coverage {cov}"
    # robust to additive noise, quiet level, and background music
    noisy = synth_speech(seed=1) + pink_noise(seed=1, level=0.03)
    assert _coverage(spectral_speech_regions(noisy), 6.0) > 0.6
    assert _coverage(
        spectral_speech_regions(synth_speech(seed=2, level=0.04)), 6.0) > 0.6
    over_music = synth_speech(seed=1) + synth_music(seed=1, level=0.05)
    assert _coverage(spectral_speech_regions(over_music), 6.0) > 0.6


def test_spectral_localizes_speech_in_mixed_timeline():
    mix = np.concatenate([
        np.zeros(3 * SR, np.float32),     # 0-3 silence
        synth_speech(seed=7, dur=4.0),    # 3-7 speech
        synth_music(seed=7, dur=4.0),     # 7-11 music
        synth_speech(seed=8, dur=3.0),    # 11-14 speech
        white_noise(seed=7, dur=3.0),     # 14-17 noise
    ])
    regions = spectral_speech_regions(mix)
    assert len(regions) == 2
    (a0, b0), (a1, b1) = regions
    assert abs(a0 - 3.0) < 1.0 and abs(b0 - 7.0) < 1.5
    assert abs(a1 - 11.0) < 1.0 and abs(b1 - 14.0) < 1.5


def test_spectral_block_scores_separate_classes():
    mr_speech = float(np.median(
        spectral_block_scores(synth_speech())["mod_ratio"]))
    mr_music = float(np.median(
        spectral_block_scores(synth_music())["mod_ratio"]))
    fl_noise = float(np.median(
        spectral_block_scores(white_noise())["flatness"]))
    fl_speech = float(np.median(
        spectral_block_scores(synth_speech())["flatness"]))
    assert mr_speech > 0.6 > 0.45 > mr_music
    assert fl_noise > 0.35 > 0.3 > fl_speech


def test_detect_speech_regions_modes():
    sp = synth_speech()
    assert detect_speech_regions(sp, "spectral")
    assert detect_speech_regions(sp, "energy")
    assert detect_speech_regions(sp, "off") == [(0.0, len(sp) / SR)]
    assert detect_speech_regions(np.zeros(0, np.float32), "off") == []
    import pytest

    with pytest.raises(ValueError):
        detect_speech_regions(sp, "nope")


def test_spectral_short_audio_no_crash():
    # shorter than one analysis block
    assert spectral_speech_regions(np.zeros(SR // 2, np.float32)) == []
    assert spectral_speech_regions(synth_speech(dur=0.4)) in ([], [(0.0, 0.4)])


# ---------------------------------------------------------------------------
# Device (jax) spectral scorer: same classifications as the numpy scorer
# ---------------------------------------------------------------------------

def test_device_scorer_matches_host_classification():
    from taiwan_whisper_tpu.pipeline.vad import (
        spectral_block_scores_device,
        spectral_speech_regions,
    )

    # speech accepted, music/noise rejected — identical verdicts to host
    for seed in range(2):
        sp = synth_speech(seed=seed)
        dev = spectral_speech_regions(
            sp, scores=spectral_block_scores_device(sp))
        assert _coverage(dev, 6.0) > 0.6
        mu = synth_music(seed=seed)
        assert spectral_speech_regions(
            mu, scores=spectral_block_scores_device(mu)) == []
        nz = white_noise(seed=seed)
        assert spectral_speech_regions(
            nz, scores=spectral_block_scores_device(nz)) == []


def test_device_scorer_scores_close_to_host():
    from taiwan_whisper_tpu.pipeline.vad import (
        spectral_block_scores,
        spectral_block_scores_device,
    )

    sp = synth_speech(seed=3)
    host = spectral_block_scores(sp)
    dev = spectral_block_scores_device(sp)
    n = min(len(host["mod_ratio"]), len(dev["mod_ratio"]))
    assert n > 10
    # same block grid (single-segment audio), near-identical features
    np.testing.assert_allclose(dev["t"][:n], host["t"][:n], atol=1e-6)
    # the device scorer ships audio as int16 (wire-size halving); the
    # quantization perturbs low-energy sub-band modulation a little —
    # bounded at 0.05, far from the 0.44/0.50 hysteresis thresholds
    np.testing.assert_allclose(dev["mod_ratio"][:n], host["mod_ratio"][:n],
                               atol=0.05)
    np.testing.assert_allclose(dev["flatness"][:n], host["flatness"][:n],
                               atol=0.05)
    np.testing.assert_allclose(dev["energy_db"][:n], host["energy_db"][:n],
                               atol=0.5)


def test_device_scorer_multi_segment_localization():
    """>120 s audio spans two scoring segments; region edges must still
    land within hysteresis tolerance of the host scorer's."""
    from taiwan_whisper_tpu.pipeline.vad import (
        spectral_block_scores_device,
        spectral_speech_regions,
    )

    mix = np.concatenate([
        np.zeros(115 * SR, np.float32),
        synth_speech(seed=9, dur=10.0),   # 115-125 s: crosses the boundary
        np.zeros(10 * SR, np.float32),
    ])
    dev = spectral_speech_regions(
        mix, scores=spectral_block_scores_device(mix))
    assert len(dev) == 1
    a, b = dev[0]
    assert abs(a - 115.0) < 2.0 and abs(b - 125.0) < 2.0
