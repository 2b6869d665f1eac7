"""Parity of the matmul-DFT log-mel frontend vs HF WhisperFeatureExtractor
(reference behavior: training/flax/distil_whisper/pipeline.py:39-58 validates
its torch.stft path against numpy the same way, to ~1e-5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from taiwan_whisper_tpu.audio import mel as A

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def fe():
    return transformers.WhisperFeatureExtractor()


def test_mel_filter_bank_matches_hf(fe):
    ours = A.mel_filter_bank(80)
    np.testing.assert_allclose(ours, fe.mel_filters, atol=1e-6)


def test_log_mel_matches_hf(fe):
    rng = np.random.RandomState(0)
    audio = (rng.randn(2, A.N_SAMPLES) * 0.1).astype(np.float32)
    ours = np.asarray(A.log_mel(jnp.asarray(audio)))  # [B, 3000, 80]
    theirs = fe(
        [audio[0], audio[1]], sampling_rate=16000, return_tensors="np"
    ).input_features  # [B, 80, 3000]
    np.testing.assert_allclose(ours.transpose(0, 2, 1), theirs, atol=2e-4)


def test_log_mel_short_audio_padded(fe):
    rng = np.random.RandomState(1)
    short = (rng.randn(12345) * 0.1).astype(np.float32)
    padded = A.pad_or_trim(short)[None]
    ours = np.asarray(A.log_mel(jnp.asarray(padded)))
    theirs = fe([short], sampling_rate=16000, return_tensors="np").input_features
    np.testing.assert_allclose(ours.transpose(0, 2, 1), theirs, atol=2e-4)


def test_frames_count():
    audio = jnp.zeros((1, A.N_SAMPLES))
    frames = A.frame_audio(audio)
    assert frames.shape == (1, A.N_FRAMES, A.N_FFT)
