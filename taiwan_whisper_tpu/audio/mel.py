"""Log-mel spectrogram frontend, TPU-native.

The reference computes Whisper fbanks three ways — numpy in HF's
WhisperFeatureExtractor (PT scripts), torch.stft in the flax pipeline
("5x faster than numpy", reference:
training/flax/distil_whisper/pipeline.py:39-58), and whatever CTranslate2
does internally for stage 1. Here there is exactly one implementation, built
for the MXU:

* the 400-point rFFT is expressed as two matmuls against fixed
  window-combined cosine/sine DFT matrices ([400, 201] each). At Whisper's
  n_fft=400 this is a few hundred MFLOP per 30 s utterance — noise for the
  MXU, and it avoids XLA's FFT path entirely.
* framing (hop 160, win 400) is a reshape + two shifted concats, no gather.
* numerics match HF's WhisperFeatureExtractor (slaney mel filters,
  log10-clamp, per-utterance max-8 floor, (x+4)/4 scaling) to ~1e-4 so that
  checkpoints trained on HF features transfer exactly.

`log_mel` is the XLA version; ops/mel_kernel.py provides the fused Pallas
kernel used on TPU for the power->mel->log10 tail.
"""

from __future__ import annotations

import functools
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH_S = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH_S  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000
N_FREQS = N_FFT // 2 + 1  # 201
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100


def hertz_to_mel(freq):
    """Slaney-scale mel (matches transformers.audio_utils, mel_scale="slaney")."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    return np.where(
        freq >= min_log_hertz,
        min_log_mel + np.log(np.maximum(freq, min_log_hertz) / min_log_hertz) * logstep,
        mels,
    )


def mel_to_hertz(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(
        mels >= min_log_mel,
        min_log_hertz * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
        freq,
    )


@functools.lru_cache(maxsize=8)
def mel_filter_bank(
    num_mel_bins: int = 80,
    num_freqs: int = N_FREQS,
    min_frequency: float = 0.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Slaney-normalised triangular filters, shape [num_freqs, num_mel_bins]."""
    fft_freqs = np.linspace(0.0, sampling_rate / 2, num_freqs)
    mel_min = hertz_to_mel(min_frequency)
    mel_max = hertz_to_mel(max_frequency)
    filter_freqs = mel_to_hertz(np.linspace(mel_min, mel_max, num_mel_bins + 2))

    filter_diff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    # slaney norm: equal-area triangles
    enorm = 2.0 / (filter_freqs[2 : num_mel_bins + 2] - filter_freqs[:num_mel_bins])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=2)
def dft_matrices() -> tuple:
    """Window-combined DFT matrices W_cos, W_sin of shape [N_FFT, N_FREQS].

    power[f] = (frame @ W_cos)[f]^2 + (frame @ W_sin)[f]^2 with the periodic
    Hann window folded in, equal to |stft|^2 with hann(400, periodic).
    """
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT))
    n = np.arange(N_FFT)[:, None]
    k = np.arange(N_FREQS)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    w_cos = (np.cos(ang) * window[:, None]).astype(np.float32)
    w_sin = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return w_cos, w_sin


def frame_audio(audio: jnp.ndarray) -> jnp.ndarray:
    """[B, N_SAMPLES] -> frames [B, N_FRAMES, N_FFT] with center (reflect)
    padding, via reshape + shifted concat (no gather, no FFT layout games)."""
    b, n = audio.shape
    assert n % HOP_LENGTH == 0, f"audio length {n} must be a multiple of {HOP_LENGTH}"
    pad = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    # trailing zeros so length is a multiple of HOP; extra frames are dropped
    total = x.shape[1]
    rows = -(-total // HOP_LENGTH)  # ceil
    x = jnp.pad(x, ((0, 0), (0, rows * HOP_LENGTH - total)))
    x2 = x.reshape(b, rows, HOP_LENGTH)
    # frame i covers rows i, i+1, i+2 (480 samples) -> first 400
    stacked = jnp.concatenate([x2[:, :-2], x2[:, 1:-1], x2[:, 2:]], axis=-1)
    n_frames = n // HOP_LENGTH  # whisper drops the final (n/hop + 1)th frame
    return stacked[:, :n_frames, :N_FFT]


def power_spectrogram(audio: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, N] -> power |STFT|^2, [B, n_frames, N_FREQS] (two MXU matmuls)."""
    frames = frame_audio(audio).astype(dtype)
    w_cos, w_sin = dft_matrices()
    re = jnp.dot(frames, jnp.asarray(w_cos, dtype), preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(w_sin, dtype), preferred_element_type=jnp.float32)
    return re * re + im * im


def log_mel(
    audio: jnp.ndarray,
    num_mel_bins: int = 80,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Whisper log-mel features: [B, N_SAMPLES] -> [B, n_frames, num_mel_bins].

    Matches HF WhisperFeatureExtractor numerics (log10 clamp at 1e-10,
    per-utterance max-8 floor, (x+4)/4).
    """
    power = power_spectrogram(audio, dtype=dtype)
    fb = jnp.asarray(mel_filter_bank(num_mel_bins), jnp.float32)
    mel = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    maxes = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, maxes - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(dtype)


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Host-side pad/trim to exactly `length` samples (the reference pads or
    trims every chunk to 30 s, prefiltering/validator_inference.py:131-137)."""
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
    return np.pad(audio, pad)
