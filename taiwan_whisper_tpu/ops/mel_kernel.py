"""Fused Pallas log-mel kernel (TPU).

Replaces the torch.stft / numpy fbank native dependency of the reference
(training/flax/distil_whisper/pipeline.py:39-58) with a single on-chip pass:

    frames @ W_cos, frames @ W_sin   (MXU, window folded into the DFT mats)
    -> power = re^2 + im^2            (VPU, stays in VMEM)
    -> power @ mel_fb                 (MXU)
    -> log10(max(., 1e-10))           (VPU)

The intermediate power spectrum ([3000, 256] per utterance) never touches
HBM — XLA cannot fuse across two matmuls, which is exactly the HBM round
trip this kernel removes. The per-utterance max-floor + (x+4)/4 tail runs as
ordinary XLA (it needs a global reduction over the utterance).

All operands are zero-padded to lane-aligned shapes (400->512, 201->256,
80->128); padded mel columns come out as log10(1e-10) and are sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio import mel as A

_FFT_PAD = 512  # 400 -> 512
_FREQ_PAD = 256  # 201 -> 256
_MEL_PAD = 128  # 80 -> 128
_FRAME_BLOCK = 200  # 3000 frames = 15 blocks; 200 % 8 == 0


@functools.lru_cache(maxsize=2)
def _padded_operands(num_mel_bins: int):
    w_cos, w_sin = A.dft_matrices()
    fb = A.mel_filter_bank(num_mel_bins)
    wc = np.zeros((_FFT_PAD, _FREQ_PAD), np.float32)
    ws = np.zeros((_FFT_PAD, _FREQ_PAD), np.float32)
    wc[: A.N_FFT, : A.N_FREQS] = w_cos
    ws[: A.N_FFT, : A.N_FREQS] = w_sin
    fbp = np.zeros((_FREQ_PAD, _MEL_PAD), np.float32)
    fbp[: A.N_FREQS, :num_mel_bins] = fb
    return wc, ws, fbp


def _mel_kernel(frames_ref, wcos_ref, wsin_ref, fb_ref, out_ref):
    f = frames_ref[0]  # [FRAME_BLOCK, FFT_PAD]
    re = jnp.dot(f, wcos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, wsin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * np.float32(1.0 / np.log(10.0))


def log_mel_pallas(
    audio: jnp.ndarray,  # [B, N_SAMPLES] fp32
    num_mel_bins: int = 80,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whisper log-mel features via the fused kernel.

    Same contract/numerics as audio.mel.log_mel: [B, N] -> [B, n_frames, M].
    """
    b, n = audio.shape
    n_frames = n // A.HOP_LENGTH
    assert n_frames % _FRAME_BLOCK == 0, f"{n_frames} frames not a multiple of {_FRAME_BLOCK}"
    frames = A.frame_audio(audio).astype(jnp.float32)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, _FFT_PAD - A.N_FFT)))
    wc, ws, fbp = _padded_operands(num_mel_bins)

    grid = (b, n_frames // _FRAME_BLOCK)
    log_spec = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_frames, _MEL_PAD), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _FRAME_BLOCK, _FFT_PAD), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FFT_PAD, _FREQ_PAD), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FFT_PAD, _FREQ_PAD), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FREQ_PAD, _MEL_PAD), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _FRAME_BLOCK, _MEL_PAD), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_frames * _FFT_PAD * _FREQ_PAD * 2 + 2 * n_frames * _FREQ_PAD * _MEL_PAD,
            bytes_accessed=4 * (n_frames * _FFT_PAD + n_frames * _MEL_PAD),
            transcendentals=n_frames * _MEL_PAD,
        ),
        interpret=interpret,
    )(frames, jnp.asarray(wc), jnp.asarray(ws), jnp.asarray(fbp))

    log_spec = log_spec[:, :, :num_mel_bins]
    maxes = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, maxes - 8.0)
    return (log_spec + 4.0) / 4.0
