"""Whisper model configuration.

Mirrors the architectural surface of the reference's model configs
(reference: training/flax/distil_whisper/modeling_flax_whisper.py and the HF
WhisperConfig fields actually used there), but as a frozen dataclass with
TPU-first defaults (bf16 compute, scan over layers, remat).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Architecture hyper-parameters for a Whisper encoder-decoder.

    Field names follow HF's WhisperConfig where the concept is identical so
    that checkpoint conversion is mechanical.
    """

    vocab_size: int = 51865
    num_mel_bins: int = 80
    # Encoder
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    # Decoder
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    d_model: int = 384
    ffn_dim: int = 1536
    max_source_positions: int = 1500  # 30 s of audio after conv stride 2
    max_target_positions: int = 448
    activation: str = "gelu"
    # Special token ids (multilingual vocab layout)
    pad_token_id: int = 50257
    bos_token_id: int = 50257
    eos_token_id: int = 50257
    decoder_start_token_id: int = 50258

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.encoder_attention_heads == 0
        return self.d_model // self.encoder_attention_heads

    def with_decoder_layers(self, n: int) -> "WhisperConfig":
        """Student config: same model with a shrunk decoder (reference:
        training/create_student_model.py:139-154 re-uses the teacher config
        with ``decoder_layers`` overridden)."""
        return dataclasses.replace(self, decoder_layers=n)

    def with_encoder_layers(self, n: int) -> "WhisperConfig":
        """Student config with a shrunk encoder (reference:
        training/create_student_model.py:128-144 ``--encoder_layers``)."""
        return dataclasses.replace(self, encoder_layers=n)


# Canonical model family presets (dimensions from the published Whisper
# family; the reference loads these via HF `from_pretrained`, e.g.
# training/run_distillation.py:1011-1018).
_PRESETS = {
    "tiny": dict(d_model=384, ffn_dim=1536, encoder_layers=4, decoder_layers=4,
                 encoder_attention_heads=6, decoder_attention_heads=6),
    "base": dict(d_model=512, ffn_dim=2048, encoder_layers=6, decoder_layers=6,
                 encoder_attention_heads=8, decoder_attention_heads=8),
    "small": dict(d_model=768, ffn_dim=3072, encoder_layers=12, decoder_layers=12,
                  encoder_attention_heads=12, decoder_attention_heads=12),
    "medium": dict(d_model=1024, ffn_dim=4096, encoder_layers=24, decoder_layers=24,
                   encoder_attention_heads=16, decoder_attention_heads=16),
    "large-v2": dict(d_model=1280, ffn_dim=5120, encoder_layers=32, decoder_layers=32,
                     encoder_attention_heads=20, decoder_attention_heads=20),
    "large-v3": dict(d_model=1280, ffn_dim=5120, encoder_layers=32, decoder_layers=32,
                     encoder_attention_heads=20, decoder_attention_heads=20,
                     vocab_size=51866, num_mel_bins=128),
}


def get_config(name: str, **overrides) -> WhisperConfig:
    """Look up a preset by family name, e.g. ``"tiny"`` or ``"large-v2"``.

    ``name`` may also be an HF-style id like ``openai/whisper-base``.
    """
    key = name.split("/")[-1]
    key = key[len("whisper-"):] if key.startswith("whisper-") else key
    if key not in _PRESETS:
        raise ValueError(f"unknown whisper preset {name!r}; have {sorted(_PRESETS)}")
    kwargs = dict(_PRESETS[key])
    kwargs.update(overrides)
    return WhisperConfig(**kwargs)


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    """bf16-compute / fp32-params policy (reference: flax/run_distillation.py
    keeps fp32 master params and casts to bf16 for compute, :661-734)."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def fp32() -> "DtypePolicy":
        return DtypePolicy(compute_dtype=jnp.float32, output_dtype=jnp.float32)

    @staticmethod
    def bf16() -> "DtypePolicy":
        return DtypePolicy()
