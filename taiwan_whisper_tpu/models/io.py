"""Model checkpoint loading/saving (HF-format dirs and native pytrees).

Replaces `WhisperForConditionalGeneration.from_pretrained` for inference-side
weight loading (reference: training/run_distillation.py:1011-1018 etc.):
reads an HF model dir (config.json + model.safetensors or pytorch_model.bin)
straight into our params pytree, torch-free when the weights are safetensors.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from .config import WhisperConfig
from .params import Params, hf_to_params, params_to_hf


def config_from_hf_dict(d: dict) -> WhisperConfig:
    return WhisperConfig(
        vocab_size=d["vocab_size"],
        num_mel_bins=d["num_mel_bins"],
        encoder_layers=d["encoder_layers"],
        encoder_attention_heads=d["encoder_attention_heads"],
        decoder_layers=d["decoder_layers"],
        decoder_attention_heads=d["decoder_attention_heads"],
        d_model=d["d_model"],
        ffn_dim=d.get("encoder_ffn_dim", d.get("decoder_ffn_dim")),
        max_source_positions=d.get("max_source_positions", 1500),
        max_target_positions=d.get("max_target_positions", 448),
        decoder_start_token_id=d.get("decoder_start_token_id", 50258),
        eos_token_id=d.get("eos_token_id", 50257),
        pad_token_id=d.get("pad_token_id", 50257),
        bos_token_id=d.get("bos_token_id", 50257),
    )


def config_to_hf_dict(c: WhisperConfig) -> dict:
    return {
        "architectures": ["WhisperForConditionalGeneration"],
        "model_type": "whisper",
        "vocab_size": c.vocab_size,
        "num_mel_bins": c.num_mel_bins,
        "encoder_layers": c.encoder_layers,
        "encoder_attention_heads": c.encoder_attention_heads,
        "decoder_layers": c.decoder_layers,
        "decoder_attention_heads": c.decoder_attention_heads,
        "d_model": c.d_model,
        "encoder_ffn_dim": c.ffn_dim,
        "decoder_ffn_dim": c.ffn_dim,
        "max_source_positions": c.max_source_positions,
        "max_target_positions": c.max_target_positions,
        "decoder_start_token_id": c.decoder_start_token_id,
        "eos_token_id": c.eos_token_id,
        "pad_token_id": c.pad_token_id,
        "bos_token_id": c.bos_token_id,
    }


def load_hf_checkpoint(model_dir: str) -> Tuple[Params, WhisperConfig]:
    """Load an HF Whisper model dir -> (params pytree, config)."""
    with open(os.path.join(model_dir, "config.json"), encoding="utf-8") as f:
        config = config_from_hf_dict(json.load(f))

    st_path = os.path.join(model_dir, "model.safetensors")
    pt_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors import safe_open

        sd = {}
        with safe_open(st_path, framework="np") as f:
            for key in f.keys():
                sd[key] = f.get_tensor(key)
    elif os.path.exists(pt_path):
        import torch  # test/conversion-time only

        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(
            f"no model.safetensors or pytorch_model.bin in {model_dir}"
        )
    return hf_to_params(sd, config), config


def save_hf_checkpoint(model_dir: str, params: Params, config: WhisperConfig):
    """Write an HF-format dir (config.json + model.safetensors) so students
    remain loadable by HF tooling (reference save_hf_weights,
    flax/run_distillation.py:736-763)."""
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w", encoding="utf-8") as f:
        json.dump(config_to_hf_dict(config), f, indent=2)
    sd = params_to_hf(params, config)
    # proj_out is tied to embed_tokens; HF convention omits it from the file
    sd.pop("proj_out.weight", None)
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(model_dir, "model.safetensors"),
              metadata={"format": "np"})


def load_model(model_dir: str) -> Tuple[Params, WhisperConfig]:
    """Load either an HF dir or an orbax checkpoint dir with config.json."""
    if os.path.exists(os.path.join(model_dir, "model.safetensors")) or os.path.exists(
        os.path.join(model_dir, "pytorch_model.bin")
    ):
        return load_hf_checkpoint(model_dir)
    raise FileNotFoundError(f"no recognised checkpoint in {model_dir}")
