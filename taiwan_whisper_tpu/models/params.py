"""Parameter initialisation, HF checkpoint conversion, student init.

The params pytree layout is defined here once and shared by init, conversion
and the partition-spec builder (parallel/specs.py). Per-layer parameters are
stacked along a leading ``layers`` axis (see models/whisper.py).

HF interop replaces the reference's reliance on
`WhisperForConditionalGeneration.from_pretrained`
(training/run_distillation.py:1011-1018): we convert a torch/safetensors
state dict into our pytree and back, so any published Whisper checkpoint
loads without torch at inference time.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# random init (tests, from-scratch students)
# ---------------------------------------------------------------------------

def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal table (used for encoder positions)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def _init_dense(key, d_in, d_out, bias=True, std=0.02) -> Params:
    k1, _ = jax.random.split(key)
    p = {"kernel": jax.random.normal(k1, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_ln(d) -> Params:
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _init_attn(key, d, bias_k=False) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "q": _init_dense(ks[0], d, d),
        "k": _init_dense(ks[1], d, d, bias=bias_k),
        "v": _init_dense(ks[2], d, d),
        "out": _init_dense(ks[3], d, d),
    }


def _init_layer(key, config: WhisperConfig, cross: bool) -> Params:
    ks = jax.random.split(key, 4)
    d, f = config.d_model, config.ffn_dim
    p = {
        "self_attn": _init_attn(ks[0], d),
        "self_attn_ln": _init_ln(d),
        "fc1": _init_dense(ks[1], d, f),
        "fc2": _init_dense(ks[2], f, d),
        "final_ln": _init_ln(d),
    }
    if cross:
        p["cross_attn"] = _init_attn(ks[3], d)
        p["cross_attn_ln"] = _init_ln(d)
    return p


def _stack_layers(layers: List[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def init_params(config: WhisperConfig, seed: int = 0) -> Params:
    key = jax.random.PRNGKey(seed)
    k_enc, k_dec, k_emb, kc1, kc2 = jax.random.split(key, 5)
    d = config.d_model
    enc_layers = _stack_layers(
        [_init_layer(k, config, cross=False)
         for k in jax.random.split(k_enc, config.encoder_layers)]
    )
    dec_layers = _stack_layers(
        [_init_layer(k, config, cross=True)
         for k in jax.random.split(k_dec, config.decoder_layers)]
    )
    return {
        "encoder": {
            "conv1": {
                "kernel": jax.random.normal(kc1, (3, config.num_mel_bins, d)) * 0.02,
                "bias": jnp.zeros((d,), jnp.float32),
            },
            "conv2": {
                "kernel": jax.random.normal(kc2, (3, d, d)) * 0.02,
                "bias": jnp.zeros((d,), jnp.float32),
            },
            "embed_positions": jnp.asarray(_sinusoids(config.max_source_positions, d)),
            "layers": enc_layers,
            "ln_post": _init_ln(d),
        },
        "decoder": {
            "embed_tokens": jax.random.normal(k_emb, (config.vocab_size, d)) * 0.02,
            "embed_positions": jax.random.normal(k_emb, (config.max_target_positions, d)) * 0.02,
            "layers": dec_layers,
            "ln_post": _init_ln(d),
        },
    }


# ---------------------------------------------------------------------------
# HF <-> pytree conversion
# ---------------------------------------------------------------------------

_ATTN_MAP = {"q_proj": "q", "k_proj": "k", "v_proj": "v", "out_proj": "out"}


def _from_t(w) -> np.ndarray:
    """torch tensor / numpy array -> numpy fp32."""
    if hasattr(w, "detach"):
        w = w.detach().cpu().numpy()
    return np.asarray(w, dtype=np.float32)


def hf_to_params(state_dict: Mapping[str, Any], config: WhisperConfig) -> Params:
    """Convert an HF ``WhisperForConditionalGeneration`` state dict.

    Accepts torch tensors or numpy arrays. Linear weights are transposed to
    [d_in, d_out]; conv weights [out,in,k] -> [k,in,out]. Keys may carry the
    ``model.`` prefix or not (both exist across HF versions).
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[len("model."):]
        sd[k] = v
    if "proj_out.weight" in sd and "decoder.embed_tokens.weight" not in sd:
        sd["decoder.embed_tokens.weight"] = sd["proj_out.weight"]

    def dense(prefix, bias=True):
        p = {"kernel": _from_t(sd[f"{prefix}.weight"]).T}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = _from_t(sd[f"{prefix}.bias"])
        return p

    def ln(prefix):
        return {"scale": _from_t(sd[f"{prefix}.weight"]),
                "bias": _from_t(sd[f"{prefix}.bias"])}

    def attn(prefix):
        return {ours: dense(f"{prefix}.{theirs}") for theirs, ours in _ATTN_MAP.items()}

    def layer(prefix, cross):
        p = {
            "self_attn": attn(f"{prefix}.self_attn"),
            "self_attn_ln": ln(f"{prefix}.self_attn_layer_norm"),
            "fc1": dense(f"{prefix}.fc1"),
            "fc2": dense(f"{prefix}.fc2"),
            "final_ln": ln(f"{prefix}.final_layer_norm"),
        }
        if cross:
            p["cross_attn"] = attn(f"{prefix}.encoder_attn")
            p["cross_attn_ln"] = ln(f"{prefix}.encoder_attn_layer_norm")
        return p

    enc_layers = _stack_layers(
        [jax.tree.map(jnp.asarray, layer(f"encoder.layers.{i}", cross=False))
         for i in range(config.encoder_layers)]
    )
    dec_layers = _stack_layers(
        [jax.tree.map(jnp.asarray, layer(f"decoder.layers.{i}", cross=True))
         for i in range(config.decoder_layers)]
    )

    def conv(prefix):
        w = _from_t(sd[f"{prefix}.weight"])  # [out, in, k]
        return {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0))),
                "bias": jnp.asarray(_from_t(sd[f"{prefix}.bias"]))}

    return {
        "encoder": {
            "conv1": conv("encoder.conv1"),
            "conv2": conv("encoder.conv2"),
            "embed_positions": jnp.asarray(_from_t(sd["encoder.embed_positions.weight"])),
            "layers": enc_layers,
            "ln_post": jax.tree.map(jnp.asarray, ln("encoder.layer_norm")),
        },
        "decoder": {
            "embed_tokens": jnp.asarray(_from_t(sd["decoder.embed_tokens.weight"])),
            "embed_positions": jnp.asarray(_from_t(sd["decoder.embed_positions.weight"])),
            "layers": dec_layers,
            "ln_post": jax.tree.map(jnp.asarray, ln("decoder.layer_norm")),
        },
    }


def params_to_hf(params: Params, config: WhisperConfig) -> Dict[str, np.ndarray]:
    """Inverse of `hf_to_params` (keys with ``model.`` prefix + proj_out),
    for exporting checkpoints consumable by HF tooling (reference:
    flax/run_distillation.py:736-763 save_hf_weights)."""
    out: Dict[str, np.ndarray] = {}

    def put(key, arr):
        out[key] = np.asarray(arr, dtype=np.float32)

    def dense(prefix, p):
        put(f"{prefix}.weight", np.asarray(p["kernel"]).T)
        if "bias" in p:
            put(f"{prefix}.bias", p["bias"])

    def ln(prefix, p):
        put(f"{prefix}.weight", p["scale"])
        put(f"{prefix}.bias", p["bias"])

    def attn(prefix, p):
        for theirs, ours in _ATTN_MAP.items():
            dense(f"{prefix}.{theirs}", p[ours])

    def unstack(stacked, i):
        return jax.tree.map(lambda x: x[i], stacked)

    enc, dec = params["encoder"], params["decoder"]
    put("model.encoder.conv1.weight", np.transpose(np.asarray(enc["conv1"]["kernel"]), (2, 1, 0)))
    put("model.encoder.conv1.bias", enc["conv1"]["bias"])
    put("model.encoder.conv2.weight", np.transpose(np.asarray(enc["conv2"]["kernel"]), (2, 1, 0)))
    put("model.encoder.conv2.bias", enc["conv2"]["bias"])
    put("model.encoder.embed_positions.weight", enc["embed_positions"])
    ln("model.encoder.layer_norm", enc["ln_post"])
    for i in range(config.encoder_layers):
        lp = unstack(enc["layers"], i)
        pre = f"model.encoder.layers.{i}"
        attn(f"{pre}.self_attn", lp["self_attn"])
        ln(f"{pre}.self_attn_layer_norm", lp["self_attn_ln"])
        dense(f"{pre}.fc1", lp["fc1"])
        dense(f"{pre}.fc2", lp["fc2"])
        ln(f"{pre}.final_layer_norm", lp["final_ln"])
    put("model.decoder.embed_tokens.weight", dec["embed_tokens"])
    put("model.decoder.embed_positions.weight", dec["embed_positions"])
    ln("model.decoder.layer_norm", dec["ln_post"])
    for i in range(config.decoder_layers):
        lp = unstack(dec["layers"], i)
        pre = f"model.decoder.layers.{i}"
        attn(f"{pre}.self_attn", lp["self_attn"])
        ln(f"{pre}.self_attn_layer_norm", lp["self_attn_ln"])
        attn(f"{pre}.encoder_attn", lp["cross_attn"])
        ln(f"{pre}.encoder_attn_layer_norm", lp["cross_attn_ln"])
        dense(f"{pre}.fc1", lp["fc1"])
        dense(f"{pre}.fc2", lp["fc2"])
        ln(f"{pre}.final_layer_norm", lp["final_ln"])
    put("proj_out.weight", dec["embed_tokens"])
    return out


# ---------------------------------------------------------------------------
# student init + language-embedding mixing
# ---------------------------------------------------------------------------

def spaced_layer_indices(n_teacher: int, n_student: int) -> List[int]:
    """Maximally-spaced teacher-layer mapping for student INIT (reference:
    training/create_student_model.py:139-150 — ``np.linspace(0, L-1, n,
    dtype=int)`` i.e. truncation, with the last index forced to L-1)."""
    idx = np.linspace(0, n_teacher - 1, n_student).astype(int).tolist()
    idx[-1] = n_teacher - 1
    return idx


def layers_to_supervise(n_student: int, n_teacher: int) -> List[int]:
    """Teacher-layer index supervising each student layer for the MSE
    hidden-state loss. This is a DIFFERENT mapping from the init one:
    student layer i emulates the teacher layer at equal increments ending
    at L-1 and starting at L//n - 1, e.g. (2, 32) -> [15, 31] (reference:
    flax/run_distillation.py get_layers_to_supervise:971-987)."""
    idx = (
        np.linspace(n_teacher // n_student - 1, n_teacher - 1, n_student)
        .astype(int)
        .tolist()
    )
    idx[-1] = n_teacher - 1
    return idx


def init_student_from_teacher(
    teacher_params: Params,
    teacher_config: WhisperConfig,
    decoder_layers: int,
    decoder_layer_indices: Optional[List[int]] = None,
    encoder_layers: Optional[int] = None,
) -> Params:
    """Build a student: N decoder layers copied from maximally-spaced
    teacher decoder layers (or an explicit index list, mirroring
    --decoder_layers_numbers), plus — when ``encoder_layers`` is given —
    a shrunk encoder sliced the same way (reference:
    training/create_student_model.py:139-144,186-191 ``--encoder_layers``;
    this is how the 16-2 variant is produced from the 32-layer large-v2)."""
    idx = decoder_layer_indices or spaced_layer_indices(
        teacher_config.decoder_layers, decoder_layers
    )
    assert len(idx) == decoder_layers
    take = jnp.asarray(idx, dtype=jnp.int32)
    encoder = teacher_params["encoder"]
    if encoder_layers is not None and encoder_layers != teacher_config.encoder_layers:
        eidx = jnp.asarray(
            spaced_layer_indices(teacher_config.encoder_layers, encoder_layers),
            dtype=jnp.int32,
        )
        encoder = dict(encoder, layers=jax.tree.map(
            lambda x: x[eidx], encoder["layers"]
        ))
    student = {
        "encoder": jax.tree.map(jnp.array, encoder),
        "decoder": {
            "embed_tokens": jnp.array(teacher_params["decoder"]["embed_tokens"]),
            "embed_positions": jnp.array(teacher_params["decoder"]["embed_positions"]),
            "layers": jax.tree.map(lambda x: x[take], teacher_params["decoder"]["layers"]),
            "ln_post": jax.tree.map(jnp.array, teacher_params["decoder"]["ln_post"]),
        },
    }
    return student


def mix_language_embeddings(
    params: Params,
    target_id: int,
    source_ids: List[int],
    weights: Optional[List[float]] = None,
) -> Params:
    """Overwrite one language-token embedding with a weighted average of
    others — the reference's code-switching trick of setting
    emb[<|zh|>] = 0.5*emb[<|zh|>] + 0.5*emb[<|en|>]
    (reference: utils/model_utils.py:4-14)."""
    emb = params["decoder"]["embed_tokens"]
    if weights is None:
        weights = [1.0 / len(source_ids)] * len(source_ids)
    mixed = sum(w * emb[i] for w, i in zip(weights, source_ids))
    emb = emb.at[target_id].set(mixed)
    new = dict(params)
    new["decoder"] = dict(params["decoder"])
    new["decoder"]["embed_tokens"] = emb
    return new
