"""Whisper encoder-decoder, pure-functional JAX, TPU-first.

Re-design of the reference model stack (reference:
training/flax/distil_whisper/modeling_flax_whisper.py — conv stem :919-980,
attention :256-310, KV cache trick :384-453; layers.py DenseGeneral/LayerNorm)
as plain functions over a params pytree:

* params are nested dicts of fp32 arrays; per-layer params are STACKED along a
  leading ``layers`` axis so the transformer body is a single `lax.scan` —
  compile time stays flat in depth and rematerialisation is one
  `jax.checkpoint` on the scanned body (the reference reaches the same shape
  via flax `nn.scan`, modeling_flax_whisper.py:543-650).
* compute runs in bf16 with fp32 softmax/logits accumulation (DtypePolicy).
* the decode-time KV cache is stored transposed ``[B, H, Dh, S]`` so the
  sequence axis sits on TPU lanes, and is updated with a one-hot
  multiply-accumulate — the layout the reference measured as "3-4x faster"
  on TPU than scatter (modeling_flax_whisper.py:384-453).
* activations carry logical-axis sharding constraints ("batch","length",
  "heads","kv", "embed", "mlp") resolved against the active mesh
  (parallel/mesh.py), replacing T5X `param_with_axes`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..parallel.mesh import shard
from .config import DtypePolicy, WhisperConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

def _dense(p: Params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """y = x @ kernel + bias. kernel is [d_in, d_out] (JAX layout)."""
    y = jnp.dot(x, p["kernel"].astype(dtype), preferred_element_type=dtype)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm in fp32 regardless of compute dtype (bf16-safe)."""
    orig = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, s, h, dh = x.shape
    return x.reshape(b, s, h * dh)


def _attention(
    q: jnp.ndarray,  # [B, Sq, H, Dh]
    k: jnp.ndarray,  # [B, Sk, H, Dh]
    v: jnp.ndarray,  # [B, Sk, H, Dh]
    mask: Optional[jnp.ndarray],  # broadcastable to [B, H, Sq, Sk], bool
    dtype,
) -> jnp.ndarray:
    """Plain XLA dot-product attention with fp32 softmax.

    Replaces the reference's torch SDPA/FlashAttention path
    (training/run_distillation.py:133-143); XLA fuses this well on TPU, and
    the Pallas flash kernel in ops/flash_attention.py is used instead for
    long (encoder) sequences.
    """
    dh = q.shape[-1]
    scale = dh ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=dtype)
    return out


def _self_attn_block(p: Params, x: jnp.ndarray, n_heads: int, mask, dtype,
                     use_pallas: bool = True):
    q = _split_heads(_dense(p["q"], x, dtype), n_heads)
    k = _split_heads(_dense(p["k"], x, dtype), n_heads)
    v = _split_heads(_dense(p["v"], x, dtype), n_heads)
    q = shard(q, "batch", "length", "heads", "kv")
    k = shard(k, "batch", "length", "heads", "kv")
    v = shard(v, "batch", "length", "heads", "kv")
    if mask is None and use_pallas and _use_pallas_attention(q.shape):
        from ..ops.attention import best_encoder_attention

        out = best_encoder_attention(q, k, v)
    else:
        out = _attention(q, k, v, mask, dtype)
    return _dense(p["out"], _merge_heads(out), dtype)


def _use_pallas_attention(q_shape) -> bool:
    """Route unmasked (encoder) self-attention through the Pallas kernel on
    TPU backends; einsum elsewhere (ops/attention.py)."""
    try:
        from ..ops.attention import supported

        if not supported(q_shape[1], q_shape[3]):
            return False
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _mlp_block(p_fc1: Params, p_fc2: Params, x: jnp.ndarray, dtype):
    h = _gelu(_dense(p_fc1, x, dtype))
    h = shard(h, "batch", "length", "mlp")
    return _dense(p_fc2, h, dtype)


def _lm_head(embed_tokens: jnp.ndarray, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Tied output head: operands in compute dtype (halves the 100+ MB/step
    weight read under bf16), accumulation and logits in fp32."""
    return jnp.dot(
        x.astype(dtype),
        embed_tokens.astype(dtype).T,
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _conv1d(p: Params, x: jnp.ndarray, stride: int, dtype) -> jnp.ndarray:
    """1-D conv, kernel [K, Cin, Cout], input [B, T, Cin], SAME-1 padding.

    XLA lowers this onto the MXU; replaces the reference's ad-hoc axis-
    annotated Conv (layers.py:1054-1340 / modeling_flax_whisper.py:919-980).
    """
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["kernel"].astype(dtype),
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=dtype,
    )
    return y + p["bias"].astype(dtype)


def encode(
    params: Params,
    mel: jnp.ndarray,  # [B, n_frames(3000), num_mel_bins]
    config: WhisperConfig,
    policy: DtypePolicy = DtypePolicy(),
    *,
    freeze_embed_positions: bool = True,
    use_pallas: bool = True,
    remat: bool = True,
) -> jnp.ndarray:
    """Encoder forward: conv stem -> +sinusoid positions -> N layers -> LN.

    Returns [B, max_source_positions, d_model] in policy.compute_dtype.
    ``use_pallas=False`` forces the XLA attention path — required when the
    encoder itself is differentiated (the Pallas kernel defines no VJP;
    frozen-encoder training instead stop-gradients the encoder params, so
    inference and frozen training keep the kernel).
    ``remat=False`` drops the jax.checkpoint on the scanned layer body —
    right for inference and for frozen (stop-gradient) training paths,
    where rematerialisation buys nothing.
    """
    p = params["encoder"]
    dtype = policy.compute_dtype
    x = shard(mel, "batch", "length", "num_mel")
    x = _gelu(_conv1d(p["conv1"], x, stride=1, dtype=dtype))
    x = _gelu(_conv1d(p["conv2"], x, stride=2, dtype=dtype))
    x = shard(x, "batch", "length", "embed")

    pos = p["embed_positions"]
    if freeze_embed_positions:
        # sinusoidal table is never trained (reference:
        # modeling_flax_whisper.py:982-985 stop-gradients it).
        pos = jax.lax.stop_gradient(pos)
    x = x + pos.astype(dtype)

    def layer(x, lp):
        h = _layer_norm(lp["self_attn_ln"], x)
        x = x + _self_attn_block(
            lp["self_attn"], h, config.encoder_attention_heads, None, dtype,
            use_pallas=use_pallas,
        )
        h = _layer_norm(lp["final_ln"], x)
        x = x + _mlp_block(lp["fc1"], lp["fc2"], h, dtype)
        x = shard(x, "batch", "length", "embed")
        return x, None

    x, _ = jax.lax.scan(jax.checkpoint(layer) if remat else layer, x, p["layers"])
    x = _layer_norm(p["ln_post"], x)
    return x.astype(dtype)


# ---------------------------------------------------------------------------
# decoder: teacher-forcing forward (training / prefill)
# ---------------------------------------------------------------------------

def decode_train(
    params: Params,
    enc_out: jnp.ndarray,  # [B, T_enc, d]
    tokens: jnp.ndarray,  # [B, U] int32
    config: WhisperConfig,
    policy: DtypePolicy = DtypePolicy(),
    *,
    attention_mask: Optional[jnp.ndarray] = None,  # [B, U] bool, True=keep
    output_hidden_states: bool = False,
    remat: bool = True,
) -> jnp.ndarray:
    """Full-sequence decoder forward, returns fp32 logits [B, U, vocab].

    Causal self-attention; cross-attention over enc_out. Padding inside
    ``tokens`` is handled by the loss mask (HF Whisper likewise runs pure
    causal attention during KD training — reference
    training/run_distillation.py:1528-1537 passes no decoder attention mask),
    but an explicit key-side mask can be supplied for left-padded prompts.

    With ``output_hidden_states`` returns (logits, hidden [L, B, U, d]) where
    hidden[l] is the output of decoder layer l — the supervision points of
    the reference's MSE layer-map loss (flax/run_distillation.py:1681-1718).
    """
    p = params["decoder"]
    dtype = policy.compute_dtype
    b, u = tokens.shape

    x = p["embed_tokens"].astype(dtype)[tokens]
    x = x + p["embed_positions"].astype(dtype)[:u]
    x = shard(x, "batch", "length", "embed")

    causal = jnp.tril(jnp.ones((u, u), dtype=bool))[None, None]
    if attention_mask is not None:
        causal = causal & attention_mask[:, None, None, :]

    n_heads = config.decoder_attention_heads

    def layer(x, lp):
        h = _layer_norm(lp["self_attn_ln"], x)
        x = x + _self_attn_block(lp["self_attn"], h, n_heads, causal, dtype)
        h = _layer_norm(lp["cross_attn_ln"], x)
        q = _split_heads(_dense(lp["cross_attn"]["q"], h, dtype), n_heads)
        k = _split_heads(_dense(lp["cross_attn"]["k"], enc_out.astype(dtype), dtype), n_heads)
        v = _split_heads(_dense(lp["cross_attn"]["v"], enc_out.astype(dtype), dtype), n_heads)
        att = _attention(q, k, v, None, dtype)
        x = x + _dense(lp["cross_attn"]["out"], _merge_heads(att), dtype)
        h = _layer_norm(lp["final_ln"], x)
        x = x + _mlp_block(lp["fc1"], lp["fc2"], h, dtype)
        x = shard(x, "batch", "length", "embed")
        return x, (x if output_hidden_states else None)

    x, hiddens = jax.lax.scan(jax.checkpoint(layer) if remat else layer, x, p["layers"])
    x = _layer_norm(p["ln_post"], x)
    logits = _lm_head(params["decoder"]["embed_tokens"], x, dtype)
    logits = shard(logits, "batch", "length", "vocab")
    if output_hidden_states:
        return logits, hiddens
    return logits


def forward(
    params: Params,
    mel: jnp.ndarray,
    tokens: jnp.ndarray,
    config: WhisperConfig,
    policy: DtypePolicy = DtypePolicy(),
) -> jnp.ndarray:
    """encoder + teacher-forcing decoder -> fp32 logits [B, U, vocab]."""
    enc = encode(params, mel, config, policy)
    return decode_train(params, enc, tokens, config, policy)


# ---------------------------------------------------------------------------
# decoder: incremental decode with transposed KV cache
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KVCache:
    """Self-attention cache for all decoder layers, stacked on a leading
    layer axis. Keys/values are stored transposed [L, B, H, Dh, S] so that
    the (448-aligned) sequence axis is the TPU lane dimension
    (reference trick: modeling_flax_whisper.py:384-453)."""

    k: jnp.ndarray
    v: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[-1]


jax.tree_util.register_dataclass(KVCache, data_fields=["k", "v"], meta_fields=[])


def init_cache(
    config: WhisperConfig, batch: int, max_len: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> KVCache:
    s = max_len or config.max_target_positions
    shape = (
        config.decoder_layers,
        batch,
        config.decoder_attention_heads,
        config.head_dim,
        s,
    )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def precompute_cross_kv(
    params: Params, enc_out: jnp.ndarray, config: WhisperConfig,
    policy: DtypePolicy = DtypePolicy(),
    *,
    quantize=0,  # 0/False plain; 8 int8; 4 int4; "fp8" e4m3
):
    """Cross-attention K/V for all layers: [L, B, H, Dh, T_enc] pair
    (or a QuantCrossKV when ``quantize`` is set).

    Computed once per utterance; the decode loop then never touches enc_out.
    TIME-MINOR layout, same convention as the self cache: TPU tiles the two
    minor dims to (8,128)-multiples, so any layout ending in Dh=64 pads 2x
    in HBM — measured on chip as a bf16[L,B,T,H,64] buffer at exactly 2.0x
    expansion in the XLA memory dump (PERF.md round 3). With T minor the
    pad is 1500->1536 (~2.4%), halving the decode loop's dominant stream.

    Quantizing INSIDE the per-layer scan keeps the fp32 quantization
    transient at 1/L of the whole tensor — quantizing large-v2 beam-5 KV
    after the fact OOMs v5e (the [32,40,20,64,1500] fp32 temps are ~9.8 GB
    each, ~20 GB for K+V together, over the 16 GB HBM).
    """
    dtype = policy.compute_dtype
    n_heads = config.decoder_attention_heads
    enc = enc_out.astype(dtype)

    def one_layer(_, lp):
        k = _split_heads(_dense(lp["cross_attn"]["k"], enc, dtype), n_heads)
        v = _split_heads(_dense(lp["cross_attn"]["v"], enc, dtype), n_heads)
        # [B, T, H, Dh] -> [B, H, Dh, T]
        k = jnp.transpose(k, (0, 2, 3, 1))
        v = jnp.transpose(v, (0, 2, 3, 1))
        if quantize:
            kq, ks = _quantize_kv_slice(k, quantize)
            vq, vs = _quantize_kv_slice(v, quantize)
            return None, (kq, ks, vq, vs)
        return None, (k, v)

    _, out = jax.lax.scan(one_layer, None, params["decoder"]["layers"])
    if quantize:
        return QuantCrossKV(k_q=out[0], k_scale=out[1],
                            v_q=out[2], v_scale=out[3])
    return out


@dataclasses.dataclass
class QuantCrossKV:
    """int8 cross-attention K/V with per-(layer,batch,head,channel) scales.

    Streaming the cross K/V is the dominant HBM traffic of incremental
    decoding (whisper-base batch 64: ~1.2 GB/step in bf16); int8 halves it.
    Scales fold into q (for K) and into the attention output (for V), so the
    only per-step extra work is the int8->bf16 cast fused into the dots.
    """

    k_q: jnp.ndarray  # [L, B, H, Dh, T] int8/int4/fp8 (time-minor)
    k_scale: jnp.ndarray  # [L, B, H, Dh, 1] fp32
    v_q: jnp.ndarray
    v_scale: jnp.ndarray


jax.tree_util.register_dataclass(
    QuantCrossKV,
    data_fields=["k_q", "k_scale", "v_q", "v_scale"],
    meta_fields=[],
)


def _quantize_kv_slice(x, bits):
    """Symmetric per-channel quantization of a time-minor K or V tensor
    (reduction over the minor time axis). Works on a per-layer
    [B, H, Dh, T] slice or the stacked [L, B, H, Dh, T]."""
    if bits == 8 or bits is True:
        qmax, store = 127.0, jnp.int8
    elif bits == 4:
        qmax, store = 7.0, jnp.int4
    elif bits == "fp8":
        qmax, store = 448.0, jnp.float8_e4m3fn
    else:
        raise ValueError(f"bits must be 8, 4 or 'fp8', got {bits}")
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = m / qmax + 1e-12
    xs = x.astype(jnp.float32) / scale
    if bits != "fp8":  # fp8's cast rounds natively; ints need round+clip
        xs = jnp.clip(jnp.round(xs), -qmax, qmax)
    return xs.astype(store), scale.astype(jnp.float32)


def quantize_cross_kv(cross_kv, bits=8) -> QuantCrossKV:
    """Symmetric per-channel int8/int4/fp8 quantization over the time axis.

    int8 halves the dominant HBM stream of the decode loop (PERF.md);
    int4 (native jnp.int4 packed storage) quarters the bytes but pays a
    VPU unpack — measured SLOWER than int8 at whisper-base shapes
    (PERF.md "measured non-levers") yet FASTEST at large-v2 shapes where
    bytes dominate (146 vs 114 audio-s/s greedy, PERF.md round 4
    "large-v2 grid"); validate WER before enabling on a production
    labelling run (tools/accuracy_quant.py).
    ``bits="fp8"`` stores float8_e4m3fn at the same byte width as int8 but
    with a hardware cast path on the dequant (no round/clip pass) and
    per-channel scaling into fp8's full 448 range.

    Prefer ``precompute_cross_kv(..., quantize=bits)`` for big models: it
    quantizes inside the layer scan, avoiding an O(full-KV) fp32 temp.
    """
    k, v = cross_kv
    kq, ks = _quantize_kv_slice(k, bits)
    vq, vs = _quantize_kv_slice(v, bits)
    return QuantCrossKV(k_q=kq, k_scale=ks, v_q=vq, v_scale=vs)


def _cross_xs(cross_kv):
    """Per-layer scan xs for either plain (k, v) or QuantCrossKV."""
    if isinstance(cross_kv, QuantCrossKV):
        return (cross_kv.k_q, cross_kv.k_scale, cross_kv.v_q, cross_kv.v_scale)
    return cross_kv


def _use_pallas_decode(dh: int, opt_in: bool) -> bool:
    """Gate for the EXPERIMENTAL Pallas decode-attention kernels.

    Measured on v5e (PERF.md "decode kernels" note): the XLA einsum path
    already streams cross/self K/V at 620-740 GB/s (76-90% of HBM peak) and
    the int8->bf16 dequant is VPU-bound either way, so the Pallas kernels'
    per-grid-cell overhead makes them 4-6x SLOWER at whisper-base decode
    shapes. They therefore require explicit opt-in (``use_pallas=True`` on
    ``decode_step``) and exist for experimentation on other shapes. Also disabled when the mesh
    tensor-shards heads over ``model`` (pallas_call does not
    auto-partition)."""
    if not opt_in:
        return False
    try:
        from ..ops.decode_attention import supported
        from ..parallel.mesh import MODEL_AXIS, get_active_mesh

        if not (supported(dh) and jax.default_backend() == "tpu"):
            return False
        mesh = get_active_mesh()
        if mesh is not None and MODEL_AXIS in mesh.axis_names:
            if mesh.shape[MODEL_AXIS] > 1:
                return False
        return True
    except Exception:
        return False


def _cross_attention(q, cross_slice, dtype, use_pallas: bool = False,
                     beams: int = 1, int8_dots: bool = False):
    """q [B, Sq, H, Dh] against one layer's cross K/V [B, H, Dh, T]
    (time-minor; plain bf16 or quantized QuantCrossKV slices).

    ``beams``: q rows arrive beam-flat [B*K, Sq, H, Dh] while the K/V is
    stored ONCE per batch item [B, H, Dh, T] — cross K/V is beam-invariant,
    so the K beams fold into the query axis ([B, K*Sq, H, Dh]) and every
    beam reads the same HBM stream. Replicating KV over beams instead
    multiplied the decode loop's dominant stream by K (measured 14x
    greedy:beam-5 at whisper-base; PERF.md round 4)."""
    if beams > 1:
        bk, sq, nh, dhq = q.shape
        q = q.reshape(bk // beams, beams * sq, nh, dhq)
    dh = q.shape[-1]
    scale = dh ** -0.5
    if len(cross_slice) == 4:
        kq, ks, vq, vs = cross_slice
        # fold 1/sqrt(d) and the K scale ([B,H,Dh,1] -> [B,1,H,Dh]) into q
        # (fp32, one cast); the quantized K/V cast to compute dtype inside
        # the dots
        ks_q = jnp.transpose(ks, (0, 3, 1, 2))
        if int8_dots and kq.dtype == jnp.int8:
            # int8 x int8 MXU dots ("8x8" mode): the int8->bf16 dequant of
            # the streamed K/V is VPU-bound (~1 ms/step of the 7.5 ms
            # large-v2 step, PERF.md round 5); quantizing q per (b,row,h)
            # after the k-scale fold and the softmax probs per row keeps
            # the dots entirely on the int8 MXU path. Extra rounding:
            # q at 8 bits (comparable to its bf16 mantissa) and probs at
            # 1/127 absolute — accuracy-gated (tools/accuracy_quant.py).
            qf = q.astype(jnp.float32) * scale * ks_q  # [B,Sq,H,Dh]
            qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-12
            q8 = jnp.clip(jnp.round(qf / qmax * 127.0),
                          -127, 127).astype(jnp.int8)
            logits = jnp.einsum(
                "bqhd,bhdt->bhqt", q8, kq,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * jnp.transpose(
                qmax / 127.0, (0, 2, 1, 3))
            probs = jax.nn.softmax(logits, axis=-1)  # [B,H,Sq,T] f32
            pmax = jnp.max(probs, axis=-1, keepdims=True) + 1e-12
            p8 = jnp.round(probs / pmax * 127.0).astype(jnp.int8)
            att = jnp.einsum(
                "bhqt,bhdt->bqhd", p8, vq,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * jnp.transpose(
                pmax / 127.0, (0, 2, 1, 3))
            att = att * jnp.transpose(vs, (0, 3, 1, 2))
            if beams > 1:
                att = att.reshape(bk, sq, nh, dhq)
            return att.astype(dtype)
        qs = (q.astype(jnp.float32) * scale * ks_q).astype(dtype)
    else:
        kq, vq = cross_slice
        vs = None
        qs = (q * scale).astype(dtype)
    # the experimental kernel's tested contract is bf16 or int8 storage;
    # int4/fp8 astype inside Mosaic is unproven — those fall through to XLA
    kernel_ok = kq.dtype in (jnp.int8, jnp.bfloat16, dtype)
    if q.shape[1] == 1 and kernel_ok and _use_pallas_decode(dh, use_pallas):
        from ..ops.decode_attention import cross_decode_attention

        # the experimental kernel wants head-major contiguous [B,H,T,Dh]
        att = cross_decode_attention(
            qs[:, 0],
            jnp.transpose(kq, (0, 1, 3, 2)),
            jnp.transpose(vq, (0, 1, 3, 2)),
        )[:, None]  # [B,1,H,Dh] f32
    else:
        logits = jnp.einsum(
            "bqhd,bhdt->bhqt", qs, kq.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        att = jnp.einsum(
            "bhqt,bhdt->bqhd", probs, vq.astype(dtype),
            preferred_element_type=jnp.float32,
        )
    if vs is not None:
        att = att.astype(jnp.float32) * jnp.transpose(vs, (0, 3, 1, 2))
    if beams > 1:
        att = att.reshape(bk, sq, nh, dhq)
    return att.astype(dtype)


def _cached_self_attn(lp, h, cache_k, cache_v, index, n_heads, dtype,
                      valid_from=None, use_pallas: bool = False):
    """One-token self-attention against the transposed cache.

    h: [B, 1, d]; cache_k/v: [B, H, Dh, S]; index: scalar int32 position.
    ``valid_from`` ([B] int32, optional) masks cache positions below it —
    used after a left-padded prefill.

    The current token's K/V are NOT written into the cache here: they are
    attended to directly (the cache position at ``index`` stays masked) and
    returned as [B,H,Dh,1] slices so the caller can commit all layers with a
    single dynamic-update-slice. This keeps the cache a read-only operand of
    the layer scan — XLA updates the while-loop-carried buffer in place
    instead of rewriting the full [L,B,H,Dh,S] tensor every step.

    With ``use_pallas`` the score+mask+softmax+PV pass runs as one Pallas
    kernel (ops/decode_attention.py::self_decode_attention, current token
    folded in via a flash-style rescale) — EXPERIMENTAL, measured slower
    than the XLA einsum path at whisper shapes (see _use_pallas_decode).
    Returns (attn_out [B,1,d], k_t, v_t).
    """
    b = h.shape[0]
    s = cache_k.shape[-1]
    q = _split_heads(_dense(lp["q"], h, dtype), n_heads)  # [B,1,H,Dh]
    k = _split_heads(_dense(lp["k"], h, dtype), n_heads)
    v = _split_heads(_dense(lp["v"], h, dtype), n_heads)
    k_t = jnp.transpose(k, (0, 2, 3, 1)).astype(cache_k.dtype)  # [B,H,Dh,1]
    v_t = jnp.transpose(v, (0, 2, 3, 1)).astype(cache_v.dtype)
    dh = q.shape[-1]
    qh = jnp.squeeze(q, axis=1) * (dh ** -0.5)  # [B,H,Dh]
    if _use_pallas_decode(dh, use_pallas):
        from ..ops.decode_attention import self_decode_attention

        vf = (
            valid_from.astype(jnp.int32)
            if valid_from is not None
            else jnp.zeros((b,), jnp.int32)
        )
        out = self_decode_attention(
            qh, cache_k, cache_v, k_t[..., 0], v_t[..., 0], index, vf
        ).astype(dtype)
    else:
        # scores over past cache (pos < index), current token scored directly
        logits = jnp.einsum(
            "bhd,bhds->bhs", qh, cache_k, preferred_element_type=jnp.float32
        )
        pos = jnp.arange(s)
        keep = pos[None, None] < index
        if valid_from is not None:
            keep = jnp.logical_and(
                keep, pos[None, None] >= valid_from[:, None, None]
            )
        logits = jnp.where(keep, logits, jnp.finfo(jnp.float32).min)
        cur = jnp.einsum(
            "bhd,bhd->bh", qh, k_t[..., 0].astype(qh.dtype),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.concatenate([logits, cur[..., None]], axis=-1)
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        out = jnp.einsum(
            "bhs,bhds->bhd", probs[..., :s], cache_v, preferred_element_type=dtype
        )
        out = out + probs[..., s:] * v_t[..., 0].astype(dtype)
    out = out.reshape(b, 1, -1)
    return _dense(lp["out"], out, dtype), k_t, v_t


def decode_step(
    params: Params,
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
    cache: KVCache,
    token: jnp.ndarray,  # [B] or [B,1] int32 — token generated at `index`
    index: jnp.ndarray,  # scalar int32 position of `token`
    config: WhisperConfig,
    policy: DtypePolicy = DtypePolicy(),
    *,
    valid_from: Optional[jnp.ndarray] = None,  # [B] mask cache pos < this
    unroll: int = 1,  # layer-scan unroll factor (perf knob; see PERF.md)
    use_pallas: bool = False,  # EXPERIMENTAL Pallas decode-attention kernels
    # (measured slower than the XLA path at whisper shapes; see PERF.md)
    beams: int = 1,  # rows per cross-KV batch item (beam search shares
    # the beam-invariant cross K/V; see _cross_attention)
    int8_dots: bool = False,  # int8 x int8 MXU cross-attention dots
) -> Tuple[jnp.ndarray, KVCache]:
    """One decoder step. Returns (fp32 logits [B, vocab], updated cache)."""
    p = params["decoder"]
    dtype = policy.compute_dtype
    n_heads = config.decoder_attention_heads
    if token.ndim == 1:
        token = token[:, None]

    x = p["embed_tokens"].astype(dtype)[token]  # [B,1,d]
    x = x + p["embed_positions"].astype(dtype)[index][None, None]

    cross_xs = _cross_xs(cross_kv)

    def layer(x, xs):
        lp, ck, cv = xs[:3]
        cross_slice = xs[3:]
        h = _layer_norm(lp["self_attn_ln"], x)
        att, k_t, v_t = _cached_self_attn(
            lp["self_attn"], h, ck, cv, index, n_heads, dtype, valid_from,
            use_pallas=use_pallas,
        )
        x = x + att
        h = _layer_norm(lp["cross_attn_ln"], x)
        q = _split_heads(_dense(lp["cross_attn"]["q"], h, dtype), n_heads)
        att = _cross_attention(q, cross_slice, dtype, use_pallas=use_pallas,
                               beams=beams, int8_dots=int8_dots)
        x = x + _dense(lp["cross_attn"]["out"], _merge_heads(att), dtype)
        h = _layer_norm(lp["final_ln"], x)
        x = x + _mlp_block(lp["fc1"], lp["fc2"], h, dtype)
        return x, (k_t, v_t)

    x, (k_new, v_new) = jax.lax.scan(
        layer, x, (p["layers"], cache.k, cache.v) + cross_xs, unroll=unroll
    )
    # single small in-place write of this step's K/V across all layers —
    # [L,B,H,Dh,1] into the while-loop-carried [L,B,H,Dh,S] cache
    new_k = jax.lax.dynamic_update_slice(cache.k, k_new, (0, 0, 0, 0, index))
    new_v = jax.lax.dynamic_update_slice(cache.v, v_new, (0, 0, 0, 0, index))
    x = _layer_norm(p["ln_post"], x)
    logits = _lm_head(p["embed_tokens"], x[:, 0], dtype)
    return logits, KVCache(k=new_k, v=new_v)


def extend(
    params: Params,
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
    cache: KVCache,
    tokens: jnp.ndarray,  # [B, P] tokens at positions offset..offset+P-1
    offset: jnp.ndarray,  # scalar int32: first position of `tokens`
    config: WhisperConfig,
    policy: DtypePolicy = DtypePolicy(),
    *,
    beams: int = 1,  # rows per cross-KV batch item (see _cross_attention)
    int8_dots: bool = False,
) -> Tuple[jnp.ndarray, KVCache]:
    """Multi-token decode: process P tokens in one pass against an existing
    cache (valid below ``offset``), returning fp32 logits for ALL P positions
    [B, P, vocab] and the updated cache.

    This is the verification primitive for speculative decoding (reference
    feature: training/run_eval.py:524-545 assistant-model decoding): the
    teacher scores a draft chunk in one matmul-bound pass.
    """
    p = params["decoder"]
    dtype = policy.compute_dtype
    n_heads = config.decoder_attention_heads
    b, plen = tokens.shape
    s = cache.max_len

    x = p["embed_tokens"].astype(dtype)[tokens]
    pos_emb = jax.lax.dynamic_slice_in_dim(
        p["embed_positions"].astype(dtype), offset, plen, axis=0
    )
    x = x + pos_emb[None]

    # mask over cache keys: position k visible to query i iff k <= offset + i
    key_pos = jnp.arange(s)[None, None, None, :]  # [1,1,1,S]
    q_pos = offset + jnp.arange(plen)[None, None, :, None]  # [1,1,P,1]
    mask = key_pos <= q_pos

    cross_xs = _cross_xs(cross_kv)

    def layer(x, xs):
        lp, ck, cv = xs[:3]
        cross_slice = xs[3:]
        h = _layer_norm(lp["self_attn_ln"], x)
        q = _split_heads(_dense(lp["self_attn"]["q"], h, dtype), n_heads)
        k = _split_heads(_dense(lp["self_attn"]["k"], h, dtype), n_heads)
        v = _split_heads(_dense(lp["self_attn"]["v"], h, dtype), n_heads)
        k_t = jnp.transpose(k, (0, 2, 3, 1)).astype(ck.dtype)  # [B,H,Dh,P]
        v_t = jnp.transpose(v, (0, 2, 3, 1)).astype(cv.dtype)
        ck = jax.lax.dynamic_update_slice(ck, k_t, (0, 0, 0, offset))
        cv = jax.lax.dynamic_update_slice(cv, v_t, (0, 0, 0, offset))
        dh = q.shape[-1]
        logits = jnp.einsum(
            "bphd,bhds->bhps", q * (dh ** -0.5), ck,
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        att = jnp.einsum("bhps,bhds->bphd", probs, cv, preferred_element_type=dtype)
        x = x + _dense(lp["self_attn"]["out"], _merge_heads(att), dtype)
        h = _layer_norm(lp["cross_attn_ln"], x)
        q = _split_heads(_dense(lp["cross_attn"]["q"], h, dtype), n_heads)
        att = _cross_attention(q, cross_slice, dtype, beams=beams,
                               int8_dots=int8_dots)
        x = x + _dense(lp["cross_attn"]["out"], _merge_heads(att), dtype)
        h = _layer_norm(lp["final_ln"], x)
        x = x + _mlp_block(lp["fc1"], lp["fc2"], h, dtype)
        return x, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        layer, x, (p["layers"], cache.k, cache.v) + cross_xs
    )
    x = _layer_norm(p["ln_post"], x)
    logits = _lm_head(p["embed_tokens"], x, dtype)
    return logits, KVCache(k=new_k, v=new_v)


def prefill(
    params: Params,
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
    cache: KVCache,
    tokens: jnp.ndarray,  # [B, P] int32 prompt (incl. forced decoder ids)
    config: WhisperConfig,
    policy: DtypePolicy = DtypePolicy(),
    *,
    valid_from: Optional[jnp.ndarray] = None,  # [B] first non-pad position
    aux_index: int = 0,  # extra position whose logits are also returned
    beams: int = 1,  # rows per cross-KV batch item (see _cross_attention)
    int8_dots: bool = False,
) -> Tuple[jnp.ndarray, KVCache, jnp.ndarray]:
    """Run the prompt through the decoder in one pass, filling cache[0:P].

    Returns (fp32 logits at the last prompt position [B, vocab], cache,
    fp32 logits at position ``aux_index`` [B, vocab]). The aux logits serve
    the no-speech probe at the <|startoftranscript|> position. This is the
    whole-prefix analogue of decode_step and makes prompted /
    condition-on-previous decoding (reference:
    pseudo-labelling/prepare_dataset.py:118-124, run_eval.py:659-676) one
    matmul-bound pass instead of P sequential steps.
    """
    p = params["decoder"]
    dtype = policy.compute_dtype
    n_heads = config.decoder_attention_heads
    b, pl_len = tokens.shape
    s = cache.max_len

    x = p["embed_tokens"].astype(dtype)[tokens]
    x = x + p["embed_positions"].astype(dtype)[:pl_len]

    mask = jnp.tril(jnp.ones((pl_len, pl_len), dtype=bool))[None, None]
    if valid_from is not None:
        keep = jnp.arange(pl_len)[None, :] >= valid_from[:, None]  # [B, P]
        mask = mask & keep[:, None, None, :]

    cross_xs = _cross_xs(cross_kv)

    def layer(x, xs):
        lp, ck, cv = xs[:3]
        cross_slice = xs[3:]
        h = _layer_norm(lp["self_attn_ln"], x)
        q = _split_heads(_dense(lp["self_attn"]["q"], h, dtype), n_heads)
        k = _split_heads(_dense(lp["self_attn"]["k"], h, dtype), n_heads)
        v = _split_heads(_dense(lp["self_attn"]["v"], h, dtype), n_heads)
        att = _attention(q, k, v, mask, dtype)
        x = x + _dense(lp["self_attn"]["out"], _merge_heads(att), dtype)
        # write k/v into cache at [0:P] (transposed layout)
        k_t = jnp.transpose(k, (0, 2, 3, 1))  # [B,H,Dh,P]
        v_t = jnp.transpose(v, (0, 2, 3, 1))
        ck = jax.lax.dynamic_update_slice(ck, k_t.astype(ck.dtype), (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_t.astype(cv.dtype), (0, 0, 0, 0))
        h = _layer_norm(lp["cross_attn_ln"], x)
        q = _split_heads(_dense(lp["cross_attn"]["q"], h, dtype), n_heads)
        att = _cross_attention(q, cross_slice, dtype, beams=beams,
                               int8_dots=int8_dots)
        x = x + _dense(lp["cross_attn"]["out"], _merge_heads(att), dtype)
        h = _layer_norm(lp["final_ln"], x)
        x = x + _mlp_block(lp["fc1"], lp["fc2"], h, dtype)
        return x, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        layer, x, (p["layers"], cache.k, cache.v) + cross_xs
    )
    x = _layer_norm(p["ln_post"], x)
    picked = jnp.stack([x[:, -1], x[:, aux_index]], axis=1)
    both = _lm_head(p["embed_tokens"], picked, dtype)
    return both[:, 0], KVCache(k=new_k, v=new_v), both[:, 1]
