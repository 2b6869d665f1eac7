"""int8 cross-KV quantization: numerics close to bf16, decode runs."""

import numpy as np
import pytest

import jax.numpy as jnp

from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

FP32 = DtypePolicy.fp32()


def _setup():
    cfg = WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size, d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, max_source_positions=60,
        max_target_positions=64,
    )
    params = init_params(cfg, seed=0)
    mel = jnp.asarray(np.random.RandomState(2).randn(2, 120, 80).astype(np.float32))
    enc = M.encode(params, mel, cfg, FP32)
    return cfg, params, enc


def test_quantized_step_logits_close():
    cfg, params, enc = _setup()
    cross = M.precompute_cross_kv(params, enc, cfg, FP32)
    crossq = M.quantize_cross_kv(cross)
    cache_a = M.init_cache(cfg, 2, 16, jnp.float32)
    cache_b = M.init_cache(cfg, 2, 16, jnp.float32)
    tok = jnp.full((2,), MULTILINGUAL.sot, jnp.int32)
    la, _ = M.decode_step(params, cross, cache_a, tok, jnp.int32(0), cfg, FP32)
    lb, _ = M.decode_step(params, crossq, cache_b, tok, jnp.int32(0), cfg, FP32)
    a, b = np.asarray(la), np.asarray(lb)
    denom = np.abs(a).max()
    assert np.abs(a - b).max() / denom < 0.02, np.abs(a - b).max() / denom
    # top-1 agreement
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_int4_quantized_step_logits_close():
    cfg, params, enc = _setup()
    cross = M.precompute_cross_kv(params, enc, cfg, FP32)
    crossq = M.quantize_cross_kv(cross, bits=4)
    assert crossq.k_q.dtype == jnp.int4
    cache_a = M.init_cache(cfg, 2, 16, jnp.float32)
    cache_b = M.init_cache(cfg, 2, 16, jnp.float32)
    tok = jnp.full((2,), MULTILINGUAL.sot, jnp.int32)
    la, _ = M.decode_step(params, cross, cache_a, tok, jnp.int32(0), cfg, FP32)
    lb, _ = M.decode_step(params, crossq, cache_b, tok, jnp.int32(0), cfg, FP32)
    a, b = np.asarray(la), np.asarray(lb)
    denom = np.abs(a).max()
    # int4 is lossier than int8; on a random model require coarse agreement
    assert np.abs(a - b).max() / denom < 0.25, np.abs(a - b).max() / denom


def test_fp8_quantized_step_logits_close():
    cfg, params, enc = _setup()
    cross = M.precompute_cross_kv(params, enc, cfg, FP32)
    crossq = M.quantize_cross_kv(cross, bits="fp8")
    assert crossq.k_q.dtype == jnp.float8_e4m3fn
    cache_a = M.init_cache(cfg, 2, 16, jnp.float32)
    cache_b = M.init_cache(cfg, 2, 16, jnp.float32)
    tok = jnp.full((2,), MULTILINGUAL.sot, jnp.int32)
    la, _ = M.decode_step(params, cross, cache_a, tok, jnp.int32(0), cfg, FP32)
    lb, _ = M.decode_step(params, crossq, cache_b, tok, jnp.int32(0), cfg, FP32)
    a, b = np.asarray(la), np.asarray(lb)
    denom = np.abs(a).max()
    # e4m3 has ~3 mantissa bits: coarser than int8's per-channel 7-bit grid
    assert np.abs(a - b).max() / denom < 0.06, np.abs(a - b).max() / denom
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_fp8_greedy_decode_runs():
    cfg, params, enc = _setup()
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL)
    prefix = jnp.asarray([tok.sot_sequence("zh")] * 2, jnp.int32)
    out = greedy_decode(params, enc, prefix, cfg, rules, FP32, max_len=32,
                        quantize_cross_kv="fp8")
    assert out.tokens.shape == (2, 32)


def test_int4_greedy_decode_runs():
    cfg, params, enc = _setup()
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL)
    prefix = jnp.asarray([tok.sot_sequence("zh")] * 2, jnp.int32)
    out = greedy_decode(params, enc, prefix, cfg, rules, FP32, max_len=32,
                        quantize_cross_kv=4)
    assert out.tokens.shape == (2, 32)


def test_quantized_greedy_decode_runs():
    cfg, params, enc = _setup()
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL)
    prefix = jnp.asarray([tok.sot_sequence("zh")] * 2, jnp.int32)
    ref = greedy_decode(params, enc, prefix, cfg, rules, FP32, max_len=32)
    qnt = greedy_decode(params, enc, prefix, cfg, rules, FP32, max_len=32,
                        quantize_cross_kv=True)
    # int8 error can flip low-margin tokens on a random model; require the
    # first few tokens to agree (high-margin on any model)
    a = np.asarray(ref.tokens)[:, :8]
    b = np.asarray(qnt.tokens)[:, :8]
    assert (a == b).mean() > 0.8, (a.tolist(), b.tolist())
