"""Tensor-parallel decode: greedy and beam on a (data, model) mesh must
reproduce single-device results — the sharded-teacher decode path of
BASELINE config 4 (large-v2 beam-search decode with the model axis
resurrected, SURVEY.md §2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from taiwan_whisper_tpu.decode.beam import beam_decode
from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.parallel.mesh import make_mesh, use_mesh
from taiwan_whisper_tpu.parallel.specs import shard_params
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

FP32 = DtypePolicy.fp32()


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size, d_model=64, ffn_dim=128,
        encoder_layers=2, decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, max_source_positions=60,
        max_target_positions=48,
    )
    params = init_params(cfg, seed=0)
    mel = jnp.asarray(
        np.random.RandomState(5).randn(4, 120, 80).astype(np.float32) * 0.5
    )
    tok = WhisperTokenizer(MULTILINGUAL)
    prefix = jnp.asarray([tok.sot_sequence("zh")] * 4, jnp.int32)
    rules = DecodeRules.from_special(MULTILINGUAL)
    return cfg, params, mel, prefix, rules


def test_tp_greedy_matches_single(setup):
    cfg, params, mel, prefix, rules = setup

    def decode(params, mel, prefix):
        enc = M.encode(params, mel, cfg, FP32)
        return greedy_decode(params, enc, prefix, cfg, rules, FP32, max_len=32)

    ref = jax.jit(decode)(params, mel, prefix)
    ref_toks = np.asarray(ref.tokens)

    mesh = make_mesh(data=2, model=4)
    with use_mesh(mesh):
        params_s = shard_params(mesh, params)
        mel_s = jax.device_put(mel, NamedSharding(mesh, P("data")))
        prefix_s = jax.device_put(prefix, NamedSharding(mesh, P("data")))
        out = jax.jit(decode)(params_s, mel_s, prefix_s)
        np.testing.assert_array_equal(np.asarray(out.tokens), ref_toks)


def test_tp_beam_matches_single(setup):
    cfg, params, mel, prefix, rules = setup

    def decode(params, mel, prefix):
        enc = M.encode(params, mel, cfg, FP32)
        return beam_decode(params, enc, prefix, cfg, rules, FP32,
                           num_beams=3, max_len=24)

    ref = jax.jit(decode)(params, mel, prefix)
    ref_toks = np.asarray(ref.tokens)

    mesh = make_mesh(data=2, model=4)
    with use_mesh(mesh):
        params_s = shard_params(mesh, params)
        mel_s = jax.device_put(mel, NamedSharding(mesh, P("data")))
        prefix_s = jax.device_put(prefix, NamedSharding(mesh, P("data")))
        out = jax.jit(decode)(params_s, mel_s, prefix_s)
        np.testing.assert_array_equal(np.asarray(out.tokens), ref_toks)
