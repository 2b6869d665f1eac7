"""Speculative decoding must be greedy-exact: token stream identical to
teacher-only greedy decode with the same rule stack."""

import numpy as np
import pytest

import jax.numpy as jnp

from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.decode.speculative import speculative_decode
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
from taiwan_whisper_tpu.models.params import init_params, init_student_from_teacher
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

FP32 = DtypePolicy.fp32()


def _cfg(dec_layers):
    return WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size, d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=dec_layers,
        encoder_attention_heads=4, decoder_attention_heads=4,
        max_source_positions=60, max_target_positions=96,
    )


@pytest.mark.parametrize("timestamps", [True, False])
@pytest.mark.parametrize("student_kind", ["distilled", "random"])
def test_speculative_matches_teacher_greedy(timestamps, student_kind):
    teacher_cfg = _cfg(2)
    teacher = init_params(teacher_cfg, seed=0)
    student_cfg = teacher_cfg.with_decoder_layers(1)
    if student_kind == "distilled":
        student = init_student_from_teacher(teacher, teacher_cfg, 1)
    else:
        student = init_params(student_cfg, seed=7)

    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=timestamps)
    prefix = jnp.asarray([tok.sot_sequence("zh", timestamps=timestamps)], jnp.int32)

    rng = np.random.RandomState(3)
    mel = jnp.asarray(rng.randn(1, 120, 80).astype(np.float32) * 0.5)
    t_enc = M.encode(teacher, mel, teacher_cfg, FP32)
    s_enc = M.encode(student, mel, student_cfg, FP32)

    max_len = prefix.shape[1] + 48
    ref = greedy_decode(
        teacher, t_enc, prefix, teacher_cfg, rules, FP32, max_len=max_len
    )
    spec = speculative_decode(
        teacher, teacher_cfg, student, student_cfg, t_enc, s_enc, prefix,
        rules, FP32, num_draft_tokens=4, max_len=max_len,
    )
    ref_toks = np.asarray(ref.tokens)[0].tolist()
    spec_toks = np.asarray(spec.tokens)[0].tolist()
    assert spec_toks == ref_toks, (
        f"kind={student_kind} ts={timestamps}\n"
        f"greedy={ref_toks}\nspec  ={spec_toks}\n"
        f"accept_rate={float(spec.draft_accept_rate):.2f}"
    )
    # a distilled (identical-encoder) student should accept often
    if student_kind == "distilled":
        assert float(spec.draft_accept_rate) >= 0.0  # informational
    assert int(spec.rounds) >= 1
