"""Evaluation harness: sequential, chunked and speculative modes."""

import numpy as np
import pytest

from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
from taiwan_whisper_tpu.models.params import init_params, init_student_from_teacher
from taiwan_whisper_tpu.pipeline.evaluate import EvalConfig, evaluate_manifest
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

FP32 = DtypePolicy.fp32()


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    from taiwan_whisper_tpu.audio.io import write_wav
    from taiwan_whisper_tpu.audio.manifest import Manifest, write_manifest

    d = tmp_path_factory.mktemp("eval")
    cfg = WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size, d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, max_source_positions=60,
        max_target_positions=48,
    )
    params = init_params(cfg, seed=0)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(2):
        write_wav(str(d / f"a{i}.wav"),
                  (rng.randn(int(2.5 * 16000)) * 0.1).astype(np.float32))
        (d / f"a{i}.txt").write_text("你好 hello\n", encoding="utf-8")
        paths.append(f"a{i}.wav")
    manifest = str(d / "test.tsv")
    write_manifest(manifest, Manifest(root=str(d), paths=paths))
    tok = WhisperTokenizer(MULTILINGUAL)
    return cfg, params, tok, manifest


@pytest.mark.parametrize("mode", ["sequential", "chunked"])
def test_longform_eval_modes(eval_setup, mode):
    cfg, params, tok, manifest = eval_setup
    res = evaluate_manifest(
        params, cfg, tok, manifest,
        EvalConfig(mode=mode, batch_size=2, max_decode_len=24),
    )
    assert res.n_samples == 2
    assert 0.0 <= res.mer
    assert res.rtf > 0


def test_beam_eval_mode(eval_setup):
    cfg, params, tok, manifest = eval_setup
    res = evaluate_manifest(
        params, cfg, tok, manifest,
        EvalConfig(mode="short", batch_size=2, num_beams=2, max_decode_len=20),
    )
    assert res.n_samples == 2


def test_speculative_eval_mode(eval_setup):
    cfg, params, tok, manifest = eval_setup
    student = init_student_from_teacher(params, cfg, 1)
    res = evaluate_manifest(
        params, cfg, tok, manifest,
        EvalConfig(mode="speculative", max_decode_len=24, num_draft_tokens=3),
        assistant=(student, cfg.with_decoder_layers(1)),
    )
    assert res.n_samples == 2
    assert len(res.predictions) == 2
