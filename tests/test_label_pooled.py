"""Pooled chunk-queue labelling scheduler (VERDICT r3 #1).

The shipping `cli label` path pools 30 s chunks across VAD regions AND
files into fixed knee-sized device batches; these tests pin (a) byte-exact
CSV parity with the per-file chunked_decode path, (b) batching accounting
(full device batches, not one per region), (c) resume, (d) the speculative
assistant path, and (e) the live validation-CER meter
(reference training/run_pseudo_labelling.py:959-979).
"""

import csv
import os

import numpy as np
import pytest

from taiwan_whisper_tpu.audio.io import write_wav
from taiwan_whisper_tpu.audio.manifest import Manifest, write_manifest
from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
from taiwan_whisper_tpu.models.params import init_params, init_student_from_teacher
from taiwan_whisper_tpu.pipeline.label import LabelConfig, label_files
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

SR = 16000


def tiny_cfg(dec_layers=2):
    return WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size,
        d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=dec_layers,
        encoder_attention_heads=4, decoder_attention_heads=4,
        max_source_positions=60, max_target_positions=48,
    )


def _burst(rng, seconds):
    """Loud modulated noise the energy VAD accepts as speech."""
    n = int(seconds * SR)
    t = np.arange(n) / SR
    return (rng.randn(n) * 0.3 * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t))
            ).astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("label_corpus")
    rng = np.random.RandomState(0)
    sil = lambda s: np.zeros(int(s * SR), np.float32)  # noqa: E731
    # file A: two speech regions separated by real silence -> pooled chunks
    # from both regions land in shared batches
    a = np.concatenate([_burst(rng, 2.0), sil(1.2), _burst(rng, 2.5)])
    # file B: one short region (shorter than a 1.2 s model chunk)
    b = np.concatenate([sil(0.4), _burst(rng, 0.9)])
    # file C: all silence -> empty CSV without touching the device
    c = sil(2.0)
    for name, audio in (("a", a), ("b", b), ("c", c)):
        write_wav(str(d / f"{name}.wav"), audio)
    return d


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return init_params(cfg, seed=0), cfg


def _read_csvs(out_dir):
    out = {}
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".csv"):
            with open(os.path.join(out_dir, name), "rb") as f:
                out[name] = f.read()
    return out


def test_pooled_matches_per_file_path(tmp_path, corpus, model):
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    paths = [str(corpus / f"{n}.wav") for n in ("a", "b", "c")]
    base = dict(vad_mode="energy", batch_size=4, max_decode_tokens=16)

    pooled_dir, plain_dir = str(tmp_path / "pooled"), str(tmp_path / "plain")
    stats_pooled = label_files(
        params, cfg, tok, paths, pooled_dir,
        LabelConfig(pooled=True, **base), log_every=0,
    )
    stats_plain = label_files(
        params, cfg, tok, paths, plain_dir,
        LabelConfig(pooled=False, **base), log_every=0,
    )
    assert stats_pooled["files"] == 3
    assert stats_plain["files"] == 3
    pooled_csvs = _read_csvs(pooled_dir)
    plain_csvs = _read_csvs(plain_dir)
    assert set(pooled_csvs) == {"a.csv", "b.csv", "c.csv"}
    # byte-exact CSVs: the pooled scheduler changes batching, not decoding
    assert pooled_csvs == plain_csvs
    # and it actually decoded something for the speech files
    with open(os.path.join(pooled_dir, "a.csv"), encoding="utf-8") as f:
        assert len(list(csv.DictReader(f))) > 0


def test_pooled_batches_cross_regions_and_files(tmp_path, corpus, model):
    """One 1.2 s-context model: files a+b hold ~8 chunks across 3 VAD
    regions; at batch 4 the pooled path must run ceil(chunks/4) device
    batches — NOT one batch per region like the old driver."""
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    paths = [str(corpus / f"{n}.wav") for n in ("a", "b", "c")]
    stats = label_files(
        params, cfg, tok, paths, str(tmp_path / "out"),
        LabelConfig(vad_mode="energy", batch_size=4, max_decode_tokens=16),
        log_every=0,
    )
    assert stats["chunks"] >= 4
    assert stats["batches"] == -(-stats["chunks"] // 4)  # ceil division
    # padding waste only in the final flush batch
    assert stats["pad_slots"] < 4


def test_int16_wire_is_lossless_for_pcm16(tmp_path, corpus, model):
    """The int16 wire format must reproduce the float32 path bit-for-bit on
    PCM16 sources (load divides by 32768; the wire multiplies back)."""
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    paths = [str(corpus / f"{n}.wav") for n in ("a", "b")]
    base = dict(vad_mode="energy", batch_size=4, max_decode_tokens=16)
    d16, d32 = str(tmp_path / "w16"), str(tmp_path / "w32")
    label_files(params, cfg, tok, paths, d16,
                LabelConfig(wire_dtype="int16", **base), log_every=0)
    label_files(params, cfg, tok, paths, d32,
                LabelConfig(wire_dtype="float32", **base), log_every=0)
    assert _read_csvs(d16) == _read_csvs(d32)


def test_pooled_resume_skips_existing(tmp_path, corpus, model):
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    paths = [str(corpus / f"{n}.wav") for n in ("a", "b")]
    out = str(tmp_path / "out")
    lc = LabelConfig(vad_mode="energy", batch_size=4, max_decode_tokens=16)
    label_files(params, cfg, tok, [paths[0]], out, lc, log_every=0)
    stats = label_files(params, cfg, tok, paths, out, lc, log_every=0)
    assert stats["skipped"] == 1 and stats["files"] == 1


def test_pooled_tolerates_unreadable_file(tmp_path, corpus, model):
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not audio")
    paths = [str(corpus / "b.wav"), bad]
    stats = label_files(
        params, cfg, tok, paths, str(tmp_path / "out"),
        LabelConfig(vad_mode="energy", batch_size=4, max_decode_tokens=16),
        log_every=0,
    )
    assert stats["files"] == 1 and stats["failed"] == 1


def test_speculative_labelling_matches_teacher_greedy(tmp_path, corpus, model):
    """`label --assistant`: draft/verify output must equal plain teacher
    greedy labelling (speculative decoding is exactness-preserving)."""
    params, cfg = model
    student = init_student_from_teacher(params, cfg, 1)
    scfg = cfg.with_decoder_layers(1)
    tok = WhisperTokenizer(MULTILINGUAL)
    paths = [str(corpus / "b.wav")]
    base = dict(vad_mode="off", batch_size=4, max_decode_tokens=16)

    spec_dir, plain_dir = str(tmp_path / "spec"), str(tmp_path / "plain")
    label_files(
        params, cfg, tok, paths, spec_dir,
        LabelConfig(speculative=True, num_draft_tokens=3, **base),
        assistant=(student, scfg), log_every=0,
    )
    label_files(
        params, cfg, tok, paths, plain_dir,
        LabelConfig(**base), log_every=0,
    )
    assert _read_csvs(spec_dir) == _read_csvs(plain_dir)


def test_validation_manifest_live_cer(tmp_path, corpus, model):
    """cli label --validation_manifest computes MER/EN-WER/ZH-CER of the
    pseudo-labels against ground-truth transcripts."""
    from taiwan_whisper_tpu.models.io import save_hf_checkpoint
    from taiwan_whisper_tpu.pipeline.label import run_labelling

    params, cfg = model
    model_dir = str(tmp_path / "model")
    save_hf_checkpoint(model_dir, params, cfg)

    # ground-truth split: audio + sibling .txt transcripts
    val_dir = tmp_path / "val"
    val_dir.mkdir()
    from taiwan_whisper_tpu.audio.io import write_flac

    rng = np.random.RandomState(1)
    for i in range(2):
        write_flac(str(val_dir / f"v{i}.flac"), _burst(rng, 1.0))
        (val_dir / f"v{i}.txt").write_text("hello world\n", encoding="utf-8")
    val_manifest = str(tmp_path / "valid.tsv")
    write_manifest(val_manifest, Manifest(root=str(val_dir),
                                          paths=["v0.flac", "v1.flac"]))

    train_manifest = str(tmp_path / "train.tsv")
    write_manifest(train_manifest, Manifest(root=str(corpus),
                                            paths=["b.wav"]))

    stats = run_labelling(
        train_manifest, model_dir, str(tmp_path / "out"),
        LabelConfig(vad_mode="energy", batch_size=4, max_decode_tokens=16),
        validation_manifest=val_manifest,
    )
    v = stats["validation"]
    assert v["n_files"] == 2
    assert 0.0 <= v["mer"]  # random weights -> garbage, but a real number
    assert "en_wer" in v and "zh_cer" in v


@pytest.mark.parametrize("wire_mode", ["resident", "chunks"])
def test_pooled_batched_device_vad(tmp_path, model, wire_mode):
    """vad_mode=spectral-device routes VAD through the batched device
    scorer inside BOTH pooled transports (resident streaming and staged
    chunk batches); CSVs must match the per-file path run with the same
    scorer."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from profile_label_driver import synth_lecture

    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    d = tmp_path / "speech_corpus"
    d.mkdir()
    rng = np.random.RandomState(5)
    paths = []
    for i in range(3):
        p = str(d / f"s{i}.wav")
        write_wav(p, synth_lecture(rng, 20.0))
        paths.append(p)
    base = dict(vad_mode="spectral-device", batch_size=4, max_decode_tokens=16)
    pooled_dir, plain_dir = str(tmp_path / "pooled"), str(tmp_path / "plain")
    sp = label_files(params, cfg, tok, paths, pooled_dir,
                     LabelConfig(pooled=True, wire_mode=wire_mode, **base),
                     log_every=0)
    label_files(params, cfg, tok, paths, plain_dir,
                LabelConfig(pooled=False, **base), log_every=0)
    assert sp["files"] == 3 and sp["chunks"] > 0
    assert _read_csvs(pooled_dir) == _read_csvs(plain_dir)
