"""End-to-end 4-stage pipeline on tiny random models and synthetic audio:
label -> segment -> prefilter -> distill -> evaluate, all through the public
drivers (the integration seam the reference never tests, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from taiwan_whisper_tpu.models.config import WhisperConfig
from taiwan_whisper_tpu.models.io import load_hf_checkpoint, save_hf_checkpoint
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer


def tiny_cfg(dec_layers=2, msp=60):
    return WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size,
        d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=dec_layers,
        encoder_attention_heads=4, decoder_attention_heads=4,
        max_source_positions=msp, max_target_positions=64,
    )


@pytest.fixture(scope="module")
def byte_tokenizer_dir(tmp_path_factory):
    """Synthetic byte-level vocab: every base byte symbol is its own token.
    Exercises the real BPE encode/decode path without the published files."""
    from taiwan_whisper_tpu.text.tokenizer import bytes_to_unicode

    d = tmp_path_factory.mktemp("tok")
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text("#version: 0.2\n", encoding="utf-8")
    return str(d)


@pytest.fixture(scope="module")
def model_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    teacher_cfg = tiny_cfg(dec_layers=2)
    teacher = init_params(teacher_cfg, seed=0)
    save_hf_checkpoint(str(d / "teacher"), teacher, teacher_cfg)
    validator_cfg = tiny_cfg(dec_layers=1)
    validator = init_params(validator_cfg, seed=1)
    save_hf_checkpoint(str(d / "validator"), validator, validator_cfg)
    return d


def test_hf_checkpoint_roundtrip(model_dirs):
    params, cfg = load_hf_checkpoint(str(model_dirs / "teacher"))
    assert cfg.d_model == 64 and cfg.decoder_layers == 2
    assert params["decoder"]["embed_tokens"].shape == (MULTILINGUAL.vocab_size, 64)


def test_tokenizer_bpe_roundtrip(byte_tokenizer_dir):
    from taiwan_whisper_tpu.text.tokenizer import encode_transcript

    tok = WhisperTokenizer.from_pretrained_dir(byte_tokenizer_dir)
    ids = tok.encode_text("hello world")
    assert tok.decode(ids, skip_special_tokens=True) == "hello world"
    # transcript with markers gets prefix+eot and timestamp ids
    ids = encode_transcript(tok, "<|0.00|>hi<|1.00|>", language="zh")
    assert ids[0] == MULTILINGUAL.sot
    assert ids[3] == MULTILINGUAL.timestamp_begin
    assert ids[-1] == MULTILINGUAL.eot
    assert MULTILINGUAL.timestamp_begin + 50 in ids  # <|1.00|>


def test_full_pipeline(tmp_path, model_dirs, byte_tokenizer_dir):
    from taiwan_whisper_tpu.audio.io import write_wav
    from taiwan_whisper_tpu.audio.manifest import (
        Manifest, read_manifest, write_manifest,
    )
    from taiwan_whisper_tpu.pipeline.label import LabelConfig, run_labelling
    from taiwan_whisper_tpu.pipeline.segment import (
        Utterance, segment_audio_file,
    )
    from taiwan_whisper_tpu.pipeline.prefilter import PrefilterConfig, run_prefilter
    from taiwan_whisper_tpu.pipeline.dataset import TrainPrepConfig
    from taiwan_whisper_tpu.pipeline.distill_driver import (
        DistillRunConfig, run_distillation,
    )
    from taiwan_whisper_tpu.pipeline.evaluate import EvalConfig, evaluate_manifest
    from taiwan_whisper_tpu.models.io import load_model

    rng = np.random.RandomState(0)

    # ---- stage 0: raw long-form audio + manifest --------------------------
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    for name in ("lec1", "lec2"):
        audio = (rng.randn(int(4.0 * 16000)) * 0.1).astype(np.float32)
        write_wav(str(raw_dir / f"{name}.wav"), audio)
    raw_manifest = tmp_path / "raw.tsv"
    write_manifest(
        str(raw_manifest),
        Manifest(root=str(raw_dir), paths=["lec1.wav", "lec2.wav"]),
    )

    # ---- stage 1: pseudo-labelling (tiny teacher, random -> garbage but
    # structurally valid CSVs). Chunk = model context (1.2 s).
    label_dir = tmp_path / "labels"
    stats = run_labelling(
        str(raw_manifest), str(model_dirs / "teacher"), str(label_dir),
        # vad off: the synthetic noise audio is (correctly) not speech to
        # the default spectral VAD; this test exercises the decode plumbing
        LabelConfig(strategy="sequential", batch_size=2, vad_mode="off"),
        tokenizer_dir=byte_tokenizer_dir,
    )
    assert (label_dir / "lec1.csv").exists() and (label_dir / "lec2.csv").exists()

    # ---- stage 2a: segmentation (deterministic utterances) ----------------
    seg_dir = tmp_path / "segments"
    rel = []
    for name in ("lec1", "lec2"):
        audio = (rng.randn(int(70 * 16000)) * 0.1).astype(np.float32)
        utts = [
            Utterance(0.0, 10.0, "hello 你好"),
            Utterance(10.0, 29.0, "more text"),
            Utterance(29.0, 45.0, "spans the boundary"),
            Utterance(45.0, 60.0, "last bit"),
        ]
        rel.extend(segment_audio_file(audio, utts, str(seg_dir), name,
                                      audio_format="flac"))
    assert rel
    seg_manifest = tmp_path / "segments.tsv"
    # repeat paths so tiny batches divide the 8-device mesh
    write_manifest(
        str(seg_manifest),
        Manifest(root=str(seg_dir), paths=rel * 8),
    )

    # ---- stage 2b: prefilter (validator + MER, threshold high => keep all)
    filt_dir = tmp_path / "prefilter"
    cleaned = run_prefilter(
        str(seg_manifest), str(model_dirs / "validator"), str(filt_dir),
        PrefilterConfig(batch_size=4, threshold=100.0),
        tokenizer_dir=byte_tokenizer_dir,
    )
    assert os.path.exists(filt_dir / "hallucination_result.csv")
    assert len(cleaned) == len(rel) * 8  # nothing dropped at threshold 100

    # strict threshold: random validator vs segment text -> everything drops
    strict, decisions = __import__(
        "taiwan_whisper_tpu.pipeline.prefilter", fromlist=["filter_manifest"]
    ).filter_manifest(
        read_manifest(str(seg_manifest)),
        {i: "完全不同的文字 totally different" for i in range(len(rel) * 8)},
        PrefilterConfig(threshold=0.05),
    )
    assert len(strict) < len(rel) * 8

    # ---- stage 3: distillation (4 steps, 8-device data parallel) ----------
    out_dir = tmp_path / "distill"
    metrics = run_distillation(
        str(seg_manifest), str(model_dirs / "teacher"), str(out_dir),
        student_decoder_layers=1,
        run_cfg=DistillRunConfig(
            max_steps=4, batch_size=8, save_steps=4, logging_steps=2,
            save_total_limit=2, eval_steps=4, gen_eval_batches=1,
            gen_eval_max_tokens=8,
        ),
        prep_cfg=TrainPrepConfig(max_label_length=48),
        tokenizer_dir=byte_tokenizer_dir,
        eval_manifest_path=str(seg_manifest),
    )
    assert np.isfinite(metrics["loss"])
    assert (out_dir / "checkpoints" / "checkpoint-4").exists()
    assert (out_dir / "hf_export" / "model.safetensors").exists()
    assert (out_dir / "metrics.jsonl").exists()
    # gen-eval logs aggregate MER plus per-sample prediction tables incl.
    # the incorrect-only view (reference run_distillation.py:534-570)
    records = [json.loads(l) for l in
               (out_dir / "metrics.jsonl").read_text().splitlines()]
    tables = {r["table"]: r for r in records if "table" in r}
    assert "eval/predictions" in tables
    assert "eval/incorrect_predictions" in tables
    ptab = tables["eval/predictions"]
    assert ptab["columns"] == ["pred", "label", "norm_pred", "norm_label"]
    assert len(ptab["rows"]) > 0 and len(ptab["rows"][0]) == 4
    assert any("eval/gen_mer" in r for r in records)

    # the exported student loads and has 1 decoder layer
    student, scfg = load_model(str(out_dir / "hf_export"))
    assert scfg.decoder_layers == 1

    # ---- fine-tuning variant (CE-only, no teacher) + held-out eval --------
    from taiwan_whisper_tpu.pipeline.distill_driver import run_finetuning

    ft_dir = tmp_path / "finetune"
    ft_metrics = run_finetuning(
        str(seg_manifest), str(out_dir / "hf_export"), str(ft_dir),
        run_cfg=DistillRunConfig(max_steps=2, batch_size=8, save_steps=2,
                                 eval_steps=2, logging_steps=1,
                                 mix_lang_embeddings=False),
        prep_cfg=TrainPrepConfig(max_label_length=48),
        tokenizer_dir=byte_tokenizer_dir,
        eval_manifest_path=str(seg_manifest),
    )
    assert np.isfinite(ft_metrics["loss"])
    assert "kl" not in ft_metrics  # teacher path disabled
    # held-out eval ran and kept a best checkpoint
    import glob as _glob
    kept = [p for p in _glob.glob(str(ft_dir / "checkpoints" / "checkpoint-*"))
            if os.path.exists(os.path.join(p, ".keep"))]
    assert kept, "eval did not mark a best checkpoint"

    # ---- stage 4: evaluation on the segment manifest ----------------------
    tok = WhisperTokenizer.from_pretrained_dir(byte_tokenizer_dir)
    res = evaluate_manifest(
        student, scfg, tok, str(seg_manifest),
        EvalConfig(batch_size=4, max_decode_len=24),
    )
    assert 0.0 <= res.mer
    assert res.audio_seconds_per_second > 0
    assert res.n_samples == len(rel) * 8


def test_multi_rank_hyp_shard_merge(tmp_path):
    """Rank-sharded validator outputs merge like the reference's
    per-rank idx_hyp.{rank}.txt + sort pipeline (dataset/cool_dataset.py:
    216-225, dataset/test_cool_dataset.sh:25-26), tolerating junk lines."""
    from taiwan_whisper_tpu.pipeline.prefilter import read_hyps_tsv

    (tmp_path / "idx_hyp.0.txt").write_text(
        "0\thyp zero\n2\thyp two\nnot-an-int\tjunk\n"
    )
    (tmp_path / "idx_hyp.1.txt").write_text(
        "1\thyp one\n3\thyp three\nbroken-line-without-tab\n"
    )
    merged = read_hyps_tsv(
        [str(tmp_path / f"idx_hyp.{r}.txt") for r in (0, 1)]
    )
    assert merged == {0: "hyp zero", 1: "hyp one", 2: "hyp two", 3: "hyp three"}


def test_manifest_host_sharding():
    """Each simulated process gets a disjoint, exhaustive slice."""
    from taiwan_whisper_tpu.audio.manifest import Manifest
    from taiwan_whisper_tpu.parallel.mesh import host_local_slice

    paths = [f"u{i}.flac" for i in range(10)]
    got = []
    for rank in range(3):
        sl = host_local_slice(len(paths), process_index=rank, process_count=3)
        got.extend(paths[sl])
    assert sorted(got) == sorted(paths)
    assert len(set(got)) == len(paths)
