"""Hallucination audit sampler + paper-figure variants
(reference: utils/collect_hallucinations.py:11-83, utils/drawings/)."""

import csv
import os

from taiwan_whisper_tpu.audio.manifest import Manifest, write_manifest
from taiwan_whisper_tpu.pipeline.audit import (
    collect_hallucinations,
    teacher_text_for_audit,
)


def _mk_corpus(tmp_path, n=8):
    root = tmp_path / "root"
    root.mkdir()
    paths = []
    for i in range(n):
        rel = f"lec/{i}.flac"
        (root / "lec").mkdir(exist_ok=True)
        (root / rel).write_bytes(b"FLACDATA" + bytes([i]))
        # 2-line schema: transcript \n prev
        (root / f"lec/{i}.txt").write_text(
            f"<|0.00|>hello {i}<|2.50|><|continued|><|endoftext|>\n"
            f"<|startofprev|>prev {i}\n",
            encoding="utf-8",
        )
        paths.append(rel)
    m = Manifest(root=str(root), paths=paths)
    write_manifest(str(tmp_path / "orig.tsv"), m)
    # keep even indices -> odd ones were "dropped"
    kept = Manifest(root=str(root), paths=paths[::2])
    write_manifest(str(tmp_path / "clean.tsv"), kept)
    with open(tmp_path / "idx_hyp.0.txt", "w", encoding="utf-8") as f:
        for i in range(n):
            f.write(f"{i}\tvalidator says {i}\n")
    with open(tmp_path / "hallucination_result.csv", "w", newline="",
              encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["index", "path", "hallucinated", "mer", "reason"])
        for i in range(n):
            w.writerow([i, paths[i], int(i % 2), f"0.{i}000", "mer" if i % 2 else ""])
    return tmp_path


def test_teacher_text_strips_markers():
    t = "<|0.00|>你好 world<|1.50|><|continued|><|endoftext|>"
    assert teacher_text_for_audit(t) == "你好 world"
    # 5-line schema appends the end transcript
    assert teacher_text_for_audit(t, "<|1.50|>tail<|2.00|>") == "你好 world tail"


def test_collect_hallucinations_samples_dropped_only(tmp_path):
    base = _mk_corpus(tmp_path)
    out = collect_hallucinations(
        str(base / "orig.tsv"), str(base / "clean.tsv"),
        [str(base / "idx_hyp.0.txt")], str(base / "audit"),
        num_samples=3, seed=0,
        filter_csv=str(base / "hallucination_result.csv"),
    )
    with open(out, encoding="utf-8") as f:
        rows = list(csv.reader(f, delimiter="\t"))
    header, body = rows[0], rows[1:]
    assert header[:4] == ["index_in_origin", "audio_fpath", "trans_text",
                          "small_model_trans_text"]
    assert header[4:] == ["mer", "reason"]
    assert len(body) == 3
    idxs = [int(r[0]) for r in body]
    assert idxs == sorted(idxs)
    for r in body:
        i = int(r[0])
        assert i % 2 == 1  # only dropped (odd) chunks sampled
        assert r[2] == f"hello {i}"  # markers stripped
        assert r[3] == f"validator says {i}"
        assert r[5] == "mer"
        # audio copied under audit/audio_samples/<idx>_<fname>
        copied = os.path.join(str(base / "audit"), "audio_samples",
                              f"{i}_{i}.flac")
        assert os.path.exists(copied)
        with open(copied, "rb") as fa:
            assert fa.read() == b"FLACDATA" + bytes([i])


def test_collect_hallucinations_deterministic(tmp_path):
    base = _mk_corpus(tmp_path, n=10)
    kw = dict(num_samples=2, seed=7, copy_audio=False)
    out1 = collect_hallucinations(
        str(base / "orig.tsv"), str(base / "clean.tsv"),
        [str(base / "idx_hyp.0.txt")], str(base / "a1"), **kw)
    out2 = collect_hallucinations(
        str(base / "orig.tsv"), str(base / "clean.tsv"),
        [str(base / "idx_hyp.0.txt")], str(base / "a2"), **kw)
    assert open(out1).read() == open(out2).read()
    assert not os.path.exists(os.path.join(str(base / "a1"), "audio_samples"))


def test_cli_collect_hallucinations(tmp_path):
    from taiwan_whisper_tpu.cli import build_parser

    base = _mk_corpus(tmp_path)
    args = build_parser().parse_args([
        "collect-hallucinations",
        "--original_tsv", str(base / "orig.tsv"),
        "--cleaned_tsv", str(base / "clean.tsv"),
        "--hyp_tsv", str(base / "idx_hyp.0.txt"),
        "--output_dir", str(base / "cli_audit"),
        "--num_samples", "2", "--no_audio",
    ])
    args.fn(args)
    assert os.path.exists(base / "cli_audit" / "hallucinations_ex2_seed0.csv")


def test_figure_variants(tmp_path):
    import pytest

    pytest.importorskip("matplotlib")
    from taiwan_whisper_tpu.utils.figures import (
        filter_threshold_curves,
        params_vs_mer_panels,
    )

    p1 = filter_threshold_curves(
        {"MER": [{"threshold": t, "remaining_pct": 100 * t}
                 for t in (1.0, 0.8, 0.6, 0.4, 0.2)],
         "ngram+PER": [{"threshold": t, "remaining_pct": 90 * t}
                       for t in (1.0, 0.6, 0.2)]},
        str(tmp_path / "fig3.png"))
    p2 = params_vs_mer_panels(
        [{"title": "In-Domain", "points": [
            {"name": "Whisper Small", "params_m": 244, "mer": 32.1},
            {"name": "Ours (K2D)", "params_m": 756, "mer": 11.4}]},
         {"title": "Out-of-Domain", "points": [
            {"name": "Whisper Large-v2", "params_m": 1550, "mer": 25.7},
            {"name": "Ours (K2D)", "params_m": 756, "mer": 17.9}]}],
        str(tmp_path / "fig1.png"))
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0
