"""Device-resident pooled labelling (pipeline/label_resident.py).

One int16 upload per file; VAD scores and 30 s chunk rows both read the
resident stream. These tests pin CSV parity with the per-file path,
multi-group streaming (files larger than one group buffer), vad-off mode,
and resume behavior — all on the CPU backend (the jax scorer and gather
paths are backend-agnostic).
"""

import os
import sys

import numpy as np
import pytest

from taiwan_whisper_tpu.audio.io import write_wav
from taiwan_whisper_tpu.models.config import WhisperConfig
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.pipeline.label import LabelConfig, label_files
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SR = 16000


def tiny_cfg():
    return WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size,
        d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, max_source_positions=60,
        max_target_positions=48,
    )


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return init_params(cfg, seed=0), cfg


@pytest.fixture(scope="module")
def speech_corpus(tmp_path_factory):
    from profile_label_driver import synth_lecture

    d = tmp_path_factory.mktemp("resident_corpus")
    rng = np.random.RandomState(11)
    paths = []
    for i, secs in enumerate((20.0, 35.0, 15.0)):
        p = str(d / f"r{i}.wav")
        write_wav(p, synth_lecture(rng, secs))
        paths.append(p)
    return paths


def _read_csvs(out_dir):
    out = {}
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".csv"):
            with open(os.path.join(out_dir, name), "rb") as f:
                out[name] = f.read()
    return out


def test_resident_matches_per_file_path(tmp_path, model, speech_corpus):
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    base = dict(vad_mode="spectral-device", batch_size=4,
                max_decode_tokens=16)
    res_dir, plain_dir = str(tmp_path / "res"), str(tmp_path / "plain")
    stats = label_files(params, cfg, tok, speech_corpus, res_dir,
                        LabelConfig(wire_mode="resident", **base),
                        log_every=0)
    label_files(params, cfg, tok, speech_corpus, plain_dir,
                LabelConfig(pooled=False, **base), log_every=0)
    assert stats["files"] == 3 and stats["chunks"] > 0
    assert stats["groups"] >= 1
    assert _read_csvs(res_dir) == _read_csvs(plain_dir)


def test_resident_is_the_auto_default(tmp_path, model, speech_corpus):
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    stats = label_files(
        params, cfg, tok, speech_corpus[:1], str(tmp_path / "out"),
        LabelConfig(vad_mode="spectral-device", batch_size=4,
                    max_decode_tokens=16),
        log_every=0,
    )
    assert "groups" in stats  # resident-path stats key


def test_resident_multi_group_stream(tmp_path, model):
    """A file longer than one group buffer spans groups; chunks crossing
    the boundary decode via the (g, g+1) buffer pair. Uses a shrunken
    group size so the test stays fast."""
    from profile_label_driver import synth_lecture
    from taiwan_whisper_tpu.pipeline import label_resident as LR

    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    old = (LR.CAP_SEGS, LR.L_STREAM, LR.L_BUF)
    LR.CAP_SEGS = 1  # one 120 s segment per group
    LR.L_STREAM = LR.CAP_SEGS * LR.SEG
    LR.L_BUF = LR.L_STREAM + LR._WIN
    try:
        rng = np.random.RandomState(13)
        p = str(tmp_path / "long.wav")
        write_wav(p, synth_lecture(rng, 150.0))  # 2 segments -> 2 groups
        base = dict(vad_mode="spectral-device", batch_size=4,
                    max_decode_tokens=16)
        res_dir, plain_dir = str(tmp_path / "res"), str(tmp_path / "plain")
        stats = label_files(params, cfg, tok, [p], res_dir,
                            LabelConfig(wire_mode="resident", **base),
                            log_every=0)
        assert stats["groups"] == 2
        label_files(params, cfg, tok, [p], plain_dir,
                    LabelConfig(pooled=False, **base), log_every=0)
        assert _read_csvs(res_dir) == _read_csvs(plain_dir)
    finally:
        LR.CAP_SEGS, LR.L_STREAM, LR.L_BUF = old


def test_resident_vad_off_and_resume(tmp_path, model, speech_corpus):
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    out = str(tmp_path / "out")
    lc = LabelConfig(wire_mode="resident", vad_mode="off",
                     vad_regions=False, batch_size=4, max_decode_tokens=16)
    s1 = label_files(params, cfg, tok, speech_corpus[:2], out, lc,
                     log_every=0)
    assert s1["files"] == 2 and s1["chunks"] > 0
    s2 = label_files(params, cfg, tok, speech_corpus, out, lc, log_every=0)
    assert s2["skipped"] == 2 and s2["files"] == 1


def test_resident_tolerates_unreadable(tmp_path, model, speech_corpus):
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"nope")
    stats = label_files(
        params, cfg, tok, [speech_corpus[0], bad], str(tmp_path / "out"),
        LabelConfig(wire_mode="resident", vad_mode="spectral-device",
                    batch_size=4, max_decode_tokens=16),
        log_every=0,
    )
    assert stats["files"] == 1 and stats["failed"] == 1


def test_resident_many_groups_freeing(tmp_path, model):
    """Regression: groups must stay resident until every file touching
    them is finished — freeing on task-queue emptiness alone crashed the
    160-file TPU run ('group N unavailable')."""
    from profile_label_driver import synth_lecture
    from taiwan_whisper_tpu.pipeline import label_resident as LR

    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    old = (LR.CAP_SEGS, LR.L_STREAM, LR.L_BUF)
    LR.CAP_SEGS = 1
    LR.L_STREAM = LR.CAP_SEGS * LR.SEG
    LR.L_BUF = LR.L_STREAM + LR._WIN
    try:
        rng = np.random.RandomState(21)
        paths = []
        d = tmp_path / "c"
        d.mkdir()
        for i in range(5):  # 5 files -> 5 groups at CAP=1
            p = str(d / f"g{i}.wav")
            write_wav(p, synth_lecture(rng, 15.0))
            paths.append(p)
        stats = label_files(
            params, cfg, tok, paths, str(tmp_path / "out"),
            LabelConfig(wire_mode="resident", vad_mode="spectral-device",
                        batch_size=2, max_decode_tokens=16),
            log_every=0,
        )
        assert stats["files"] == 5 and stats["groups"] == 5
    finally:
        LR.CAP_SEGS, LR.L_STREAM, LR.L_BUF = old


# ---------------------------------------------------------------------------
# Region packing (opt-in): short regions share decode windows
# ---------------------------------------------------------------------------

def test_map_packed_segments_math():
    from taiwan_whisper_tpu.decode.longform import TranscriptSegment
    from taiwan_whisper_tpu.pipeline.label_resident import map_packed_segments

    # two pieces: [0, 5) <- region at 10 s; [5.2, 9.2) <- region at 40 s
    pieces = [(0.0, 5.0, 10.0), (5.2, 9.2, 40.0)]
    segs = [
        TranscriptSegment(0.5, 2.0, [1]),    # piece 0 -> 10.5..12.0
        TranscriptSegment(4.0, 5.1, [2]),    # piece 0, end clamped ~15.5
        TranscriptSegment(5.1, 6.0, [3]),    # starts in separator -> snaps
        TranscriptSegment(6.0, 8.0, [4]),    # piece 1 -> 40.8..42.8
        TranscriptSegment(9.5, 10.0, [5]),   # trailing pad -> dropped
    ]
    out = map_packed_segments(list(segs), pieces)
    assert len(out) == 4
    assert abs(out[0].start - 10.5) < 1e-6 and abs(out[0].end - 12.0) < 1e-6
    assert abs(out[1].start - 14.0) < 1e-6 and out[1].end <= 15.5 + 1e-6
    assert abs(out[2].start - 40.0) < 1e-6  # snapped to piece-1 start
    assert abs(out[3].start - 40.8) < 1e-6 and abs(out[3].end - 42.8) < 1e-6


def test_resident_region_packing(tmp_path, model):
    """pack_regions=True shares decode windows between short VAD regions:
    fewer device batches, segments still inside their file timelines."""
    from profile_label_driver import synth_lecture

    # tiny dims but the REAL 30 s context, so ordinary 12-28 s VAD regions
    # are sub-window and the packer can share windows between them
    cfg = WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size,
        d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=1, encoder_attention_heads=4,
        decoder_attention_heads=4, max_source_positions=1500,
        max_target_positions=48,
    )
    params = init_params(cfg, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    d = tmp_path / "c"
    d.mkdir()
    rng = np.random.RandomState(31)
    paths = []
    for i in range(2):
        p = str(d / f"p{i}.wav")
        write_wav(p, synth_lecture(rng, 60.0))
        paths.append(p)
    base = dict(vad_mode="spectral-device", batch_size=4,
                max_decode_tokens=16, wire_mode="resident")
    packed_dir, plain_dir = str(tmp_path / "packed"), str(tmp_path / "plain")
    sp = label_files(params, cfg, tok, paths, packed_dir,
                     LabelConfig(pack_regions=True, **base), log_every=0)
    su = label_files(params, cfg, tok, paths, plain_dir,
                     LabelConfig(**base), log_every=0)
    assert sp["files"] == 2 and su["files"] == 2
    # packing shares windows: strictly fewer decode slots than unpacked
    assert 0 < sp["chunks"] < su["chunks"]
    # outputs are plausible: CSVs exist, segments within file bounds
    for i in range(2):
        with open(os.path.join(packed_dir, f"p{i}.csv"),
                  encoding="utf-8") as f:
            import csv as _csv

            rows = list(_csv.DictReader(f))
        assert rows
        for r in rows:
            # random-weight timestamps are garbage IN-WINDOW, but packed
            # mapping must keep them inside the file timeline
            assert -0.01 <= float(r["start"]) <= 61.0


def test_resident_group_boundary_rider_window(tmp_path):
    """Regression (advisor r4, label_resident.py decode_from_bufs): a rider
    task near the END of group g+1 — admitted by the drain rule because
    start+valid <= (g+2)*L_STREAM — needs chunk_len samples past its start,
    which overran the old virtual stream (2*L_STREAM+WIN). dynamic_slice
    CLAMPS out-of-bounds starts, silently shifting the gathered window up
    to ~30 s earlier; the valid-mask then kept the wrong (earlier) audio.
    The virtual stream is now zero-padded to 2*L_STREAM+chunk_len.

    Geometry (CAP_SEGS=1, 30 s context): speech at [113,130] s makes the
    batch leader in group 0; speech at [223,237] s makes a rider in group 1
    whose window [223,253] s overruns the old 240.025 s stream. CSV output
    must equal the per-file reference path."""
    from profile_label_driver import synth_lecture
    from taiwan_whisper_tpu.pipeline import label_resident as LR

    cfg = WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size,
        d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=1, encoder_attention_heads=4,
        decoder_attention_heads=4, max_source_positions=1500,
        max_target_positions=48,
    )
    params = init_params(cfg, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    rng = np.random.RandomState(7)
    audio = np.zeros(240 * SR, np.float32)
    for lo, hi in ((113, 130), (223, 237)):
        sp = synth_lecture(rng, float(hi - lo) + 1.0)[: (hi - lo) * SR]
        audio[lo * SR: hi * SR] = sp
    p = str(tmp_path / "boundary.wav")
    write_wav(p, audio)
    old = (LR.CAP_SEGS, LR.L_STREAM, LR.L_BUF)
    LR.CAP_SEGS = 1  # 120 s groups: the file spans groups 0 and 1
    LR.L_STREAM = LR.CAP_SEGS * LR.SEG
    LR.L_BUF = LR.L_STREAM + LR._WIN
    # spy on the audio rows reaching the mel front-end: tiny random
    # models can emit identical tokens for speech and silence, so CSV
    # equality alone cannot detect a silently shifted gather window
    import jax as _jax

    import taiwan_whisper_tpu.audio.mel as mel_mod

    captured = []
    orig_log_mel = mel_mod.log_mel

    def spy(a, n_mels):
        _jax.debug.callback(lambda x: captured.append(np.asarray(x)), a)
        return orig_log_mel(a, n_mels)

    mel_mod.log_mel = spy
    try:
        base = dict(vad_mode="spectral-device", batch_size=4,
                    max_decode_tokens=16)
        res_dir, plain_dir = str(tmp_path / "res"), str(tmp_path / "plain")
        stats = label_files(params, cfg, tok, [p], res_dir,
                            LabelConfig(wire_mode="resident", **base),
                            log_every=0)
        mel_mod.log_mel = orig_log_mel
        label_files(params, cfg, tok, [p], plain_dir,
                    LabelConfig(pooled=False, **base), log_every=0)
        assert stats["files"] == 1 and stats["groups"] == 2
        assert stats["chunks"] == 2 and stats["batches"] == 1
        assert _read_csvs(res_dir) == _read_csvs(plain_dir)
        # every decoded row is a VAD speech region: a clamped gather
        # would have fed the rider row silence from ~30 s earlier
        rows = np.concatenate(captured, axis=0)[: stats["chunks"]]
        for j, row in enumerate(rows):
            assert float(np.abs(row).max()) > 0.01, f"row {j} is silence"
    finally:
        mel_mod.log_mel = orig_log_mel
        LR.CAP_SEGS, LR.L_STREAM, LR.L_BUF = old


def test_resident_group_segs_config(tmp_path, model, speech_corpus):
    """cfg.group_segs shrinks the device group buffer (pipelines ingest
    with decode); output must equal the default-capacity path."""
    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    base = dict(vad_mode="spectral-device", batch_size=4,
                max_decode_tokens=16, wire_mode="resident")
    small_dir, dflt_dir = str(tmp_path / "small"), str(tmp_path / "dflt")
    stats = label_files(params, cfg, tok, speech_corpus, small_dir,
                        LabelConfig(group_segs=1, **base), log_every=0)
    label_files(params, cfg, tok, speech_corpus, dflt_dir,
                LabelConfig(**base), log_every=0)
    # 20+35+15 s corpus -> one 120 s segment per file -> 3 groups at
    # group_segs=1 (vs 1 group at the 32-min default)
    assert stats["groups"] == 3
    assert _read_csvs(small_dir) == _read_csvs(dflt_dir)


def test_decode_program_cached_across_calls(tmp_path, model, speech_corpus):
    """label_files invocations with the same static signature reuse ONE
    jitted decode program (tracing+lowering measured 18.4 s per call at
    large-v2 full-unroll shapes — PERF.md round 5)."""
    from taiwan_whisper_tpu.pipeline import label_resident as LR

    params, cfg = model
    tok = WhisperTokenizer(MULTILINGUAL)
    LR._decode_fn_cache.clear()
    lc = LabelConfig(wire_mode="resident", vad_mode="spectral-device",
                     batch_size=4, max_decode_tokens=16)
    label_files(params, cfg, tok, speech_corpus[:1], str(tmp_path / "a"),
                lc, log_every=0)
    assert len(LR._decode_fn_cache) == 1
    fn = next(iter(LR._decode_fn_cache.values()))
    label_files(params, cfg, tok, speech_corpus[1:], str(tmp_path / "b"),
                lc, log_every=0)
    assert len(LR._decode_fn_cache) == 1
    assert next(iter(LR._decode_fn_cache.values())) is fn
    # a different static signature gets its own program
    label_files(params, cfg, tok, speech_corpus[:1], str(tmp_path / "c"),
                LabelConfig(wire_mode="resident", vad_mode="spectral-device",
                            batch_size=4, max_decode_tokens=16,
                            quantize_kv=8),
                log_every=0)
    assert len(LR._decode_fn_cache) == 2
