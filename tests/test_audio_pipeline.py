"""Audio IO (WAV/native FLAC), manifests, segmenter, long-form decode."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from taiwan_whisper_tpu.audio.io import (
    load_audio_16k,
    read_wav,
    resample_linear,
    write_wav,
)
from taiwan_whisper_tpu.audio.manifest import (
    Manifest,
    SegmentText,
    read_manifest,
    read_segment_txt,
    split_valid,
    write_manifest,
    write_segment_txt,
)
from taiwan_whisper_tpu.pipeline.segment import (
    Utterance,
    segment_audio_file,
    segment_utterances,
)
from taiwan_whisper_tpu.utils.native import flac_decode, flac_encode


def _tone(seconds=1.0, sr=16000, f=440.0):
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)


# -- audio io ---------------------------------------------------------------

def test_wav_roundtrip(tmp_path):
    x = _tone(0.5)
    p = str(tmp_path / "t.wav")
    write_wav(p, x)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(x, y, atol=1 / 12000)


def test_wav_matches_scipy(tmp_path):
    scipy_io = pytest.importorskip("scipy.io.wavfile")
    x = _tone(0.25)
    p = str(tmp_path / "t.wav")
    write_wav(p, x)
    sr, y = scipy_io.read(p)
    assert sr == 16000
    np.testing.assert_allclose(x, y.astype(np.float32) / 32768.0, atol=1 / 16000)


def test_flac_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = (_tone(2.0) + 0.01 * rng.randn(32000)).astype(np.float32)
    p = str(tmp_path / "t.flac")
    flac_encode(p, x, 16000)
    y, sr = flac_decode(p)
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_allclose(np.clip(x, -1, 1), y, atol=1.01 / 32768)
    # should actually compress vs 16-bit PCM
    assert os.path.getsize(p) < len(x) * 2


def test_flac_stereo_and_load16k(tmp_path):
    x = np.stack([_tone(0.5, f=440), _tone(0.5, f=220)], axis=1)
    p = str(tmp_path / "s.flac")
    flac_encode(p, x, 16000)
    mono = load_audio_16k(p)
    assert mono.ndim == 1 and len(mono) == len(x)


def test_resample():
    x = _tone(1.0, sr=48000)
    y = resample_linear(x, 48000, 16000)
    assert abs(len(y) - 16000) <= 1
    assert np.abs(y).max() > 0.2


# -- manifest ---------------------------------------------------------------

def test_manifest_roundtrip(tmp_path):
    m = Manifest(root="/data/audio", paths=["a/x.flac", "b/y.flac"], frames=[100, 200])
    p = str(tmp_path / "m.tsv")
    write_manifest(p, m)
    m2 = read_manifest(p)
    assert m2.root == m.root and m2.paths == m.paths and m2.frames == m.frames
    assert m2.transcript_paths() == ["/data/audio/a/x.txt", "/data/audio/b/y.txt"]


def test_manifest_split():
    m = Manifest(root="/r", paths=[f"{i}.flac" for i in range(100)])
    train, valid = split_valid(m, 0.2, seed=1)
    assert len(train) + len(valid) == 100
    assert 5 < len(valid) < 40
    assert set(train.paths).isdisjoint(valid.paths)


def test_segment_txt_schemas(tmp_path):
    seg = SegmentText(
        transcript="<|0.00|>你好<|2.00|><|endoftext|>",
        prev_transcript="<|0.00|>前文<|1.00|><|endoftext|>",
        end_transcript="你好",
    )
    p2 = str(tmp_path / "two.txt")
    write_segment_txt(p2, seg, schema=2)
    r2 = read_segment_txt(p2)
    assert r2.transcript == seg.transcript and r2.prev_transcript == seg.prev_transcript
    p5 = str(tmp_path / "five.txt")
    write_segment_txt(p5, seg, schema=5)
    r5 = read_segment_txt(p5)
    assert r5.transcript == seg.transcript
    assert r5.end_transcript == "你好"
    assert r5.prev_transcript == seg.prev_transcript


# -- segmenter --------------------------------------------------------------

def test_segment_utterances_windows():
    # utterances: 0-10, 10-20, 20-28, 28-45 (spans boundary), 45-50
    utts = [
        Utterance(0.0, 10.0, "一"),
        Utterance(10.0, 20.0, "二"),
        Utterance(20.0, 28.0, "三"),
        Utterance(28.0, 45.0, "四"),
        Utterance(45.0, 50.0, "五"),
    ]
    segs = segment_utterances(utts)
    assert len(segs) >= 1
    s0 = segs[0]
    assert s0.start_frame == 0
    assert s0.end_frame == 28 * 16000  # cut at the start of the spanning utt
    assert s0.transcript.startswith("<|0.00|>一<|10.00|>")
    # >1 s of utterance 4 falls inside the window -> continued marker
    assert "<|continued|>" in s0.transcript
    assert s0.transcript.endswith("<|endoftext|>")
    assert s0.prev_transcript == ""
    if len(segs) > 1:
        assert segs[1].prev_transcript == s0.transcript


def test_segment_audio_file(tmp_path):
    audio = np.zeros(50 * 16000, np.float32)
    utts = [Utterance(0.0, 10.0, "一"), Utterance(10.0, 40.0, "二"),
            Utterance(40.0, 45.0, "三")]
    rels = segment_audio_file(audio, utts, str(tmp_path), "lecture", audio_format="wav")
    assert rels, "no segments written"
    for rel in rels:
        assert os.path.exists(tmp_path / rel)
        assert os.path.exists(str(tmp_path / rel).replace(".wav", ".txt"))


# -- long-form --------------------------------------------------------------

def test_tokens_to_segments():
    from taiwan_whisper_tpu.decode.longform import _tokens_to_segments
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL

    tb = MULTILINGUAL.timestamp_begin
    # <|0.00|> text(100) <|2.00|> <|2.00|> text(200) <|4.00|>(single trailing)
    # single trailing timestamp => "no speech after": whole window consumed
    # (HF _retrieve_segment semantics; see test_longform_parity.py)
    toks = [tb, 100, tb + 100, tb + 100, 200, tb + 200]
    segs, advance, single = _tokens_to_segments(toks, MULTILINGUAL, 0.0, 30.0)
    assert single
    assert len(segs) == 2
    assert segs[0].start == 0.0 and segs[0].end == pytest.approx(2.0)
    assert segs[0].token_ids == [100]
    assert segs[1].token_ids == [200]
    assert segs[1].end == pytest.approx(4.0)
    assert advance == pytest.approx(30.0)
    # complete pair then trailing text: seek to the closing timestamp of the
    # last complete segment; trailing text re-decoded next window
    toks = [tb, 100, tb + 100, tb + 100, 200, tb + 200, tb + 200, 300]
    segs, advance, single = _tokens_to_segments(toks, MULTILINGUAL, 0.0, 30.0)
    assert not single
    assert len(segs) == 2
    assert segs[1].end == pytest.approx(4.0)
    assert 300 not in [t for s in segs for t in s.token_ids]
    assert advance == pytest.approx(4.0)
    # no timestamps at all -> whole window
    segs, advance, single = _tokens_to_segments([1, 2, 3], MULTILINGUAL, 10.0, 25.0)
    assert segs[0].start == 10.0 and segs[0].end == 35.0
    assert advance == 25.0


def test_chunk_with_stride():
    from taiwan_whisper_tpu.decode.longform import chunk_with_stride

    audio = np.zeros(int(70 * 16000), np.float32)
    chunks = chunk_with_stride(audio)
    assert chunks[0][1] == 0.0 and chunks[0][2] == 0.0  # first: no left stride
    assert chunks[-1][3] == 0.0  # last: no right stride
    # coverage: every sample inside some chunk core
    assert len(chunks) >= 3
    for c in chunks:
        assert c[0].shape == (30 * 16000,)


def test_sequential_decode_runs():
    """End-to-end sequential long-form on a tiny random model (96 s audio)."""
    from taiwan_whisper_tpu.decode.longform import sequential_decode
    from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
    from taiwan_whisper_tpu.models.params import init_params
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

    cfg = WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size, d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=1, encoder_attention_heads=4,
        decoder_attention_heads=4,
    )
    params = init_params(cfg, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    audio = (np.random.RandomState(0).randn(int(96 * 16000)) * 0.1).astype(np.float32)
    res = sequential_decode(
        params, audio, cfg, tok, DtypePolicy.fp32(),
        temperatures=(0.0,), compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
    )
    assert isinstance(res.segments, list)
    # windows advanced to the end without an infinite loop; segment ends may
    # run up to one window past the content (HF doesn't clamp model-emitted
    # timestamps to the audio length, and neither do we)
    assert res.segments == [] or res.segments[-1].end <= 96.0 + 30.0


def test_chunked_decode_runs():
    from taiwan_whisper_tpu.decode.longform import chunked_decode
    from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
    from taiwan_whisper_tpu.models.params import init_params
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

    cfg = WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size, d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=1, encoder_attention_heads=4,
        decoder_attention_heads=4,
    )
    params = init_params(cfg, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    audio = (np.random.RandomState(1).randn(int(50 * 16000)) * 0.1).astype(np.float32)
    res = chunked_decode(params, audio, cfg, tok, DtypePolicy.fp32(), batch_size=4)
    assert isinstance(res.segments, list)
    for s in res.segments:
        assert 0.0 <= s.start <= 51.0


def _tiny_cfg_params():
    from taiwan_whisper_tpu.models.config import WhisperConfig
    from taiwan_whisper_tpu.models.params import init_params
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL

    cfg = WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size, d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=1, encoder_attention_heads=4,
        decoder_attention_heads=4,
    )
    return cfg, init_params(cfg, seed=0)


def test_chunked_decode_beam_matches_direct_beam():
    """chunked_decode(num_beams=K) on a single-window input must produce
    exactly the segments of a direct beam_decode over that window (the
    labelling beam path, reference run_pseudo_labelling.py:858-866)."""
    import jax
    from taiwan_whisper_tpu.decode.beam import beam_decode
    from taiwan_whisper_tpu.decode.longform import (
        _tokens_to_segments,
        chunked_decode,
    )
    from taiwan_whisper_tpu.decode.rules import DecodeRules
    from taiwan_whisper_tpu.models import whisper as M
    from taiwan_whisper_tpu.models.config import DtypePolicy
    from taiwan_whisper_tpu.audio.mel import log_mel, pad_or_trim
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

    cfg, params = _tiny_cfg_params()
    tok = WhisperTokenizer(MULTILINGUAL)
    fp32 = DtypePolicy.fp32()
    audio = (np.random.RandomState(2).randn(int(20 * 16000)) * 0.1).astype(np.float32)

    res = chunked_decode(params, audio, cfg, tok, fp32, batch_size=2,
                         num_beams=2)

    sot = tok.sot_sequence("zh", "transcribe", timestamps=True)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    chunk = pad_or_trim(audio, 30 * 16000)
    mel = log_mel(jnp.asarray(chunk[None]), cfg.num_mel_bins)
    enc = M.encode(params, mel, cfg, fp32)
    direct = beam_decode(
        params, enc, jnp.asarray([sot], np.int32), cfg, rules, fp32,
        num_beams=2,
    )
    toks = np.asarray(direct.tokens)[0]
    n = int(np.asarray(direct.lengths)[0])
    sampled = toks[len(sot): len(sot) + n].tolist()
    want, _, _ = _tokens_to_segments(sampled, MULTILINGUAL, 0.0, 20.0)
    assert [(s.start, s.end, s.token_ids) for s in res.segments] == [
        (s.start, s.end, s.token_ids) for s in want
    ]


def test_sequential_decode_beam_runs():
    from taiwan_whisper_tpu.decode.longform import sequential_decode
    from taiwan_whisper_tpu.models.config import DtypePolicy
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

    cfg, params = _tiny_cfg_params()
    tok = WhisperTokenizer(MULTILINGUAL)
    audio = (np.random.RandomState(3).randn(int(65 * 16000)) * 0.1).astype(np.float32)
    res = sequential_decode(
        params, audio, cfg, tok, DtypePolicy.fp32(),
        temperatures=(0.0,), compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        num_beams=2,
    )
    assert isinstance(res.segments, list)
    # model-emitted timestamps are not clamped to the audio length (HF parity)
    assert res.segments == [] or res.segments[-1].end <= 65.0 + 30.0


def test_round_timestamp_tokens():
    from taiwan_whisper_tpu.pipeline.dataset import round_timestamp_tokens

    assert round_timestamp_tokens("<|6.24|>hi<|29.96|>") == "<|6.20|>hi<|30.00|>"
    assert round_timestamp_tokens("<|0.00|>") == "<|0.00|>"
    assert round_timestamp_tokens("plain text") == "plain text"


def test_stream_segments_parallel_matches_serial(tmp_path):
    """num_workers>0 must yield the same segments in the same order."""
    from taiwan_whisper_tpu.pipeline.dataset import stream_segments

    rng = np.random.RandomState(0)
    rels = []
    for j in range(7):
        dur = 5.0 + j
        audio = rng.randn(int(dur * 16000)).astype(np.float32) * 0.05
        utts = [Utterance(0.0, dur / 2, f"甲{j}"), Utterance(dur / 2, dur, f"乙{j}")]
        rels += segment_audio_file(
            audio, utts, str(tmp_path), f"lec{j}", audio_format="wav"
        )
    man = Manifest(root=str(tmp_path), paths=rels)
    serial = list(stream_segments(man, "trim"))
    parallel = list(stream_segments(man, "trim", num_workers=3))
    assert len(serial) == len(parallel) == len(rels)
    for a, b in zip(serial, parallel):
        assert a.transcript == b.transcript
        assert a.prev_transcript == b.prev_transcript
        np.testing.assert_array_equal(a.audio, b.audio)
