"""Utterance packing (distributed labeller) and subtitle readers."""

import numpy as np
import pytest

from taiwan_whisper_tpu.pipeline.packing import (
    PackedSample,
    Utterance,
    pack_utterances,
)
from taiwan_whisper_tpu.text.subtitles import (
    Cue,
    cut_cue_pairs,
    read_srt,
    read_vtt,
    timecode_to_seconds,
)


def _utt(sec, speaker, text="t"):
    return Utterance(np.zeros(int(sec * 16000), np.float32), text, speaker)


def test_pack_same_speaker_concatenates():
    packs = pack_utterances([_utt(5, "a"), _utt(5, "a"), _utt(5, "a")])
    assert len(packs) == 1
    assert len(packs[0].audio) == 15 * 16000
    assert packs[0].text == "t t t"


def test_pack_speaker_change_splits_flag0():
    packs = pack_utterances([_utt(5, "a"), _utt(5, "b")])
    assert len(packs) == 2
    assert packs[0].condition_on_prev == 0


def test_pack_length_split_flag1():
    packs = pack_utterances([_utt(20, "a"), _utt(15, "a"), _utt(5, "a")])
    # 20+15 > 30 -> split with condition_on_prev=1
    assert len(packs) == 2
    assert packs[0].condition_on_prev == 1
    assert len(packs[0].audio) == 20 * 16000
    assert len(packs[1].audio) == 20 * 16000  # 15 + 5 packed together


def test_timecode_to_seconds():
    assert timecode_to_seconds("00:01:02.500") == pytest.approx(62.5)
    assert timecode_to_seconds("01:02,500".replace(",", ".")) == pytest.approx(62.5)
    assert timecode_to_seconds("5.25") == pytest.approx(5.25)


def test_read_srt(tmp_path):
    p = tmp_path / "a.srt"
    p.write_text(
        "1\n00:00:01,000 --> 00:00:03,500\n你好 world\n\n"
        "2\n00:00:04,000 --> 00:00:06,000\nsecond line\nwrapped text\n\n",
        encoding="utf-8",
    )
    cues = read_srt(str(p))
    assert len(cues) == 2
    assert cues[0].start == pytest.approx(1.0)
    assert cues[0].end == pytest.approx(3.5)
    assert cues[0].text == "你好 world"
    assert cues[1].text == "second line wrapped text"


def test_read_vtt(tmp_path):
    p = tmp_path / "a.vtt"
    p.write_text(
        "WEBVTT\n\n00:00:01.000 --> 00:00:03.000\nhello\n\n"
        "00:04.000 --> 00:06.500\n再見\n",
        encoding="utf-8",
    )
    cues = read_vtt(str(p))
    assert len(cues) == 2
    assert cues[0].text == "hello"
    assert cues[1].start == pytest.approx(4.0)
    assert cues[1].end == pytest.approx(6.5)


def test_cut_cue_pairs():
    audio = np.arange(16000 * 10, dtype=np.float32)
    cues = [Cue(1.0, 2.0, "a"), Cue(8.0, 12.0, "overruns"), Cue(3.0, 2.0, "bad")]
    pairs = cut_cue_pairs(audio, cues)
    assert len(pairs) == 1
    assert len(pairs[0][0]) == 16000
    assert pairs[0][1] == "a"


def test_srt_vtt_writers_roundtrip(tmp_path):
    from taiwan_whisper_tpu.text.subtitles import (
        Cue, read_srt, read_vtt, write_srt, write_vtt,
    )

    cues = [
        Cue(0.0, 1.5, "hello world"),
        Cue(61.25, 3661.004, "跨 model 測試"),
    ]
    srt = tmp_path / "a.srt"
    vtt = tmp_path / "a.vtt"
    write_srt(str(srt), cues)
    write_vtt(str(vtt), cues)
    for back in (read_srt(str(srt)), read_vtt(str(vtt))):
        assert len(back) == 2
        for orig, got in zip(cues, back):
            assert abs(orig.start - got.start) < 0.002
            assert abs(orig.end - got.end) < 0.002
            assert got.text == orig.text
