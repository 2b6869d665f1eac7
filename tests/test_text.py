"""Text subsystem: MER, detectors, normalizer, tokenizer helpers, native ext."""

import numpy as np
import pytest

from taiwan_whisper_tpu.text.metrics import (
    MixErrorRate,
    count_repetitive_hallucination,
    edit_distance_py,
    edit_ops,
)
from taiwan_whisper_tpu.text.hallucination import (
    CrossModelFilter,
    blocklist_hits,
    char_ngram_hallucinated,
    clean_segment_transcript,
    wer_filter_in_range,
)
from taiwan_whisper_tpu.text.normalizer import BasicTextNormalizer
from taiwan_whisper_tpu.text.tokenizer import (
    MULTILINGUAL,
    WhisperTokenizer,
    frames_to_timestamp_str,
    seconds_to_timestamp_str,
    strip_markers,
)
from taiwan_whisper_tpu.utils import native


# -- MER --------------------------------------------------------------------

def test_mer_unit_split_mixed():
    m = MixErrorRate(to_simplified_chinese=False)
    assert m.units("hello 世界 world") == ["hello", "世", "界", "world"]
    assert m.units("it's A-B 好。") == ["it's", "A-B", "好"]
    assert m.units("（你好）test") == ["你", "好", "test"]


def test_mer_t2s_conversion():
    m = MixErrorRate(to_simplified_chinese=True)
    assert m.units("學習") == ["学", "习"]


def test_mer_values():
    m = MixErrorRate(to_simplified_chinese=False)
    # identical -> 0
    assert m.compute(["你好 world"], ["你好 world"]) == 0.0
    # 1 sub over 3 units
    assert m.compute(["你坏 world"], ["你好 world"]) == pytest.approx(1 / 3)
    # empty reference -> empty_error_rate
    assert m.compute(["something"], [""], empty_error_rate=1.0) == 1.0
    assert m.compute([""], [""], empty_error_rate=0.5) == 0.5


def test_mer_separate_language():
    m = MixErrorRate(to_simplified_chinese=False, separate_language=True)
    res = m.compute(["你好 hello"], ["你坏 hello"])
    assert res["ZH CER"] == pytest.approx(0.5)
    assert res["EN WER"] == 0.0
    assert res["MER"] == pytest.approx(1 / 3)


def test_edit_ops_decomposition():
    s, d, i, n = edit_ops(list("abcd"), list("abd"))
    assert (s, d, i, n) == (0, 1, 0, 4)
    s, d, i, n = edit_ops(list("abc"), list("axc"))
    assert (s, d, i, n) == (1, 0, 0, 3)
    s, d, i, n = edit_ops(list("ac"), list("abc"))
    assert (s, d, i, n) == (0, 0, 1, 2)


def test_native_edit_distance_matches_python():
    rng = np.random.RandomState(0)
    for _ in range(25):
        a = [str(x) for x in rng.randint(0, 10, rng.randint(0, 30))]
        b = [str(x) for x in rng.randint(0, 10, rng.randint(0, 30))]
        assert native.edit_distance(a, b) == edit_distance_py(a, b)


def test_native_ngram_matches_python():
    texts = [
        "abcdefabcdefabcdefabcdefabcdefabcdef",
        "<|1.00|>xxxxxxxxxx<|2.00|>",
        "short",
        "重複重複重複重複重複重複重複重複重複重複",
    ]
    for t in texts:
        lib_count = native.max_ngram_count(t, 6)
        from collections import defaultdict

        counts = defaultdict(int)
        for i in range(max(len(t) - 5, 0)):
            g = t[i : i + 6]
            if "|>" in g or "<|" in g:
                continue
            counts[g] += 1
        ref = max(counts.values()) if counts else 0
        assert lib_count == ref, t


# -- detectors --------------------------------------------------------------

def test_char_ngram_detector():
    assert not char_ngram_hallucinated("normal text without repeats")
    assert char_ngram_hallucinated("abcdef" * 10)  # 6-gram repeats 10x
    # n-grams containing the marker digraphs are skipped (reference semantics:
    # '|0.00|' still counts since it contains neither '<|' nor '|>')
    assert not char_ngram_hallucinated("<|ab|>" * 20)


def test_repetitive_hallucination_count():
    assert count_repetitive_hallucination("abcdef" * 10) >= 1
    assert count_repetitive_hallucination("short") == 0


def test_clean_segment_transcript():
    raw = "<|0.00|>你好<|1.24|><|1.24|>世界<|29.96|><|continued|><|endoftext|>"
    assert clean_segment_transcript(raw) == "你好 世界"


def test_blocklists():
    contains, matches = blocklist_hits("請不吝點贊 訂閱")
    assert "請不吝" in contains and "點贊" in contains
    _, matches = blocklist_hits("okay . then")
    assert "." in matches
    contains, _ = blocklist_hits("the organization is big")
    assert contains == []  # "org" guarded by word boundary
    contains, _ = blocklist_hits("visit example org now")
    assert contains  # standalone org matches


def test_cross_model_filter():
    f = CrossModelFilter(threshold=0.4)
    good = f.check(0, "<|0.00|>今天 天氣 很好<|2.00|>", "今天天氣很好")
    assert not good.hallucinated
    bad = f.check(1, "<|0.00|>完全 不同 的 字<|2.00|>", "this is english only")
    assert bad.hallucinated
    # mix detection: teacher n-gram hallucination -> drop regardless of MER
    f2 = CrossModelFilter(threshold=10.0, mix_detection=True)
    rep = f2.check(2, "哈哈哈哈" * 20, "哈哈哈哈" * 20)
    assert rep.hallucinated and rep.reason == "teacher-ngram"


def test_wer_filter():
    m = MixErrorRate()
    assert wer_filter_in_range("你好世界", "你好世界", m, max_wer_percent=10)
    assert not wer_filter_in_range("完全不同", "你好世界", m, max_wer_percent=10)


# -- normalizer -------------------------------------------------------------

def test_normalizer_matches_hf():
    transformers = pytest.importorskip("transformers")
    from transformers.models.whisper.english_normalizer import (
        BasicTextNormalizer as HFNorm,
    )

    ours = BasicTextNormalizer()
    theirs = HFNorm()
    cases = [
        "Hello, World! 你好。",
        "  multiple   spaces\there ",
        "symbols: @#$%^&*()",
        "MiXeD CaSe 中文字",
        "(aside) keep this [remove me]",
    ]
    for c in cases:
        assert ours(c) == theirs(c), c


# -- tokenizer helpers ------------------------------------------------------

def test_special_token_layout():
    s = MULTILINGUAL
    assert s.eot == 50257 and s.sot == 50258
    assert s.language_id("en") == 50259
    assert s.language_id("zh") == 50260
    assert s.translate == 50358 and s.transcribe == 50359
    assert s.sot_prev == 50361 and s.no_speech == 50362
    assert s.no_timestamps == 50363 and s.timestamp_begin == 50364
    assert s.vocab_size == 51865
    assert s.timestamp_seconds(50364) == 0.0
    assert s.timestamp_seconds(51864) == pytest.approx(30.0)
    assert s.seconds_to_timestamp(1.24) == 50364 + 62


def test_timestamp_strings():
    assert frames_to_timestamp_str(0) == "<|0.00|>"
    assert frames_to_timestamp_str(320) == "<|0.02|>"
    assert frames_to_timestamp_str(16000) == "<|1.00|>"
    # rounds to nearest 320-frame multiple like the reference
    assert frames_to_timestamp_str(330) == "<|0.02|>"
    assert frames_to_timestamp_str(480001) == "<|30.00|>"
    assert seconds_to_timestamp_str(1.239) == "<|1.24|>"


def test_tokenizer_decode_specials():
    tok = WhisperTokenizer(MULTILINGUAL)
    ids = [50258, 50260, 50359, 50364, 51864, 50257]
    assert tok.decode(ids, skip_special_tokens=False, decode_with_timestamps=True) == (
        "<|startoftranscript|><|zh|><|transcribe|><|0.00|><|30.00|><|endoftext|>"
    )
    assert tok.decode(ids, skip_special_tokens=True) == ""
    # added token
    cont_id = tok.added_tokens["<|continued|>"]
    assert tok.special_token_string(cont_id) == "<|continued|>"


def test_sot_sequence_and_prompt():
    tok = WhisperTokenizer(MULTILINGUAL)
    assert tok.sot_sequence("zh", "transcribe", timestamps=True) == [50258, 50260, 50359]
    assert tok.sot_sequence("en", "transcribe", timestamps=False) == [
        50258, 50259, 50359, 50363,
    ]
    p = tok.prompt_ids(list(range(500)), max_len=223)
    assert p[0] == 50361 and len(p) == 224 and p[-1] == 499


def test_strip_markers():
    assert strip_markers("<|0.00|>hi<|1.00|> there<|endoftext|>") == "hi there"
    assert strip_markers("no markers") == "no markers"


# -- phonemized PER via user lexicons (no pypinyin needed) --------------------


def test_phonemize_with_zh_lexicon(tmp_path):
    zh_lex = tmp_path / "zh.tsv"
    # char -> bopomofo reading (tone marks are stripped by the metric)
    zh_lex.write_text("你\tㄋㄧˇ\n好\tㄏㄠˇ\n", encoding="utf-8")
    en_lex = tmp_path / "en.tsv"
    en_lex.write_text("hello\tHH AH L OW\nworld\tW ER L D\n", encoding="utf-8")
    per = MixErrorRate(
        phonemize=True,
        lexicon_path=str(en_lex),
        zh_lexicon_path=str(zh_lex),
    )
    # identical readings -> PER 0 even with different surface forms is not
    # the case here; exact match first:
    assert per.compute(["你好 hello"], ["你好 hello"]) == 0.0
    # 好/你 swap changes phoneme order -> nonzero
    assert per.compute(["好你 hello"], ["你好 hello"]) > 0.0
    # a homophone-level match: unknown chars phonemize to nothing, so a
    # missing-char prediction only costs that char's phonemes
    r = per.compute(["你 hello"], ["你好 hello"])
    assert 0.0 < r < 1.0


def test_phonemize_requires_some_zh_source(tmp_path):
    try:
        import pypinyin  # noqa: F401
        pytest.skip("pypinyin installed; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="zh_lexicon_path"):
        MixErrorRate(phonemize=True)


# -- English-only (*.en) token layout -----------------------------------------


def test_english_layout():
    from taiwan_whisper_tpu.text.tokenizer import ENGLISH, special_for_vocab

    # the *.en vocab: every special shifts down one vs multilingual
    assert ENGLISH.eot == 50256
    assert ENGLISH.sot == 50257
    assert ENGLISH.transcribe == 50358
    assert ENGLISH.sot_prev == 50360
    assert ENGLISH.no_speech == 50361
    assert ENGLISH.no_timestamps == 50362
    assert ENGLISH.timestamp_begin == 50363
    assert ENGLISH.vocab_size == 51864
    assert special_for_vocab(51864) is ENGLISH
    assert special_for_vocab(51865) is MULTILINGUAL
    assert special_for_vocab(51866).n_languages == 100

    tok = WhisperTokenizer(ENGLISH)
    # English models force only [sot(, notimestamps)] — no lang/task ids
    assert tok.sot_sequence(None) == [50257]
    assert tok.sot_sequence(None, timestamps=False) == [50257, 50362]
    assert tok.special_token_string(50257) == "<|startoftranscript|>"
    assert tok.special_token_string(50363) == "<|0.00|>"
