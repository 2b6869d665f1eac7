"""Whisper tokenizer: special-token layout, timestamp tokens, byte-level BPE.

The reference leans on HF's WhisperTokenizer everywhere and has to patch it —
re-adding the 1501 timestamp tokens as AddedTokens
(training/run_distillation.py:996-1007) and appending ``<|continued|>``
(pseudo-labelling/prepare_dataset.py segment txts). Here the multilingual
vocab layout is first-class: timestamp ids, language ids and the prompt
tokens are computed, not patched in.

BPE text encode/decode needs the (public) vocab.json/merges.txt files; when
they are absent (e.g. in this offline build) the tokenizer still fully
supports id-space work — special tokens, timestamps, prompt construction,
decode of special/timestamp tokens — and renders unknown text ids as
``<unk-N>``. All pipeline logic (segmentation, filtering, metrics) is keyed
on ids and timestamp strings, so it runs without the vocab files.
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

# 99 Whisper languages in canonical order; token id = SOT + 1 + index.
LANGUAGES = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms "
    "cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn "
    "et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be "
    "tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln "
    "ha ba jw su"
).split()
LANGUAGES_V3 = LANGUAGES + ["yue"]

# Standard multilingual generation-time suppress lists (public Whisper
# generation config; the reference inherits them via HF generate).
NON_SPEECH_TOKENS = [
    1, 2, 7, 8, 9, 10, 14, 25, 26, 27, 28, 29, 31, 58, 59, 60, 61, 62, 63,
    90, 91, 92, 93, 359, 503, 522, 542, 873, 893, 902, 918, 922, 931, 1350,
    1853, 1982, 2460, 2627, 3246, 3253, 3268, 3536, 3846, 3961, 4183, 4667,
    6585, 6647, 7273, 9061, 9383, 10428, 10929, 11938, 12033, 12331, 12562,
    13793, 14157, 14635, 15265, 15618, 16553, 16604, 18362, 18956, 20075,
    21675, 22520, 26130, 26161, 26435, 28279, 29464, 31650, 32302, 32470,
    36865, 42863, 47425, 49870, 50254, 50258, 50358, 50359, 50360, 50361,
    50362,
]
BEGIN_SUPPRESS_TOKENS = [220, 50257]  # " " and <|endoftext|>

TIME_PRECISION = 0.02  # seconds per timestamp token step


@dataclasses.dataclass(frozen=True)
class SpecialTokens:
    """Id layout of the multilingual Whisper vocab (51865 / 51866-v3)."""

    eot: int = 50257  # <|endoftext|> (also pad)
    sot: int = 50258  # <|startoftranscript|>
    n_languages: int = 99

    @property
    def translate(self) -> int:
        return self.sot + 1 + self.n_languages

    @property
    def transcribe(self) -> int:
        return self.translate + 1

    @property
    def start_of_lm(self) -> int:
        return self.transcribe + 1

    @property
    def sot_prev(self) -> int:  # <|startofprev|>
        return self.transcribe + 2

    @property
    def no_speech(self) -> int:  # <|nospeech|>
        return self.transcribe + 3

    @property
    def no_timestamps(self) -> int:  # <|notimestamps|>
        return self.transcribe + 4

    @property
    def timestamp_begin(self) -> int:  # <|0.00|>
        return self.no_timestamps + 1

    @property
    def n_timestamps(self) -> int:
        return 1501  # <|0.00|> .. <|30.00|>

    @property
    def vocab_size(self) -> int:
        return self.timestamp_begin + self.n_timestamps

    def language_id(self, lang: str) -> int:
        langs = LANGUAGES_V3 if self.n_languages == 100 else LANGUAGES
        return self.sot + 1 + langs.index(lang)

    def language_code(self, token_id: int) -> str:
        langs = LANGUAGES_V3 if self.n_languages == 100 else LANGUAGES
        return langs[token_id - self.sot - 1]

    def is_timestamp(self, token_id: int) -> bool:
        return self.timestamp_begin <= token_id < self.timestamp_begin + self.n_timestamps

    def timestamp_seconds(self, token_id: int) -> float:
        return (token_id - self.timestamp_begin) * TIME_PRECISION

    def seconds_to_timestamp(self, seconds: float) -> int:
        idx = int(round(seconds / TIME_PRECISION))
        idx = max(0, min(idx, self.n_timestamps - 1))
        return self.timestamp_begin + idx


MULTILINGUAL = SpecialTokens()
MULTILINGUAL_V3 = SpecialTokens(eot=50257, sot=50258, n_languages=100)
# English-only models (*.en — the reference's baseline sweeps,
# flax/evaluation_scripts/test/run_baselines.sh): GPT-2 vocab keeps
# <|endoftext|> at 50256, so every special shifts down by one. The language
# block still exists in the vocab (unused); sot_sequence(language=None)
# yields the [sot(, notimestamps)] forced ids these models expect.
ENGLISH = SpecialTokens(eot=50256, sot=50257, n_languages=99)


def special_for_vocab(vocab_size: int) -> SpecialTokens:
    """Token layout implied by a checkpoint's vocab size (51864 = *.en,
    51865 = multilingual v1/v2, 51866 = large-v3 family)."""
    if vocab_size == ENGLISH.vocab_size:
        return ENGLISH
    if vocab_size == MULTILINGUAL_V3.vocab_size:
        return MULTILINGUAL_V3
    return MULTILINGUAL


def frames_to_timestamp_str(n_frames: int, sample_rate: int = 16000) -> str:
    """Audio-frame offset -> '<|T.TT|>' at 0.02 s (320-sample) resolution,
    the exact rounding of the reference's frame_diff_to_timestamp
    (pseudo-labelling/prepare_dataset.py:20-35)."""
    step = int(sample_rate * TIME_PRECISION)  # 320
    idx = round(n_frames / step)
    return f"<|{idx * TIME_PRECISION:.2f}|>"


def seconds_to_timestamp_str(seconds: float) -> str:
    return f"<|{round(seconds / TIME_PRECISION) * TIME_PRECISION:.2f}|>"


# ---------------------------------------------------------------------------
# byte-level BPE (GPT-2 scheme, as used by all Whisper vocabs)
# ---------------------------------------------------------------------------

@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte<->unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class WhisperTokenizer:
    """Id-first Whisper tokenizer.

    ``vocab``/``merges`` are optional; without them only text encode and
    text decode of non-special ids are unavailable (rendered ``<unk-N>``).
    Extra added tokens (e.g. ``<|continued|>``) are appended after the
    timestamp block, mirroring the reference's AddedTokens usage.
    """

    CONTINUED = "<|continued|>"

    def __init__(
        self,
        special: SpecialTokens = MULTILINGUAL,
        vocab: Optional[Dict[str, int]] = None,
        merges: Optional[List[Tuple[str, str]]] = None,
        added_tokens: Sequence[str] = (CONTINUED,),
    ):
        self.special = special
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()} if vocab else None
        self.bpe_ranks = (
            {pair: i for i, pair in enumerate(merges)} if merges is not None else None
        )
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.added_tokens: Dict[str, int] = {}
        for i, tok in enumerate(added_tokens):
            self.added_tokens[tok] = special.vocab_size + i
        self.inv_added = {v: k for k, v in self.added_tokens.items()}
        self._bpe_cache: Dict[str, List[str]] = {}

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_files(
        cls,
        vocab_path: str,
        merges_path: str,
        special: SpecialTokens = MULTILINGUAL,
        **kw,
    ) -> "WhisperTokenizer":
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        with open(merges_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split(" ")
                merges.append((a, b))
        return cls(special=special, vocab=vocab, merges=merges, **kw)

    @classmethod
    def from_pretrained_dir(cls, path: str, **kw) -> "WhisperTokenizer":
        """Load from an HF-style tokenizer dir (vocab.json + merges.txt)."""
        return cls.from_files(
            os.path.join(path, "vocab.json"), os.path.join(path, "merges.txt"), **kw
        )

    # -- special-token helpers ---------------------------------------------

    def special_token_string(self, token_id: int) -> Optional[str]:
        s = self.special
        if s.is_timestamp(token_id):
            return f"<|{s.timestamp_seconds(token_id):.2f}|>"
        names = {
            s.eot: "<|endoftext|>",
            s.sot: "<|startoftranscript|>",
            s.translate: "<|translate|>",
            s.transcribe: "<|transcribe|>",
            s.start_of_lm: "<|startoflm|>",
            s.sot_prev: "<|startofprev|>",
            s.no_speech: "<|nospeech|>",
            s.no_timestamps: "<|notimestamps|>",
        }
        if token_id in names:
            return names[token_id]
        if s.sot < token_id <= s.sot + s.n_languages:
            return f"<|{s.language_code(token_id)}|>"
        if token_id in self.inv_added:
            return self.inv_added[token_id]
        return None

    def sot_sequence(
        self, language: Optional[str] = "zh", task: str = "transcribe",
        timestamps: bool = True,
    ) -> List[int]:
        """[<|startoftranscript|>, <|lang|>, <|task|>, (<|notimestamps|>)] —
        the forced decoder ids of HF generate. ``language=None`` gives the
        English-only models' prefix [sot(, notimestamps)] (no lang/task)."""
        s = self.special
        if language is None:
            seq = [s.sot]
        else:
            seq = [s.sot, s.language_id(language),
                   s.transcribe if task == "transcribe" else s.translate]
        if not timestamps:
            seq.append(s.no_timestamps)
        return seq

    def prompt_ids(self, prompt_tokens: Sequence[int], max_len: int = 223) -> List[int]:
        """[<|startofprev|>] + last max_len prompt tokens (the reference trims
        prompts to <=224 total, run_distillation.py:1208-1305)."""
        toks = list(prompt_tokens)[-max_len:]
        return [self.special.sot_prev] + toks

    # -- BPE ----------------------------------------------------------------

    def _bpe(self, token: str) -> List[str]:
        if token in self._bpe_cache:
            return self._bpe_cache[token]
        word = list(token)
        if not word:
            return []
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 60))
            if best not in self.bpe_ranks:
                break
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._bpe_cache[token] = word
        return word

    def encode_text(self, text: str) -> List[int]:
        """Plain text -> ids (no special tokens). Requires vocab files."""
        if self.vocab is None or self.bpe_ranks is None:
            raise RuntimeError(
                "text encoding requires vocab.json/merges.txt; construct via "
                "WhisperTokenizer.from_files(...)"
            )
        import regex  # GPT-2 pretokenizer needs \p classes

        pat = regex.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
        )
        ids: List[int] = []
        for tok in pat.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(mapped):
                ids.append(self.vocab[piece])
        return ids

    def decode(
        self,
        ids: Iterable[int],
        skip_special_tokens: bool = True,
        decode_with_timestamps: bool = False,
    ) -> str:
        """ids -> text. Timestamp/special tokens render as '<|..|>' strings
        when requested (the segment txt format of the reference, component 5)."""
        s = self.special
        pieces: List[str] = []
        byte_buf: List[str] = []

        def flush():
            if not byte_buf:
                return
            text = "".join(byte_buf)
            data = bytearray(self.byte_decoder[c] for c in text)
            pieces.append(data.decode("utf-8", errors="replace"))
            byte_buf.clear()

        for i in ids:
            i = int(i)
            if i >= s.eot:  # special region
                name = self.special_token_string(i)
                flush()
                if s.is_timestamp(i):
                    if decode_with_timestamps:
                        pieces.append(name)
                elif not skip_special_tokens and name is not None:
                    pieces.append(name)
                elif name is None:
                    pieces.append(f"<unk-{i}>")
                continue
            if self.inv_vocab is not None:
                byte_buf.append(self.inv_vocab.get(i, ""))
            else:
                flush()
                pieces.append(f"<unk-{i}>")
        flush()
        return "".join(pieces)


def _marker_to_id(tok: "WhisperTokenizer", marker: str) -> Optional[int]:
    """'<|...|>' string -> token id (timestamps, specials, languages, added)."""
    s = tok.special
    ts = parse_timestamp_str(marker)
    if ts is not None:
        return s.seconds_to_timestamp(ts)
    names = {
        "<|endoftext|>": s.eot,
        "<|startoftranscript|>": s.sot,
        "<|translate|>": s.translate,
        "<|transcribe|>": s.transcribe,
        "<|startoflm|>": s.start_of_lm,
        "<|startofprev|>": s.sot_prev,
        "<|nospeech|>": s.no_speech,
        "<|notimestamps|>": s.no_timestamps,
    }
    if marker in names:
        return names[marker]
    if marker in tok.added_tokens:
        return tok.added_tokens[marker]
    inner = marker[2:-2]
    langs = LANGUAGES_V3 if s.n_languages == 100 else LANGUAGES
    if inner in langs:
        return s.language_id(inner)
    return None


def encode_transcript(
    tok: "WhisperTokenizer",
    text: str,
    *,
    language: str = "zh",
    task: str = "transcribe",
    predict_timestamps: bool = True,
    add_special_tokens: Optional[bool] = None,
) -> List[int]:
    """Segment-transcript string -> token ids.

    '<|..|>' markers map to their special/timestamp ids; plain text spans go
    through BPE. When the string carries no '<|transcribe|>' marker, the sot
    prefix [sot, lang, task(, notimestamps)] is prepended and <|endoftext|>
    appended — matching the reference's
    `tokenizer(input_str, add_special_tokens=not "<|transcribe|>" in input)`
    (run_distillation.py:1231 with set_prefix_tokens at :1081).
    """
    if add_special_tokens is None:
        add_special_tokens = "<|transcribe|>" not in text
    ids: List[int] = []
    i = 0
    while i < len(text):
        j = text.find("<|", i)
        if j < 0:
            if text[i:]:
                ids.extend(tok.encode_text(text[i:]))
            break
        if text[i:j]:
            ids.extend(tok.encode_text(text[i:j]))
        k = text.find("|>", j + 2)
        if k < 0:
            ids.extend(tok.encode_text(text[j:]))
            break
        marker = text[j : k + 2]
        mid = _marker_to_id(tok, marker)
        if mid is None:
            ids.extend(tok.encode_text(marker))
        else:
            ids.append(mid)
        i = k + 2
    if add_special_tokens:
        prefix = tok.sot_sequence(language, task, timestamps=predict_timestamps)
        ids = prefix + ids + [tok.special.eot]
    return ids


def strip_markers(text: str) -> str:
    """Remove all '<|...|>' spans from a transcript string (the reference
    strips timestamp/special markers before computing MER,
    utils/hallucination_detector.py:47-91)."""
    out: List[str] = []
    i = 0
    while i < len(text):
        j = text.find("<|", i)
        if j < 0:
            out.append(text[i:])
            break
        out.append(text[i:j])
        k = text.find("|>", j + 2)
        if k < 0:
            out.append(text[j:])
            break
        i = k + 2
    return "".join(out)


def parse_timestamp_str(tok: str) -> Optional[float]:
    """'<|1.24|>' -> 1.24; None if not a timestamp marker."""
    if not (tok.startswith("<|") and tok.endswith("|>")):
        return None
    try:
        return float(tok[2:-2])
    except ValueError:
        return None
