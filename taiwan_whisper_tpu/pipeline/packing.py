"""Speaker-aware utterance packing + batched short-form pseudo-labelling.

Behavioral port of the reference's distributed labeller preprocessing
(training/run_pseudo_labelling.py concatenate_dataset:644-734): consecutive
utterances from the same speaker are concatenated up to 30 s; a pack that
closed because of the length limit (same speaker continuing) is flagged
``condition_on_prev=1`` so decoding may prompt on the previous pack's text,
while a speaker change flags 0.

`label_packed` then runs batched greedy decode over the packs with
per-batch-uniform prompting and incremental CSV checkpointing (reference
eval_step_with_save:884-952).
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..audio.mel import log_mel, pad_or_trim
from ..decode.greedy import greedy_decode
from ..decode.rules import DecodeRules
from ..models import whisper as M
from ..models.config import DtypePolicy, WhisperConfig
from ..text.tokenizer import WhisperTokenizer


@dataclasses.dataclass
class Utterance:
    audio: np.ndarray
    text: str = ""
    speaker_id: Optional[str] = None


@dataclasses.dataclass
class PackedSample:
    audio: np.ndarray
    text: str
    speaker_id: Optional[str]
    condition_on_prev: int  # 1 when the previous pack is the same speaker


def pack_utterances(
    utterances: Sequence[Utterance],
    max_input_samples: int = 30 * 16000,
) -> List[PackedSample]:
    """Greedy same-speaker packing to <= max length. Mirrors the reference's
    loop exactly, including its flag semantics (length-split -> 1,
    speaker-change -> 0) and that the final open pack is flushed."""
    if not utterances:
        return []
    packed: List[PackedSample] = []
    audio_sample = utterances[0].audio
    text_sample = utterances[0].text
    cur_speaker = utterances[0].speaker_id

    for idx in range(1, len(utterances)):
        utt = utterances[idx]
        prev_speaker = utterances[idx - 1].speaker_id
        if len(audio_sample) + len(utt.audio) < max_input_samples:
            if utt.speaker_id == prev_speaker:
                audio_sample = np.concatenate([audio_sample, utt.audio])
                text_sample = text_sample + " " + utt.text if text_sample else utt.text
            else:
                packed.append(PackedSample(audio_sample, text_sample,
                                           utt.speaker_id, 0))
                audio_sample = utt.audio
                text_sample = utt.text
                cur_speaker = utt.speaker_id
        else:
            packed.append(PackedSample(audio_sample, text_sample,
                                       utt.speaker_id, 1))
            audio_sample = utt.audio
            text_sample = utt.text
            cur_speaker = utt.speaker_id
    packed.append(PackedSample(audio_sample, text_sample, cur_speaker, 0))
    return packed


def label_packed(
    params,
    config: WhisperConfig,
    tok: WhisperTokenizer,
    packs: Sequence[PackedSample],
    output_csv: str,
    policy: DtypePolicy = DtypePolicy(),
    *,
    language: str = "zh",
    batch_size: int = 16,
    timestamps: bool = True,
    logging_steps: int = 10,
    mel_fn=None,
) -> List[str]:
    """Batched greedy labelling of packs -> transcripts; CSV rows
    (id, condition_on_prev, whisper_transcript, text) flushed incrementally
    every ``logging_steps`` batches (reference :927-952)."""
    rules = DecodeRules.from_special(tok.special, timestamps=timestamps)
    mel_fn = mel_fn or (lambda a: log_mel(a, config.num_mel_bins))
    n_window = config.max_source_positions * 2 * 160
    sot_seq = tok.sot_sequence(language, "transcribe", timestamps=timestamps)

    # params is an explicit jit argument (closure constants overflow the
    # remote-compile payload at real model sizes — HTTP 413; see label.py)
    @jax.jit
    def decode_batch(params, audio_batch, prefix):
        mel = mel_fn(audio_batch)
        enc = M.encode(params, mel, config, policy)
        return greedy_decode(params, enc, prefix, config, rules, policy)

    os.makedirs(os.path.dirname(os.path.abspath(output_csv)), exist_ok=True)
    transcripts: List[str] = []
    rows: List[List] = []
    wrote_header = False

    def flush():
        nonlocal wrote_header, rows
        mode = "a" if wrote_header else "w"
        with open(output_csv, mode, encoding="utf-8", newline="") as f:
            w = csv.writer(f)
            if not wrote_header:
                w.writerow(["id", "condition_on_prev", "whisper_transcript", "text"])
                wrote_header = True
            w.writerows(rows)
        rows = []

    prefix = jnp.asarray([sot_seq] * batch_size, jnp.int32)
    for bi, i in enumerate(range(0, len(packs), batch_size)):
        batch = packs[i : i + batch_size]
        arrs = [pad_or_trim(p.audio.astype(np.float32), n_window) for p in batch]
        while len(arrs) < batch_size:
            arrs.append(np.zeros_like(arrs[0]))
        res = decode_batch(params, jnp.asarray(np.stack(arrs)), prefix)
        tokens = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        for j, pack in enumerate(batch):
            ids = tokens[j][len(sot_seq) : len(sot_seq) + int(lengths[j])]
            text = tok.decode(ids.tolist(), skip_special_tokens=True,
                              decode_with_timestamps=timestamps)
            transcripts.append(text)
            rows.append([
                pack.speaker_id if pack.speaker_id is not None else i + j,
                pack.condition_on_prev, text, pack.text,
            ])
        if (bi + 1) % logging_steps == 0:
            flush()
    flush()
    return transcripts
