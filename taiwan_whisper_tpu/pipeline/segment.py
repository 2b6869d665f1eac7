"""Stage 2: re-segment long-form teacher transcripts into <=30 s chunks with
Whisper timestamp tokens, <|continued|> marking and previous-text carry.

Behavioral port of the reference's segmenter
(pseudo-labelling/prepare_dataset.py:20-135): teacher utterances (start, end,
text) are packed greedily into windows; when the next utterance would
overflow 30 s, the window is cut at the utterance boundary, the partial
utterance's start tag + <|continued|> is appended when more than 1 s of it
falls inside the window, and the window's text becomes the next window's
prompt. Timestamps are rounded to the 0.02 s (320-sample) grid exactly like
frame_diff_to_timestamp.

Pure logic operating on arrays + a thin file driver; audio slicing reuses
audio/io.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import List, Sequence

import numpy as np

from ..audio.io import write_flac, write_wav
from ..audio.manifest import SegmentText, write_segment_txt
from ..text.tokenizer import frames_to_timestamp_str

SAMPLE_RATE = 16000
SEGMENT_LENGTH = 30 * SAMPLE_RATE
CONTINUED_THRESHOLD_S = 1.0  # append <|continued|> if > 1 s spills in


@dataclasses.dataclass
class Utterance:
    start: float  # seconds
    end: float
    text: str


@dataclasses.dataclass
class Segment:
    """One emitted <=30 s window."""

    start_frame: int
    end_frame: int
    transcript: str  # timestamp-token text incl. <|endoftext|>
    prev_transcript: str  # previous window's transcript (prompt source)


def read_pseudo_label_csv(path: str) -> List[Utterance]:
    """{start,end,text} CSV with header (reference read_pseudo_labels)."""
    utts: List[Utterance] = []
    with open(path, encoding="utf-8") as f:
        reader = csv.reader(f)
        next(reader, None)
        for row in reader:
            if len(row) != 3:
                continue
            start, end, text = row
            utts.append(Utterance(float(start), float(end), text.strip()))
    return utts


def segment_utterances(utterances: Sequence[Utterance]) -> List[Segment]:
    """Pack utterances into <=30 s windows (pure port of the window loop,
    prepare_dataset.py:92-135)."""
    if not utterances:
        return []
    segments: List[Segment] = []
    prev_end_frame = int(utterances[0].start * SAMPLE_RATE)
    prev_text = ""
    cur_text = ""

    for utt in utterances:
        s_frame = int(utt.start * SAMPLE_RATE)
        e_frame = int(utt.end * SAMPLE_RATE)
        s_tag = frames_to_timestamp_str(s_frame - prev_end_frame)
        e_tag = frames_to_timestamp_str(e_frame - prev_end_frame)

        if e_frame - prev_end_frame > SEGMENT_LENGTH:
            cur_end_frame = prev_end_frame + SEGMENT_LENGTH
            if cur_end_frame - s_frame > CONTINUED_THRESHOLD_S * SAMPLE_RATE:
                # the cut utterance starts inside this window: mark carry-over
                cur_text += s_tag + "<|continued|>"
            cur_text += "<|endoftext|>"
            segments.append(
                Segment(
                    start_frame=prev_end_frame,
                    end_frame=s_frame,
                    transcript=cur_text,
                    prev_transcript=prev_text,
                )
            )
            prev_end_frame = s_frame
            prev_text = cur_text
            s_tag = frames_to_timestamp_str(0)
            e_tag = frames_to_timestamp_str(e_frame - prev_end_frame)
            cur_text = s_tag + utt.text + e_tag
        else:
            cur_text += s_tag + utt.text + e_tag
    return segments


def segment_audio_file(
    audio: np.ndarray,
    utterances: Sequence[Utterance],
    output_dir: str,
    file_name: str,
    audio_format: str = "flac",
) -> List[str]:
    """Write per-segment audio + 2-line txt pairs; returns relative paths
    (layout: <output_dir>/<file_name>/<file_name>_<s>-<e>.flac/.txt,
    matching prepare_dataset.py:114-124)."""
    seg_dir = os.path.join(output_dir, file_name)
    os.makedirs(seg_dir, exist_ok=True)
    rel_paths: List[str] = []
    for seg in segment_utterances(utterances):
        base = f"{file_name}_{seg.start_frame}-{seg.end_frame}"
        audio_path = os.path.join(seg_dir, f"{base}.{audio_format}")
        chunk = audio[seg.start_frame : seg.end_frame]
        if audio_format == "flac":
            write_flac(audio_path, chunk, SAMPLE_RATE)
        else:
            write_wav(audio_path, chunk, SAMPLE_RATE)
        write_segment_txt(
            os.path.join(seg_dir, f"{base}.txt"),
            SegmentText(transcript=seg.transcript, prev_transcript=seg.prev_transcript),
        )
        rel_paths.append(os.path.join(file_name, f"{base}.{audio_format}"))
    return rel_paths
