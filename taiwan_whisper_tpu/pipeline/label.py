"""Stage 1: pseudo-labelling — teacher transcribes long-form audio.

TPU-native replacement for the reference's faster-whisper/CTranslate2 driver
(pseudo-labelling/initial_inference.py:56-122) and its Accelerate-DDP
variant (training/run_pseudo_labelling.py): the teacher runs as batched
chunked long-form decode on-device (decode/longform.py), files are sharded
across hosts by jax.process_index, and each audio file produces the same
{start,end,text} CSV the downstream segmenter consumes.

A lightweight energy VAD gates obviously-silent chunks before they reach the
device (the reference relies on faster-whisper's VAD model; here silence is
additionally caught on-device by the no-speech probe).
"""

from __future__ import annotations

import csv
import dataclasses
import os
import time
from typing import Optional, Sequence

import numpy as np

from ..audio.io import load_audio_16k
from ..audio.manifest import read_manifest
from ..models.config import DtypePolicy, WhisperConfig
from ..parallel.mesh import host_local_slice
from ..text.tokenizer import WhisperTokenizer
from ..decode.longform import LongformResult, chunked_decode, sequential_decode


@dataclasses.dataclass
class LabelConfig:
    language: str = "zh"
    task: str = "transcribe"
    strategy: str = "chunked"  # | sequential
    batch_size: int = 16
    # None: derive from the model context (30 s for real Whisper configs;
    # chunked_decode defaults chunk to max_source_positions and stride to
    # chunk/6, the reference's ratio)
    chunk_s: Optional[float] = None
    stride_s: Optional[float] = None
    energy_vad_threshold: float = 0.0  # 0 disables; else min RMS to transcribe
    # region-gated decode is ON by default, matching the reference's
    # use_vad_model=True (initial_inference.py:84-90): only detected speech
    # regions reach the teacher. "spectral" (default) is the model-grade gate
    # that also rejects music/steady noise (pipeline/vad.py); "energy" is the
    # RMS-only gate; "off" decodes the whole file.
    vad_regions: bool = True
    vad_mode: str = "spectral"  # | energy | off
    quantize_kv: bool = False  # int8 cross-KV (+~20% throughput, near-parity)
    num_beams: int = 1  # >1: beam-search teacher decode (reference labels
    # with beam — run_pseudo_labelling.py:858-866, faster-whisper default 5)


def energy_vad_is_speech(audio: np.ndarray, threshold: float) -> bool:
    if threshold <= 0:
        return True
    return float(np.sqrt(np.mean(np.square(audio)))) >= threshold


def write_label_csv(path: str, result: LongformResult, tok: WhisperTokenizer):
    """{start,end,text} CSV, one row per segment (reference
    save_transcription_to_csv, initial_inference.py:48-54)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8", newline="") as f:
        w = csv.writer(f)
        w.writerow(["start", "end", "text"])
        for seg in result.segments:
            w.writerow([f"{seg.start:.3f}", f"{seg.end:.3f}", seg.text(tok)])


def label_files(
    params,
    config: WhisperConfig,
    tok: WhisperTokenizer,
    audio_paths: Sequence[str],
    output_dir: str,
    cfg: LabelConfig = LabelConfig(),
    policy: DtypePolicy = DtypePolicy(),
    *,
    mel_fn=None,
    log_every: int = 10,
) -> dict:
    """Transcribe each file to <output_dir>/<stem>.csv; returns stats."""
    os.makedirs(output_dir, exist_ok=True)
    done = 0
    skipped = 0
    audio_seconds = 0.0
    t0 = time.time()
    for i, path in enumerate(audio_paths):
        stem = os.path.splitext(os.path.basename(path))[0]
        out_csv = os.path.join(output_dir, f"{stem}.csv")
        if os.path.exists(out_csv):  # resumable (reference per-file try/except)
            skipped += 1
            continue
        try:
            audio = load_audio_16k(path)
        except Exception as e:  # tolerate unreadable files like the reference
            print(f"[label] failed to read {path}: {e}")
            continue
        if not energy_vad_is_speech(audio, cfg.energy_vad_threshold):
            write_label_csv(out_csv, LongformResult(segments=[]), tok)
            continue

        def decode_span(span_audio):
            if cfg.strategy == "chunked":
                return chunked_decode(
                    params, span_audio, config, tok, policy,
                    language=cfg.language, task=cfg.task,
                    batch_size=cfg.batch_size, chunk_s=cfg.chunk_s,
                    stride_s=cfg.stride_s, mel_fn=mel_fn,
                    quantize_cross_kv=cfg.quantize_kv,
                    num_beams=cfg.num_beams,
                )
            # no mel_fn: sequential_decode computes the full-file mel once
            # and needs arbitrary-length support (the fixed-30 s Pallas mel
            # kernel only fits the chunked path)
            return sequential_decode(
                params, span_audio, config, tok, policy,
                language=cfg.language, task=cfg.task,
                quantize_cross_kv=cfg.quantize_kv,
                num_beams=cfg.num_beams,
            )

        if cfg.vad_regions and cfg.vad_mode != "off":
            # decode only detected speech, shifting timestamps back to the
            # original timeline (the role of faster-whisper's VAD in stage 1)
            from .vad import detect_speech_regions

            segs = []
            for a, b_ in detect_speech_regions(audio, cfg.vad_mode):
                span = audio[int(a * 16000) : int(b_ * 16000)]
                r = decode_span(span)
                for s in r.segments:
                    s.start += a
                    s.end += a
                segs.extend(r.segments)
            res = LongformResult(segments=segs)
        else:
            res = decode_span(audio)
        write_label_csv(out_csv, res, tok)
        done += 1
        audio_seconds += len(audio) / 16000.0
        if log_every and done % log_every == 0:
            rate = audio_seconds / max(time.time() - t0, 1e-6)
            print(f"[label] {done}/{len(audio_paths)} files, "
                  f"{rate:.1f} audio-s/s")
    return {
        "files": done,
        "skipped": skipped,
        "audio_seconds": audio_seconds,
        "wall_seconds": time.time() - t0,
    }


def run_labelling(
    manifest_path: str,
    model_dir: str,
    output_dir: str,
    cfg: LabelConfig = LabelConfig(),
    tokenizer_dir: Optional[str] = None,
) -> dict:
    """CLI entry: shard the manifest over hosts and label this host's slice."""
    from ..models.io import load_model

    params, config = load_model(model_dir)
    tok = (
        WhisperTokenizer.from_pretrained_dir(tokenizer_dir)
        if tokenizer_dir
        else WhisperTokenizer()
    )
    manifest = read_manifest(manifest_path)
    paths = manifest.absolute_paths()
    shard = host_local_slice(len(paths))
    return label_files(
        params, config, tok, paths[shard], output_dir, cfg
    )
