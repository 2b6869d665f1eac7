"""Stage 1: pseudo-labelling — teacher transcribes long-form audio.

TPU-native replacement for the reference's faster-whisper/CTranslate2 driver
(pseudo-labelling/initial_inference.py:56-122) and its Accelerate-DDP
variant (training/run_pseudo_labelling.py): the teacher runs as batched
chunked long-form decode on-device, files are sharded across hosts by
jax.process_index, and each audio file produces the same {start,end,text}
CSV the downstream segmenter consumes.

The chunked strategy runs a POOLED scheduler: 30 s chunks from all VAD
speech regions of all files are collected into one queue and decoded in
fixed knee-sized device batches (one jit loop), with host-side audio
load + VAD prefetched on threads — so a 5 s VAD region never occupies a
whole device batch by itself. Decoded segments are scattered back to
per-file CSVs in order. This is SURVEY §5's "chunk-parallel batch decode
across chips" applied within a chip; the per-region batching of the
reference lives in faster-whisper's BatchedInferencePipeline
(initial_inference.py:84-90) and HF pipeline's chunk iterator
(training/flax/distil_whisper/pipeline.py:224-254).

A lightweight energy VAD gates obviously-silent chunks before they reach the
device (the reference relies on faster-whisper's VAD model; here silence is
additionally caught on-device by the no-speech probe).
"""

from __future__ import annotations

import csv
import dataclasses
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np

from ..audio.io import load_audio_16k
from ..audio.manifest import read_manifest
from ..models.config import DtypePolicy, WhisperConfig
from ..parallel.mesh import host_local_slice
from ..text.tokenizer import WhisperTokenizer
from ..decode.longform import (
    LongformResult,
    TranscriptSegment,
    _tokens_to_segments,
    chunk_with_stride,
    chunked_decode,
    sequential_decode,
)


@dataclasses.dataclass
class LabelConfig:
    language: str = "zh"
    task: str = "transcribe"
    strategy: str = "chunked"  # | sequential
    # device batch of pooled 30 s chunks; default = the measured throughput
    # knee of the greedy labelling config on v5e (PERF.md)
    batch_size: int = 96
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
    # cross-KV quantization: 0/False off; True/8 int8; 4 int4; "fp8" e4m3
    # (int8 is the measured default recommendation — PERF.md)
    quantize_kv: object = False
    num_beams: int = 1  # >1: beam-search teacher decode (reference labels
    # with beam — run_pseudo_labelling.py:858-866, faster-whisper default 5)
    # chunked strategy only: pool chunks across VAD regions AND files into
    # full device batches (the shipping fast path); False falls back to
    # per-file chunked_decode calls (kept for A/B and debugging)
    pooled: bool = True
    io_threads: int = 2  # host-side load+VAD prefetch workers (pooled path)
    # wire format for host->device audio batches. "int16" halves the bytes
    # and is LOSSLESS for PCM16 wav/flac sources (load divides by 32768, the
    # wire multiplies back); measured 2x end-to-end on the transfer-bound
    # labelling path (PERF.md round 4). "float32" for float-native sources.
    wire_dtype: str = "int16"
    # transport architecture of the pooled path:
    #   "resident" — upload each file ONCE as flat int16 into device-resident
    #     group buffers; VAD scoring AND 30 s chunk gathers read the resident
    #     stream (pipeline/label_resident.py). Halves wire bytes again and
    #     removes host chunk stacking; supports spectral/off VAD.
    #   "chunks"  — stage stacked chunk batches per decode call.
    #   "auto"    — resident when eligible, else chunks.
    wire_mode: str = "auto"
    # device batches staged (uploaded) ahead of the decode loop so transfer
    # overlaps compute; 2 is enough to hide either side
    stage_depth: int = 2
    # cap sampled tokens per chunk (None = model max, 448). The labelling
    # throughput numbers in PERF.md use 192 — a realistic long-form budget
    max_decode_tokens: Optional[int] = None
    # speculative decoding: draft with a distilled student, verify with the
    # teacher (greedy-exact; measured in PERF.md "speculative"). Enabled by
    # passing assistant params via label_files(assistant=...) / cli
    # --assistant; batch is 1 per chunk, so this is a small-batch/low-latency
    # mode, not the pooled-throughput mode.
    speculative: bool = False
    num_draft_tokens: int = 5
    # resident path only: greedily pack multiple short VAD regions of a
    # file into single 30 s decode windows (separated by pack_separator_s
    # of silence) and map emitted timestamps back piecewise — lifts slot
    # utilization when speech regions are much shorter than 30 s (measured
    # 19.6 s/window on lecture fixtures). The reference's labeller packs
    # utterances the same way (run_pseudo_labelling.py concatenate_dataset).
    # OFF by default: packed windows place disjoint speech contexts in one
    # window, a (reference-sanctioned) label-semantics tradeoff.
    pack_regions: bool = False
    pack_separator_s: float = 0.2
    # resident path only: 120 s segments per device group buffer (None =
    # label_resident.CAP_SEGS, 32 min). Decode of a group's chunks can
    # only start once the group seals, so SMALLER groups pipeline ingest/
    # upload/VAD with decode. On the RTT-heavy dev tunnel this measured a
    # NON-lever (extra per-group round trips beat the overlap win,
    # PERF.md round 5); kept as a tuning knob for PCIe hosts.
    group_segs: Optional[int] = None


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


@dataclasses.dataclass
class _ChunkTask:
    """One padded 30 s chunk awaiting decode, tagged for scatter-back.

    Offsets stay REGION-RELATIVE and the region start is applied as a
    post-shift — the same float-op order as the per-file path
    (chunked_decode then `s.start += region_start`), so CSV timestamps are
    bit-identical between the two drivers."""

    file_idx: int
    audio: np.ndarray  # [chunk_len] fp32, padded
    region_start: float  # seconds of the VAD region in the source file
    offset: float  # seconds of this chunk WITHIN the region
    stride_left: float
    stride_right: float
    window_duration: float  # unpadded seconds in this chunk


def _file_to_tasks(
    file_idx: int, audio: np.ndarray, cfg: LabelConfig,
    chunk_s: float, stride_s: float, regions=None,
) -> List[_ChunkTask]:
    """Host-side prep of one file: VAD regions -> strided chunks.

    Chunk offsets stay REGION-relative (``offset`` counts seconds within
    the region); the consumer applies ``region_start`` as a post-shift when
    scattering segments back (see _ChunkTask), so the in-window stride
    arithmetic is identical to chunked_decode's core-region merge
    (decode/longform.py). ``regions`` injects precomputed VAD regions (the
    pooled driver's batched device scorer)."""
    from ..audio.mel import SAMPLE_RATE

    if regions is None:
        if cfg.vad_regions and cfg.vad_mode != "off":
            from .vad import detect_speech_regions

            regions = detect_speech_regions(audio, cfg.vad_mode)
        else:
            regions = [(0.0, len(audio) / SAMPLE_RATE)]
    tasks: List[_ChunkTask] = []
    for a, b in regions:
        span = audio[int(a * SAMPLE_RATE): int(b * SAMPLE_RATE)]
        if len(span) == 0:
            continue
        for chunk, off, sl, sr in chunk_with_stride(
            span, chunk_s, stride_s, stride_s
        ):
            dur = min(chunk_s, len(span) / SAMPLE_RATE - off)
            tasks.append(_ChunkTask(file_idx, chunk, a, off, sl, sr, dur))
    return tasks



# Jitted staged-path decode programs cached across label_files calls —
# rebuilding the @jax.jit closure per call re-pays Python tracing + MLIR
# lowering (~18 s at large-v2 full-unroll; measured on the resident path,
# same mechanism here). Key is the frozen static signature; ``use_pallas``
# stands in for the mel_fn choice (custom mel_fn callers bypass the cache).
_decode_batch_cache: dict = {}


def _get_decode_batch(config, policy, rules, num_beams, quantize_kv,
                      max_len, use_pallas):
    key = (config, policy, rules, num_beams, quantize_kv, max_len,
           use_pallas)
    cached = _decode_batch_cache.get(key)
    if cached is not None:
        return cached
    import jax
    import jax.numpy as jnp

    from ..audio.mel import log_mel
    from ..decode.beam import beam_decode
    from ..decode.greedy import greedy_decode
    from ..models import whisper as M

    # params is an explicit argument (NOT a closure): closed-over arrays
    # are baked into the lowered program as constants, which bloats the
    # compile payload past the remote-compile tunnel's request limit at
    # real model sizes (observed as HTTP 413 at whisper-base) and
    # forfeits donation
    @jax.jit
    def decode_batch(params, audio_batch, prefix):
        if audio_batch.dtype == jnp.int16:  # int16 wire -> f32 on device
            audio_batch = audio_batch.astype(jnp.float32) / 32768.0
        if use_pallas:
            from ..ops.mel_kernel import log_mel_pallas

            mel = log_mel_pallas(audio_batch, config.num_mel_bins)
        else:
            mel = log_mel(audio_batch, config.num_mel_bins)
        enc = M.encode(params, mel, config, policy)
        if num_beams > 1:
            return beam_decode(
                params, enc, prefix, config, rules, policy,
                num_beams=num_beams, max_len=max_len,
                quantize_cross_kv=quantize_kv,
            )
        return greedy_decode(
            params, enc, prefix, config, rules, policy, max_len=max_len,
            quantize_cross_kv=quantize_kv,
        )

    _decode_batch_cache[key] = decode_batch
    return decode_batch


def _label_files_pooled(
    params,
    config: WhisperConfig,
    tok: WhisperTokenizer,
    audio_paths: Sequence[str],
    output_dir: str,
    cfg: LabelConfig,
    policy: DtypePolicy,
    *,
    mel_fn=None,
    log_every: int = 10,
) -> dict:
    """The chunk-queue scheduler: every file's VAD-region chunks feed one
    shared queue; the device sees only full ``batch_size`` batches through a
    single jit'd mel->encode->decode function; segments scatter back to
    per-file CSVs. File loading + VAD run ahead on ``io_threads`` threads."""
    import jax
    import jax.numpy as jnp

    from ..audio.mel import N_SAMPLES, SAMPLE_RATE, log_mel
    from ..decode.beam import beam_decode
    from ..decode.greedy import greedy_decode
    from ..decode.rules import DecodeRules
    from ..models import whisper as M

    special = tok.special
    rules = DecodeRules.from_special(special, timestamps=True)
    sot_seq = tok.sot_sequence(cfg.language, cfg.task, timestamps=True)
    chunk_s = cfg.chunk_s or config.max_source_positions * 2 * 160 / SAMPLE_RATE
    stride_s = cfg.stride_s if cfg.stride_s is not None else chunk_s / 6.0
    chunk_len = int(chunk_s * SAMPLE_RATE)
    bs = cfg.batch_size
    max_len = (len(sot_seq) + cfg.max_decode_tokens
               if cfg.max_decode_tokens else None)

    prefix = jnp.asarray([sot_seq] * bs, jnp.int32)

    if mel_fn is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and chunk_len == N_SAMPLES)
        decode_batch = _get_decode_batch(
            config, policy, rules, cfg.num_beams, cfg.quantize_kv,
            max_len, use_pallas)
    else:
        # custom mel frontend: uncacheable closure, built per call
        @jax.jit
        def decode_batch(params, audio_batch, prefix):
            if audio_batch.dtype == jnp.int16:
                audio_batch = audio_batch.astype(jnp.float32) / 32768.0
            mel = mel_fn(audio_batch)
            enc = M.encode(params, mel, config, policy)
            if cfg.num_beams > 1:
                return beam_decode(
                    params, enc, prefix, config, rules, policy,
                    num_beams=cfg.num_beams, max_len=max_len,
                    quantize_cross_kv=cfg.quantize_kv,
                )
            return greedy_decode(
                params, enc, prefix, config, rules, policy,
                max_len=max_len, quantize_cross_kv=cfg.quantize_kv,
            )

    # per-file bookkeeping: segments land here as their batches complete
    states: dict = {}  # file_idx -> {segments, remaining, produced, out_csv}
    buffer: List[_ChunkTask] = []
    stats = dict(files=0, skipped=0, failed=0, audio_seconds=0.0,
                 chunks=0, batches=0, pad_slots=0,
                 # phase timers (seconds of MAIN-thread wall)
                 vad_s=0.0, decode_s=0.0, stage_wait_s=0.0, load_wait_s=0.0,
                 scatter_s=0.0)
    t0 = time.time()

    def finish_file(idx):
        st = states.pop(idx)
        st["segments"].sort(key=lambda s: s.start)
        write_label_csv(st["out_csv"], LongformResult(st["segments"]), tok)
        stats["files"] += 1
        if log_every and stats["files"] % log_every == 0:
            rate = stats["audio_seconds"] / max(time.time() - t0, 1e-6)
            print(f"[label] {stats['files']} files, {rate:.1f} audio-s/s")

    # staging: a dedicated thread stacks each batch in the wire dtype and
    # device_puts it so the host->device transfer of batch N+1 overlaps the
    # decode of batch N (the transfer is the measured bottleneck of the
    # real driver on tunneled chips — PERF.md round 4)
    from collections import deque

    stage_pool = ThreadPoolExecutor(max_workers=1)
    staged: "deque" = deque()  # (batch, future-of-device-array)

    def _stack_and_put(batch: List[_ChunkTask]):
        pad_n = bs - len(batch)
        arr = np.stack([t.audio for t in batch] + [batch[-1].audio] * pad_n)
        if cfg.wire_dtype == "int16":
            arr = np.clip(np.round(arr * 32768.0), -32768, 32767
                          ).astype(np.int16)
        dev = jax.device_put(arr)
        dev.block_until_ready()  # force the transfer HERE, in the staging
        # thread — otherwise the lazy upload fires inside the decode
        # dispatch and serializes with compute on the main thread
        return dev

    def process_oldest():
        batch, fut = staged.popleft()
        tw = time.perf_counter()
        dev_arr = fut.result()
        stats["stage_wait_s"] += time.perf_counter() - tw
        td = time.perf_counter()
        res = decode_batch(params, dev_arr, prefix)
        tokens = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        stats["decode_s"] += time.perf_counter() - td
        stats["batches"] += 1
        stats["pad_slots"] += bs - len(batch)
        ts = time.perf_counter()
        for j, t in enumerate(batch):
            sampled = tokens[j][
                len(sot_seq): len(sot_seq) + int(lengths[j])
            ].tolist()
            segs, _, _ = _tokens_to_segments(
                sampled, special, t.offset, t.window_duration
            )
            lo = t.offset + t.stride_left
            hi = t.offset + chunk_s - t.stride_right
            st = states[t.file_idx]
            for s in segs:
                if (s.start >= lo or t.stride_left == 0.0) and (
                    s.start < hi or t.stride_right == 0.0
                ):
                    s.start += t.region_start  # post-shift: per-file order
                    s.end += t.region_start
                    st["segments"].append(s)
            st["remaining"] -= 1
            if st["remaining"] == 0 and st["produced"]:
                finish_file(t.file_idx)
        stats["scatter_s"] += time.perf_counter() - ts

    def drain(force=False):
        while len(buffer) >= bs or (force and buffer):
            batch = buffer[:bs]
            del buffer[:bs]
            staged.append((batch, stage_pool.submit(_stack_and_put, batch)))
            while len(staged) > max(cfg.stage_depth, 1):
                process_oldest()
        while force and staged:
            process_oldest()

    # device-batched VAD: spectral scoring on TPU backends goes through
    # spectral_regions_device_batch so MANY files share one device dispatch
    # (per-file calls cost a tunnel RTT each — measured 0.39 s/file vs
    # ~0.03 s of work); host scorers stay in the producer threads
    from .vad import _VAD_SEG_SAMPLES, _VAD_CALL_SEGS, resolve_vad_mode

    vad_mode = (resolve_vad_mode(cfg.vad_mode)
                if cfg.vad_regions else "off")
    batched_vad = vad_mode == "spectral-device"

    def load_one(item):
        idx, path = item
        try:
            audio = load_audio_16k(path)
        except Exception as e:  # tolerate unreadable files (reference does)
            return idx, None, 0.0, f"{e}"
        if not energy_vad_is_speech(audio, cfg.energy_vad_threshold):
            return idx, [], len(audio) / 16000.0, None
        if batched_vad:
            return idx, audio, len(audio) / 16000.0, None  # VAD later
        tasks = _file_to_tasks(idx, audio, cfg, chunk_s, stride_s)
        return idx, tasks, len(audio) / 16000.0, None

    todo = []
    for idx, path in enumerate(audio_paths):
        stem = os.path.splitext(os.path.basename(path))[0]
        out_csv = os.path.join(output_dir, f"{stem}.csv")
        if os.path.exists(out_csv):  # resumable, like the per-file path
            stats["skipped"] += 1
            continue
        todo.append((idx, path))
        states[idx] = dict(segments=[], remaining=0, produced=False,
                           out_csv=out_csv)

    def ingest_tasks(idx, tasks):
        st = states[idx]
        st["remaining"] = len(tasks)
        st["produced"] = True
        if not tasks:  # no speech anywhere: empty CSV now
            finish_file(idx)
            return
        buffer.extend(tasks)
        stats["chunks"] += len(tasks)
        drain()

    vad_pending: List = []  # (idx, audio) awaiting a batched VAD call
    vad_pending_segs = 0

    def flush_vad(force=False):
        nonlocal vad_pending, vad_pending_segs
        if not vad_pending:
            return
        if not force and vad_pending_segs < _VAD_CALL_SEGS:
            return
        from .vad import spectral_regions_device_batch

        tv = time.perf_counter()
        regions_list = spectral_regions_device_batch(
            [a for _, a in vad_pending])
        stats["vad_s"] += time.perf_counter() - tv
        for (idx, audio), regions in zip(vad_pending, regions_list):
            ingest_tasks(idx, _file_to_tasks(
                idx, audio, cfg, chunk_s, stride_s, regions=regions))
        vad_pending, vad_pending_segs = [], 0

    # bounded look-ahead: io_threads workers prep files while the device
    # decodes; completed files enter the queue in submission order so CSVs
    # appear deterministically
    with ThreadPoolExecutor(max_workers=max(cfg.io_threads, 1)) as pool, \
            stage_pool:
        inflight = []
        it = iter(todo)

        def top_up():
            while len(inflight) < max(cfg.io_threads, 1) * 2:
                try:
                    item = next(it)
                except StopIteration:
                    return
                inflight.append(pool.submit(load_one, item))

        top_up()
        while inflight:
            tl = time.perf_counter()
            idx, payload, secs, err = inflight.pop(0).result()
            stats["load_wait_s"] += time.perf_counter() - tl
            top_up()
            if payload is None:
                print(f"[label] failed to read {audio_paths[idx]}: {err}")
                states.pop(idx)
                stats["failed"] += 1
                continue
            stats["audio_seconds"] += secs
            if batched_vad and isinstance(payload, np.ndarray):
                vad_pending.append((idx, payload))
                vad_pending_segs += max(
                    -(-len(payload) // _VAD_SEG_SAMPLES), 1)
                flush_vad()
            else:
                ingest_tasks(idx, payload)
        flush_vad(force=True)
        drain(force=True)

    assert not states, f"unfinished files: {sorted(states)}"
    stats["wall_seconds"] = time.time() - t0
    return stats


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
    assistant=None,  # (params, config) draft model for cfg.speculative
) -> dict:
    """Transcribe each file to <output_dir>/<stem>.csv; returns stats."""
    os.makedirs(output_dir, exist_ok=True)
    if (cfg.strategy == "chunked" and cfg.pooled
            and not (cfg.speculative and assistant is not None)):
        resident_ok = (
            cfg.wire_mode in ("auto", "resident")
            and mel_fn is None
            and (not cfg.vad_regions
                 or cfg.vad_mode in ("spectral", "spectral-device", "off"))
        )
        if cfg.wire_mode == "resident" or (
            cfg.wire_mode == "auto" and resident_ok
        ):
            if resident_ok:
                from .label_resident import label_files_resident

                return label_files_resident(
                    params, config, tok, audio_paths, output_dir, cfg,
                    policy, log_every=log_every,
                )
            raise ValueError(
                "wire_mode='resident' requires spectral/off VAD and the "
                "default mel path")
        return _label_files_pooled(
            params, config, tok, audio_paths, output_dir, cfg, policy,
            mel_fn=mel_fn, log_every=log_every,
        )
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
            if cfg.speculative and assistant is not None:
                return _speculative_chunked(
                    params, config, assistant, span_audio, tok, policy, cfg
                )
            if cfg.strategy == "chunked":
                return chunked_decode(
                    params, span_audio, config, tok, policy,
                    language=cfg.language, task=cfg.task,
                    batch_size=cfg.batch_size, chunk_s=cfg.chunk_s,
                    stride_s=cfg.stride_s, mel_fn=mel_fn,
                    quantize_cross_kv=cfg.quantize_kv,
                    num_beams=cfg.num_beams,
                    max_decode_tokens=cfg.max_decode_tokens,
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
            segs.sort(key=lambda s: s.start)  # CSV is globally time-ordered
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


def _speculative_chunked(
    params, config, assistant, audio, tok, policy, cfg: LabelConfig
) -> LongformResult:
    """Chunked long-form labelling via speculative decoding (batch 1 per
    chunk): the assistant (distilled student) drafts, the teacher verifies —
    greedy-exact vs plain teacher decode (decode/speculative.py). Counterpart
    of the reference's assistant-model generate (run_eval.py:524-545)."""
    import jax
    import jax.numpy as jnp

    from ..audio.mel import SAMPLE_RATE, log_mel
    from ..decode.rules import DecodeRules
    from ..decode.speculative import speculative_decode
    from ..models import whisper as M

    a_params, a_config = assistant
    special = tok.special
    rules = DecodeRules.from_special(special, timestamps=True)
    sot_seq = tok.sot_sequence(cfg.language, cfg.task, timestamps=True)
    chunk_s = cfg.chunk_s or config.max_source_positions * 2 * 160 / SAMPLE_RATE
    stride_s = cfg.stride_s if cfg.stride_s is not None else chunk_s / 6.0
    max_len = (len(sot_seq) + cfg.max_decode_tokens
               if cfg.max_decode_tokens else None)
    shared_encoder = a_config.d_model == config.d_model and (
        a_config.encoder_layers == config.encoder_layers
    )

    # params are explicit jit arguments (closure constants overflow the
    # remote-compile payload at real model sizes — see _label_files_pooled)
    @jax.jit
    def spec_one(params, a_params, chunk):
        mel = log_mel(chunk[None], config.num_mel_bins)
        t_enc = M.encode(params, mel, config, policy)
        if shared_encoder:
            s_enc = t_enc  # distilled students share the teacher encoder
        else:
            a_mel = log_mel(chunk[None], a_config.num_mel_bins)
            s_enc = M.encode(a_params, a_mel, a_config, policy)
        prefix = jnp.asarray([sot_seq], jnp.int32)
        return speculative_decode(
            params, config, a_params, a_config, t_enc, s_enc, prefix,
            rules, policy, num_draft_tokens=cfg.num_draft_tokens,
            max_len=max_len,
        )

    segments: List[TranscriptSegment] = []
    accept_rates = []
    for chunk, offset, sl, sr in chunk_with_stride(audio, chunk_s,
                                                   stride_s, stride_s):
        res = spec_one(params, a_params, jnp.asarray(chunk))
        sampled = np.asarray(res.tokens)[0][
            len(sot_seq): len(sot_seq) + int(res.length)
        ].tolist()
        accept_rates.append(float(res.draft_accept_rate))
        window_dur = min(chunk_s, len(audio) / SAMPLE_RATE - offset)
        segs, _, _ = _tokens_to_segments(sampled, special, offset, window_dur)
        lo, hi = offset + sl, offset + chunk_s - sr
        for s in segs:
            if (s.start >= lo or sl == 0.0) and (s.start < hi or sr == 0.0):
                segments.append(s)
    segments.sort(key=lambda s: s.start)
    out = LongformResult(segments=segments)
    out.draft_accept_rate = (  # type: ignore[attr-defined]
        float(np.mean(accept_rates)) if accept_rates else 0.0
    )
    return out


def run_labelling(
    manifest_path: str,
    model_dir: str,
    output_dir: str,
    cfg: LabelConfig = LabelConfig(),
    tokenizer_dir: Optional[str] = None,
    assistant_dir: Optional[str] = None,
    validation_manifest: Optional[str] = None,
) -> dict:
    """CLI entry: shard the manifest over hosts and label this host's slice.

    ``assistant_dir`` loads a draft model and switches on speculative
    decoding (cfg.speculative is implied). ``validation_manifest`` points at
    a labelled split (manifest with transcript sidecars): after labelling,
    live CER/MER of the pseudo-labels against ground truth is computed and
    returned — the label-quality meter of the reference's distributed
    labeller (training/run_pseudo_labelling.py:808,959-979)."""
    from ..models.io import load_model

    params, config = load_model(model_dir)
    tok = (
        WhisperTokenizer.from_pretrained_dir(tokenizer_dir)
        if tokenizer_dir
        else WhisperTokenizer()
    )
    assistant = None
    if assistant_dir:
        assistant = load_model(assistant_dir)
        cfg = dataclasses.replace(cfg, speculative=True)
    manifest = read_manifest(manifest_path)
    paths = manifest.absolute_paths()
    shard = host_local_slice(len(paths))
    stats = label_files(
        params, config, tok, paths[shard], output_dir, cfg,
        assistant=assistant,
    )
    if validation_manifest:
        stats["validation"] = validate_labels(
            params, config, tok, validation_manifest, output_dir, cfg,
            assistant=assistant,
        )
    return stats


def validate_labels(
    params,
    config: WhisperConfig,
    tok: WhisperTokenizer,
    validation_manifest: str,
    output_dir: str,
    cfg: LabelConfig,
    assistant=None,
) -> dict:
    """Label a ground-truth split and score the pseudo-labels against it.

    The reference's labeller computes CER on validation splits during the
    run (run_pseudo_labelling.py:808,959-979 — `evaluate.load("cer")` over
    gathered predictions); here the validation files go through the SAME
    labelling path as production files and the resulting CSV text is scored
    with MixErrorRate (MER + EN-WER + ZH-CER, the repo's richer metric).
    Returns {mer, en_wer, zh_cer, n_files}."""
    from ..text.metrics import MixErrorRate
    from ..text.normalizer import BasicTextNormalizer
    from ..text.tokenizer import strip_markers

    vman = read_manifest(validation_manifest)
    v_audio = vman.absolute_paths()
    v_txt = vman.transcript_paths()
    val_dir = os.path.join(output_dir, "validation")
    os.makedirs(val_dir, exist_ok=True)
    label_files(params, config, tok, v_audio, val_dir, cfg,
                assistant=assistant, log_every=0)
    normalizer = BasicTextNormalizer()
    preds, refs = [], []
    for apath, tpath in zip(v_audio, v_txt):
        stem = os.path.splitext(os.path.basename(apath))[0]
        csv_path = os.path.join(val_dir, f"{stem}.csv")
        if not (os.path.exists(csv_path) and os.path.exists(tpath)):
            continue
        with open(csv_path, encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        preds.append(normalizer("".join(r["text"] for r in rows)))
        with open(tpath, encoding="utf-8") as f:
            # transcript sidecar: first line is the text (markers stripped)
            refs.append(normalizer(strip_markers(f.readline().strip())))
    if not preds:
        return {"mer": None, "n_files": 0}
    scores = MixErrorRate(separate_language=True).compute(preds, refs)
    return {
        "mer": scores["MER"],
        "en_wer": scores["EN WER"],
        "zh_cer": scores["ZH CER"],
        "n_files": len(preds),
    }
