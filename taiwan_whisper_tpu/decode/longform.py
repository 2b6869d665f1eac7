"""Long-form (>30 s) transcription: sequential and chunked strategies.

The reference scales long audio by chunking, never by sequence parallelism
(SURVEY.md §5): (a) sequential timestamp-window sliding with the OpenAI
temperature-fallback ladder (training/run_eval.py:659-676 delegates to HF
generate's seek loop), and (b) parallel chunked decode with stride overlap +
timestamp-stitch merge (flax pipeline.py:224-254,353-375). Both are
implemented here over the jit decode primitives; the host drives window
arithmetic (it is data-dependent), the device does everything else.

On TPU the chunked path is the throughput path: chunks across (and within)
files become one big data-parallel batch.
"""

from __future__ import annotations

import dataclasses
import zlib
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import N_SAMPLES, SAMPLE_RATE, log_mel, pad_or_trim
from ..models import whisper as M
from ..models.config import DtypePolicy, WhisperConfig
from ..text.tokenizer import TIME_PRECISION, SpecialTokens, WhisperTokenizer
from .beam import beam_decode
from .greedy import DecodeResult, greedy_decode
from .rules import DecodeRules


@dataclasses.dataclass
class TranscriptSegment:
    start: float  # absolute seconds
    end: float
    token_ids: List[int]  # text tokens only (no timestamps/specials)

    def text(self, tokenizer: WhisperTokenizer) -> str:
        return tokenizer.decode(self.token_ids, skip_special_tokens=True)


@dataclasses.dataclass
class LongformResult:
    segments: List[TranscriptSegment]

    def text(self, tokenizer: WhisperTokenizer) -> str:
        return "".join(s.text(tokenizer) for s in self.segments)


def _compression_ratio(data: bytes) -> float:
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def _tokens_to_segments(
    tokens: Sequence[int],
    special: SpecialTokens,
    window_offset: float,
    window_duration: float,
) -> Tuple[List[TranscriptSegment], float, bool]:
    """Split a window's sampled tokens into timestamped segments.

    Returns (segments, seek_advance_seconds, ended_with_single_timestamp).
    Mirrors the OpenAI/HF window-consumption rules: segments end at
    consecutive timestamp pairs; a single trailing timestamp moves the seek
    to that timestamp; no trailing timestamp consumes the whole window.
    """
    tb = special.timestamp_begin
    is_ts = [t >= tb for t in tokens]
    # indices where a timestamp directly follows another timestamp (pair
    # boundary: first closes a segment, second opens the next)
    pair_pos = [
        i for i in range(1, len(tokens)) if is_ts[i] and is_ts[i - 1]
    ]
    segments: List[TranscriptSegment] = []

    limit = window_offset + window_duration

    def emit(start_tok: int, end_tok: int, text_ids: Sequence[int]):
        # clamp to the true window extent: the model can emit timestamps past
        # the end of (padded) audio
        segments.append(
            TranscriptSegment(
                start=min(window_offset + special.timestamp_seconds(start_tok), limit),
                end=min(window_offset + special.timestamp_seconds(end_tok), limit),
                token_ids=[t for t in text_ids if t < special.eot],
            )
        )

    if pair_pos:
        last_slice = 0
        for p in pair_pos:
            seg_toks = tokens[last_slice:p]
            ts_in = [t for t in seg_toks if t >= tb]
            if ts_in:
                emit(ts_in[0], seg_toks[-1] if seg_toks[-1] >= tb else ts_in[-1],
                     seg_toks)
            last_slice = p
        last_ts = tokens[pair_pos[-1] - 1]
        advance = special.timestamp_seconds(last_ts)
        # trailing tokens after the final pair are re-decoded next window
        return segments, max(advance, TIME_PRECISION), False

    # no pair boundary: one segment covering the window
    ts_in = [t for t in tokens if t >= tb]
    single_trailing = len(tokens) > 0 and tokens[-1] >= tb and (
        len(tokens) < 2 or tokens[-2] < tb
    )
    if ts_in:
        start_tok = ts_in[0]
        if single_trailing:
            end_tok = tokens[-1]
            emit(start_tok, end_tok, tokens)
            return segments, special.timestamp_seconds(end_tok) or window_duration, True
        end_tok = ts_in[-1]
        emit(start_tok, end_tok, tokens)
    elif tokens:
        segments.append(
            TranscriptSegment(
                start=window_offset,
                end=window_offset + window_duration,
                token_ids=[t for t in tokens if t < special.eot],
            )
        )
    return segments, window_duration, False


def sequential_decode(
    params,
    audio: np.ndarray,  # [T] float32 16 kHz
    config: WhisperConfig,
    tokenizer: WhisperTokenizer,
    policy: DtypePolicy = DtypePolicy(),
    *,
    language: str = "zh",
    task: str = "transcribe",
    temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_prev: bool = True,
    max_prompt_tokens: int = 223,
    mel_fn: Optional[Callable] = None,
    seed: int = 0,
    quantize_cross_kv: bool = False,
    num_beams: int = 1,
    length_penalty: float = 1.0,
) -> LongformResult:
    """OpenAI-style sequential long-form decode of one audio stream.

    The device function (mel -> encode -> prefilled decode) is jitted
    once per prefix length; the host slides the window using timestamp
    arithmetic and runs the temperature-fallback ladder
    (reference controls: run_eval.py:659-676).

    With ``num_beams > 1`` the temperature-0.0 rung runs beam search and the
    fallback rungs sample, matching faster-whisper/OpenAI semantics
    (beam_size applies at t=0, best_of sampling above — the teacher decode
    quality knob of pseudo-labelling/initial_inference.py:84-90).
    """
    special = tokenizer.special
    rules = DecodeRules.from_special(special, timestamps=True)
    mel_fn = mel_fn or (lambda a: log_mel(a, config.num_mel_bins))
    # window length follows the model context (30 s for published models)
    n_window = config.max_source_positions * 2 * 160

    # jit per (prefix_len, temperature): temperature is a python float baked
    # into the trace, so each ladder rung compiles once and is then cached
    _cache = {}

    def run_decode(audio_chunk, prefix_arr, temperature, rng, sot_index):
        key = (prefix_arr.shape[1], float(temperature))
        if key not in _cache:
            use_beam = num_beams > 1 and float(temperature) == 0.0

            def fn(audio_chunk, prefix, rng, _t=float(temperature), _si=sot_index):
                mel = mel_fn(audio_chunk[None])
                enc = M.encode(params, mel, config, policy)
                if use_beam:
                    return beam_decode(
                        params, enc, prefix, config, rules, policy,
                        num_beams=num_beams, length_penalty=length_penalty,
                        sot_index=_si, quantize_cross_kv=quantize_cross_kv,
                    )
                return greedy_decode(
                    params, enc, prefix, config, rules, policy,
                    temperature=_t, rng=rng, sot_index=_si,
                    quantize_cross_kv=quantize_cross_kv,
                )
            _cache[key] = jax.jit(fn)
        return _cache[key](audio_chunk, prefix_arr, rng)

    sot_seq = tokenizer.sot_sequence(language, task, timestamps=True)
    total = len(audio)
    seek = 0
    all_segments: List[TranscriptSegment] = []
    prompt_tokens: List[int] = []
    rng = jax.random.PRNGKey(seed)

    while seek < total:
        window = audio[seek : seek + n_window]
        window_duration = len(window) / SAMPLE_RATE
        chunk = pad_or_trim(window.astype(np.float32), n_window)

        if condition_on_prev and prompt_tokens:
            prefix_list = tokenizer.prompt_ids(prompt_tokens, max_prompt_tokens) + sot_seq
            sot_index = len(prefix_list) - len(sot_seq)
        else:
            prefix_list = list(sot_seq)
            sot_index = 0
        prefix_arr = jnp.asarray([prefix_list], jnp.int32)

        chosen: Optional[DecodeResult] = None
        chosen_tokens: List[int] = []
        for temperature in temperatures:
            rng, sub = jax.random.split(rng)
            res = run_decode(chunk, prefix_arr, temperature, sub, sot_index)
            toks = np.asarray(res.tokens)[0]
            n_sampled = int(np.asarray(res.lengths)[0])
            sampled = toks[len(prefix_list) : len(prefix_list) + n_sampled].tolist()
            avg_logprob = float(np.asarray(res.sum_logprobs)[0]) / (n_sampled + 1)

            needs_fallback = False
            if compression_ratio_threshold is not None:
                if tokenizer.vocab is not None:
                    text = tokenizer.decode(sampled, skip_special_tokens=True)
                    ratio = _compression_ratio(text.encode("utf-8"))
                else:
                    ratio = _compression_ratio(
                        np.asarray(sampled, np.int32).tobytes()
                    )
                if ratio > compression_ratio_threshold:
                    needs_fallback = True
            if logprob_threshold is not None and avg_logprob < logprob_threshold:
                needs_fallback = True
            if (
                no_speech_threshold is not None
                and float(np.asarray(res.no_speech_probs)[0]) > no_speech_threshold
                and (logprob_threshold is None or avg_logprob < logprob_threshold)
            ):
                # confident silence: skip the window entirely
                chosen = res
                chosen_tokens = []
                break
            chosen = res
            chosen_tokens = sampled
            if not needs_fallback:
                break

        if not chosen_tokens:
            seek += n_window
            continue

        segments, advance_s, _ = _tokens_to_segments(
            chosen_tokens, special, seek / SAMPLE_RATE, window_duration
        )
        all_segments.extend(segments)
        prompt_tokens.extend(
            t for t in chosen_tokens if t < special.eot
        )
        prompt_tokens = prompt_tokens[-max_prompt_tokens:]
        seek += max(int(advance_s * SAMPLE_RATE), SAMPLE_RATE // 2)

    return LongformResult(segments=all_segments)


# ---------------------------------------------------------------------------
# chunked (parallel) long-form
# ---------------------------------------------------------------------------

def chunk_with_stride(
    audio: np.ndarray,
    chunk_s: float = 30.0,
    stride_left_s: float = 5.0,
    stride_right_s: float = 5.0,
) -> List[Tuple[np.ndarray, float, float, float]]:
    """(chunk audio padded to 30 s, offset_s, stride_left_s, stride_right_s)
    per chunk; step = chunk - strideL - strideR (reference:
    pipeline.py chunk_iter_with_batch:224-254)."""
    chunk_len = int(chunk_s * SAMPLE_RATE)
    step = chunk_len - int((stride_left_s + stride_right_s) * SAMPLE_RATE)
    assert step > 0
    out = []
    pos = 0
    total = len(audio)
    while True:
        start = max(pos - int(stride_left_s * SAMPLE_RATE), 0) if pos > 0 else 0
        chunk = audio[start : start + chunk_len]
        is_first = start == 0
        is_last = start + chunk_len >= total
        sl = 0.0 if is_first else stride_left_s
        sr = 0.0 if is_last else stride_right_s
        out.append((pad_or_trim(chunk.astype(np.float32), chunk_len),
                    start / SAMPLE_RATE, sl, sr))
        if is_last:
            break
        pos = start + chunk_len - int(stride_right_s * SAMPLE_RATE)
    return out


def chunked_decode(
    params,
    audio: np.ndarray,
    config: WhisperConfig,
    tokenizer: WhisperTokenizer,
    policy: DtypePolicy = DtypePolicy(),
    *,
    language: str = "zh",
    task: str = "transcribe",
    batch_size: int = 8,
    chunk_s: Optional[float] = None,
    stride_s: Optional[float] = None,
    mel_fn: Optional[Callable] = None,
    quantize_cross_kv: bool = False,
    num_beams: int = 1,
    length_penalty: float = 1.0,
) -> LongformResult:
    """Batched parallel chunked decode + timestamp-stitch merge.

    Each chunk keeps only the segments whose start lies inside its
    non-overlapped core [stride_left, chunk - stride_right); overlapped
    margins belong to the neighbouring chunk (the merge role of
    tokenizer._decode_asr in the reference, pipeline.py:353-375).

    ``num_beams > 1`` decodes every chunk with beam search — the teacher
    labelling quality setting (reference passes num_beams to generate,
    training/run_pseudo_labelling.py:858-866; faster-whisper defaults to
    beam 5, pseudo-labelling/initial_inference.py:84-90).
    """
    special = tokenizer.special
    rules = DecodeRules.from_special(special, timestamps=True)
    mel_fn = mel_fn or (lambda a: log_mel(a, config.num_mel_bins))
    sot_seq = tokenizer.sot_sequence(language, task, timestamps=True)
    if chunk_s is None:
        chunk_s = config.max_source_positions * 2 * 160 / SAMPLE_RATE
    if stride_s is None:
        stride_s = chunk_s / 6.0  # the reference default (pipeline.py:224)

    chunks = chunk_with_stride(audio, chunk_s, stride_s, stride_s)

    @jax.jit
    def decode_batch(audio_batch, prefix):
        mel = mel_fn(audio_batch)
        enc = M.encode(params, mel, config, policy)
        if num_beams > 1:
            return beam_decode(params, enc, prefix, config, rules, policy,
                               num_beams=num_beams,
                               length_penalty=length_penalty,
                               quantize_cross_kv=quantize_cross_kv)
        return greedy_decode(params, enc, prefix, config, rules, policy,
                             quantize_cross_kv=quantize_cross_kv)

    all_segments: List[TranscriptSegment] = []
    for i in range(0, len(chunks), batch_size):
        batch = chunks[i : i + batch_size]
        # pad the batch to a fixed size for compile stability
        # (reference pads to max batch, pipeline.py:394-396)
        pad_n = batch_size - len(batch)
        arr = np.stack([c[0] for c in batch] + [batch[-1][0]] * pad_n)
        prefix = jnp.asarray([sot_seq] * batch_size, jnp.int32)
        res = decode_batch(jnp.asarray(arr), prefix)
        tokens = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        for j, (chunk, offset, sl, sr) in enumerate(batch):
            sampled = tokens[j][len(sot_seq) : len(sot_seq) + int(lengths[j])].tolist()
            window_dur = min(chunk_s, len(audio) / SAMPLE_RATE - offset)
            segs, _, _ = _tokens_to_segments(sampled, special, offset, window_dur)
            lo = offset + sl
            hi = offset + chunk_s - sr
            for s in segs:
                if (s.start >= lo or sl == 0.0) and (s.start < hi or sr == 0.0):
                    all_segments.append(s)
    all_segments.sort(key=lambda s: s.start)
    return LongformResult(segments=all_segments)
