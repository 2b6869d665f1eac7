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
    # the raw sampled slice including timestamp tokens — what HF keeps in
    # segment["tokens"] and conditions the next window on
    raw_token_ids: Optional[List[int]] = None

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
    Token-exact mirror of the OpenAI/HF window-consumption rules
    (transformers WhisperGenerationMixin._retrieve_segment, which the
    reference's eval path delegates to via training/run_eval.py:659-676):

    * segment boundaries are CONSECUTIVE timestamp pairs;
    * a single trailing timestamp ("no speech after it") consumes the WHOLE
      window — the seek does NOT move back to that timestamp;
    * with pairs but no single trailing timestamp, the seek advances to the
      closing timestamp of the last complete segment and trailing tokens are
      re-decoded in the next window;
    * with no pairs at all, the whole decoding is one segment and the window
      is consumed.
    """
    tokens = list(tokens)
    tb = special.timestamp_begin
    is_ts = [t >= tb for t in tokens]
    segments: List[TranscriptSegment] = []

    # a single timestamp at the very end means "no speech after it"
    single_ending = len(tokens) >= 2 and not is_ts[-2] and is_ts[-1]
    # indices one past each consecutive-timestamp boundary
    slices = [i + 1 for i in range(len(tokens) - 1) if is_ts[i] and is_ts[i + 1]]

    def emit(start_tok: int, end_tok: int, raw: Sequence[int]):
        segments.append(
            TranscriptSegment(
                start=window_offset + special.timestamp_seconds(start_tok),
                end=window_offset + special.timestamp_seconds(end_tok),
                token_ids=[t for t in raw if t < special.eot],
                raw_token_ids=list(raw),
            )
        )

    if slices:
        if single_ending:
            slices.append(len(tokens))
        else:
            # include the duplicated closing timestamp in the last segment
            slices[-1] += 1
        last_slice = 0
        for i, cur in enumerate(slices):
            seg = tokens[last_slice:cur]
            is_last = i == len(slices) - 1
            start_tok = seg[0] if seg[0] >= tb else tb
            end_tok = seg[-1] if (not is_last or single_ending) else seg[-2]
            emit(start_tok, end_tok if end_tok >= tb else tb, seg)
            last_slice = cur
        if single_ending:
            return segments, window_duration, True
        # seek to the closing timestamp of the last complete segment;
        # tokens after it are thrown away and re-decoded next window
        advance = special.timestamp_seconds(tokens[last_slice - 2])
        return segments, max(advance, TIME_PRECISION), False

    # no consecutive timestamps: the whole decoding is one segment and the
    # window is consumed; its end comes from the last timestamp if present
    ts_in = [t for t in tokens if t >= tb]
    end = window_duration
    if ts_in and ts_in[-1] != tb:
        end = special.timestamp_seconds(ts_in[-1])
    if tokens:
        segments.append(
            TranscriptSegment(
                start=window_offset,
                end=window_offset + end,
                token_ids=[t for t in tokens if t < special.eot],
                raw_token_ids=tokens,
            )
        )
    return segments, window_duration, single_ending


def _prompt_from_segments(
    segments: Sequence[TranscriptSegment],
    special: SpecialTokens,
    max_prompt_tokens: int,
) -> List[int]:
    """Previous-context tokens for condition-on-prev, HF-exact
    (transformers _pad_to_max_length with skip_ending_double_timestamps):
    each segment contributes its RAW tokens (timestamps included) minus a
    duplicated closing timestamp; the concatenation is cut to the last
    ``max_prompt_tokens`` and prefixed with <|startofprev|>."""
    tb = special.timestamp_begin
    out: List[int] = []
    for s in segments:
        raw = s.raw_token_ids if s.raw_token_ids is not None else s.token_ids
        if len(raw) > 2 and raw[-2] >= tb:
            raw = raw[:-1]  # segment ended with two timestamps: keep one
        out.extend(raw)
    return [special.sot_prev] + out[-max_prompt_tokens:]


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
    quantize_cross_kv=0,  # 0/False off; True/8 int8; 4 int4; "fp8" e4m3
    num_beams: int = 1,
    length_penalty: float = 1.0,
    tail_pad: str = "zeros",  # "zeros" (HF feature-pad) | "silence" (OpenAI)
) -> LongformResult:
    """OpenAI-style sequential long-form decode of one audio stream,
    segment/seek-exact against HF WhisperGenerationMixin's long-form
    generate (the engine behind the reference's sequential eval mode,
    training/run_eval.py:659-676); parity-tested in
    tests/test_longform_parity.py.

    The log-mel is computed ONCE over the whole audio (+30 s zero tail) and
    windows are sliced in mel-frame domain — both HF and OpenAI seek on
    frames of the precomputed features, and per-window STFT edge effects
    would otherwise break token parity. ``mel_fn`` must therefore accept
    arbitrary-length audio (the default XLA log_mel does; the fixed-30 s
    Pallas mel kernel is for the batched chunked path).

    The device function (encode -> prefilled decode) is jitted once per
    (prefix length, temperature) and cached; the host slides the window
    with timestamp arithmetic and runs the temperature-fallback ladder.

    With ``num_beams > 1`` the temperature-0.0 rung runs beam search and the
    fallback rungs sample, matching faster-whisper/OpenAI semantics
    (beam_size applies at t=0, best_of sampling above — the teacher decode
    quality knob of pseudo-labelling/initial_inference.py:84-90).
    """
    special = tokenizer.special
    rules = DecodeRules.from_special(special, timestamps=True)
    mel_fn = mel_fn or (lambda a: log_mel(a, config.num_mel_bins))
    n_window_frames = config.max_source_positions * 2  # 3000 for 30 s models
    frames_per_s = SAMPLE_RATE // 160  # 100

    # feature extraction: one pass over audio + one window of zero padding
    content_frames = len(audio) // 160
    padded = np.zeros(
        (content_frames + n_window_frames) * 160, np.float32
    )
    padded[: len(audio)] = audio
    mel_full = np.asarray(mel_fn(jnp.asarray(padded[None])))  # [1, F, bins]

    # jit per (prefix_len, temperature): temperature is a python float baked
    # into the trace, so each ladder rung compiles once and is then cached
    _cache = {}

    def run_decode(mel_window, prefix_arr, temperature, rng, sot_index):
        key = (prefix_arr.shape[1], float(temperature))
        if key not in _cache:
            use_beam = num_beams > 1 and float(temperature) == 0.0

            # params is an explicit jit argument: closure constants are
            # serialized into the lowered program, which overflows the
            # remote-compile payload at real model sizes (HTTP 413)
            def fn(params, mel, prefix, rng,
                   _t=float(temperature), _si=sot_index):
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
        return _cache[key](params, mel_window, prefix_arr, rng)

    sot_seq = tokenizer.sot_sequence(language, task, timestamps=True)
    seek = 0  # in mel frames, like HF/OpenAI
    all_segments: List[TranscriptSegment] = []
    do_condition = False  # becomes True after the first window (if enabled)
    rng = jax.random.PRNGKey(seed)

    while seek < content_frames:
        seek_num_frames = min(content_frames - seek, n_window_frames)
        window_duration = seek_num_frames / frames_per_s
        window = mel_full[:, seek : seek + n_window_frames]
        if tail_pad == "zeros" and seek_num_frames < n_window_frames:
            # HF pads the final feature window with zeros
            # (_get_input_segment); "silence" keeps the log-mel of the
            # zero-audio tail instead (OpenAI transcribe.py behavior)
            window = window.copy()
            window[:, seek_num_frames:] = 0.0
        mel_window = jnp.asarray(window)

        if condition_on_prev and do_condition and all_segments:
            prefix_list = (
                _prompt_from_segments(all_segments, special, max_prompt_tokens)
                + sot_seq
            )
            sot_index = len(prefix_list) - len(sot_seq)
        else:
            prefix_list = list(sot_seq)
            sot_index = 0
        prefix_arr = jnp.asarray([prefix_list], jnp.int32)
        budget = config.max_target_positions - len(prefix_list)

        chosen_tokens: List[int] = []
        chosen_temperature = 0.0
        for temperature in temperatures:
            rng, sub = jax.random.split(rng)
            res = run_decode(mel_window, prefix_arr, temperature, sub, sot_index)
            toks = np.asarray(res.tokens)[0]
            n_sampled = int(np.asarray(res.lengths)[0])
            sampled = toks[len(prefix_list) : len(prefix_list) + n_sampled].tolist()
            finished = n_sampled < budget  # <|endoftext|> was emitted
            # HF averages over sampled tokens INCLUDING the eos when present
            n_scored = min(n_sampled + 1, budget)
            avg_logprob = float(np.asarray(res.sum_logprobs)[0]) / max(n_scored, 1)
            chosen_temperature = float(temperature)

            needs_fallback = False
            if compression_ratio_threshold is not None:
                # HF compresses the raw token BYTES (2 bytes/token for the
                # whisper vocab), eos included — not the decoded text
                # (transformers _retrieve_compression_ratio)
                byte_len = int(np.log2(special.vocab_size) / 8) + 1
                scored = sampled + ([special.eot] if finished else [])
                token_bytes = b"".join(
                    int(t).to_bytes(byte_len, "little") for t in scored
                )
                if _compression_ratio(token_bytes) > compression_ratio_threshold:
                    needs_fallback = True
            if logprob_threshold is not None and avg_logprob < logprob_threshold:
                needs_fallback = True
            if (
                no_speech_threshold is not None
                and float(np.asarray(res.no_speech_probs)[0]) > no_speech_threshold
                and (logprob_threshold is None or avg_logprob < logprob_threshold)
            ):
                # confident silence: skip the window entirely
                chosen_tokens = []
                break
            chosen_tokens = sampled
            if not needs_fallback:
                break

        # prompt-reset rule: only low-temperature output conditions the next
        # window (HF: condition_on_prev_tokens and temperature < 0.5)
        do_condition = condition_on_prev and chosen_temperature < 0.5

        if not chosen_tokens:
            seek += seek_num_frames
            continue

        segments, advance_s, _ = _tokens_to_segments(
            chosen_tokens, special, seek / frames_per_s, window_duration
        )
        all_segments.extend(segments)
        advance_frames = int(round(advance_s * frames_per_s))
        # guard (beyond HF): a degenerate zero-advance pair must not hang
        seek += advance_frames if advance_frames > 0 else seek_num_frames

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
    quantize_cross_kv=0,  # 0/False off; True/8 int8; 4 int4; "fp8" e4m3
    num_beams: int = 1,
    length_penalty: float = 1.0,
    max_decode_tokens: Optional[int] = None,  # cap sampled tokens per chunk
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
    max_len = len(sot_seq) + max_decode_tokens if max_decode_tokens else None

    # params is an explicit jit argument (closure constants overflow the
    # remote-compile payload at real model sizes — HTTP 413; see label.py)
    @jax.jit
    def decode_batch(params, audio_batch, prefix):
        mel = mel_fn(audio_batch)
        enc = M.encode(params, mel, config, policy)
        if num_beams > 1:
            return beam_decode(params, enc, prefix, config, rules, policy,
                               num_beams=num_beams, max_len=max_len,
                               length_penalty=length_penalty,
                               quantize_cross_kv=quantize_cross_kv)
        return greedy_decode(params, enc, prefix, config, rules, policy,
                             max_len=max_len,
                             quantize_cross_kv=quantize_cross_kv)

    all_segments: List[TranscriptSegment] = []
    for i in range(0, len(chunks), batch_size):
        batch = chunks[i : i + batch_size]
        # pad the batch to a fixed size for compile stability
        # (reference pads to max batch, pipeline.py:394-396)
        pad_n = batch_size - len(batch)
        arr = np.stack([c[0] for c in batch] + [batch[-1][0]] * pad_n)
        prefix = jnp.asarray([sot_seq] * batch_size, jnp.int32)
        res = decode_batch(params, jnp.asarray(arr), prefix)
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
