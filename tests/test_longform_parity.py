"""Sequential long-form parity vs HF Whisper's long-form generate.

SURVEY.md §7.3 ranks sequential long-form decode semantics (window sliding,
condition-on-prev prompts, temperature-fallback controls) the #1 hard part;
the reference delegates all of it to HF generate (training/run_eval.py:
659-676). This drives transformers' WhisperGenerationMixin in long-form mode
(>3000 feature frames) on random tiny weights and asserts SEGMENT-level
agreement — raw tokens (timestamps included), start/end times — with
sequential_decode, under active logprob/compression thresholds and
condition_on_prev.

Both sides consume the identical precomputed log-mel (ours), so the test
isolates the window/seek/prompt/fallback algorithm, not the fbank.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from taiwan_whisper_tpu.audio.mel import log_mel
from taiwan_whisper_tpu.decode.longform import sequential_decode
from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
from taiwan_whisper_tpu.models.params import hf_to_params
from taiwan_whisper_tpu.text.tokenizer import (
    MULTILINGUAL,
    NON_SPEECH_TOKENS,
    WhisperTokenizer,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

FP32 = DtypePolicy.fp32()
MAX_TARGET = 128  # short decode budget keeps the CPU while_loops fast


def configs():
    kw = dict(
        vocab_size=MULTILINGUAL.vocab_size,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        max_source_positions=1500,
        max_target_positions=MAX_TARGET,
    )
    ours = WhisperConfig(ffn_dim=128, **kw)
    hf = transformers.WhisperConfig(encoder_ffn_dim=128, decoder_ffn_dim=128, **kw)
    return ours, hf


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    cfg, hf_cfg = configs()
    model = transformers.WhisperForConditionalGeneration(hf_cfg)
    model.eval()
    gc = model.generation_config
    gc.no_timestamps_token_id = MULTILINGUAL.no_timestamps
    gc.max_initial_timestamp_index = 50
    gc.decoder_start_token_id = MULTILINGUAL.sot
    gc.eos_token_id = MULTILINGUAL.eot
    gc.pad_token_id = MULTILINGUAL.eot
    gc.bos_token_id = MULTILINGUAL.eot
    gc.is_multilingual = True
    gc.lang_to_id = {f"<|{c}|>": MULTILINGUAL.language_id(c) for c in ("zh", "en")}
    gc.task_to_id = {"transcribe": MULTILINGUAL.transcribe,
                     "translate": MULTILINGUAL.translate}
    gc.begin_suppress_tokens = [220, MULTILINGUAL.eot]
    gc.suppress_tokens = list(NON_SPEECH_TOKENS)
    gc.no_speech_token_id = MULTILINGUAL.no_speech
    gc.prev_sot_token_id = MULTILINGUAL.sot_prev
    gc.max_length = MAX_TARGET
    params = hf_to_params(model.state_dict(), cfg)
    return model, cfg, params


def _audio(seconds, seed):
    n = int(seconds) * 16000  # multiple of the hop so frame counts agree
    return (np.random.RandomState(seed).randn(n) * 0.1).astype(np.float32)


def _run_both(models, audio, *, condition_on_prev, temperatures,
              logprob_threshold, compression_ratio_threshold,
              no_speech_threshold, num_beams=1):
    model, cfg, params = models
    tok = WhisperTokenizer(MULTILINGUAL)

    content_frames = len(audio) // 160
    mel_full = np.asarray(log_mel(jnp.asarray(audio[None]), cfg.num_mel_bins))

    with torch.no_grad():
        out = model.generate(
            input_features=torch.from_numpy(
                mel_full[:, :content_frames].transpose(0, 2, 1)
            ),
            language="zh",
            task="transcribe",
            return_timestamps=True,
            return_segments=True,
            condition_on_prev_tokens=condition_on_prev,
            temperature=temperatures,
            logprob_threshold=logprob_threshold,
            compression_ratio_threshold=compression_ratio_threshold,
            no_speech_threshold=no_speech_threshold,
            num_beams=num_beams,
        )
    hf_segments = out["segments"][0]

    ours = sequential_decode(
        params, audio, cfg, tok, FP32,
        language="zh", task="transcribe",
        temperatures=temperatures,
        logprob_threshold=logprob_threshold,
        compression_ratio_threshold=compression_ratio_threshold,
        no_speech_threshold=no_speech_threshold,
        condition_on_prev=condition_on_prev,
        max_prompt_tokens=MAX_TARGET // 2 - 1,  # HF cut_off_length
        tail_pad="zeros",
        num_beams=num_beams,
    )
    return hf_segments, ours.segments


def _assert_segments_equal(hf_segments, our_segments):
    assert len(our_segments) == len(hf_segments), (
        f"{len(our_segments)} segments vs HF {len(hf_segments)}\n"
        f"ours  ={[(s.start, s.end) for s in our_segments]}\n"
        f"theirs={[(float(s['start']), float(s['end'])) for s in hf_segments]}"
    )
    for i, (ours, hf) in enumerate(zip(our_segments, hf_segments)):
        hf_tokens = hf["tokens"].tolist()
        # HF keeps the eos in the last segment's tokens sometimes; ours never
        hf_tokens = [t for t in hf_tokens if t != MULTILINGUAL.eot]
        assert ours.raw_token_ids == hf_tokens, (
            f"segment {i} tokens\nours  ={ours.raw_token_ids}\ntheirs={hf_tokens}"
        )
        assert ours.start == pytest.approx(float(hf["start"]), abs=1e-6)
        assert ours.end == pytest.approx(float(hf["end"]), abs=1e-6)


def test_longform_parity_greedy_conditioned(models):
    """>30 s input, condition_on_prev on, thresholds active. With random
    weights avg_logprob is always below -1.0, so every window walks the
    full (deterministic) fallback ladder — exercising fallback bookkeeping
    without sampling nondeterminism."""
    audio = _audio(75, seed=11)
    hf_segments, our_segments = _run_both(
        models, audio,
        condition_on_prev=True,
        temperatures=(0.0, 0.0),
        logprob_threshold=-1.0,
        compression_ratio_threshold=2.4,
        no_speech_threshold=0.6,
    )
    assert len(hf_segments) > 1  # the loop actually slid windows
    _assert_segments_equal(hf_segments, our_segments)


def test_longform_parity_unconditioned(models):
    """No prompt carry: every window decodes from the bare sot sequence."""
    audio = _audio(64, seed=5)
    hf_segments, our_segments = _run_both(
        models, audio,
        condition_on_prev=False,
        temperatures=(0.0,),
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    assert len(hf_segments) > 1
    _assert_segments_equal(hf_segments, our_segments)


def test_longform_parity_beam_unconditioned(models):
    """Beam rung (num_beams=2) at t=0: deterministic, so full segment-level
    parity with HF's long-form beam generate (VERDICT r2 weak #5)."""
    audio = _audio(64, seed=3)
    hf_segments, our_segments = _run_both(
        models, audio,
        condition_on_prev=False,
        temperatures=(0.0,),
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
        num_beams=2,
    )
    assert len(hf_segments) > 1
    _assert_segments_equal(hf_segments, our_segments)


def test_longform_parity_beam_conditioned_thresholds(models):
    """Beam decode under ACTIVE thresholds + condition_on_prev: every window
    fails the logprob threshold (random weights), so the ladder exhausts on
    the beam rung on both sides. This proves the beam sum_logprobs
    reconstruction (beam.py inverts the length penalty) feeds the
    avg_logprob threshold identically to HF's _retrieve_avg_logprobs —
    a decision mismatch would change conditioning/seek and break segment
    equality."""
    audio = _audio(75, seed=13)
    hf_segments, our_segments = _run_both(
        models, audio,
        condition_on_prev=True,
        temperatures=(0.0, 0.0),
        logprob_threshold=-1.0,
        compression_ratio_threshold=2.4,
        no_speech_threshold=0.6,
        num_beams=2,
    )
    assert len(hf_segments) > 1
    _assert_segments_equal(hf_segments, our_segments)


def test_longform_parity_sampling_rungs_deterministic(models, monkeypatch):
    """The t>0 sampling rungs, CONTROL-path parity (VERDICT r2 item 6).

    Token-level parity of true sampling is out of scope by construction:
    HF draws from torch.multinomial on torch's global RNG while we draw
    from jax.random.categorical on a threaded PRNGKey — there is no shared
    seed semantics. Instead both samplers are patched to deterministic
    argmax (temperature scaling never changes the argmax), which makes
    every ladder rung deterministic AND identical across implementations
    while still driving the real sampling code paths: per-rung regeneration
    at t=0.4/0.8, last-rung acceptance when every rung fails the logprob
    threshold, the prompt-reset rule (chosen t >= 0.5 stops conditioning the
    next window), avg_logprob accounting for sampled tokens (HF un-warps
    the temperature out of its recorded scores; ours gathers raw logits),
    and window advance. Any control-flow divergence breaks segment
    equality."""
    import jax

    monkeypatch.setattr(
        jax.random, "categorical",
        lambda key, logits, axis=-1: jnp.argmax(logits, axis=axis).astype(
            jnp.int32),
    )
    monkeypatch.setattr(
        torch, "multinomial",
        lambda probs, num_samples=1, **kw: probs.argmax(-1, keepdim=True),
    )
    audio = _audio(75, seed=17)
    hf_segments, our_segments = _run_both(
        models, audio,
        condition_on_prev=True,
        temperatures=(0.0, 0.4, 0.8),
        logprob_threshold=-1.0,  # random weights always fail: full ladder
        compression_ratio_threshold=2.4,
        no_speech_threshold=0.6,
    )
    assert len(hf_segments) > 1
    _assert_segments_equal(hf_segments, our_segments)
