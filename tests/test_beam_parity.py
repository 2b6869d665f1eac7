"""Beam-search parity vs HF generate(num_beams) — token-for-token, including
length-penalty scoring and early-stopping band (SURVEY.md §7.3 #2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from taiwan_whisper_tpu.models.config import DtypePolicy
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.decode.beam import beam_decode
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

torch = pytest.importorskip("torch")

from test_decode_parity import configs, models, _mel  # noqa: E402,F401

FP32 = DtypePolicy.fp32()


def test_beam_k1_matches_greedy_and_aux_fields(models):
    """A 1-beam search ranks tokens exactly like greedy argmax (rules are
    shift-invariant), and the aux fields added for the long-form fallback
    ladder (lengths, sum_logprobs, no_speech_probs) are self-consistent."""
    from taiwan_whisper_tpu.decode.greedy import greedy_decode

    model, cfg, params = models
    mel = _mel(batch=2, seed=13)
    tok = WhisperTokenizer(MULTILINGUAL)
    prefix_list = tok.sot_sequence("zh", "transcribe", timestamps=True)
    prefix = jnp.asarray([prefix_list] * 2, jnp.int32)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    enc = M.encode(params, jnp.asarray(mel), cfg, FP32)
    max_len = len(prefix_list) + 24

    g = greedy_decode(params, enc, prefix, cfg, rules, FP32, max_len=max_len)
    b = beam_decode(params, enc, prefix, cfg, rules, FP32, num_beams=1,
                    max_len=max_len, length_penalty=1.0)
    assert np.asarray(b.tokens).tolist() == np.asarray(g.tokens).tolist()
    assert np.asarray(b.lengths).tolist() == np.asarray(g.lengths).tolist()
    np.testing.assert_allclose(
        np.asarray(b.no_speech_probs), np.asarray(g.no_speech_probs),
        rtol=1e-5,
    )
    # scores invert to sum_logprobs at hyp_len = p_len + sampled
    hyp_len = len(prefix_list) + np.asarray(b.lengths)
    np.testing.assert_allclose(
        np.asarray(b.sum_logprobs), np.asarray(b.scores) * hyp_len,
        rtol=1e-5,
    )


@pytest.mark.parametrize("timestamps", [False, True])
@pytest.mark.parametrize("num_beams", [2, 4])
def test_beam_parity(models, timestamps, num_beams):
    model, cfg, params = models
    mel = _mel(batch=2, seed=11)
    max_new = 24

    # Use the generic GenerationMixin path with explicit Whisper processors:
    # WhisperForConditionalGeneration.generate wraps everything in its
    # seek/segment long-form loop (even for a single 30 s window), which
    # re-decodes trailing slivers — not the single-pass semantics under test.
    import transformers
    from transformers.generation.logits_process import (
        LogitsProcessorList,
        SuppressTokensAtBeginLogitsProcessor,
        SuppressTokensLogitsProcessor,
        WhisperTimeStampLogitsProcessor,
    )
    from taiwan_whisper_tpu.text.tokenizer import NON_SPEECH_TOKENS

    tok = WhisperTokenizer(MULTILINGUAL)
    prefix_list = tok.sot_sequence("zh", "transcribe", timestamps=timestamps)
    procs = LogitsProcessorList([
        SuppressTokensAtBeginLogitsProcessor(
            [220, MULTILINGUAL.eot], begin_index=len(prefix_list), device="cpu"
        ),
        SuppressTokensLogitsProcessor(list(NON_SPEECH_TOKENS), device="cpu"),
    ])
    if timestamps:
        procs.append(
            WhisperTimeStampLogitsProcessor(
                model.generation_config, begin_index=len(prefix_list)
            )
        )
    with torch.no_grad():
        hf_ids = transformers.generation.GenerationMixin.generate(
            model,
            inputs=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.tensor([prefix_list] * mel.shape[0]),
            logits_processor=procs,
            do_sample=False,
            num_beams=num_beams,
            length_penalty=1.0,
            max_new_tokens=max_new,
        ).numpy()
    prefix = np.tile(np.asarray([prefix_list], np.int32), (2, 1))
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=timestamps)
    enc = M.encode(params, jnp.asarray(mel), cfg, FP32)
    res = beam_decode(
        params, enc, jnp.asarray(prefix), cfg, rules, FP32,
        num_beams=num_beams, max_len=prefix.shape[1] + max_new,
        length_penalty=1.0,
    )
    ours = np.asarray(res.tokens)
    p = prefix.shape[1]
    for i in range(2):
        o = ours[i]
        t = hf_ids[i]
        if t[0] != MULTILINGUAL.sot:  # HF >=4.49 strips the forced prefix
            o = o[p:]
        # HF pads shorter batch items with pad=eot, as do we
        n = min(len(o), len(t))
        assert o[:n].tolist() == t[:n].tolist(), (
            f"beams={num_beams} ts={timestamps} sample={i}\n"
            f"ours  ={o[:n].tolist()}\ntheirs={t[:n].tolist()}"
        )
