"""Token-for-token greedy decode parity vs HF WhisperForConditionalGeneration
.generate (random weights, real multilingual vocab layout, tiny dims).

This is the seam where the reference trusts HF/faster-whisper internals
(SURVEY.md §7.3 #1): timestamp pairing rules, non-decreasing timestamps,
initial-timestamp window, timestamp-probability forcing, suppress lists.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.params import hf_to_params
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

FP32 = DtypePolicy.fp32()


def configs():
    kw = dict(
        vocab_size=MULTILINGUAL.vocab_size,  # 51865
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        max_source_positions=1500,
        max_target_positions=448,
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
    from taiwan_whisper_tpu.text.tokenizer import NON_SPEECH_TOKENS
    gc.suppress_tokens = list(NON_SPEECH_TOKENS)
    gc.no_speech_token_id = MULTILINGUAL.no_speech
    params = hf_to_params(model.state_dict(), cfg)
    return model, cfg, params


def _mel(batch=1, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randn(batch, 3000, 80).astype(np.float32) * 0.5


@pytest.mark.parametrize("timestamps", [True, False])
def test_greedy_parity(models, timestamps):
    model, cfg, params = models
    mel = _mel()
    max_new = 32

    with torch.no_grad():
        hf_ids = model.generate(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            language="zh",
            task="transcribe",
            return_timestamps=timestamps,
            do_sample=False,
            num_beams=1,
            max_new_tokens=max_new,
        ).numpy()

    tok = WhisperTokenizer(MULTILINGUAL)
    prefix = np.asarray(
        [tok.sot_sequence("zh", "transcribe", timestamps=timestamps)], np.int32
    )
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=timestamps)
    enc = M.encode(params, jnp.asarray(mel), cfg, FP32)
    res = greedy_decode(
        params, enc, jnp.asarray(prefix), cfg, rules, FP32,
        max_len=prefix.shape[1] + max_new,
    )
    ours = np.asarray(res.tokens)[0]
    theirs = hf_ids[0]
    # transformers >= 4.49 strips the forced prefix from the returned ids
    if theirs[0] != MULTILINGUAL.sot:
        ours = ours[prefix.shape[1]:]
    n = min(len(theirs), len(ours))
    assert ours[:n].tolist() == theirs[:n].tolist(), (
        f"timestamps={timestamps}\nours  ={ours[:n].tolist()}\n"
        f"theirs={theirs[:n].tolist()}"
    )


def test_batched_greedy_matches_single(models):
    """Batching must not change results (padding/masking correctness)."""
    model, cfg, params = models
    mel = _mel(batch=3, seed=7)
    tok = WhisperTokenizer(MULTILINGUAL)
    prefix1 = np.asarray([tok.sot_sequence("zh")], np.int32)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)

    enc_all = M.encode(params, jnp.asarray(mel), cfg, FP32)
    res_all = greedy_decode(
        params, enc_all, jnp.tile(prefix1, (3, 1)), cfg, rules, FP32,
        max_len=prefix1.shape[1] + 24,
    )
    for i in range(3):
        enc1 = M.encode(params, jnp.asarray(mel[i : i + 1]), cfg, FP32)
        res1 = greedy_decode(
            params, enc1, jnp.asarray(prefix1), cfg, rules, FP32,
            max_len=prefix1.shape[1] + 24,
        )
        assert np.asarray(res1.tokens)[0].tolist() == np.asarray(res_all.tokens)[i].tolist()
