"""Quantized cross-KV decode throughput probe (int8 vs int4) on the real chip."""
import json, time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
from taiwan_whisper_tpu.audio.mel import N_SAMPLES
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

bits = int(sys.argv[1])
batch, budget = 64, 192
config = get_config("base"); policy = DtypePolicy.bf16()
params = init_params(config, seed=0)
tok = WhisperTokenizer(MULTILINGUAL)
rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
prefix = jnp.asarray([tok.sot_sequence("zh", "transcribe")] * batch, jnp.int32)
max_len = prefix.shape[1] + budget

@jax.jit
def label_chunks(params, audio, prefix):
    mel = log_mel_pallas(audio)
    enc = M.encode(params, mel, config, policy)
    return greedy_decode(params, enc, prefix, config, rules, policy,
                         max_len=max_len, quantize_cross_kv=bits).tokens

rng = np.random.RandomState(0)
audios = [jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32)*0.1) for _ in range(4)]
np.asarray(label_chunks(params, audios[0], prefix))
iters = 4
t0 = time.perf_counter()
for i in range(iters):
    np.asarray(label_chunks(params, audios[i % 4], prefix))
dt = time.perf_counter() - t0
thr = batch * 30.0 * iters / dt
print(json.dumps({"bits": bits, "audio_s_per_s": round(thr, 1)}))
