"""Per-stage timing of the pseudo-labelling path on the real chip.

Times mel / encoder / cross-KV+prefill / decode-loop separately (each its
own jit, result materialised to host per the tunnel caveat in PERF.md) so
optimization effort goes where the milliseconds are.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, iters=4):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
from taiwan_whisper_tpu.audio.mel import N_SAMPLES
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
budget = 192
config = get_config("base")
policy = DtypePolicy.bf16()
params = init_params(config, seed=0)
tok = WhisperTokenizer(MULTILINGUAL)
rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
prefix = jnp.asarray([tok.sot_sequence("zh", "transcribe")] * batch, jnp.int32)
max_len = prefix.shape[1] + budget

rng = np.random.RandomState(0)
audio = jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32) * 0.1)

mel_fn = jax.jit(log_mel_pallas)
enc_fn = jax.jit(lambda m: M.encode(params, m, config, policy))


@jax.jit
def decode_fn(enc, prefix):
    return greedy_decode(
        params, enc, prefix, config, rules, policy, max_len=max_len,
        quantize_cross_kv=True,
    ).tokens


mel = mel_fn(audio)
enc = enc_fn(mel)
res = {
    "batch": batch,
    "mel_ms": round(timed(mel_fn, audio) * 1e3, 1),
    "encode_ms": round(timed(enc_fn, mel) * 1e3, 1),
    "decode_192_ms": round(timed(decode_fn, enc, prefix) * 1e3, 1),
}
res["decode_step_ms"] = round(res["decode_192_ms"] / budget, 3)
total = res["mel_ms"] + res["encode_ms"] + res["decode_192_ms"]
res["total_ms"] = round(total, 1)
res["audio_s_per_s"] = round(batch * 30.0 / (total / 1e3), 1)
print(json.dumps(res))
