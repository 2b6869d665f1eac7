"""Batch-size knee for the labelling path, measured in ONE process.

Cross-run bench numbers on the tunneled chip drift ~12% (PERF.md), so the
batch-size decision must come from a single process: compile label_chunks at
each batch size, interleave timed calls A/B/A/B, report audio-s/s each.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.audio.mel import N_SAMPLES, log_mel
from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

BATCHES = [int(b) for b in os.environ.get("BATCHES", "96,128").split(",")]
BUDGET = 192
ROUNDS = 3

config = get_config("base")
policy = DtypePolicy.bf16()
params = init_params(config, seed=0)
tok = WhisperTokenizer(MULTILINGUAL)
rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
on_tpu = jax.devices()[0].platform != "cpu"


def make(batch):
    prefix = jnp.asarray([tok.sot_sequence("zh", "transcribe")] * batch, jnp.int32)
    max_len = prefix.shape[1] + BUDGET

    @jax.jit
    def label_chunks(params, audio):
        mel = log_mel_pallas(audio) if on_tpu else log_mel(audio)
        enc = M.encode(params, mel, config, policy)
        return greedy_decode(
            params, enc, prefix, config, rules, policy, max_len=max_len,
            quantize_cross_kv=True,
        ).tokens

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32) * 0.1)
    return label_chunks, audio


if __name__ == "__main__":
    fns = {b: make(b) for b in BATCHES}
    for b, (fn, audio) in fns.items():
        np.asarray(fn(params, audio))  # compile
    times = {b: [] for b in BATCHES}
    for _ in range(ROUNDS):
        for b, (fn, audio) in fns.items():  # interleaved A/B
            t0 = time.perf_counter()
            np.asarray(fn(params, audio))
            times[b].append(time.perf_counter() - t0)
    out = {}
    for b in BATCHES:
        dt = min(times[b])
        out[f"batch_{b}_audio_s_per_s"] = round(b * 30.0 / dt, 1)
    print(json.dumps(out))
