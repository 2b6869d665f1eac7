"""Beam-search labelling throughput on the real chip (VERDICT r2 #2).

configs/label_large_v2.args ships num_beams=5 + int8 cross-KV, but
PERF.md only ever measured greedy batch-96. This times the full labelling
call (Pallas log-mel -> encoder -> decode, 192-token budget) for
greedy/beam x quant variants and prints audio-s/s per chip for each, so
the shipping config's cost is on record and the batch knee for beam can
be chosen from data.

Usage: python tools/profile_beam.py [preset] [batch ...]
(default: base; batches 24 48 96 for beam, 96 for greedy reference)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.decode.beam import beam_decode
from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
from taiwan_whisper_tpu.audio.mel import N_SAMPLES, log_mel
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

BUDGET = 192

preset = sys.argv[1] if len(sys.argv) > 1 else "base"
batches = [int(a) for a in sys.argv[2:]] or [24, 48, 96]

config = get_config(preset)
policy = DtypePolicy.bf16()
params = init_params(config, seed=0)
tok = WhisperTokenizer(MULTILINGUAL)
rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
on_tpu = jax.devices()[0].platform != "cpu"


def timer(fn, *args, iters=4):
    np.asarray(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def run(batch, beams, quant):
    prefix = jnp.asarray(
        [tok.sot_sequence("zh", "transcribe")] * batch, jnp.int32
    )
    max_len = prefix.shape[1] + BUDGET

    @jax.jit
    def label(params, audio, prefix):
        mel = log_mel_pallas(audio) if on_tpu else log_mel(audio)
        enc = M.encode(params, mel, config, policy)
        if beams:
            return beam_decode(params, enc, prefix, config, rules, policy,
                               num_beams=beams, max_len=max_len,
                               quantize_cross_kv=quant).tokens
        return greedy_decode(params, enc, prefix, config, rules, policy,
                             max_len=max_len, quantize_cross_kv=quant).tokens

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32) * 0.1)
    dt = timer(label, params, audio, prefix)
    return round(batch * 30.0 / dt, 1)


if __name__ == "__main__":
    out = {"preset": preset, "budget": BUDGET, "rows": []}
    grid = [("greedy_int8", 0, 8, [max(batches)])]
    grid += [("beam5_int8", 5, 8, batches), ("beam5_bf16", 5, 0, [max(batches)])]
    for name, beams, quant, bs in grid:
        for b in bs:
            thr = run(b, beams, quant)
            row = {"variant": name, "batch": b, "audio_s_per_s": thr}
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps(out))
