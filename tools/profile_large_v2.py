"""Labelling-path decode throughput at large-v2 shapes (VERDICT r2 #8).

Every PERF.md decode number was measured on whisper-base; the flagship
teacher is large-v2 (d_model=1280, 32 layers, 20 heads). This times the
full labelling call (Pallas log-mel -> encoder -> 192-token decode) at
large-v2 dims across quantization modes and greedy/beam, so the
base-model conclusions (int8 wins, int4 loses, beam cost) are validated
or flipped at the shapes that actually ship (configs/label_large_v2.args).

HBM note (v5e, 16 GB): bf16 params ~3.2 GB; int8 cross-KV is
L32*B*1500*1280*2 bytes ~ 123 MB/row — beam-5 multiplies rows by 5, so
the beam grid stops at batch 16 (80 rows ~ 9.8 GB). OOM at a grid point
is reported, not fatal.

Usage: python tools/profile_large_v2.py
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

config = get_config("large-v2")
policy = DtypePolicy.bf16()
params = init_params(config, seed=0)
tok = WhisperTokenizer(MULTILINGUAL)
rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
on_tpu = jax.devices()[0].platform != "cpu"


def run(batch, beams, quant, iters=3, unroll=0):
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
                               quantize_cross_kv=quant,
                               scan_unroll=unroll).tokens
        return greedy_decode(params, enc, prefix, config, rules, policy,
                             max_len=max_len, quantize_cross_kv=quant,
                             scan_unroll=unroll).tokens

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32) * 0.1)
    np.asarray(label(params, audio, prefix))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(label(params, audio, prefix))
        samples.append(time.perf_counter() - t0)
    return round(batch * 30.0 / float(np.median(samples)), 1)


GRID = [
    # (variant, beams, quant, batches)
    ("greedy_bf16", 0, 0, [16, 32]),
    ("greedy_int8", 0, 8, [16, 32]),
    ("greedy_fp8", 0, "fp8", [16, 32]),
    ("greedy_int4", 0, 4, [16, 32, 48]),
    # greedy decoder-scan unroll probe: at 32 layers the per-step floor is
    # ~5.5 ms (weights 1.47 GB + int8 KV 2.0 GB + self cache ~1 GB) but
    # auto(u4) measures ~20 ms/step — sequencing-bound, not bandwidth
    ("greedy_int8_u1", (0, 1), 8, [16]),
    ("greedy_int8_u8", (0, 8), 8, [16]),
    ("greedy_int8_u16", (0, 16), 8, [16]),
    # FULL unroll removes the stacked-layer dynamic slicing entirely:
    # measured 249.2 audio-s/s at b16 vs auto-u4's 113.9 (round 5)
    ("greedy_int8_u32", (0, 32), 8, [16]),
    ("greedy_u32_scale", (0, 32), 8, [8, 32, 48]),
    ("greedy_fp8_u32", (0, 32), "fp8", [16, 32]),
    ("greedy_int4_u32", (0, 32), 4, [16, 32]),
    # int8 x int8 MXU attention dots (kills the dequant VPU cost; PERF.md
    # round-5 step decomposition put it at ~+15%)
    ("greedy_8x8_u32", (0, 32), "8x8", [16, 32]),
    ("beam5_int8_u32", (5, 32), 8, [8]),
    ("beam5_int8", 5, 8, [8, 16]),  # the shipping label_large_v2 config
    ("beam5_int4", 5, 4, [8, 16]),
    # remote-compile helper crashed on the auto-unroll(4) beam programs at
    # 32 decoder layers; unroll=1 shrinks the lowered program
    ("beam5_int8_u1", (5, 1), 8, [8, 16]),
]

if __name__ == "__main__":
    only = sys.argv[1:]  # optional variant-name substrings to run
    out = {"preset": "large-v2", "budget": BUDGET, "rows": []}
    for name, beams, quant, batches in GRID:
        if only and not any(o in name for o in only):
            continue
        beams, unroll = beams if isinstance(beams, tuple) else (beams, 0)
        for b in batches:
            try:
                thr = run(b, beams, quant, unroll=unroll)
                row = {"variant": name, "batch": b, "audio_s_per_s": thr}
            except Exception as e:
                row = {"variant": name, "batch": b, "error": repr(e)[:160]}
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps(out))
