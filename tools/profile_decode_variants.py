"""Decode-loop variant timing on the real chip (see PERF.md).

Variants: cross-KV precision x layer-scan unroll. Timing inside jit via
fori_loop (tunnel-safe; scalar result).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

ITERS = 4
batch, budget = 64, 192
config = get_config("base")
policy = DtypePolicy.bf16()
params = init_params(config, seed=0)
tok = WhisperTokenizer(MULTILINGUAL)
rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
prefix = jnp.asarray([tok.sot_sequence("zh", "transcribe")] * batch, jnp.int32)
max_len = prefix.shape[1] + budget

rng = np.random.RandomState(0)
mel_shape = (batch, 3000, config.num_mel_bins)
mel = jnp.asarray(rng.randn(*mel_shape).astype(np.float32) * 0.5)
enc = jax.jit(lambda m: M.encode(params, m, config, policy))(mel)


def run_variant(quant, unroll):
    @jax.jit
    def loop(e, p):
        def body(i, acc):
            r = greedy_decode(
                params, e + i * 1e-9, p, config, rules, policy,
                max_len=max_len, quantize_cross_kv=quant,
                scan_unroll=unroll,
            )
            return acc + jnp.sum(r.tokens[:, -1]).astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    np.asarray(loop(enc, prefix))
    t0 = time.perf_counter()
    np.asarray(loop(enc, prefix))
    dt = (time.perf_counter() - t0) / ITERS
    return round(dt * 1e3, 1)


for quant, unroll in [(True, 1), (True, 6), (0, 6), (4, 6)]:
    ms = run_variant(quant, unroll)
    print(json.dumps({
        "quant": quant, "unroll": unroll, "decode_192_ms": ms,
        "step_ms": round(ms / budget, 3),
    }), flush=True)
