"""Locate the decode loop's op-sequencing overhead on the real chip.

PERF.md: at batch 96 the end-to-end decode step (~derived from bench) runs
~4.7 ms while its isolated micro-parts sum to ~2.8 ms. This script times
two compositions, 192 iterations inside one jit each:

  A. decode_step alone (fori_loop, fixed token, varying index)
  C. the real greedy_decode while_loop (rules + bookkeeping + early-exit
     cond each step)

C-A = rule/bookkeeping/while_loop cost. Caveat: with random params C's
while_loop can emit EOT on every row and exit before BUDGET steps, which
would deflate its per-step figure — C therefore divides by the realised
step count (max of the returned lengths), reported alongside.
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

BATCH = int(os.environ.get("B", "96"))
BUDGET = 192

config = get_config("base")
policy = DtypePolicy.bf16()
params = init_params(config, seed=0)
tok = WhisperTokenizer(MULTILINGUAL)
rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
prefix = jnp.asarray([tok.sot_sequence("zh", "transcribe")] * BATCH, jnp.int32)
p_len = prefix.shape[1]
max_len = p_len + BUDGET

rng = np.random.RandomState(0)
enc = jnp.asarray(
    rng.randn(BATCH, config.max_source_positions, config.d_model)
    .astype(np.float32) * 0.1
)


def timer(fn, *args, iters=BUDGET):
    jitted = jax.jit(fn)
    jax.device_get(jitted(*args))  # compile + warm (forced host transfer)
    t0 = time.perf_counter()
    jax.device_get(jitted(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def setup(params, enc):
    cross = M.precompute_cross_kv(params, enc, config, policy)
    crossq = M.quantize_cross_kv(cross)
    cache = M.init_cache(config, BATCH, max_len, dtype=policy.compute_dtype)
    logits0, cache, _ = M.prefill(
        params, crossq, cache, prefix, config, policy, aux_index=0
    )
    return crossq, cache, logits0


# params is a jit ARGUMENT everywhere below: closing over it bakes multi-MB
# weight constants into the program, which the remote-compile tunnel rejects
# (HTTP 413) and which would skew compile time regardless.
def a_steps(params, enc):
    crossq, cache, logits0 = setup(params, enc)
    tok0 = jnp.full((BATCH,), rules.eot, jnp.int32)

    def body(i, carry):
        cache, acc = carry
        logits, cache = M.decode_step(
            params, crossq, cache, tok0, p_len + i, config, policy, unroll=6
        )
        return (cache, acc + logits[0, 0])

    _, acc = jax.lax.fori_loop(0, BUDGET, body, (cache, jnp.float32(0)))
    return acc


def c_decode_only(params, enc):
    res = greedy_decode(
        params, enc, prefix, config, rules, policy, max_len=max_len,
        quantize_cross_kv=True,
    )
    return res.tokens, res.lengths


if __name__ == "__main__":
    t_a = timer(a_steps, params, enc)
    # realised step count: the while_loop runs until every row finishes, so
    # per-step cost divides by max(lengths), not BUDGET
    _, lengths = jax.jit(c_decode_only)(params, enc)
    steps_run = int(np.max(np.asarray(lengths)))
    t_c = timer(c_decode_only, params, enc, iters=max(steps_run, 1))
    out = {
        "batch": BATCH,
        "A_decode_step_ms": round(t_a, 3),
        "C_full_greedy_ms_per_step": round(t_c, 3),
        "C_minus_A_ms": round(t_c - t_a, 3),
        "C_steps_run": steps_run,
        "C_budget": BUDGET,
        "note": "C includes prefill+precompute+quant amortized over its steps",
    }
    print(json.dumps(out))
