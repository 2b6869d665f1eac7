"""Per-stage timing of the pseudo-labelling path on the real chip.

Each stage runs ITERS times inside one jit (lax.fori_loop) and returns a
scalar, so the tunnel's device->host transfer cost (which dominates any
per-call timing of large intermediates) is paid once per measurement, not
per iteration. See PERF.md "Timing methodology".
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
from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
from taiwan_whisper_tpu.audio.mel import N_SAMPLES
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

ITERS = 8


def timed_loop(stage_fn, *args):
    """Wall time per iteration of stage_fn, looped ITERS times inside jit.

    stage_fn must fold its (varying) iteration index into its input so XLA
    cannot hoist the body out of the loop, and return a scalar.
    """

    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + stage_fn(i, *a)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    np.asarray(run(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / ITERS


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
mel = jax.jit(log_mel_pallas)(audio)
enc = jax.jit(lambda m: M.encode(params, m, config, policy))(mel)

mel_s = timed_loop(
    lambda i, a: jnp.sum(log_mel_pallas(a + i * 1e-9)[:, 0, 0]), audio
)
enc_s = timed_loop(
    lambda i, m: jnp.sum(
        M.encode(params, m + i * 1e-9, config, policy)[:, 0, 0]
    ).astype(jnp.float32),
    mel,
)


def dec_stage(i, e, p):
    r = greedy_decode(
        params, e + i * 1e-9, p, config, rules, policy, max_len=max_len,
        quantize_cross_kv=True,
    )
    return jnp.sum(r.tokens[:, -1]).astype(jnp.float32)


dec_s = timed_loop(dec_stage, enc, prefix)

res = {
    "batch": batch,
    "iters": ITERS,
    "mel_ms": round(mel_s * 1e3, 1),
    "encode_ms": round(enc_s * 1e3, 1),
    "decode_192_ms": round(dec_s * 1e3, 1),
    "decode_step_ms": round(dec_s * 1e3 / budget, 3),
}
total = mel_s + enc_s + dec_s
res["total_ms"] = round(total * 1e3, 1)
res["audio_s_per_s"] = round(batch * 30.0 / total, 1)
print(json.dumps(res))
