"""Encoder-attention kernel throughput on the real chip.

Times the Pallas kernel vs the XLA einsum at whisper-base and large-v2
shapes (in-jit fori_loop, scalar result) and reports achieved TFLOP/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.ops.attention import (
    encoder_attention,
    encoder_attention_flash,
)

ITERS = 16


def timed(fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    return (time.perf_counter() - t0) / ITERS


def xla_attn(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (d ** -0.5), k,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=q.dtype)


for name, (b, s, h, d) in [("base-b64", (64, 1500, 8, 64)),
                           ("large-b8", (8, 1500, 20, 64))]:
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(
        rng.randn(b, s, h, d).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    flops = 2 * 2 * b * h * s * s * d

    res = {"shape": name}
    for qb in (128, 256, 512):
        t_pal = timed(
            lambda i, q, k, v, _qb=qb: jnp.sum(
                encoder_attention(q + i * jnp.bfloat16(1e-9), k, v,
                                  q_block=_qb)[:, 0, 0, 0]
            ).astype(jnp.float32), q, k, v)
        res[f"pallas_qb{qb}_ms"] = round(t_pal * 1e3, 2)
        res[f"pallas_qb{qb}_tflops"] = round(flops / t_pal / 1e12, 1)
    t_fl = timed(
        lambda i, q, k, v: jnp.sum(
            encoder_attention_flash(q + i * jnp.bfloat16(1e-9), k, v)[:, 0, 0, 0]
        ).astype(jnp.float32), q, k, v)
    res["flash_ms"] = round(t_fl * 1e3, 2)
    res["flash_tflops"] = round(flops / t_fl / 1e12, 1)
    t_xla = timed(
        lambda i, q, k, v: jnp.sum(
            xla_attn(q + i * jnp.bfloat16(1e-9), k, v)[:, 0, 0, 0]
        ).astype(jnp.float32), q, k, v)
    res["xla_ms"] = round(t_xla * 1e3, 2)
    res["xla_tflops"] = round(flops / t_xla / 1e12, 1)
    print(json.dumps(res), flush=True)
