"""Encoder-layer cost breakdown at large-v2 shapes on the real chip.

The distillation train step is encoder-forward-bound (profile_train_parts:
bs 8 -> encode 213.7 ms of 332.7 ms total) and the encoder runs at ~43% of
v5e bf16 peak. This ablates one encoder layer in-jit (fori_loop over the
layer body, scalar result) to locate the gap between measured time and the
matmul speed-of-light: attention (kernel) vs MLP vs layernorm/gelu glue.

Variants: full, no_attn (residual passthrough), attn_core_only (kernel on
precomputed q/k/v), no_mlp, projections_only (qkvo+fc matmuls, no
attention dots / softmax / gelu), fused_qkv (single [d,3d] projection).

Usage: python tools/profile_encoder_parts.py [preset] [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.ops.attention import best_encoder_attention

ITERS = 8
preset = sys.argv[1] if len(sys.argv) > 1 else "large-v2"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

config = get_config(preset)
policy = DtypePolicy.bf16()
dtype = policy.compute_dtype
H = config.encoder_attention_heads
params = init_params(config, seed=0)
lp = jax.tree.map(lambda x: x[0], params["encoder"]["layers"])

rng = np.random.RandomState(0)
S = config.max_source_positions
x0 = jnp.asarray(rng.randn(B, S, config.d_model).astype(np.float32) * 0.1
                 ).astype(dtype)


def timed(fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    return round((time.perf_counter() - t0) / ITERS * 1e3, 2)


def layer(variant):
    def fn(i, lp, x):
        x = x + i * jnp.bfloat16(1e-9)
        if variant != "no_attn":
            h = M._layer_norm(lp["self_attn_ln"], x)
            if variant == "fused_qkv":
                p = lp["self_attn"]
                wk = jnp.concatenate(
                    [p["q"]["kernel"], p["k"]["kernel"], p["v"]["kernel"]],
                    axis=1,
                )
                qkv = jnp.dot(h, wk.astype(dtype))
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q = M._split_heads(q + p["q"]["bias"].astype(dtype), H)
                k = M._split_heads(k, H)
                v = M._split_heads(v + p["v"]["bias"].astype(dtype), H)
                out = best_encoder_attention(q, k, v)
                x = x + M._dense(p["out"], M._merge_heads(out), dtype)
            elif variant == "projections_only":
                p = lp["self_attn"]
                q = M._dense(p["q"], h, dtype)
                k = M._dense(p["k"], h, dtype)
                v = M._dense(p["v"], h, dtype)
                x = x + M._dense(p["out"], q + k + v, dtype)
            else:
                x = x + M._self_attn_block(lp["self_attn"], h, H, None, dtype)
        if variant != "no_mlp":
            h = M._layer_norm(lp["final_ln"], x)
            if variant == "projections_only":
                a = M._dense(lp["fc1"], h, dtype)
                x = x + M._dense(lp["fc2"], a, dtype)
            else:
                x = x + M._mlp_block(lp["fc1"], lp["fc2"], h, dtype)
        return jnp.sum(x[:, 0, 0]).astype(jnp.float32)

    return fn


def attn_core(i, q, k, v):
    return jnp.sum(
        best_encoder_attention(q + i * jnp.bfloat16(1e-9), k, v)[:, 0, 0, 0]
    ).astype(jnp.float32)


if __name__ == "__main__":
    res = {"preset": preset, "batch": B}
    for v in ["full", "no_attn", "no_mlp", "projections_only", "fused_qkv"]:
        res[v + "_ms"] = timed(layer(v), lp, x0)
    qkv = jnp.asarray(
        rng.randn(3, B, S, H, config.head_dim).astype(np.float32) * 0.1
    ).astype(dtype)
    res["attn_core_only_ms"] = timed(attn_core, qkv[0], qkv[1], qkv[2])
    # matmul speed-of-light for one layer at these shapes (197 TFLOP/s v5e)
    d = config.d_model
    proj_flops = 2 * B * S * d * d * 4 + 2 * B * S * d * config.ffn_dim * 2
    attn_flops = 2 * 2 * B * H * S * S * config.head_dim
    res["proj_flops_sol_ms"] = round(proj_flops / 197e12 * 1e3, 2)
    res["attn_flops_sol_ms"] = round(attn_flops / 197e12 * 1e3, 2)
    print(json.dumps(res))
