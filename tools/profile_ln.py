"""LayerNorm lever A/B at large-v2 encoder shapes (VERDICT r3 #3).

PERF.md round 3: the projection/LN stack runs 6.03 ms vs 2.40 ms matmul
speed-of-light per encoder layer, "partly fp32 LayerNorm HBM passes". This
times, in-jit (fori_loop, scalar result):

  ln_xla        two fp32-upcast LayerNorms on [B,S,d]   (current)
  ln_pallas     two fused bf16-IO Pallas LayerNorms
  layer_xla     one full encoder layer, current LN
  layer_pallas  one full encoder layer, Pallas LN
  mlp_ln_xla    LN+MLP half-layer, current
  mlp_ln_pallas LN+MLP half-layer, Pallas LN

Usage: python tools/profile_ln.py [preset] [batch]   (default large-v2 8)
"""

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
from taiwan_whisper_tpu.ops.layer_norm import layer_norm_pallas

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
    return round((time.perf_counter() - t0) / ITERS * 1e3, 3)


def ln_of(kind):
    def ln(p, x):
        if kind == "pallas":
            return layer_norm_pallas(x, p["scale"], p["bias"])
        return M._layer_norm(p, x)
    return ln


def two_lns(kind):
    ln = ln_of(kind)

    def fn(i, lp, x):
        x = x + i * jnp.bfloat16(1e-9)
        a = ln(lp["self_attn_ln"], x)
        b = ln(lp["final_ln"], a)
        return jnp.sum(b[:, 0, 0]).astype(jnp.float32)
    return fn


def full_layer(kind):
    ln = ln_of(kind)

    def fn(i, lp, x):
        x = x + i * jnp.bfloat16(1e-9)
        h = ln(lp["self_attn_ln"], x)
        x = x + M._self_attn_block(lp["self_attn"], h, H, None, dtype)
        h = ln(lp["final_ln"], x)
        x = x + M._mlp_block(lp["fc1"], lp["fc2"], h, dtype)
        return jnp.sum(x[:, 0, 0]).astype(jnp.float32)
    return fn


def mlp_half(kind):
    ln = ln_of(kind)

    def fn(i, lp, x):
        x = x + i * jnp.bfloat16(1e-9)
        h = ln(lp["final_ln"], x)
        x = x + M._mlp_block(lp["fc1"], lp["fc2"], h, dtype)
        return jnp.sum(x[:, 0, 0]).astype(jnp.float32)
    return fn


results = {}
for name, fn in [
    ("ln_xla", two_lns("xla")),
    ("ln_pallas", two_lns("pallas")),
    ("mlp_ln_xla", mlp_half("xla")),
    ("mlp_ln_pallas", mlp_half("pallas")),
    ("layer_xla", full_layer("xla")),
    ("layer_pallas", full_layer("pallas")),
]:
    results[name] = timed(fn, lp, x0)
    print(f"{name:>14}: {results[name]} ms")

print(results)
