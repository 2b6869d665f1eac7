"""In-situ decode_step component costs by ablation on the real chip.

Isolated micro-parts (tools/profile_decode_parts.py) sum to ~half the bare
decode_step time, so something about the composed step costs extra. This
times decode_step variants with one component nulled at a time, inside the
same fori_loop harness; (full - ablated) is the IN-SITU cost of that
component including its share of slicing/fusion/dispatch overhead.

Variants: full, no_cross, no_self, no_mlp, no_head, no_commit (skip the
cache DUS), embeds_only.
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

BATCH = int(os.environ.get("B", "96"))
BUDGET = 192
UNROLL = int(os.environ.get("UNROLL", "6"))
# QUANT: "8" int8 (default), "4" int4, "fp8", "0" plain bf16 cross-KV
QUANT = os.environ.get("QUANT", "8")

config = get_config(os.environ.get("PRESET", "base"))
policy = DtypePolicy.bf16()
params = init_params(config, seed=0)
p_len = 4
max_len = p_len + BUDGET

rng = np.random.RandomState(0)
enc = jnp.asarray(
    rng.randn(BATCH, config.max_source_positions, config.d_model)
    .astype(np.float32) * 0.1
)


def step_variant(ablate: str):
    """A decode_step clone with one component removed."""
    dtype = policy.compute_dtype
    n_heads = config.decoder_attention_heads

    def step(params, cross_kv, cache, token, index):
        p = params["decoder"]
        x = p["embed_tokens"].astype(dtype)[token[:, None]]
        x = x + p["embed_positions"].astype(dtype)[index][None, None]
        if ablate == "embeds_only":
            k0 = jnp.zeros(
                (config.decoder_layers,) + cache.k.shape[1:-1] + (1,),
                cache.k.dtype,
            )
            return (M._lm_head(p["embed_tokens"], x[:, 0], dtype),
                    cache, k0, k0)
        cross_xs = M._cross_xs(cross_kv)

        def layer(x, xs):
            lp, ck, cv = xs[:3]
            cross_slice = xs[3:]
            if ablate == "no_self":
                b = x.shape[0]
                k_t = jnp.zeros(
                    (b, n_heads, config.head_dim, 1), ck.dtype
                )
                v_t = k_t
            else:
                h = M._layer_norm(lp["self_attn_ln"], x)
                att, k_t, v_t = M._cached_self_attn(
                    lp["self_attn"], h, ck, cv, index, n_heads, dtype
                )
                x = x + att
            if ablate != "no_cross":
                h = M._layer_norm(lp["cross_attn_ln"], x)
                q = M._split_heads(
                    M._dense(lp["cross_attn"]["q"], h, dtype), n_heads
                )
                att = M._cross_attention(q, cross_slice, dtype)
                x = x + M._dense(
                    lp["cross_attn"]["out"], M._merge_heads(att), dtype
                )
            if ablate != "no_mlp":
                h = M._layer_norm(lp["final_ln"], x)
                x = x + M._mlp_block(lp["fc1"], lp["fc2"], h, dtype)
            return x, (k_t, v_t)

        x, (k_new, v_new) = jax.lax.scan(
            layer, x, (p["layers"], cache.k, cache.v) + cross_xs,
            unroll=UNROLL,
        )
        x = M._layer_norm(p["ln_post"], x)
        if ablate == "no_head":
            logits = jnp.zeros((x.shape[0], config.vocab_size), jnp.float32)
            logits = logits.at[:, 0].set(jnp.sum(x[:, 0], -1))
        else:
            logits = M._lm_head(p["embed_tokens"], x[:, 0], dtype)
        return logits, cache, k_new, v_new

    def fn(params, enc):
        cross = M.precompute_cross_kv(params, enc, config, policy)
        if QUANT == "0":
            crossq = cross
        else:
            crossq = M.quantize_cross_kv(
                cross, bits=int(QUANT) if QUANT.isdigit() else QUANT
            )
        cache = M.init_cache(config, BATCH, max_len, dtype=policy.compute_dtype)
        tok0 = jnp.zeros((BATCH,), jnp.int32)

        def body(i, carry):
            cache, acc = carry
            logits, cache2, k_new, v_new = step(
                params, crossq, cache, tok0, p_len + i
            )
            if ablate != "no_commit":
                nk = jax.lax.dynamic_update_slice(
                    cache2.k, k_new, (0, 0, 0, 0, p_len + i)
                )
                nv = jax.lax.dynamic_update_slice(
                    cache2.v, v_new, (0, 0, 0, 0, p_len + i)
                )
                cache2 = M.KVCache(k=nk, v=nv)
            return (cache2, acc + logits[0, 0])

        _, acc = jax.lax.fori_loop(0, BUDGET, body, (cache, jnp.float32(0)))
        return acc

    return fn


def timer(fn):
    jitted = jax.jit(fn)
    jax.device_get(jitted(params, enc))
    t0 = time.perf_counter()
    jax.device_get(jitted(params, enc))
    return (time.perf_counter() - t0) / BUDGET * 1e3


if __name__ == "__main__":
    names = os.environ.get(
        "VARIANTS", "full,no_cross,no_self,no_mlp,no_head,no_commit,embeds_only"
    ).split(",")
    results = {}
    for name in names:
        results[name] = round(timer(step_variant(name)), 3)
    full = results.get("full")
    insitu = {}
    if full is not None:
        for abl in ["no_cross", "no_self", "no_mlp", "no_head", "no_commit"]:
            if abl in results:
                insitu[abl[3:] + "_ms"] = round(full - results[abl], 3)
        if "embeds_only" in results:
            insitu["residual_ms"] = round(results["embeds_only"], 3)
    print(json.dumps(
        {"batch": BATCH, "quant": QUANT, "raw": results, "insitu": insitu}
    ))
