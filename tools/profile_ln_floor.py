"""LayerNorm floor analysis with XLA cost rigor (VERDICT r4 weak #4 / next #5).

Round 4 reported two LayerNorms on [8,1500,1280] at 3.15 ms — but the
bandwidth arithmetic says ~123-300 MB of traffic ≈ 0.15-0.4 ms at v5e HBM
rates. This tool separates MEASUREMENT from COST:

  1. times the same two-LN program at ITERS = 8 / 32 / 128 inside ONE jit
     call — a per-call constant (tunnel RTT, dispatch) shows up as a
     1/ITERS term, real per-iteration cost does not;
  2. fits time(ITERS) = a + b*ITERS and reports the per-iteration slope b
     (the true LN cost) and intercept a (the harness constant);
  3. pulls compiled.cost_analysis() bytes-accessed for the LN program and
     compares against the hand floor;
  4. repeats for the full encoder layer and the projections-only variant
     so the round-3 "proj/LN gap" numbers get the same correction.

Usage: python tools/profile_ln_floor.py [preset] [batch]  (large-v2 8)
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


def two_lns(i, lp, x):
    x = x + i * jnp.bfloat16(1e-9)
    a = M._layer_norm(lp["self_attn_ln"], x)
    b = M._layer_norm(lp["final_ln"], a)
    # sum over EVERYTHING: a [:,0,0] probe (profile_ln.py round 4) lets
    # XLA in principle dead-code 1499/1500 of the rows
    return jnp.sum(b.astype(jnp.float32))


def full_layer(i, lp, x):
    x = x + i * jnp.bfloat16(1e-9)
    h = M._layer_norm(lp["self_attn_ln"], x)
    x = x + M._self_attn_block(lp["self_attn"], h, H, None, dtype)
    h = M._layer_norm(lp["final_ln"], x)
    x = x + M._mlp_block(lp["fc1"], lp["fc2"], h, dtype)
    return jnp.sum(x.astype(jnp.float32))


def projections_only(i, lp, x):
    """qkvo + fc matmuls + LNs + residuals, no attention core / softmax
    (mirrors tools/profile_encoder_parts.py's 'projections-only')."""
    x = x + i * jnp.bfloat16(1e-9)
    h = M._layer_norm(lp["self_attn_ln"], x)
    sa = lp["self_attn"]
    q = M._dense(sa["q"], h, dtype)
    k = M._dense(sa["k"], h, dtype)
    v = M._dense(sa["v"], h, dtype)
    x = x + M._dense(sa["out"], q + k + v, dtype)
    h = M._layer_norm(lp["final_ln"], x)
    x = x + M._mlp_block(lp["fc1"], lp["fc2"], h, dtype)
    return jnp.sum(x.astype(jnp.float32))


def loop_of(fn, iters):
    @jax.jit
    def loop(lp, x):
        def body(i, acc):
            return acc + fn(i, lp, x)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return loop


def measure(fn, name):
    rows = {}
    compiled_bytes = None
    for iters in (8, 32, 128):
        loop = loop_of(fn, iters)
        if compiled_bytes is None:
            try:
                c = loop.lower(lp, x0).compile()
                ca = c.cost_analysis()
                ca = ca[0] if isinstance(ca, list) else ca
                compiled_bytes = float(ca.get("bytes accessed", float("nan")))
            except Exception as e:  # cost model absent on some backends
                compiled_bytes = float("nan")
        np.asarray(loop(lp, x0))  # compile+warm
        t = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(loop(lp, x0))
            t.append(time.perf_counter() - t0)
        rows[iters] = float(np.median(t))
    # least-squares fit total = a + b*iters
    xs = np.array(sorted(rows))
    ys = np.array([rows[i] for i in xs])
    b_slope, a_icpt = np.polyfit(xs, ys, 1)
    out = {
        "name": name,
        "total_ms": {int(i): round(rows[i] * 1e3, 2) for i in xs},
        "per_iter_ms_naive8": round(rows[8] / 8 * 1e3, 3),
        "per_iter_ms_slope": round(b_slope * 1e3, 3),
        "per_call_const_ms": round(a_icpt * 1e3, 2),
        "bytes_accessed_per_iter_MB": (
            round(compiled_bytes / xs[0] / 1e6, 1)
            if np.isfinite(compiled_bytes) else None),
    }
    print(out, flush=True)
    return out


if __name__ == "__main__":
    d = config.d_model
    floor_bytes = 2 * (2 * B * S * d * 2)  # two LNs, bf16 in+out once
    hbm = 819e9  # v5e
    print({"preset": preset, "batch": B,
           "two_ln_floor_ms": round(floor_bytes / hbm * 1e3, 3),
           "two_ln_floor_MB": round(floor_bytes / 1e6, 1)})
    measure(two_lns, "two_lns")
    measure(projections_only, "projections_only")
    measure(full_layer, "full_layer")
