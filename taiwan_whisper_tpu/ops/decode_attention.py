"""Pallas decode-step attention kernels (TPU) — EXPERIMENTAL, opt-in.

Incremental (one-query-token) decoding is HBM-bandwidth-bound: every step
streams the full cross-attention K/V (whisper-base batch 96: ~150 MB int8 per
layer) and the self-attention cache. These kernels fuse score + mask +
softmax + PV into one VMEM-resident pass per (batch, head).

MEASURED RESULT (v5e, whisper-base decode shapes, PERF.md): the XLA einsum
path already streams K/V at 620-740 GB/s (76-90% of HBM peak) and the
int8->bf16 dequant is VPU-bound in either implementation, so the per-grid-
cell overhead (~1.2 us x B*H cells x 2 calls x L layers per step) makes the
kernels 4-6x SLOWER than XLA here. They are kept (a) as the measurement
harness for that negative result, (b) for experimentation at shapes where
the trade flips (longer T, fewer/larger heads). The model layer gates them
behind an explicit ``use_pallas=True`` opt-in (models/whisper.py::
_use_pallas_decode); numerics are verified in interpret mode by
tests/test_decode_attention_kernel.py and on-chip vs the XLA path.

Design (per grid cell = one (batch, head)):

* ``cross_decode_attention`` — q against per-utterance encoder K/V
  ([B,H,T,D], bf16 or int8 storage; int8 is dequantized in-register so the
  HBM stream stays 1 byte/element). Scales (and 1/sqrt(d)) are folded into q
  and the output by the caller (models/whisper.py::_cross_attention).
* ``self_decode_attention`` — q against the transposed KV cache
  ([B,H,D,S], reference layout trick modeling_flax_whisper.py:384-453) with
  position masking (pos < index, pos >= valid_from) and the CURRENT token's
  k/v folded in via a flash-style rescale, so the cache stays a read-only
  loop carry (committed once per step by the caller).

Replaces the per-step attention the reference buys from CTranslate2 /
HF generate (pseudo-labelling/initial_inference.py:64-90,
training/run_pseudo_labelling.py:918). Numerical contract: scores and
softmax statistics in fp32, dots on the MXU with fp32 accumulation, output
fp32. Each grid cell broadcasts q over 8 sublanes (the fp32 min tile); the
waste is negligible next to the K/V stream that dominates the cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float(np.finfo(np.float32).min)
_ROWS = 8  # q is replicated over the fp32 sublane tile


def _cross_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # [8, D] (scale pre-folded)
    k = k_ref[0].astype(q.dtype)  # [T, D]; int8 storage casts in VMEM
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [8, T]
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(q.dtype), v_ref[0].astype(q.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def cross_decode_attention(
    q: jnp.ndarray,  # [B, H, D] compute dtype, scale already folded in
    k: jnp.ndarray,  # [B, H, T, D] bf16 / int8
    v: jnp.ndarray,  # [B, H, T, D]
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-token cross-attention. Returns fp32 [B, H, D]."""
    b, h, t, d = k.shape
    bh = b * h
    qf = jnp.broadcast_to(q.reshape(bh, 1, d), (bh, _ROWS, d))
    out = pl.pallas_call(
        _cross_kernel,
        out_shape=jax.ShapeDtypeStruct((bh, _ROWS, d), jnp.float32),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, _ROWS, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROWS, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * t * d,
            bytes_accessed=2 * bh * t * d * k.dtype.itemsize,
            transcendentals=bh * t,
        ),
        interpret=interpret,
    )(qf, k.reshape(bh, t, d), v.reshape(bh, t, d))
    return out[:, 0].reshape(b, h, d)


def _self_kernel(idx_ref, cur_ref, vf_ref, q_ref, k_ref, v_ref, vt_ref, o_ref):
    i = pl.program_id(0)
    idx = idx_ref[0, 0]
    vf = vf_ref[i, 0]
    cur = cur_ref[i, 0]  # fp32 logit of the current token
    q = q_ref[0]  # [8, D]
    k = k_ref[0]  # [D, S] — transposed cache layout, seq on lanes
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [8, S]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    keep = jnp.logical_and(col < idx, col >= vf)
    scores = jnp.where(keep, scores, _NEG)
    # flash-style combine of the cache scores with the current-token logit
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), cur)  # [8,1]
    e = jnp.exp(scores - m)
    e_cur = jnp.exp(cur - m)  # [8,1]
    den = jnp.sum(e, axis=-1, keepdims=True) + e_cur
    n = jax.lax.dot_general(
        e.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [8, D]
    o_ref[0] = (n + e_cur * vt_ref[0].astype(jnp.float32)) / den


@functools.partial(jax.jit, static_argnames=("interpret",))
def self_decode_attention(
    q: jnp.ndarray,  # [B, H, D] compute dtype, 1/sqrt(d) already folded in
    cache_k: jnp.ndarray,  # [B, H, D, S]
    cache_v: jnp.ndarray,  # [B, H, D, S]
    k_t: jnp.ndarray,  # [B, H, D] current token's key
    v_t: jnp.ndarray,  # [B, H, D] current token's value
    index: jnp.ndarray,  # scalar int32: cache positions < index are valid
    valid_from: jnp.ndarray,  # [B] int32: positions below are masked
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-token self-attention over the cache + current token. fp32 [B,H,D]."""
    b, h, d, s = cache_k.shape
    bh = b * h
    cur = jnp.einsum(
        "bhd,bhd->bh", q.astype(jnp.float32), k_t.astype(jnp.float32)
    ).reshape(bh, 1)
    qf = jnp.broadcast_to(q.reshape(bh, 1, d), (bh, _ROWS, d))
    vtf = jnp.broadcast_to(v_t.reshape(bh, 1, d), (bh, _ROWS, d))
    idx = jnp.full((1, 1), index, jnp.int32)
    vf = jnp.broadcast_to(
        valid_from.astype(jnp.int32).reshape(b, 1, 1), (b, h, 1)
    ).reshape(bh, 1)
    out = pl.pallas_call(
        _self_kernel,
        out_shape=jax.ShapeDtypeStruct((bh, _ROWS, d), jnp.float32),
        grid=(bh,),
        in_specs=[
            # scalar operands live whole in SMEM (per-cell SMEM blocks are
            # not supported); the kernel indexes them by program_id
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bh, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bh, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _ROWS, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROWS, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * s * d,
            bytes_accessed=2 * bh * s * d * cache_k.dtype.itemsize,
            transcendentals=bh * s,
        ),
        interpret=interpret,
    )(idx, cur.astype(jnp.float32), vf, qf,
      cache_k.reshape(bh, d, s), cache_v.reshape(bh, d, s), vtf)
    return out[:, 0].reshape(b, h, d)


def supported(d: int) -> bool:
    """Head dims the kernels handle (lane-aligned, fits VMEM comfortably)."""
    return d % 8 == 0 and d <= 256
