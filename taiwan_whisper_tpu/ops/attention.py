"""Pallas self-attention kernel for the encoder (TPU).

Replaces the reference's SDPA/FlashAttention-2 native dependency
(training/run_distillation.py:133-143) for the encoder's fixed-length
(1500-position) non-causal self-attention. Whisper's sequence is short
enough that K/V for one (batch, head) fit comfortably in VMEM
(1536 x 64 x 2 B x 2 = ~0.4 MB), so the kernel does one full-row pass —
scores, fp32 softmax and the PV matmul all stay on-chip, eliminating the
[B, H, S, S] HBM round trip XLA would materialise between the two matmuls.

The kernel is VPU-bound (softmax over [BQ, S] fp32 scores; the MXU dots are
~2 us/cell while softmax passes dominate), so every elementwise pass over
the score matrix is engineered away:

* the 1/sqrt(d) scale is folded into q OUTSIDE the kernel ([B,S,H,D] is
  24x smaller than the score matrix at S=1500);
* padded key columns are masked by ADDING a precomputed [1, S_pad] bias row
  (0 / -inf) — one fused add instead of iota+compare+select passes;
* the softmax denominator rides the MXU: V is extended with a ones column
  (D=64 -> 128 lanes, which the PV matmul left half-idle anyway), so
  sum(exp) appears as output column D and the normalising division runs on
  the [BQ, D] output, never on [BQ, S].

Falls back to the XLA einsum path off-TPU or for unaligned shapes
(models/whisper.py chooses per-call).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q_BLOCK = 128
_NEG = float(np.finfo(np.float32).min)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # dot in the input dtype (bf16 on TPU -> full-rate MXU; an fp32 upcast
    # here measured ~6x slower) with fp32 accumulation. q arrives pre-scaled.
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [S_pad, D]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, S_pad] fp32
    scores = scores + bias_ref[0]  # -inf on padded key columns
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)  # unnormalised probabilities in [0, 1]
    # PV with the denominator as extra output column(s): v_ref is [S_pad,
    # 2D] = [V | ones | 0...]; column D of the product is sum(e).
    out = jax.lax.dot_general(
        e.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, 2D] fp32
    d = q.shape[-1]
    o_ref[0] = (out[:, :d] / out[:, d:d + 1]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret", "q_block"))
def encoder_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    interpret: bool = False,
    q_block: int = 0,
) -> jnp.ndarray:
    """Non-causal multi-head attention, q-scaled inside. [B,S,H,D] -> same.

    ``q_block=0`` auto-selects the largest block (fewest grid cells, fewest
    K/V VMEM re-streams): 512 measured fastest at both whisper-base and
    large-v2 shapes (PERF.md).
    """
    b, s, h, d = q.shape
    if q_block == 0:
        q_block = 512 if s >= 512 else _Q_BLOCK
    scale = d ** -0.5
    s_pad = _round_up(s, q_block)
    dtype = q.dtype

    def to_flat(x, pad_cols: int = 0):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        if s_pad != s or pad_cols:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, pad_cols)))
        return x

    qf = to_flat(q * jnp.asarray(scale, q.dtype))
    kf = to_flat(k)
    # V extended to 2D lanes: [V | ones | zeros] — the ones column turns the
    # PV matmul into PV + softmax-denominator in one MXU pass
    vf = to_flat(v, pad_cols=d)
    vf = vf.at[:, :s, d].set(jnp.asarray(1.0, dtype))
    # additive key-column mask: 0 on real columns, -inf on padding
    bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1) < s, 0.0, _NEG
    ).astype(jnp.float32)

    grid = (b * h, s_pad // q_block)
    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 2 * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * s_pad * s_pad * d,
            bytes_accessed=2 * b * h * s_pad * d * 3,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf, bias)

    out = out[:, :s].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))


def supported(s: int, d: int) -> bool:
    """Shapes the kernel handles efficiently (lane-aligned head dim)."""
    return d % 8 == 0 and d <= 256 and s >= _Q_BLOCK


# ---------------------------------------------------------------------------
# flash routing
# ---------------------------------------------------------------------------

_FLASH_BLOCK_Q = 512


def flash_supported(s: int, d: int) -> bool:
    """Shapes the in-tree flash kernel beats the full-row kernel on
    (measured, PERF.md round 3): needs lane-aligned heads and at least one
    full q block."""
    return d in (64, 128, 256) and s >= _FLASH_BLOCK_Q


@jax.jit
def encoder_attention_flash(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Non-causal attention via jax's in-tree TPU flash kernel.

    Measured faster than the full-row kernel at BOTH production shapes
    (whisper-base b64: 9.2 vs 10.9 ms; large-v2 b8: 3.7 vs 5.0 ms — both
    at h*s*s*d attention FLOPs, PERF.md round 3): its scheduler overlaps
    the VPU softmax of one q block with the MXU dots of the next, which
    the single-block full-row kernel serialises. kv rides in ONE whole-row
    block (block_k = padded S) so there is no running-max bookkeeping in
    practice; padded key columns are masked via segment ids.

    Also differentiable (the kernel has a custom VJP), so it is legal on
    the unfrozen-encoder fine-tuning path.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention,
    )

    b, s, h, d = q.shape
    sp = _round_up(s, _FLASH_BLOCK_Q)
    pad = ((0, 0), (0, 0), (0, sp - s), (0, 0))
    qt = jnp.pad(jnp.transpose(q, (0, 2, 1, 3)), pad)
    kt = jnp.pad(jnp.transpose(k, (0, 2, 1, 3)), pad)
    vt = jnp.pad(jnp.transpose(v, (0, 2, 1, 3)), pad)
    kv_seg = (jax.lax.broadcasted_iota(jnp.int32, (b, sp), 1) >= s).astype(
        jnp.int32
    )
    o = flash_attention(
        qt, kt, vt, causal=False, sm_scale=d ** -0.5,
        segment_ids=SegmentIds(q=jnp.zeros((b, sp), jnp.int32), kv=kv_seg),
        block_sizes=BlockSizes(
            block_q=_FLASH_BLOCK_Q, block_k_major=sp, block_k=sp, block_b=1,
            block_q_major_dkv=_FLASH_BLOCK_Q, block_k_major_dkv=sp,
            block_k_dkv=sp, block_q_dkv=_FLASH_BLOCK_Q,
            block_k_major_dq=sp, block_k_dq=sp, block_q_dq=_FLASH_BLOCK_Q,
        ),
    )
    return jnp.transpose(o[:, :, :s], (0, 2, 1, 3))


def best_encoder_attention(q, k, v):
    """Route to the fastest supported kernel for this shape."""
    b, s, h, d = q.shape
    if flash_supported(s, d):
        return encoder_attention_flash(q, k, v)
    return encoder_attention(q, k, v)
