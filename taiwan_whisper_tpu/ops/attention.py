"""Pallas self-attention kernel for the encoder (TPU).

Replaces the reference's SDPA/FlashAttention-2 native dependency
(training/run_distillation.py:133-143) for the encoder's fixed-length
(1500-position) non-causal self-attention. Whisper's sequence is short
enough that K/V for one (batch, head) fit comfortably in VMEM
(1536 x 64 x 2 B x 2 = ~0.4 MB), so the kernel does one full-row pass —
scores, fp32 softmax and the PV matmul all stay on-chip, eliminating the
[B, H, S, S] HBM round trip XLA would materialise between the two matmuls.

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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, s_real):
    # dot in the input dtype (bf16 on TPU -> full-rate MXU; an fp32 upcast
    # here measured ~6x slower) with fp32 accumulation; the 1/sqrt(d) scale
    # applies to the fp32 scores, preserving numerics
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [S_pad, D]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BQ, S_pad] fp32
    s_pad = scores.shape[-1]
    if s_real < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < s_real, scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret", "q_block"))
def encoder_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    interpret: bool = False,
    q_block: int = _Q_BLOCK,
) -> jnp.ndarray:
    """Non-causal multi-head attention, q-scaled inside. [B,S,H,D] -> same."""
    b, s, h, d = q.shape
    scale = d ** -0.5
    s_pad = _round_up(s, q_block)
    dtype = q.dtype

    def to_flat(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        return x

    qf, kf, vf = to_flat(q), to_flat(k), to_flat(v)

    grid = (b * h, s_pad // q_block)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, s_real=s),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
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
    )(qf, kf, vf)

    out = out[:, :s].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))


def supported(s: int, d: int) -> bool:
    """Shapes the kernel handles efficiently (lane-aligned head dim)."""
    return d % 8 == 0 and d <= 256 and s >= _Q_BLOCK
