"""Fused LayerNorm Pallas kernel (TPU): bf16 IO, fp32 statistics, one pass.

Motivation (PERF.md round 3): the large-v2 encoder layer's projection/LN
stack measures 6.03 ms vs a 2.40 ms matmul speed-of-light at bs 8, with
"fp32 LayerNorm HBM passes" a named suspect — models/whisper.py::_layer_norm
upcasts the whole [B, 1500, 1280] stream to fp32, so XLA materialises 2x-
sized temporaries between the stats pass and the normalise pass. This
kernel reads each row tile once into VMEM, computes mean/variance in fp32
registers, and writes the normalised bf16 rows straight back — one HBM
round trip at the storage width.

Rows are independent, so the grid tiles the flattened row dimension; the
feature dimension d rides the lanes (must be a multiple of 128 — true for
all Whisper sizes: 384/512/768/1024/1280).

Status: a parity-tested CANDIDATE kernel, not wired into the model —
profiling at large-v2 encoder shapes (PERF.md round 4, tools/profile_ln.py)
measured it neutral standalone (3.13 vs 3.15 ms) and a net LOSS in situ
(the kernel boundary blocks XLA's surrounding fusions), so the encoder
keeps XLA LN. It covers the same role as the reference's flax LayerNorm
(layers.py:759-816); numerics match models/whisper.py::_layer_norm to bf16
resolution (tests/test_ln_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 256


def _ln_kernel(x_ref, sb_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [R, d]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * sb_ref[0:1].astype(jnp.float32) + sb_ref[1:2].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def supported(d: int) -> bool:
    return d % 128 == 0


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def layer_norm_pallas(
    x: jnp.ndarray,  # [..., d]
    scale: jnp.ndarray,  # [d]
    bias: jnp.ndarray,  # [d]
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the last axis; returns x.dtype. d must be 128-aligned."""
    d = x.shape[-1]
    assert supported(d), f"feature dim {d} not 128-aligned"
    orig_shape = x.shape
    n = 1
    for s in orig_shape[:-1]:
        n *= s
    x2 = x.reshape(n, d)
    n_pad = (-n) % _ROW_BLOCK
    if n_pad:
        x2 = jnp.pad(x2, ((0, n_pad), (0, 0)))
    sb = jnp.stack([scale, bias]).astype(x.dtype)  # [2, d]
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(x2.shape[0] // _ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, sb)
    if n_pad:
        out = out[:n]
    return out.reshape(orig_shape)
