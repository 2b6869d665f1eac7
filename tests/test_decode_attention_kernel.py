"""Parity tests for the Pallas decode-step attention kernels (interpret mode).

The kernels (ops/decode_attention.py) must match the XLA einsum path of
models/whisper.py::_cached_self_attn / _cross_attention bit-for-bit in fp32
up to dot-order rounding. On CPU they run in Pallas interpret mode; on real
TPU the same code paths are exercised by the decode parity suite (the model
routes through the kernels automatically there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taiwan_whisper_tpu.ops.decode_attention import (
    cross_decode_attention,
    self_decode_attention,
)


def _ref_cross(q, k, v):
    # q [B,H,D] pre-scaled; k/v [B,H,T,D]
    logits = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bht,bhtd->bhd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("t", [160, 1500])
def test_cross_kernel_matches_einsum(t):
    rng = np.random.RandomState(0)
    b, h, d = 3, 4, 64
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    out = cross_decode_attention(q, k, v, interpret=True)
    ref = _ref_cross(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_cross_kernel_int8_storage():
    rng = np.random.RandomState(1)
    b, h, t, d = 2, 2, 256, 64
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    k8 = jnp.asarray(rng.randint(-127, 128, (b, h, t, d)).astype(np.int8))
    v8 = jnp.asarray(rng.randint(-127, 128, (b, h, t, d)).astype(np.int8))
    out = cross_decode_attention(q, k8, v8, interpret=True)
    ref = _ref_cross(q, k8.astype(jnp.float32), v8.astype(jnp.float32))
    # int8 values up to 127 with float32 q: dot accumulation differences only
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-3)


def _ref_self(q, ck, cv, k_t, v_t, index, valid_from):
    # q [B,H,D] pre-scaled; ck/cv [B,H,D,S] transposed cache
    b, h, d, s = ck.shape
    logits = jnp.einsum("bhd,bhds->bhs", q.astype(jnp.float32), ck.astype(jnp.float32))
    pos = jnp.arange(s)
    keep = (pos[None, None] < index) & (pos[None, None] >= valid_from[:, None, None])
    logits = jnp.where(keep, logits, jnp.finfo(jnp.float32).min)
    cur = jnp.einsum("bhd,bhd->bh", q.astype(jnp.float32), k_t.astype(jnp.float32))
    logits = jnp.concatenate([logits, cur[..., None]], axis=-1)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhs,bhds->bhd", p[..., :s], cv.astype(jnp.float32))
    return out + p[..., s:] * v_t.astype(jnp.float32)


@pytest.mark.parametrize("index,vf", [(0, 0), (5, 0), (5, 2), (190, 0)])
def test_self_kernel_matches_einsum(index, vf):
    rng = np.random.RandomState(2)
    b, h, d, s = 3, 4, 64, 195
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    ck = jnp.asarray(rng.randn(b, h, d, s).astype(np.float32))
    cv = jnp.asarray(rng.randn(b, h, d, s).astype(np.float32))
    k_t = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    v_t = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    valid_from = jnp.full((b,), vf, jnp.int32)
    out = self_decode_attention(
        q, ck, cv, k_t, v_t, jnp.int32(index), valid_from, interpret=True
    )
    ref = _ref_self(q, ck, cv, k_t, v_t, jnp.int32(index), valid_from)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_self_kernel_per_row_valid_from():
    rng = np.random.RandomState(3)
    b, h, d, s = 4, 2, 64, 64
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    ck = jnp.asarray(rng.randn(b, h, d, s).astype(np.float32))
    cv = jnp.asarray(rng.randn(b, h, d, s).astype(np.float32))
    k_t = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    v_t = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    valid_from = jnp.asarray([0, 3, 7, 12], jnp.int32)
    out = self_decode_attention(
        q, ck, cv, k_t, v_t, jnp.int32(20), valid_from, interpret=True
    )
    ref = _ref_self(q, ck, cv, k_t, v_t, jnp.int32(20), valid_from)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
