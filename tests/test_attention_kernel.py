"""Pallas encoder-attention kernel parity vs the einsum reference
(interpreter mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from taiwan_whisper_tpu.models.whisper import _attention
from taiwan_whisper_tpu.ops.attention import encoder_attention, supported


def test_kernel_matches_einsum():
    rng = np.random.RandomState(0)
    b, s, h, d = 2, 300, 4, 64  # padded to 384 internally
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    ref = np.asarray(_attention(q, k, v, None, jnp.float32))
    out = np.asarray(encoder_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_kernel_aligned_seq():
    rng = np.random.RandomState(1)
    b, s, h, d = 1, 256, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    ref = np.asarray(_attention(q, k, v, None, jnp.float32))
    out = np.asarray(encoder_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_supported_shapes():
    assert supported(1500, 64)
    assert not supported(64, 64)  # too short to block
    assert not supported(1500, 63)  # unaligned head dim
