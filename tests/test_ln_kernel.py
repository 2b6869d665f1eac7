"""Fused LayerNorm kernel parity vs models/whisper.py::_layer_norm."""

import jax.numpy as jnp
import numpy as np

from taiwan_whisper_tpu.models.whisper import _layer_norm
from taiwan_whisper_tpu.ops.layer_norm import layer_norm_pallas, supported


def _ref(x, scale, bias):
    return _layer_norm({"scale": scale, "bias": bias}, x)


def test_ln_kernel_matches_fp32():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 37, 256).astype(np.float32) * 3 + 1)
    scale = jnp.asarray(rng.randn(256).astype(np.float32))
    bias = jnp.asarray(rng.randn(256).astype(np.float32))
    got = layer_norm_pallas(x, scale, bias, interpret=True)
    want = _ref(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ln_kernel_matches_bf16_io():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 300, 128).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.randn(128).astype(np.float32))
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    got = layer_norm_pallas(x, scale, bias, interpret=True)
    want = _ref(x, scale, bias)
    assert got.dtype == jnp.bfloat16
    # scale/bias are applied at bf16 operand width in the kernel; bound the
    # difference at bf16 resolution of the normalised magnitudes
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    ref_mag = np.abs(np.asarray(want, np.float32)) + 1.0
    assert float((diff / ref_mag).max()) < 0.05


def test_ln_kernel_row_padding():
    # rows not a multiple of the 256-row block exercise the pad/slice path
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 100, 128).astype(np.float32))
    scale = jnp.ones(128, jnp.float32)
    bias = jnp.zeros(128, jnp.float32)
    got = layer_norm_pallas(x, scale, bias, interpret=True)
    want = _ref(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_supported():
    assert supported(1280) and supported(512)
    assert not supported(60)
