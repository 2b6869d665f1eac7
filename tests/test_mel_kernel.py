"""The fused Pallas log-mel kernel must match the XLA frontend bit-for-bit in
semantics (same DFT matrices/filters); run in interpreter mode on CPU."""

import numpy as np

import jax.numpy as jnp

from taiwan_whisper_tpu.audio import mel as A
from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas


def test_pallas_mel_matches_xla():
    rng = np.random.RandomState(0)
    audio = (rng.randn(1, A.N_SAMPLES) * 0.1).astype(np.float32)
    ref = np.asarray(A.log_mel(jnp.asarray(audio)))
    ours = np.asarray(log_mel_pallas(jnp.asarray(audio), interpret=True))
    assert ours.shape == ref.shape == (1, A.N_FRAMES, 80)
    np.testing.assert_allclose(ours, ref, atol=2e-5)
