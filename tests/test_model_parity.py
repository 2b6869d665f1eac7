"""Numeric parity of the JAX Whisper against HF torch Whisper (random
weights, fp32, CPU) — the test seam SURVEY.md §4 calls for: "numeric parity
tests vs HF Whisper for encoder/decoder on CPU".

transformers/torch are test-only dependencies; the framework itself never
imports them.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.params import (
    hf_to_params,
    init_params,
    params_to_hf,
    mix_language_embeddings,
    spaced_layer_indices,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

FP32 = DtypePolicy.fp32()


def small_configs(decoder_layers=2):
    """Matching (ours, HF) small test configs."""
    kw = dict(
        vocab_size=1000,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=decoder_layers,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        max_source_positions=60,
        max_target_positions=32,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=1,
        decoder_start_token_id=2,
    )
    ours = WhisperConfig(ffn_dim=128, **kw)
    hf = transformers.WhisperConfig(
        encoder_ffn_dim=128, decoder_ffn_dim=128, **kw
    )
    return ours, hf


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    _, hf_cfg = small_configs()
    model = transformers.WhisperForConditionalGeneration(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jx(hf_model):
    cfg, _ = small_configs()
    params = hf_to_params(hf_model.state_dict(), cfg)
    return cfg, params


def _mel(batch=2, seed=0):
    cfg, _ = small_configs()
    rng = np.random.RandomState(seed)
    # HF takes [B, n_mels, frames]; we take [B, frames, n_mels]
    frames = cfg.max_source_positions * 2
    return rng.randn(batch, frames, 80).astype(np.float32)


def test_encoder_parity(hf_model, jx):
    cfg, params = jx
    mel = _mel()
    ours = np.asarray(M.encode(params, jnp.asarray(mel), cfg, FP32))
    with torch.no_grad():
        theirs = hf_model.model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_full_forward_parity(hf_model, jx):
    cfg, params = jx
    mel = _mel()
    tokens = np.array([[1, 5, 9, 400, 3], [2, 7, 999, 0, 1]], dtype=np.int32)
    ours = np.asarray(
        M.forward(params, jnp.asarray(mel), jnp.asarray(tokens), cfg, FP32)
    )
    with torch.no_grad():
        theirs = hf_model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_cached_decode_matches_teacher_forcing(jx):
    """decode_step chained over positions must reproduce decode_train logits:
    the KV-cache path (transposed [B,H,Dh,S] layout, one-hot update) is
    numerically identical to full-sequence attention."""
    cfg, params = jx
    mel = _mel()
    tokens = np.array([[1, 5, 9, 400, 3], [2, 7, 999, 0, 1]], dtype=np.int32)
    enc = M.encode(params, jnp.asarray(mel), cfg, FP32)
    full = np.asarray(M.decode_train(params, enc, jnp.asarray(tokens), cfg, FP32))

    cross_kv = M.precompute_cross_kv(params, enc, cfg, FP32)
    cache = M.init_cache(cfg, batch=2, max_len=16, dtype=jnp.float32)
    step_logits = []
    for i in range(tokens.shape[1]):
        logits, cache = M.decode_step(
            params, cross_kv, cache, jnp.asarray(tokens[:, i]), jnp.int32(i), cfg, FP32
        )
        step_logits.append(np.asarray(logits))
    stepped = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(stepped, full, atol=1e-4, rtol=1e-4)


def test_prefill_matches_steps(jx):
    """prefill(tokens[:P]) must leave the cache and final logits exactly as P
    sequential decode_steps would."""
    cfg, params = jx
    mel = _mel()
    tokens = np.array([[1, 5, 9, 400], [2, 7, 999, 0]], dtype=np.int32)
    enc = M.encode(params, jnp.asarray(mel), cfg, FP32)
    cross_kv = M.precompute_cross_kv(params, enc, cfg, FP32)

    cache_a = M.init_cache(cfg, 2, max_len=16, dtype=jnp.float32)
    logits_pre, cache_a, _ = M.prefill(params, cross_kv, cache_a, jnp.asarray(tokens), cfg, FP32)

    cache_b = M.init_cache(cfg, 2, max_len=16, dtype=jnp.float32)
    for i in range(tokens.shape[1]):
        logits_b, cache_b = M.decode_step(
            params, cross_kv, cache_b, jnp.asarray(tokens[:, i]), jnp.int32(i), cfg, FP32
        )
    np.testing.assert_allclose(np.asarray(logits_pre), np.asarray(logits_b), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cache_a.k), np.asarray(cache_b.k), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_a.v), np.asarray(cache_b.v), atol=1e-5)


def test_hf_roundtrip(hf_model, jx):
    import jax as _jax

    cfg, params = jx
    sd = params_to_hf(params, cfg)
    params2 = hf_to_params(sd, cfg)
    for (pa, la), (pb, lb) in zip(
        _jax.tree_util.tree_leaves_with_path(params),
        _jax.tree_util.tree_leaves_with_path(params2),
    ):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=0, err_msg=str(pa))


def test_student_init_spacing():
    # reference create_student_model.py:139-150: np.linspace(..., dtype=int)
    # (truncation) with the last index forced to L-1
    assert spaced_layer_indices(32, 2) == [0, 31]
    assert spaced_layer_indices(32, 4) == [0, 10, 20, 31]
    assert spaced_layer_indices(4, 4) == [0, 1, 2, 3]
    assert spaced_layer_indices(32, 16) == [
        0, 2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 31]


def test_layers_to_supervise_matches_reference():
    # reference flax/run_distillation.py get_layers_to_supervise:971-987
    # docstring example: (student=3, teacher=12) -> {0: 3, 1: 7, 2: 11}
    from taiwan_whisper_tpu.models.params import layers_to_supervise

    assert layers_to_supervise(3, 12) == [3, 7, 11]
    assert layers_to_supervise(2, 32) == [15, 31]
    assert layers_to_supervise(1, 6) == [5]


def test_student_init_encoder_slicing(jx):
    from taiwan_whisper_tpu.models.params import init_student_from_teacher

    cfg, params = jx
    n = cfg.encoder_layers // 2
    student = init_student_from_teacher(
        params, cfg, decoder_layers=1, encoder_layers=n
    )
    assert student["encoder"]["layers"]["fc1"]["kernel"].shape[0] == n
    # first sliced layer is teacher encoder layer 0, last is teacher's last
    idx = spaced_layer_indices(cfg.encoder_layers, n)
    for si, ti in enumerate(idx):
        np.testing.assert_array_equal(
            np.asarray(student["encoder"]["layers"]["fc1"]["kernel"][si]),
            np.asarray(params["encoder"]["layers"]["fc1"]["kernel"][ti]),
        )


def test_student_init_copies_layers(jx):
    from taiwan_whisper_tpu.models.params import init_student_from_teacher

    cfg, params = jx
    student = init_student_from_teacher(params, cfg, decoder_layers=1)
    # the reference forces mapping[-1] = L-1 (create_student_model.py:147),
    # so a 1-layer student copies the LAST teacher decoder layer
    t0 = params["decoder"]["layers"]["fc1"]["kernel"][cfg.decoder_layers - 1]
    s0 = student["decoder"]["layers"]["fc1"]["kernel"][0]
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(s0))
    assert student["decoder"]["layers"]["fc1"]["kernel"].shape[0] == 1


def test_mix_language_embeddings(jx):
    cfg, params = jx
    new = mix_language_embeddings(params, target_id=5, source_ids=[5, 7])
    emb = params["decoder"]["embed_tokens"]
    expected = 0.5 * emb[5] + 0.5 * emb[7]
    np.testing.assert_allclose(
        np.asarray(new["decoder"]["embed_tokens"][5]), np.asarray(expected), atol=1e-6
    )
    # untouched rows unchanged
    np.testing.assert_array_equal(
        np.asarray(new["decoder"]["embed_tokens"][6]), np.asarray(emb[6])
    )
