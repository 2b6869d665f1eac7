"""Distillation training: loss semantics, step mechanics, TP/DP sharding
equivalence on the virtual 8-device CPU mesh, checkpoint rotation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.models.config import DtypePolicy, WhisperConfig
from taiwan_whisper_tpu.models.params import init_params, init_student_from_teacher
from taiwan_whisper_tpu.parallel.mesh import make_mesh, use_mesh
from taiwan_whisper_tpu.parallel.specs import param_partition_specs, shard_params
from taiwan_whisper_tpu.train.distill import (
    DistillConfig,
    distill_loss,
    kl_divergence,
    make_train_step,
    masked_cross_entropy,
)
from taiwan_whisper_tpu.train.state import CheckpointManager, OptimConfig, make_optimizer

FP32 = DtypePolicy.fp32()


def _cfg(dec_layers=2):
    return WhisperConfig(
        vocab_size=256, num_mel_bins=80, d_model=64, ffn_dim=128,
        encoder_layers=2, decoder_layers=dec_layers,
        encoder_attention_heads=4, decoder_attention_heads=4,
        max_source_positions=60, max_target_positions=32,
    )


def _batch(b=4, u=8, seed=0):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 256, (b, u)).astype(np.int32)
    labels[:, :2] = -100  # prompt positions masked
    labels[-1, -3:] = -100  # padding
    return {
        "mel": jnp.asarray(rng.randn(b, 120, 80).astype(np.float32)),
        "decoder_input_ids": jnp.asarray(rng.randint(0, 256, (b, u)).astype(np.int32)),
        "labels": jnp.asarray(labels),
    }


def test_masked_ce_and_kl():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 4, 10).astype(np.float32))
    labels = jnp.asarray([[1, 2, -100, 3], [-100, -100, 5, 6]], dtype=jnp.int32)
    ce_sum, n = masked_cross_entropy(logits, labels)
    assert int(n) == 5
    # manual CE for one position
    lp = jax.nn.log_softmax(logits, -1)
    manual = -(lp[0, 0, 1] + lp[0, 1, 2] + lp[0, 3, 3] + lp[1, 2, 5] + lp[1, 3, 6])
    np.testing.assert_allclose(float(ce_sum), float(manual), rtol=1e-6)
    # KL of identical distributions is 0
    kl_sum, _ = kl_divergence(logits, logits, labels, temperature=2.0)
    np.testing.assert_allclose(float(kl_sum), 0.0, atol=1e-5)


def test_distill_loss_teacher_equals_student():
    cfg = _cfg()
    params = init_params(cfg, seed=0)
    dcfg = DistillConfig(mse_weight=1.0)
    loss, metrics = distill_loss(
        params, params, _batch(), cfg, cfg, dcfg, FP32
    )
    np.testing.assert_allclose(float(metrics["kl"]), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(metrics["mse"]), 0.0, atol=1e-6)
    assert float(metrics["ce"]) > 1.0  # random model on random labels
    np.testing.assert_allclose(
        float(loss), 0.8 * float(metrics["ce"]), rtol=1e-4
    )


def test_train_step_learns_and_freezes():
    teacher_cfg = _cfg(dec_layers=2)
    teacher = init_params(teacher_cfg, seed=0)
    student_cfg = teacher_cfg.with_decoder_layers(1)
    student = init_student_from_teacher(teacher, teacher_cfg, 1)

    dcfg = DistillConfig()
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0, schedule="constant_with_warmup"))
    step = jax.jit(make_train_step(student_cfg, teacher_cfg, dcfg, opt, FP32))
    opt_state = opt.init(student)
    batch = _batch()

    losses = []
    p = student
    for _ in range(8):
        p, opt_state, m = step(p, opt_state, teacher, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # frozen subtrees unchanged
    np.testing.assert_array_equal(
        np.asarray(p["encoder"]["conv1"]["kernel"]),
        np.asarray(student["encoder"]["conv1"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(p["decoder"]["embed_positions"]),
        np.asarray(student["decoder"]["embed_positions"]),
    )
    # trainable decoder layers did change
    assert not np.allclose(
        np.asarray(p["decoder"]["layers"]["fc1"]["kernel"]),
        np.asarray(student["decoder"]["layers"]["fc1"]["kernel"]),
    )


def test_partition_specs_structure():
    cfg = _cfg()
    params = init_params(cfg, seed=0)
    specs = param_partition_specs(params)
    from jax.sharding import PartitionSpec as P

    # vocab table replicated (51865 has no practical divisors; see specs.py)
    assert specs["decoder"]["embed_tokens"] == P()
    # stacked layer params get a leading None axis
    assert specs["encoder"]["layers"]["self_attn"]["q"]["kernel"] == P(None, None, "model")
    assert specs["encoder"]["layers"]["fc2"]["kernel"] == P(None, "model", None)
    assert specs["encoder"]["conv1"]["kernel"] == P()
    assert specs["decoder"]["ln_post"]["scale"] == P()


def test_sharded_train_step_matches_single_device():
    """One train step on a (data=4, model=2) mesh must equal the single-device
    result — validates the whole TP layout + sharding-constraint plumbing."""
    teacher_cfg = _cfg(dec_layers=2)
    teacher = init_params(teacher_cfg, seed=0)
    student_cfg = teacher_cfg.with_decoder_layers(1)
    student = init_student_from_teacher(teacher, teacher_cfg, 1)
    dcfg = DistillConfig()
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0))
    batch = _batch(b=4)

    step_fn = make_train_step(student_cfg, teacher_cfg, dcfg, opt, FP32)

    # single device reference
    p1, os1, m1 = jax.jit(step_fn)(student, opt.init(student), teacher, batch)

    mesh = make_mesh(data=4, model=2)
    with use_mesh(mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        student_s = shard_params(mesh, student)
        teacher_s = shard_params(mesh, teacher)
        batch_s = jax.device_put(
            batch, NamedSharding(mesh, P("data"))
        )
        p2, os2, m2 = jax.jit(step_fn)(
            student_s, opt.init(student_s), teacher_s, batch_s
        )
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p1),
            jax.tree_util.tree_leaves_with_path(p2),
        ):
            # cross-device reduction order shifts a few ulps, which Adam's
            # rsqrt amplifies for near-zero second moments — 1e-4 is tight
            # enough to catch any real layout bug
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, err_msg=str(path)
            )


def test_grad_accumulation():
    """accum=2 over two half-batches ~ accum=1 over the full batch (MultiSteps
    averages grads; Adam sees one combined update)."""
    cfg = _cfg(dec_layers=1)
    teacher = init_params(_cfg(dec_layers=2), seed=0)
    teacher_cfg = _cfg(dec_layers=2)
    student = init_student_from_teacher(teacher, teacher_cfg, 1)
    dcfg = DistillConfig()
    full = _batch(b=4)
    halves = [
        {k: v[:2] for k, v in full.items()},
        {k: v[2:] for k, v in full.items()},
    ]

    opt1 = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=0))
    step1 = jax.jit(make_train_step(cfg, teacher_cfg, dcfg, opt1, FP32))
    p1, _, _ = step1(student, opt1.init(student), teacher, full)

    opt2 = make_optimizer(
        OptimConfig(learning_rate=1e-3, warmup_steps=0, grad_accum_steps=2)
    )
    step2 = jax.jit(make_train_step(cfg, teacher_cfg, dcfg, opt2, FP32))
    p2, os2 = student, opt2.init(student)
    for h in halves:
        p2, os2, _ = step2(p2, os2, teacher, h)

    a = np.asarray(p1["decoder"]["layers"]["fc1"]["kernel"])
    b = np.asarray(p2["decoder"]["layers"]["fc1"]["kernel"])
    s = np.asarray(student["decoder"]["layers"]["fc1"]["kernel"])
    # both must have moved, in the same direction and similar magnitude
    assert not np.allclose(a, s) and not np.allclose(b, s)
    da, db = a - s, b - s
    cos = float((da * db).sum() / (np.linalg.norm(da) * np.linalg.norm(db)))
    assert cos > 0.9, cos


def test_checkpoint_manager(tmp_path):
    cm = CheckpointManager(str(tmp_path), save_total_limit=2)
    state = {"params": {"w": jnp.ones((3,))}, "step": jnp.int32(1)}
    cm.save(10, state)
    cm.save(20, jax.tree.map(lambda x: x * 2, state), keep=True)
    cm.save(30, jax.tree.map(lambda x: x * 3, state))
    cm.save(40, jax.tree.map(lambda x: x * 4, state))
    steps = cm.all_steps()
    assert 20 in steps  # protected best checkpoint survives rotation
    assert len([s for s in steps if s != 20]) <= 2
    restored, step = cm.restore(like=state)
    assert step == 40
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 4.0)


def test_masked_optimizer_skips_frozen_moments():
    """optax.masked via trainable_mask: no AdamW moments for the frozen
    encoder / positional table, identical updates for trainable leaves."""
    import optax

    from taiwan_whisper_tpu.train.state import trainable_mask

    teacher_cfg = _cfg(dec_layers=2)
    teacher = init_params(teacher_cfg, seed=0)
    student_cfg = teacher_cfg.with_decoder_layers(1)
    student = init_student_from_teacher(teacher, teacher_cfg, 1)

    mask = trainable_mask(student, freeze_encoder=True)
    assert mask["decoder"]["embed_positions"] is False
    assert all(not leaf for leaf in jax.tree.leaves(mask["encoder"]))
    assert mask["decoder"]["layers"]["fc1"]["kernel"] is True

    ocfg = OptimConfig(learning_rate=1e-3, warmup_steps=0)
    opt = make_optimizer(ocfg, mask=mask)
    state = opt.init(student)
    # masked leaves hold MaskedNode placeholders, not moment arrays
    inner = state[0]  # MaskedState wrapping the adamw chain
    mus = [l for l in jax.tree.leaves(inner, is_leaf=lambda x: x is None)]
    n_opt_arrays = sum(
        1 for l in jax.tree.leaves(state) if hasattr(l, "shape") and l.ndim > 0
    )
    n_trainable = sum(
        1 for l, m in zip(jax.tree.leaves(student), jax.tree.leaves(mask)) if m
    )
    # mu+nu per trainable leaf (plus scalar counts) — far fewer arrays than
    # 2x all leaves
    assert n_opt_arrays <= 2 * n_trainable, (n_opt_arrays, n_trainable)

    # training still works and matches the unmasked optimizer on trainables
    dcfg = DistillConfig()
    step = jax.jit(make_train_step(student_cfg, teacher_cfg, dcfg, opt, FP32))
    batch = _batch()
    p, state2, m = step(student, state, teacher, batch)
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_array_equal(
        np.asarray(p["encoder"]["conv1"]["kernel"]),
        np.asarray(student["encoder"]["conv1"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(p["decoder"]["layers"]["fc1"]["kernel"]),
        np.asarray(student["decoder"]["layers"]["fc1"]["kernel"]),
    )
