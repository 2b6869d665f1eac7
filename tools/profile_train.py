"""Distillation train-step throughput on the real chip.

The reference's headline training cost is 120k steps at global batch 256 in
~42 h on 4x H100 (~51 samples/s per GPU, K2D §4.2 / BASELINE.md). This
times our jit train step — frozen shared encoder, CE + T^2·KL — at the
same per-model shapes (teacher large-v2, student = 32-enc/2-dec) and
reports samples/s per chip.

Usage: python tools/profile_train.py [model_preset] [batch]
(default large-v2 8; use `base 32` for a quick probe).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params, init_student_from_teacher
from taiwan_whisper_tpu.train.distill import DistillConfig, make_train_step
from taiwan_whisper_tpu.train.state import (
    OptimConfig,
    make_optimizer,
    trainable_mask,
)

preset = sys.argv[1] if len(sys.argv) > 1 else "large-v2"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
U = 256  # label length (reference pads target=max 448; 256 is typical)

teacher_cfg = get_config(preset)
teacher = init_params(teacher_cfg, seed=0)
student_cfg = teacher_cfg.with_decoder_layers(2)
student = init_student_from_teacher(teacher, teacher_cfg, 2)
policy = DtypePolicy.bf16()

to_bf16 = lambda t: jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
)
teacher = to_bf16(teacher)  # teacher is inference-only

opt = make_optimizer(
    OptimConfig(learning_rate=1e-4, total_steps=1000),
    mask=trainable_mask(student, freeze_encoder=True),
)
opt_state = opt.init(student)
step = make_train_step(student_cfg, teacher_cfg, DistillConfig(), opt, policy)
step = jax.jit(step, donate_argnums=(0, 1))

rng = np.random.RandomState(0)
mel = jnp.asarray(rng.randn(batch, 3000, teacher_cfg.num_mel_bins)
                  .astype(np.float32) * 0.5)
dec_in = jnp.asarray(rng.randint(0, 50000, (batch, U)).astype(np.int32))
labels = jnp.asarray(rng.randint(0, 50000, (batch, U)).astype(np.int32))
batch_d = {"mel": mel, "decoder_input_ids": dec_in, "labels": labels}

student, opt_state, metrics = step(student, opt_state, teacher, batch_d)
np.asarray(metrics["loss"])  # compile + warm

ITERS = 8
t0 = time.perf_counter()
for _ in range(ITERS):
    student, opt_state, metrics = step(student, opt_state, teacher, batch_d)
    np.asarray(metrics["loss"])
dt = (time.perf_counter() - t0) / ITERS
print(json.dumps({
    "preset": preset,
    "batch": batch,
    "step_ms": round(dt * 1e3, 1),
    "samples_per_s": round(batch / dt, 2),
    "vs_h100_51_samples_s": round(batch / dt / 51.0, 2),
}))
