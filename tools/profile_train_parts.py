"""Per-part timing of the large-v2 distillation step on the real chip."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params, init_student_from_teacher
from taiwan_whisper_tpu.train.distill import (
    DistillConfig,
    kl_divergence,
    masked_cross_entropy,
)

ITERS = 4
preset = sys.argv[1] if len(sys.argv) > 1 else "large-v2"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
U = 256

teacher_cfg = get_config(preset)
teacher = init_params(teacher_cfg, seed=0)
student_cfg = teacher_cfg.with_decoder_layers(2)
student = init_student_from_teacher(teacher, teacher_cfg, 2)
policy = DtypePolicy.bf16()
to_bf16 = lambda t: jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
)
teacher = to_bf16(teacher)

rng = np.random.RandomState(0)
mel = jnp.asarray(rng.randn(B, 3000, teacher_cfg.num_mel_bins).astype(np.float32) * 0.5)
dec_in = jnp.asarray(rng.randint(0, 50000, (B, U)).astype(np.int32))
labels = jnp.asarray(rng.randint(0, 50000, (B, U)).astype(np.int32))


def timed(fn, *args):
    """Time fn in an in-jit fori_loop. Params must be passed through *args —
    closing over them captures multi-GB constants into the jaxpr (the
    lowering then dies on large-v2)."""
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    return round((time.perf_counter() - t0) / ITERS * 1e3, 1)


enc = jax.jit(lambda p, m: M.encode(p, m, student_cfg, policy))(student, mel)

res = {"preset": preset, "batch": B}
res["encode_fwd_ms"] = timed(
    lambda i, p, m: jnp.sum(
        M.encode(p, m + i * 1e-9, student_cfg, policy)[:, 0, 0]
    ).astype(jnp.float32), student, mel)
res["teacher_dec_fwd_ms"] = timed(
    lambda i, p, e: jnp.sum(
        M.decode_train(p, e + i * jnp.bfloat16(1e-9), dec_in,
                       teacher_cfg, policy)[:, 0, 0]
    ).astype(jnp.float32), teacher, enc)
res["student_dec_fwd_ms"] = timed(
    lambda i, p, e: jnp.sum(
        M.decode_train(p, e + i * jnp.bfloat16(1e-9), dec_in,
                       student_cfg, policy)[:, 0, 0]
    ).astype(jnp.float32), student, enc)


def stu_loss(p, e):
    lg = M.decode_train(p, e, dec_in, student_cfg, policy)
    ce, n = masked_cross_entropy(lg, labels)
    return ce / jnp.maximum(n, 1)


grad = jax.grad(lambda p, i, e: stu_loss(p, e + i * jnp.bfloat16(1e-9)))
res["student_dec_fwd_bwd_ms"] = timed(
    lambda i, p, e: jax.tree.leaves(grad(p, i, e))[0].sum().astype(jnp.float32),
    student, enc)

t_logits = jax.jit(lambda p, e: M.decode_train(p, e, dec_in, teacher_cfg, policy))(teacher, enc)
s_logits = jax.jit(lambda p, e: M.decode_train(p, e, dec_in, student_cfg, policy))(student, enc)
res["ce_kl_ms"] = timed(
    lambda i, t, s: (
        masked_cross_entropy(s + i * 1e-9, labels)[0]
        + kl_divergence(t, s + i * 1e-9, labels, 2.0)[0]
    ).astype(jnp.float32), t_logits, s_logits)
res["sum_ms"] = round(
    res["encode_fwd_ms"] + res["teacher_dec_fwd_ms"]
    + res["student_dec_fwd_bwd_ms"] + res["ce_kl_ms"], 1)
print(json.dumps(res))
