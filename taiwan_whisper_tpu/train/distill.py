"""Knowledge-distillation losses and the jit train step.

TPU-native redesign of the reference's KD loop (PT:
training/run_distillation.py train_step:1519-1551; flax:
training/flax/run_distillation.py:1660-1818):

* loss = ce_weight * masked-CE + kl_weight * T^2 * KL(teacher_T || student_T)
  (+ mse_weight * MSE on maximally-spaced decoder hidden states — present in
  the flax reference, dropped by the PT port; kept here behind a weight).
* the (frozen) encoder runs ONCE; both decoders consume the stop-gradient
  encoder output (reference shares teacher.encoder = student.encoder,
  run_distillation.py:1072-1075).
* normalization is by global non-masked token count: under jit on a (data,
  model) mesh jnp.sum over the sharded batch IS the cross-chip psum — no
  hand-written collectives (the flax reference does this manually with
  psum over the pmap axis, :1798-1818).
* bf16 compute / fp32 master params via DtypePolicy; AdamW update + global
  norm clip run in fp32 (train/state.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import whisper as M
from ..models.config import DtypePolicy, WhisperConfig
from ..models.params import layers_to_supervise

LABEL_IGNORE = -100


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Static KD hyper-parameters (defaults = the reference's
    distil-basic-run.sh / K2D §4.2: beta=0.8 CE, gamma=1.0 KL, T=2)."""

    ce_weight: float = 0.8
    kl_weight: float = 1.0
    temperature: float = 2.0
    mse_weight: float = 0.0
    freeze_encoder: bool = True
    # rematerialise the student decoder's scanned layer body in the backward
    # pass. Off by default: the flagship student decoder is 2 layers, whose
    # activations fit HBM easily — remat would only re-run the forward.
    # Enable for deep-student fine-tuning at long label lengths.
    remat_student: bool = False


def masked_cross_entropy(
    logits: jnp.ndarray,  # [B, U, V] fp32
    labels: jnp.ndarray,  # [B, U] int32 with LABEL_IGNORE masking
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum CE over valid tokens, valid token count)."""
    mask = labels != LABEL_IGNORE
    safe = jnp.where(mask, labels, 0)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(mask, nll, 0.0)
    return jnp.sum(nll), jnp.sum(mask)


def kl_divergence(
    teacher_logits: jnp.ndarray,  # [B, U, V] fp32 (stop-gradient)
    student_logits: jnp.ndarray,  # [B, U, V] fp32
    labels: jnp.ndarray,  # [B, U]
    temperature: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temperature-scaled forward KL, masked sum (reference:
    run_distillation.py kl_divergence:1507-1516, scaled by T^2 at :1546)."""
    mask = labels != LABEL_IGNORE
    t_prob = jax.nn.softmax(teacher_logits / temperature, axis=-1)
    s_logprob = jax.nn.log_softmax(student_logits / temperature, axis=-1)
    t_logprob = jax.nn.log_softmax(teacher_logits / temperature, axis=-1)
    kl = jnp.sum(t_prob * (t_logprob - s_logprob), axis=-1)  # [B, U]
    kl = jnp.where(mask, kl, 0.0)
    return jnp.sum(kl) * (temperature**2), jnp.sum(mask)


def distill_loss(
    student_params,
    teacher_params,
    batch: Dict[str, jnp.ndarray],
    student_config: WhisperConfig,
    teacher_config: WhisperConfig,
    dcfg: DistillConfig,
    policy: DtypePolicy = DtypePolicy(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Scalar loss + metrics dict for one batch.

    batch keys: mel [B, T, n_mels]; decoder_input_ids [B, U];
    labels [B, U] (-100 on prompt/pad positions).
    """
    mel = batch["mel"]
    dec_in = batch["decoder_input_ids"]
    labels = batch["labels"]

    # one encoder pass, shared by both decoders (teacher encoder == student
    # encoder under freeze+share, so running it from student params is exact).
    # Frozen: stop-grad the encoder PARAMS (not just the output) so autodiff
    # never linearizes the encoder — keeps the Pallas attention kernel legal
    # under value_and_grad and skips building its tangent graph entirely.
    # Trainable encoder: force the differentiable XLA attention path.
    if dcfg.freeze_encoder:
        enc_params = dict(
            student_params, encoder=jax.lax.stop_gradient(student_params["encoder"])
        )
        # remat=False: nothing differentiates through the frozen encoder, so
        # checkpointing the scan body is pure overhead (VERDICT r1 lever)
        enc = jax.lax.stop_gradient(
            M.encode(enc_params, mel, student_config, policy, remat=False)
        )
    else:
        enc = M.encode(student_params, mel, student_config, policy,
                       use_pallas=False)

    need_mse = dcfg.mse_weight > 0.0
    # CE-only fine-tuning (reference flax/run_finetuning.py:880-903) skips
    # the teacher forward entirely
    need_teacher = dcfg.kl_weight > 0.0 or need_mse
    s_out = M.decode_train(
        student_params, enc, dec_in, student_config, policy,
        output_hidden_states=need_mse, remat=dcfg.remat_student,
    )
    if need_mse:
        s_logits, s_hidden = s_out
    else:
        s_logits, s_hidden = s_out, None
    t_logits = t_hidden = None
    if need_teacher:
        # teacher forward is stop-gradient: no remat
        t_out = M.decode_train(
            teacher_params, enc, dec_in, teacher_config, policy,
            output_hidden_states=need_mse, remat=False,
        )
        if need_mse:
            t_logits, t_hidden = jax.lax.stop_gradient(t_out)
        else:
            t_logits = jax.lax.stop_gradient(t_out)

    ce_sum, n_tok = masked_cross_entropy(s_logits, labels)
    n_tok = jnp.maximum(n_tok, 1)
    ce = ce_sum / n_tok
    loss = dcfg.ce_weight * ce
    metrics = {"ce": ce}
    if need_teacher:
        kl_sum, _ = kl_divergence(t_logits, s_logits, labels, dcfg.temperature)
        kl = kl_sum / n_tok
        loss = loss + dcfg.kl_weight * kl
        metrics["kl"] = kl
    if need_mse:
        # equal-increment teacher layers supervise student layers — e.g.
        # 32->2 supervises with teacher layers [15, 31], NOT the init
        # mapping [0, 31] (flax reference
        # get_layers_to_supervise:971-987 + :1681-1718)
        idx = layers_to_supervise(
            student_config.decoder_layers, teacher_config.decoder_layers
        )
        t_sel = t_hidden[jnp.asarray(idx)]  # [Ls, B, U, d]
        mask = (labels != LABEL_IGNORE)[None, :, :, None]
        diff = (s_hidden.astype(jnp.float32) - t_sel.astype(jnp.float32)) ** 2
        mse = jnp.sum(jnp.where(mask, diff, 0.0)) / (
            jnp.maximum(jnp.sum(mask), 1) * s_hidden.shape[-1]
        )
        loss = loss + dcfg.mse_weight * mse
        metrics["mse"] = mse
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(
    student_config: WhisperConfig,
    teacher_config: WhisperConfig,
    dcfg: DistillConfig,
    optimizer,
    policy: DtypePolicy = DtypePolicy(),
    max_grad_norm: Optional[float] = 1.0,
):
    """Build the jit-able train step:
    (student_params, opt_state, teacher_params, batch) ->
    (student_params, opt_state, metrics).

    Gradients for frozen subtrees (encoder, positional tables) are zeroed
    before the update, mirroring requires_grad=False freezing (reference:
    run_distillation.py:1039-1066 set_trainable + freeze flags).
    """

    def zero_frozen(grads):
        g = dict(grads)
        if dcfg.freeze_encoder:
            g["encoder"] = jax.tree.map(jnp.zeros_like, grads["encoder"])
        dec = dict(g["decoder"])
        # positional tables never train (reference freezes embed_positions)
        dec["embed_positions"] = jnp.zeros_like(dec["embed_positions"])
        g["decoder"] = dec
        return g

    def train_step(student_params, opt_state, teacher_params, batch):
        grad_fn = jax.value_and_grad(
            lambda p: distill_loss(
                p, teacher_params, batch, student_config, teacher_config,
                dcfg, policy,
            ),
            has_aux=True,
        )
        (loss, metrics), grads = grad_fn(student_params)
        grads = zero_frozen(grads)
        if max_grad_norm is not None:
            gnorm = optax_global_norm(grads)
            scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
            metrics = dict(metrics, grad_norm=gnorm)
        updates, opt_state = optimizer.update(grads, opt_state, student_params)
        student_params = jax.tree.map(
            lambda p, u: (p + u).astype(p.dtype), student_params, updates
        )
        return student_params, opt_state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def make_eval_step(
    student_config: WhisperConfig,
    teacher_config: WhisperConfig,
    dcfg: DistillConfig,
    policy: DtypePolicy = DtypePolicy(),
):
    """Loss-only eval step (reference eval_step:1554-1578)."""

    def eval_step(student_params, teacher_params, batch):
        _, metrics = distill_loss(
            student_params, teacher_params, batch, student_config,
            teacher_config, dcfg, policy,
        )
        return metrics

    return eval_step
