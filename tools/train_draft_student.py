"""Train a draft student on the TEACHER'S OWN greedy outputs (VERDICT r3 #5).

Speculative decoding's acceptance rate measures how well the draft model
predicts the teacher's free-running argmax stream. A student distilled on
ground-truth transcripts (tools/train_fixture_student.py) optimizes a
different target — measured acceptance ~0 against a random-weight teacher.
This script reproduces the ACTUAL K2D setup at fixture scale: the teacher
pseudo-labels in-domain audio (greedy, full rule stack), and the student
is distilled directly on those (mel, teacher-token) pairs — so the
acceptance measured afterwards (tools/profile_speculative.py) reflects a
draft trained the way the pipeline trains it.

Usage: python tools/train_draft_student.py [preset] [steps] [out_dir]
       (defaults: base 400 /tmp/draft_student)
Prints the hf_export path.
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.audio.mel import N_SAMPLES, log_mel
from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.io import save_hf_checkpoint
from taiwan_whisper_tpu.models.params import init_params, init_student_from_teacher
from taiwan_whisper_tpu.train.distill import (
    DistillConfig, LABEL_IGNORE, make_train_step,
)
from taiwan_whisper_tpu.train.state import (
    OptimConfig, make_optimizer, trainable_mask,
)
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

SR = 16000


def synth_speech(rng, dur, level=0.15):
    n = int(dur * SR)
    out = np.zeros(n, np.float64)
    t = 0
    while t < n:
        syl = int(rng.uniform(0.12, 0.28) * SR)
        if rng.rand() < 0.15:
            t += int(rng.uniform(0.05, 0.25) * SR)
            continue
        f0 = rng.uniform(90, 220)
        seg = np.zeros(syl)
        seg[:: max(int(SR / f0), 1)] = 1.0
        y = seg
        for fc, bw in [(rng.uniform(300, 900), 80),
                       (rng.uniform(1000, 2600), 120)]:
            k = np.arange(int(SR * 0.02))
            h = np.exp(-np.pi * bw * k / SR) * np.sin(2 * np.pi * fc * k / SR)
            y = np.convolve(y, h)[:syl]
        y *= np.hanning(syl) ** 0.7
        end = min(t + syl, n)
        out[t:end] += y[: end - t]
        t = end
    return (out / (np.abs(out).max() + 1e-9) * level).astype(np.float32)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "base"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/draft_student"
    n_chunks, budget, bs = 32, 96, 8

    cfg = get_config(preset)
    policy = DtypePolicy.bf16()
    # bf16 teacher from the start: holding an fp32 large-v2 teacher (6.2 GB)
    # NEXT TO its bf16 training copy OOMs the 16 GB chip; the teacher is
    # inference-only here (labelling + stop-gradient distillation target)
    teacher = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x,
        init_params(cfg, seed=0))
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    sot_seq = tok.sot_sequence("zh", "transcribe", timestamps=True)
    p_len = len(sot_seq)
    max_len = p_len + budget

    rng = np.random.RandomState(101)
    chunks = np.stack([synth_speech(rng, 30.0)[:N_SAMPLES] for _ in
                       range(n_chunks)])
    chunks = np.pad(chunks, ((0, 0), (0, N_SAMPLES - chunks.shape[1])))

    # teacher pseudo-labels (greedy, full rules) — the draft's target stream
    @jax.jit
    def label(params, audio, prefix):
        mel = log_mel(audio, cfg.num_mel_bins)
        enc = M.encode(params, mel, cfg, policy)
        return greedy_decode(params, enc, prefix, cfg, rules, policy,
                             max_len=max_len)

    prefix = jnp.asarray([sot_seq] * n_chunks, jnp.int32)
    res = label(teacher, jnp.asarray(chunks), prefix)
    tokens = np.asarray(res.tokens)  # [N, max_len], prefix + sampled + eot
    lengths = np.asarray(res.lengths)
    print(f"[draft] teacher labelled {n_chunks} chunks, "
          f"mean len {lengths.mean():.1f}")

    # training pairs: decoder input = full teacher stream; labels shifted,
    # prompt positions masked (prefix predicts nothing but its last token)
    dec_in = tokens[:, :-1]
    labels = tokens[:, 1:].astype(np.int64).copy()
    labels[:, : p_len - 1] = LABEL_IGNORE
    for i, ln in enumerate(lengths):  # mask past the eot
        labels[i, p_len + int(ln):] = LABEL_IGNORE

    # student carries fp32 master weights for the optimizer
    student = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if x.dtype == jnp.bfloat16 else x,
        init_student_from_teacher(teacher, cfg, 2))
    s_cfg = cfg.with_decoder_layers(2)
    teacher_bf16 = teacher
    opt = make_optimizer(
        OptimConfig(learning_rate=3e-4, warmup_steps=20, total_steps=steps),
        mask=trainable_mask(student, freeze_encoder=True),
    )
    opt_state = opt.init(student)
    step = jax.jit(make_train_step(s_cfg, cfg, DistillConfig(), opt, policy))

    order = np.arange(n_chunks)
    rs = np.random.RandomState(0)
    for it in range(steps):
        if it % (n_chunks // bs) == 0:
            rs.shuffle(order)
        sel = order[(it % (n_chunks // bs)) * bs:][:bs]
        batch = {
            "mel": jnp.asarray(log_mel(jnp.asarray(chunks[sel]),
                                       cfg.num_mel_bins)),
            "decoder_input_ids": jnp.asarray(dec_in[sel].astype(np.int32)),
            "labels": jnp.asarray(labels[sel].astype(np.int32)),
        }
        student, opt_state, metrics = step(student, opt_state, teacher_bf16,
                                           batch)
        if (it + 1) % 100 == 0:
            print(f"[draft] step {it+1}: "
                  f"loss {float(metrics['loss']):.4f} "
                  f"ce {float(metrics['ce']):.4f}")

    shutil.rmtree(out_dir, ignore_errors=True)
    export = os.path.join(out_dir, "hf_export")
    save_hf_checkpoint(export, jax.device_get(student), s_cfg)
    print(export)


if __name__ == "__main__":
    main()
