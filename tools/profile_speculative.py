"""Speculative-decoding measurement (VERDICT r3 #5).

PERF.md listed speculative decoding as a predicted lever with zero measured
numbers. This measures, on the real chip:

  - draft acceptance rate (teacher-rule-exact draft/verify loop,
    decode/speculative.py) with a trained draft (tools/train_fixture_student
    hf_export) or the layer-copied init student;
  - end-to-end audio-s/s of batch-1 speculative labelling vs batch-1 plain
    greedy (the mode speculative competes in — HF assisted generation and
    the reference's run_eval.py:524-545 are batch-1) and vs the batched
    greedy throughput mode for context.

Audio: formant-synthesized speech (same family the student trained on) so
acceptance reflects in-domain behavior.

Usage: python tools/profile_speculative.py [preset] [--student DIR]
         [--budget N] [--draft K]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.audio.mel import N_SAMPLES, log_mel
from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.decode.speculative import speculative_decode
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params, init_student_from_teacher
from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
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
    ap = argparse.ArgumentParser()
    ap.add_argument("preset", nargs="?", default="base")
    ap.add_argument("--student", default=None,
                    help="hf_export dir of a trained draft; default = "
                         "layer-copied init student (untrained)")
    ap.add_argument("--budget", type=int, default=192)
    ap.add_argument("--draft", type=int, default=5)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--audio-seed", type=int, default=11,
                    help="101 reproduces train_draft_student's corpus "
                         "(in-domain acceptance); 11 = held-out draws")
    args = ap.parse_args()

    t_cfg = get_config(args.preset)
    policy = DtypePolicy.bf16()
    teacher = init_params(t_cfg, seed=0)
    if args.student:
        from taiwan_whisper_tpu.models.io import load_model

        student, s_cfg = load_model(args.student)
        # trained-student case: its teacher was the same seed-0 random init
        # (train_fixture_student), so verify against that teacher's config
        assert s_cfg.d_model == t_cfg.d_model, "student/teacher dims differ"
        student_kind = f"trained({args.student})"
    else:
        student = init_student_from_teacher(teacher, t_cfg, 2)
        s_cfg = t_cfg.with_decoder_layers(2)
        student_kind = "init-copy(untrained)"

    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    sot_seq = tok.sot_sequence("zh", "transcribe", timestamps=True)
    max_len = len(sot_seq) + args.budget
    on_tpu = jax.devices()[0].platform != "cpu"
    mel_fn = log_mel_pallas if on_tpu else log_mel

    rng = np.random.RandomState(args.audio_seed)
    chunks = [synth_speech(rng, 30.0)[:N_SAMPLES] for _ in range(args.chunks)]
    chunks = [np.pad(c, (0, N_SAMPLES - len(c))) for c in chunks]

    prefix1 = jnp.asarray([sot_seq], jnp.int32)

    # params are explicit jit arguments (closure constants overflow the
    # remote-compile payload at real model sizes — HTTP 413)
    @jax.jit
    def spec_one(teacher, student, chunk):
        mel = mel_fn(chunk[None])
        t_enc = M.encode(teacher, mel, t_cfg, policy)
        s_enc = (t_enc if s_cfg.encoder_layers == t_cfg.encoder_layers
                 else M.encode(student, mel, s_cfg, policy))
        return speculative_decode(
            teacher, t_cfg, student, s_cfg, t_enc, s_enc, prefix1,
            rules, policy, num_draft_tokens=args.draft, max_len=max_len,
        )

    @jax.jit
    def greedy_one(teacher, chunk):
        mel = mel_fn(chunk[None])
        enc = M.encode(teacher, mel, t_cfg, policy)
        return greedy_decode(teacher, enc, prefix1, t_cfg, rules, policy,
                             max_len=max_len).tokens

    # warm up both programs
    r0 = spec_one(teacher, student, jnp.asarray(chunks[0]))
    np.asarray(r0.tokens)
    np.asarray(greedy_one(teacher, jnp.asarray(chunks[0])))

    # exactness check on the first chunk
    g = np.asarray(greedy_one(teacher, jnp.asarray(chunks[0])))[0]
    s = np.asarray(r0.tokens)[0]
    exact = bool((g == s).all())

    accept_rates, rounds = [], []
    t0 = time.perf_counter()
    for c in chunks:
        r = spec_one(teacher, student, jnp.asarray(c))
        np.asarray(r.tokens)
        accept_rates.append(float(r.draft_accept_rate))
        rounds.append(int(r.rounds))
    spec_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    for c in chunks:
        np.asarray(greedy_one(teacher, jnp.asarray(c)))
    greedy_wall = time.perf_counter() - t0

    audio_s = 30.0 * len(chunks)
    print({
        "preset": args.preset,
        "student": student_kind,
        "draft_k": args.draft,
        "budget": args.budget,
        "teacher_exact_first_chunk": exact,
        "acceptance_rate_mean": round(float(np.mean(accept_rates)), 4),
        "teacher_rounds_mean": round(float(np.mean(rounds)), 1),
        "tokens_per_teacher_pass": round(
            args.budget / max(float(np.mean(rounds)), 1.0), 2),
        "speculative_audio_s_per_s": round(audio_s / spec_wall, 1),
        "plain_greedy_b1_audio_s_per_s": round(audio_s / greedy_wall, 1),
        "speedup_vs_b1_greedy": round(greedy_wall / spec_wall, 2),
    })


if __name__ == "__main__":
    main()
