"""Benchmark: labelling, training and eval throughput on one TPU chip.

Headline (BASELINE.json config 2 at the measured knee): pseudo-labelling
audio-seconds/s per chip — whisper-base batched greedy (batch 96, 30 s
chunks), on-device Pallas log-mel -> encoder -> int8-cross-KV cached greedy
decode with the full Whisper timestamp rule stack, fixed 192-token budget
per chunk (a realistic long-form labelling budget; random weights never
emit <|endoftext|>, so the budget bounds the loop). vs_baseline: upstream
distil-whisper pseudo-labelling at ~120 audio-s/s per 80 GB GPU (20 h in
~10 min, training/README.md:136-139; BASELINE.md).

Also measured (VERDICT r2 #1: record every path, not just labelling),
reported in the same JSON line under "extra":
  - train_step_samples_per_s_per_chip — the flagship distillation step
    (large-v2 teacher -> 32-2 student, frozen shared encoder, CE+T^2*KL,
    bs 16, label len 256); vs_baseline: ~51 samples/s per H100
    (K2D §4.2: 120k steps @ global 256 in 42 h on 4x H100).
  - eval_rtf_short_form — the deployed 32-2 student decoding 30 s
    short-form chunks at eval batch 8, x real-time per chip;
    vs_baseline 1.0 = real-time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import sys
import time

import numpy as np


def _median_time(fn, *args, iters=8, arg_pool=None):
    """Median wall-time of fn; np.asarray forces a device-to-host transfer —
    on the tunneled TPU backend block_until_ready alone does not reliably
    await remote execution, so every timed call must materialise its result.
    Median because the tunneled chip's throughput drifts between runs
    (PERF.md): the statistic must be robust to stragglers.

    ``arg_pool``: optional list of replacement values for args[1], rotated
    across iterations so no single input is re-timed back to back (keeps
    the number apples-to-apples with the r1/r2 methodology)."""
    np.asarray(fn(*args))  # warmup / compile
    samples = []
    args = list(args)
    for i in range(iters):
        if arg_pool is not None:
            args[1] = arg_pool[i % len(arg_pool)]
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def bench_label(jax, jnp):
    from taiwan_whisper_tpu.decode.greedy import greedy_decode
    from taiwan_whisper_tpu.decode.rules import DecodeRules
    from taiwan_whisper_tpu.models import whisper as M
    from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
    from taiwan_whisper_tpu.models.params import init_params
    from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
    from taiwan_whisper_tpu.audio.mel import N_SAMPLES
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

    batch = 96
    decode_budget = 192
    config = get_config("base")
    policy = DtypePolicy.bf16()
    params = init_params(config, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    prefix = jnp.asarray([tok.sot_sequence("zh", "transcribe")] * batch, jnp.int32)
    max_len = prefix.shape[1] + decode_budget
    on_tpu = jax.devices()[0].platform != "cpu"

    @jax.jit
    def label_chunks(params, audio, prefix):
        if on_tpu:
            mel = log_mel_pallas(audio)
        else:
            from taiwan_whisper_tpu.audio.mel import log_mel

            mel = log_mel(audio)
        enc = M.encode(params, mel, config, policy)
        res = greedy_decode(
            params, enc, prefix, config, rules, policy, max_len=max_len,
            quantize_cross_kv=True,  # int8 cross-KV: the optimized labelling
            # config (+~20%; accuracy-gated by tools/accuracy_quant.py)
        )
        return res.tokens

    rng = np.random.RandomState(0)
    pool = [
        jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32) * 0.1)
        for _ in range(4)
    ]
    dt = _median_time(label_chunks, params, pool[0], prefix, arg_pool=pool)
    return batch * 30.0 / dt


def bench_label_flagship(jax, jnp):
    """FLAGSHIP-shape labelling: large-v2 greedy, fp8 cross-KV, batch 32,
    full decoder-scan unroll — the shipping configs/label_large_v2.args
    operating point (PERF.md round-5 grid: 267 audio-s/s; int8 288, int4
    313 but accuracy-gated). vs_baseline: the same ~120 audio-s/s/GPU
    reference rate, which is itself a large-model labelling number."""
    from taiwan_whisper_tpu.decode.greedy import greedy_decode
    from taiwan_whisper_tpu.decode.rules import DecodeRules
    from taiwan_whisper_tpu.models import whisper as M
    from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
    from taiwan_whisper_tpu.models.params import init_params
    from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
    from taiwan_whisper_tpu.audio.mel import N_SAMPLES
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

    batch, decode_budget = 32, 192
    config = get_config("large-v2")
    policy = DtypePolicy.bf16()
    params = init_params(config, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    prefix = jnp.asarray([tok.sot_sequence("zh", "transcribe")] * batch, jnp.int32)
    max_len = prefix.shape[1] + decode_budget
    on_tpu = jax.devices()[0].platform != "cpu"

    @jax.jit
    def label_chunks(params, audio, prefix):
        if on_tpu:
            mel = log_mel_pallas(audio)
        else:
            from taiwan_whisper_tpu.audio.mel import log_mel

            mel = log_mel(audio)
        enc = M.encode(params, mel, config, policy)
        return greedy_decode(
            params, enc, prefix, config, rules, policy, max_len=max_len,
            quantize_cross_kv="fp8",
        ).tokens

    rng = np.random.RandomState(0)
    pool = [
        jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32) * 0.1)
        for _ in range(2)
    ]
    dt = _median_time(label_chunks, params, pool[0], prefix, iters=3,
                      arg_pool=pool)
    return batch * 30.0 / dt


def bench_label_driver(jax, jnp):
    """The SHIPPING `cli label` path (pooled device-resident scheduler) on
    a synthetic VAD-gated lecture corpus — wire, VAD, scheduling and CSV
    writes included (PERF.md round 4 'driver vs synthetic loop')."""
    import shutil

    from taiwan_whisper_tpu.audio.io import write_wav
    from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
    from taiwan_whisper_tpu.models.params import init_params
    from taiwan_whisper_tpu.pipeline.label import LabelConfig, label_files
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer
    from tools.profile_label_driver import synth_lecture

    config = get_config("base")
    params = init_params(config, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    root = "/tmp/bench_label_driver"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    rng = np.random.RandomState(7)
    pool = [synth_lecture(rng, 120.0) for _ in range(4)]
    quarter = min(len(p) for p in pool) // 4
    paths = []
    for i in range(96):  # ~3.2 h of audio: enough batches to amortize
        # the pipeline spin-up (40 files measured ~3x below steady state)
        parts = [pool[rng.randint(4)][q * quarter:(q + 1) * quarter]
                 for q in range(4)]
        p = os.path.join(root, f"lec{i:02d}.wav")
        write_wav(p, np.concatenate(parts))
        paths.append(p)
    cfg = LabelConfig(batch_size=96, quantize_kv=8, max_decode_tokens=192,
                      vad_mode="spectral")
    # warmup pass compiles the decode/VAD programs (paid once per process)
    label_files(params, config, tok, paths[:4],
                os.path.join(root, "warm"), cfg, log_every=0)
    t0 = time.perf_counter()
    stats = label_files(params, config, tok, paths,
                        os.path.join(root, "out"), cfg, log_every=0)
    return stats["audio_seconds"] / (time.perf_counter() - t0)


def bench_train(jax, jnp):
    from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
    from taiwan_whisper_tpu.models.params import (
        init_params,
        init_student_from_teacher,
    )
    from taiwan_whisper_tpu.train.distill import DistillConfig, make_train_step
    from taiwan_whisper_tpu.train.state import (
        OptimConfig,
        make_optimizer,
        trainable_mask,
    )

    batch, label_len = 16, 256
    teacher_cfg = get_config("large-v2")
    teacher = init_params(teacher_cfg, seed=0)
    student_cfg = teacher_cfg.with_decoder_layers(2)
    student = init_student_from_teacher(teacher, teacher_cfg, 2)
    policy = DtypePolicy.bf16()
    teacher = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        teacher,
    )
    opt = make_optimizer(
        OptimConfig(learning_rate=1e-4, total_steps=1000),
        mask=trainable_mask(student, freeze_encoder=True),
    )
    opt_state = opt.init(student)
    step = jax.jit(
        make_train_step(student_cfg, teacher_cfg, DistillConfig(), opt, policy)
    )

    rng = np.random.RandomState(0)
    mel = jnp.asarray(
        rng.randn(batch, 3000, teacher_cfg.num_mel_bins).astype(np.float32) * 0.5
    )
    dec_in = jnp.asarray(rng.randint(0, 50000, (batch, label_len)).astype(np.int32))
    labels = jnp.asarray(rng.randint(0, 50000, (batch, label_len)).astype(np.int32))
    batch_d = {"mel": mel, "decoder_input_ids": dec_in, "labels": labels}

    def one(student, opt_state):
        s2, o2, metrics = step(student, opt_state, teacher, batch_d)
        return metrics["loss"]

    dt = _median_time(one, student, opt_state, iters=4)
    return batch / dt


def bench_eval_rtf(jax, jnp):
    from taiwan_whisper_tpu.decode.greedy import greedy_decode
    from taiwan_whisper_tpu.decode.rules import DecodeRules
    from taiwan_whisper_tpu.models import whisper as M
    from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
    from taiwan_whisper_tpu.models.params import (
        init_params,
        init_student_from_teacher,
    )
    from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
    from taiwan_whisper_tpu.audio.mel import N_SAMPLES
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

    batch, decode_budget = 8, 96
    teacher_cfg = get_config("large-v2")
    config = teacher_cfg.with_decoder_layers(2)
    params = init_student_from_teacher(
        init_params(teacher_cfg, seed=0), teacher_cfg, 2
    )
    policy = DtypePolicy.bf16()
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    prefix = jnp.asarray([tok.sot_sequence("zh", "transcribe")] * batch, jnp.int32)
    max_len = prefix.shape[1] + decode_budget
    on_tpu = jax.devices()[0].platform != "cpu"

    @jax.jit
    def eval_chunks(params, audio, prefix):
        if on_tpu:
            mel = log_mel_pallas(audio)
        else:
            from taiwan_whisper_tpu.audio.mel import log_mel

            mel = log_mel(audio)
        enc = M.encode(params, mel, config, policy)
        return greedy_decode(
            params, enc, prefix, config, rules, policy, max_len=max_len,
            quantize_cross_kv=True,
        ).tokens

    rng = np.random.RandomState(0)
    pool = [
        jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32) * 0.1)
        for _ in range(4)
    ]
    dt = _median_time(eval_chunks, params, pool[0], prefix, arg_pool=pool)
    return batch * 30.0 / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    label = bench_label(jax, jnp)
    extra = []
    try:
        flagship = bench_label_flagship(jax, jnp)
        extra.append({
            "metric": "label_large_v2_audio_s_per_s_per_chip",
            "value": round(flagship, 1),
            "unit": "audio_seconds_per_second_per_chip",
            # flagship teacher shapes vs the same ~120/GPU reference rate
            "vs_baseline": round(flagship / 120.0, 3),
        })
    except Exception as e:
        extra.append({"metric": "label_large_v2_audio_s_per_s_per_chip",
                      "error": repr(e)})
    try:
        import sys as _sys

        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        driver = bench_label_driver(jax, jnp)
        extra.append({
            "metric": "label_driver_audio_s_per_s_per_chip",
            "value": round(driver, 1),
            "unit": "audio_seconds_per_second_per_chip",
            # the PRODUCT path (cli label) vs the reference's ~120/GPU
            "vs_baseline": round(driver / 120.0, 3),
        })
    except Exception as e:
        extra.append({"metric": "label_driver_audio_s_per_s_per_chip",
                      "error": repr(e)})
    try:
        train = bench_train(jax, jnp)
        extra.append({
            "metric": "train_step_samples_per_s_per_chip",
            "value": round(train, 2),
            "unit": "samples_per_second_per_chip",
            "vs_baseline": round(train / 51.0, 3),  # ~51 samples/s per H100
        })
    except Exception as e:  # never lose the headline to a secondary path
        extra.append({"metric": "train_step_samples_per_s_per_chip",
                      "error": repr(e)})
    try:
        rtf = bench_eval_rtf(jax, jnp)
        extra.append({
            "metric": "eval_rtf_short_form",
            "value": round(rtf, 2),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(rtf / 1.0, 3),  # 1.0 = real-time
        })
    except Exception as e:
        extra.append({"metric": "eval_rtf_short_form", "error": repr(e)})

    baseline = 120.0  # audio-s/s per GPU, upstream labelling example
    print(json.dumps({
        "metric": "pseudo_label_decode_throughput",
        "value": round(label, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(label / baseline, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
