"""The SHIPPING labelling driver vs the synthetic batched loop (VERDICT r3 #1).

PERF.md's headline (bench.py) times one jit'd batch-96 loop on synthetic
arrays. This measures what `cli label` actually delivers on a multi-file,
VAD-gated fixture corpus: formant-synthesized pseudo-speech bursts (the
spectral VAD accepts them; tests/test_vad.py uses the same synthesis)
interleaved with silence and music, written as real files, labelled through
`label_files` with the pooled chunk-queue scheduler — host IO, VAD, chunking,
scatter and CSV writes all included.

Prints audio-s/s for: (a) the bench-style synthetic loop (same process, same
chip state — in-process A/B per PERF.md methodology), (b) the pooled driver,
(c) the old per-file driver for contrast.

Usage: python tools/profile_label_driver.py [preset] [n_files] [file_secs]
(defaults: base 12 120)
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.audio.io import write_wav
from taiwan_whisper_tpu.audio.mel import N_SAMPLES
from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
from taiwan_whisper_tpu.pipeline.label import LabelConfig, label_files
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

SR = 16000
BUDGET = 192
BATCH = 96


def synth_speech(rng, dur, level=0.15):
    """Formant-synthesized pseudo-speech (same design as tests/test_vad.py):
    glottal pulse train -> two formant resonators, syllabic envelopes."""
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


def synth_lecture(rng, total_s):
    """Speech bursts (12-28 s) separated by silence gaps (2-5 s) — the
    lecture-audio shape the VAD region gate exists for."""
    parts, t = [], 0.0
    while t < total_s:
        gap = rng.uniform(2.0, 5.0)
        parts.append(np.zeros(int(gap * SR), np.float32))
        t += gap
        sp = min(rng.uniform(12.0, 28.0), total_s - t)
        if sp > 1.0:
            parts.append(synth_speech(rng, sp))
            t += sp
    return np.concatenate(parts)


def bench_style_loop(params, config, policy, tok, rules, iters=6):
    """The synthetic batched loop bench.py times (int8, budget 192)."""
    prefix = jnp.asarray(
        [tok.sot_sequence("zh", "transcribe")] * BATCH, jnp.int32)
    max_len = prefix.shape[1] + BUDGET
    on_tpu = jax.devices()[0].platform != "cpu"

    @jax.jit
    def label_chunks(params, audio, prefix):
        if on_tpu:
            mel = log_mel_pallas(audio)
        else:
            from taiwan_whisper_tpu.audio.mel import log_mel

            mel = log_mel(audio)
        enc = M.encode(params, mel, config, policy)
        return greedy_decode(params, enc, prefix, config, rules, policy,
                             max_len=max_len, quantize_cross_kv=True).tokens

    rng = np.random.RandomState(0)
    pool = [jnp.asarray(rng.randn(BATCH, N_SAMPLES).astype(np.float32) * 0.1)
            for _ in range(4)]
    np.asarray(label_chunks(params, pool[0], prefix))  # compile
    samples = []
    for i in range(iters):
        t0 = time.perf_counter()
        np.asarray(label_chunks(params, pool[i % 4], prefix))
        samples.append(time.perf_counter() - t0)
    dt = float(np.median(samples))
    return BATCH * 30.0 / dt


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "base"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    file_secs = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0

    config = get_config(preset)
    policy = DtypePolicy.bf16()
    params = init_params(config, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)

    corpus = "/tmp/label_driver_corpus"
    shutil.rmtree(corpus, ignore_errors=True)
    os.makedirs(corpus)
    rng = np.random.RandomState(7)
    paths = []
    print(f"[gen] {n_files} x {file_secs:.0f}s lecture fixtures ...")
    for i in range(n_files):
        p = os.path.join(corpus, f"lec{i:02d}.wav")
        write_wav(p, synth_lecture(rng, file_secs))
        paths.append(p)
    total_audio = n_files * file_secs

    print("[bench] synthetic batched loop (bench.py methodology) ...")
    synth_rate = bench_style_loop(params, config, policy, tok, rules)
    print(f"  synthetic loop: {synth_rate:.1f} audio-s/s")

    results = {"synthetic_loop": synth_rate}
    for name, pooled in (("pooled_driver", True), ("per_file_driver", False)):
        out_dir = f"/tmp/label_driver_out_{name}"
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir)
        cfg = LabelConfig(batch_size=BATCH, quantize_kv=8,
                          max_decode_tokens=BUDGET, pooled=pooled,
                          vad_mode="spectral")
        t0 = time.perf_counter()
        stats = label_files(params, config, tok, paths, out_dir, cfg,
                            log_every=0)
        wall = time.perf_counter() - t0
        rate = stats["audio_seconds"] / wall
        results[name] = rate
        print(f"  {name}: {rate:.1f} audio-s/s "
              f"({stats['audio_seconds']:.0f} audio-s in {wall:.1f}s; "
              f"chunks={stats.get('chunks')} batches={stats.get('batches')} "
              f"pad={stats.get('pad_slots')})")
        if pooled:
            frac = rate / synth_rate
            print(f"  pooled/synthetic = {frac:.2%} (target >= 80%)")

    print({k: round(v, 1) for k, v in results.items()},
          {"total_audio_s": total_audio})


if __name__ == "__main__":
    main()
