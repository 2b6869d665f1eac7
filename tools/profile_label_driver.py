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
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    file_secs = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    global BATCH
    if len(sys.argv) > 4 and sys.argv[4].isdigit():
        BATCH = int(sys.argv[4])  # large-v2 knee is 16 (PERF.md grid)
    with_per_file = "--per-file" in sys.argv  # pathologically slow: the old
    # driver re-traces chunked_decode per VAD region (measured 1.5 audio-s/s
    # on a 12-file corpus); off by default

    config = get_config(preset)
    policy = DtypePolicy.bf16()
    params = init_params(config, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)

    # corpus: a small pool of distinct synthesized lectures, remixed into
    # n_files by slicing — full-speed generation without hours of convolves
    corpus = "/tmp/label_driver_corpus"
    shutil.rmtree(corpus, ignore_errors=True)
    os.makedirs(corpus)
    rng = np.random.RandomState(7)
    n_pool = 6
    print(f"[gen] pool of {n_pool} x {file_secs:.0f}s lectures ...")
    pool = [synth_lecture(rng, file_secs) for _ in range(n_pool)]
    file_len = min(len(p) for p in pool)
    quarter = file_len // 4
    paths = []
    print(f"[gen] remixing into {n_files} files ...")
    for i in range(n_files):
        parts = [pool[rng.randint(n_pool)]
                 [q * quarter:(q + 1) * quarter] for q in range(4)]
        p = os.path.join(corpus, f"lec{i:03d}.wav")
        write_wav(p, np.concatenate(parts))
        paths.append(p)
    total_audio = n_files * file_len / SR

    print("[bench] synthetic batched loop (bench.py methodology) ...")
    synth_rate = bench_style_loop(params, config, policy, tok, rules)
    print(f"  synthetic loop: {synth_rate:.1f} audio-s/s")

    results = {"synthetic_loop": synth_rate}
    variants = [("resident_driver", True, "resident", False)]
    if "--pack" in sys.argv:  # VAD-region packing A/B (VERDICT r4 #1)
        variants.append(("resident_packed", True, "resident", True))
    if "--resident-only" not in sys.argv and "--pack" not in sys.argv:
        variants.append(("staged_driver", True, "chunks", False))
    if with_per_file:
        variants.append(("per_file_driver", False, "chunks", False))
    group_segs = None
    for a in sys.argv:
        if a.startswith("--group-segs="):
            group_segs = int(a.split("=")[1])
    for name, pooled, wire_mode, pack in variants:
        cfg = LabelConfig(batch_size=BATCH, quantize_kv=8,
                          max_decode_tokens=BUDGET, pooled=pooled,
                          vad_mode="spectral", io_threads=2,
                          wire_mode=wire_mode, pack_regions=pack,
                          group_segs=group_segs)
        if pooled:
            # steady-state: one warmup pass over 4 files compiles the decode
            # + VAD programs (a production run pays this once per process)
            warm_dir = "/tmp/label_driver_warm"
            shutil.rmtree(warm_dir, ignore_errors=True)
            label_files(params, config, tok, paths[:4], warm_dir, cfg,
                        log_every=0)
        out_dir = f"/tmp/label_driver_out_{name}"
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir)
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
        timers = {k: round(v, 2) for k, v in stats.items()
                  if k.endswith("_s") and not k.startswith("audio")}
        if timers:
            print(f"  {name} main-thread phases: {timers}")
        if pooled:
            frac = rate / synth_rate
            print(f"  pooled/synthetic = {frac:.2%}")

    print({k: round(v, 1) for k, v in results.items()},
          {"total_audio_s": total_audio})


if __name__ == "__main__":
    main()
