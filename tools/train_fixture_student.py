"""Distill a small student on-device for trained-margin gating (VERDICT r3 #4).

The quantization accuracy gate (tools/accuracy_quant.py) previously ran on
random weights only — a conservative bound, but too loose to justify a
production quant default. No network egress excuses real checkpoints, not
trained margins: this script distills a 2-layer student from a random
teacher for a few hundred steps on a synthetic formant-speech corpus with
REAL (byte-tokenized) transcripts. The student becomes confident on
in-domain audio, giving realistic logit margins; its hf_export then feeds
`accuracy_quant.py --checkpoint` and the speculative-decoding measurement
(tools/profile_speculative.py).

Usage: python tools/train_fixture_student.py [preset] [steps] [out_dir]
       (defaults: base 300 /tmp/fixture_student)
Prints the hf_export path on success.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from taiwan_whisper_tpu.audio.manifest import Manifest, write_manifest
from taiwan_whisper_tpu.models.config import get_config
from taiwan_whisper_tpu.models.io import save_hf_checkpoint
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.pipeline.dataset import TrainPrepConfig
from taiwan_whisper_tpu.pipeline.distill_driver import (
    DistillRunConfig,
    run_distillation,
)
from taiwan_whisper_tpu.pipeline.segment import Utterance, segment_audio_file
from taiwan_whisper_tpu.text.tokenizer import bytes_to_unicode

SR = 16000

PHRASES = [
    "今天我們講授第三章的內容",
    "the gradient descent update rule",
    "這個定理的證明需要三個步驟",
    "please look at the slide on page twelve",
    "我們用 matrix multiplication 來計算",
    "the eigenvalues of this matrix are real",
    "下一節課會有 quiz 請大家準備",
    "損失函數 loss function 的定義如下",
]


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


def build_corpus(root, n_files=8, file_secs=65.0, seed=3):
    rng = np.random.RandomState(seed)
    seg_dir = os.path.join(root, "segments")
    rel = []
    for i in range(n_files):
        audio = synth_speech(rng, file_secs)
        # utterances every ~5 s with cycling phrases -> 30 s windows with
        # timestamps, prompt carry, the full training txt format
        utts, t = [], 0.0
        j = 0
        while t + 5.0 <= file_secs:
            utts.append(Utterance(t, t + 5.0, PHRASES[(i + j) % len(PHRASES)]))
            t += 5.0
            j += 1
        rel.extend(segment_audio_file(audio, utts, seg_dir, f"fix{i:02d}"))
    manifest = os.path.join(root, "train.tsv")
    write_manifest(manifest, Manifest(root=seg_dir, paths=rel))
    return manifest, len(rel)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "base"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    root = sys.argv[3] if len(sys.argv) > 3 else "/tmp/fixture_student"

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    # byte-level vocab: every base byte symbol is its own token, so real
    # zh/en text round-trips without the published BPE files (no egress)
    tok_dir = os.path.join(root, "tok")
    os.makedirs(tok_dir)
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")

    cfg = get_config(preset)
    teacher_dir = os.path.join(root, "teacher")
    save_hf_checkpoint(teacher_dir, init_params(cfg, seed=0), cfg)

    manifest, n_seg = build_corpus(root)
    print(f"[fixture] {n_seg} segments; distilling {steps} steps ...")

    out_dir = os.path.join(root, "distill")
    metrics = run_distillation(
        manifest, teacher_dir, out_dir,
        student_decoder_layers=2,
        run_cfg=DistillRunConfig(
            max_steps=steps, batch_size=8, save_steps=steps,
            eval_steps=steps + 1, logging_steps=50, resume=False,
        ),
        prep_cfg=TrainPrepConfig(timestamp_probability=0.5),
        tokenizer_dir=tok_dir,
    )
    print(f"[fixture] final loss {metrics['loss']:.4f}")
    print(os.path.join(out_dir, "hf_export"))


if __name__ == "__main__":
    main()
