"""Label-quality cost of VAD-region packing, measured (VERDICT r4 next #1).

Region packing shares 30 s decode windows between short VAD regions —
higher slot utilization (throughput measured by profile_label_driver
--pack), but the model decodes several regions concatenated with a small
separator instead of one region per window, and segments are re-mapped
piecewise — the label-semantics tradeoff label_resident.py concedes.
This measures that tradeoff with the TRAINED fixture student
(tools/train_fixture_student.py), whose confident margins make token
choices realistic:

  * label a synthetic lecture corpus with pack_regions OFF (reference
    semantics, one region per window) and ON;
  * report per-file MER of packed vs unpacked transcripts (unpacked =
    reference), plus timestamp drift of matched segments.

Usage: python tools/packing_mer.py [student_hf_dir] [tok_dir]
       (defaults: /tmp/fixture_student/distill/hf_export,
        /tmp/fixture_student/tok — run tools/train_fixture_student.py
        first)
"""

import csv
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from taiwan_whisper_tpu.audio.io import write_wav
from taiwan_whisper_tpu.models.io import load_model
from taiwan_whisper_tpu.pipeline.label import LabelConfig, label_files
from taiwan_whisper_tpu.text.metrics import MixErrorRate
from taiwan_whisper_tpu.text.tokenizer import WhisperTokenizer
from profile_label_driver import synth_lecture

SR = 16000


def read_csv(path):
    with open(path, encoding="utf-8") as f:
        return list(csv.DictReader(f))


def main():
    student_dir = (sys.argv[1] if len(sys.argv) > 1
                   else "/tmp/fixture_student/distill/hf_export")
    tok_dir = (sys.argv[2] if len(sys.argv) > 2
               else "/tmp/fixture_student/tok")
    params, config = load_model(student_dir)
    tok = WhisperTokenizer.from_pretrained_dir(tok_dir)

    root = "/tmp/packing_mer"
    shutil.rmtree(root, ignore_errors=True)
    corpus = os.path.join(root, "corpus")
    os.makedirs(corpus)
    rng = np.random.RandomState(23)
    paths = []
    for i in range(16):
        p = os.path.join(corpus, f"lec{i:02d}.wav")
        write_wav(p, synth_lecture(rng, 120.0))
        paths.append(p)

    base = dict(batch_size=16, quantize_kv=0, vad_mode="spectral",
                wire_mode="resident", max_decode_tokens=96)
    results = {}
    for name, pack in (("unpacked", False), ("packed", True)):
        out = os.path.join(root, name)
        t0 = time.perf_counter()
        stats = label_files(params, config, tok, paths, out,
                            LabelConfig(pack_regions=pack, **base),
                            log_every=0)
        results[name] = dict(stats=stats, wall=time.perf_counter() - t0,
                             out=out)
        print(f"[{name}] chunks={stats['chunks']} batches={stats['batches']}"
              f" wall={results[name]['wall']:.1f}s", flush=True)

    mer = MixErrorRate()
    preds, refs = [], []
    ts_drift, matched = [], 0
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0] + ".csv"
        u_rows = read_csv(os.path.join(results["unpacked"]["out"], stem))
        p_rows = read_csv(os.path.join(results["packed"]["out"], stem))
        refs.append(" ".join(r["text"] for r in u_rows))
        preds.append(" ".join(r["text"] for r in p_rows))
        # timestamp drift for text-identical segments
        u_by_text = {}
        for r in u_rows:
            u_by_text.setdefault(r["text"], []).append(float(r["start"]))
        for r in p_rows:
            cands = u_by_text.get(r["text"])
            if cands:
                matched += 1
                ts_drift.append(min(abs(float(r["start"]) - c)
                                    for c in cands))
    score = mer.compute(preds, refs)
    print({
        "packed_vs_unpacked_mer": round(float(score), 4),
        "chunks_unpacked": results["unpacked"]["stats"]["chunks"],
        "chunks_packed": results["packed"]["stats"]["chunks"],
        "chunk_reduction": round(
            1 - results["packed"]["stats"]["chunks"]
            / max(results["unpacked"]["stats"]["chunks"], 1), 3),
        "wall_unpacked_s": round(results["unpacked"]["wall"], 1),
        "wall_packed_s": round(results["packed"]["wall"], 1),
        "matched_segments": matched,
        "ts_drift_p50_s": (round(float(np.median(ts_drift)), 3)
                           if ts_drift else None),
        "ts_drift_max_s": (round(float(np.max(ts_drift)), 3)
                           if ts_drift else None),
    })


if __name__ == "__main__":
    main()
