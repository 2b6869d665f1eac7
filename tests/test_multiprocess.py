"""True multi-process validation of the multi-host prefilter path.

Spawns 2 OS processes that form a real jax.distributed cluster (CPU
backend, localhost coordinator) and run `run_prefilter` over a shared
tmpdir: each rank transcribes its manifest shard, writes
``idx_hyp.<rank>.txt``, hits the shard barrier, and rank 0 merges + filters
— the reference achieves the same with Accelerate DDP + per-rank files +
sort (dataset/cool_dataset.py:173-226, dataset/test_cool_dataset.sh:25-26).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid, nproc, workdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
assert jax.process_count() == nproc

from taiwan_whisper_tpu.pipeline.prefilter import PrefilterConfig, run_prefilter

cleaned = run_prefilter(
    workdir + "/train.tsv",
    workdir + "/model",
    workdir + "/out",
    PrefilterConfig(language="zh", batch_size=1, threshold=0.4),
    tokenizer_dir=workdir + "/tok",
)
print("RANK", pid, "DONE", len(cleaned))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# Full 4-stage pipeline worker: label -> segment -> prefilter -> distill,
# run identically as a 1-process baseline and as a 2-process cluster. The
# reference covers these seams with Accelerate DDP + per-rank files + shell
# sorts (dataset/cool_dataset.py:173-226, pseudo-labelling per-rank CSVs);
# here every stage shards by jax.process_index over a shared filesystem.
PIPELINE_WORKER = r"""
import glob
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")

coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
workdir, mp, outname = sys.argv[4], int(sys.argv[5]), sys.argv[6]
if nproc > 1:
    jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                               process_id=pid)

from jax.experimental import multihost_utils

from taiwan_whisper_tpu.audio.io import load_audio_16k
from taiwan_whisper_tpu.audio.manifest import Manifest, read_manifest, write_manifest
from taiwan_whisper_tpu.parallel.mesh import host_local_slice
from taiwan_whisper_tpu.pipeline.dataset import TrainPrepConfig
from taiwan_whisper_tpu.pipeline.distill_driver import (
    DistillRunConfig, run_distillation,
)
from taiwan_whisper_tpu.pipeline.label import LabelConfig, run_labelling
from taiwan_whisper_tpu.pipeline.prefilter import PrefilterConfig, run_prefilter
from taiwan_whisper_tpu.pipeline.segment import (
    Utterance, read_pseudo_label_csv, segment_audio_file,
)


def barrier(name):
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)


tok_dir = os.path.join(workdir, "tok")
out = os.path.join(workdir, outname)
os.makedirs(out, exist_ok=True)
label_dir = os.path.join(out, "labels")

# stage 1: pseudo-label (run_labelling shards the manifest by host)
run_labelling(
    os.path.join(workdir, "raw.tsv"), os.path.join(workdir, "teacher"),
    label_dir,
    LabelConfig(strategy="sequential", batch_size=2, vad_mode="off"),
    tokenizer_dir=tok_dir,
)
barrier("label_done")

# stage 2: segment this host's slice; per-rank path shards, rank 0 merges
manifest = read_manifest(os.path.join(workdir, "raw.tsv"))
seg_dir = os.path.join(out, "segments")
sl = host_local_slice(len(manifest.paths))
rel = []
for relpath, abspath in zip(manifest.paths[sl], manifest.absolute_paths()[sl]):
    stem = os.path.splitext(os.path.basename(relpath))[0]
    audio = load_audio_16k(abspath)
    utts = read_pseudo_label_csv(os.path.join(label_dir, stem + ".csv"))
    # tiny random teachers may emit zero usable segments; append
    # deterministic utterances CROSSING the 30 s window boundary (trailing
    # partial windows are dropped, prepare_dataset.py semantics) so the
    # distill stage always has data
    utts = list(utts) + [
        Utterance(0.0, 10.0, "hello " + stem),
        Utterance(10.0, 29.0, "again " + stem),
        Utterance(29.0, 45.0, "crosses the boundary " + stem),
    ]
    rel.extend(segment_audio_file(audio, utts, seg_dir, stem))
with open(os.path.join(out, "seg_paths.%d.txt" % jax.process_index()), "w") as f:
    f.write("".join(p + "\n" for p in rel))
barrier("segment_shards_written")
seg_tsv = os.path.join(out, "segments.tsv")
if jax.process_index() == 0:
    paths = []
    for shard in sorted(glob.glob(os.path.join(out, "seg_paths.*.txt"))):
        with open(shard) as f:
            paths.extend(l.strip() for l in f if l.strip())
    # repeat so tiny batches divide evenly
    write_manifest(seg_tsv, Manifest(root=seg_dir, paths=sorted(paths) * 4))
barrier("segments_merged")

# stage 3: prefilter (per-rank idx_hyp shards, rank 0 merges + filters)
run_prefilter(
    seg_tsv, os.path.join(workdir, "validator"), out,
    PrefilterConfig(batch_size=2, threshold=100.0), tokenizer_dir=tok_dir,
)
barrier("prefilter_done")
cleaned_tsv = os.path.join(out, "train_non-hallucinated-threshold100.0.tsv")
assert os.path.exists(cleaned_tsv), cleaned_tsv

# stage 4: distill 2 steps over the (data, model) mesh
metrics = run_distillation(
    cleaned_tsv, os.path.join(workdir, "teacher"),
    os.path.join(out, "distill"),
    student_decoder_layers=1,
    run_cfg=DistillRunConfig(
        max_steps=2, batch_size=4, save_steps=2, logging_steps=1,
        model_parallel=mp, resume=False, num_workers=0,
    ),
    prep_cfg=TrainPrepConfig(max_label_length=48),
    tokenizer_dir=tok_dir,
)
print("FINAL_LOSS", "%.6f" % float(metrics["loss"]))
"""


def _launch_pipeline(workdir: str, nproc: int, mp: int, outname: str) -> str:
    """Run PIPELINE_WORKER as nproc real OS processes; returns rank-0 stdout."""
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual-device forcing in children
    env["PYTHONPATH"] = REPO
    script = os.path.join(workdir, "pipeline_worker.py")
    with open(script, "w") as f:
        f.write(PIPELINE_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, script, coord, str(r), str(nproc), workdir,
             str(mp), outname],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env,
        )
        for r in range(nproc)
    ]
    outs = [p.communicate(timeout=540)[0].decode(errors="replace")
            for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r}/{nproc} (mp={mp}) failed:\n{out}"
    return outs[0]


def _final_loss(stdout: str) -> float:
    lines = [l for l in stdout.splitlines() if l.startswith("FINAL_LOSS")]
    assert lines, stdout
    return float(lines[-1].split()[1])


@pytest.mark.slow
def test_two_process_full_pipeline(tmp_path):
    """label -> segment -> prefilter -> distill as a REAL 2-process
    jax.distributed cluster, both mesh topologies ({data:2,model:1} and
    {data:1,model:2}), asserting the merged artifacts byte-equal the
    single-process run (reference merge semantics:
    dataset/cool_dataset.py:216-225)."""
    import filecmp
    import json

    from taiwan_whisper_tpu.audio.io import write_flac
    from taiwan_whisper_tpu.audio.manifest import Manifest, write_manifest
    from taiwan_whisper_tpu.models.config import WhisperConfig
    from taiwan_whisper_tpu.models.io import save_hf_checkpoint
    from taiwan_whisper_tpu.models.params import init_params
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, bytes_to_unicode

    workdir = str(tmp_path)

    def cfg(dec_layers):
        return WhisperConfig(
            vocab_size=MULTILINGUAL.vocab_size, d_model=64, ffn_dim=128,
            encoder_layers=1, decoder_layers=dec_layers,
            encoder_attention_heads=4, decoder_attention_heads=4,
            max_source_positions=60, max_target_positions=64,
        )

    save_hf_checkpoint(os.path.join(workdir, "teacher"),
                       init_params(cfg(2), seed=0), cfg(2))
    save_hf_checkpoint(os.path.join(workdir, "validator"),
                       init_params(cfg(1), seed=1), cfg(1))
    tok_dir = os.path.join(workdir, "tok")
    os.makedirs(tok_dir)
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")

    rng = np.random.RandomState(7)
    aud = os.path.join(workdir, "raw")
    os.makedirs(aud)
    names = []
    for i in range(4):
        name = f"lec{i}.flac"
        write_flac(os.path.join(aud, name),
                   (rng.randn(int(2.5 * 16000)) * 0.1).astype(np.float32))
        names.append(name)
    write_manifest(os.path.join(workdir, "raw.tsv"),
                   Manifest(root=aud, paths=names))

    sp_out = _launch_pipeline(workdir, nproc=1, mp=1, outname="sp")
    dp_out = _launch_pipeline(workdir, nproc=2, mp=1, outname="dp")
    tp_out = _launch_pipeline(workdir, nproc=2, mp=2, outname="tp")
    # combined DP x TP: 4 processes (1 CPU device each) on a
    # {data:2, model:2} mesh — the 2-D submesh case the reference's dormant
    # partitioner describes (partitioner.py:150-307) and the in-process
    # dryrun covers without real process boundaries
    dptp_out = _launch_pipeline(workdir, nproc=4, mp=2, outname="dptp")

    # merged artifacts byte-equal the single-process run
    for run in ("dp", "tp", "dptp"):
        for i in range(4):
            assert filecmp.cmp(
                os.path.join(workdir, "sp", "labels", f"lec{i}.csv"),
                os.path.join(workdir, run, "labels", f"lec{i}.csv"),
                shallow=False,
            ), f"label CSV lec{i} differs in {run}"
        # manifests embed the per-run absolute root; compare path lists
        from taiwan_whisper_tpu.audio.manifest import read_manifest

        for art in ("segments.tsv",
                    "train_non-hallucinated-threshold100.0.tsv"):
            a = read_manifest(os.path.join(workdir, "sp", art))
            b = read_manifest(os.path.join(workdir, run, art))
            assert a.paths == b.paths and a.frames == b.frames, \
                f"{art} differs in {run}"
        assert filecmp.cmp(
            os.path.join(workdir, "sp", "hallucination_result.csv"),
            os.path.join(workdir, run, "hallucination_result.csv"),
            shallow=False,
        ), f"hallucination_result.csv differs in {run}"
        # every rank wrote a disjoint, non-empty hyp shard
        import glob as _glob

        shards = sorted(_glob.glob(os.path.join(workdir, run, "idx_hyp.*.txt")))
        assert len(shards) == (4 if run == "dptp" else 2)
        seen: set = set()
        for sh in shards:
            idx = {int(l.split("\t")[0])
                   for l in open(sh).read().splitlines() if "\t" in l}
            assert idx and not (idx & seen), f"shard overlap/empty in {run}"
            seen |= idx
        # distill artifacts: rank-0 HF export + orbax checkpoint
        assert os.path.exists(os.path.join(
            workdir, run, "distill", "hf_export", "model.safetensors"))
        assert os.path.exists(os.path.join(
            workdir, run, "distill", "checkpoints", "checkpoint-2"))

    # same global batch on every topology -> same loss (reduction-order eps)
    sp_loss = _final_loss(sp_out)
    assert abs(_final_loss(dp_out) - sp_loss) < 5e-3 * max(abs(sp_loss), 1.0)
    assert abs(_final_loss(tp_out) - sp_loss) < 5e-3 * max(abs(sp_loss), 1.0)
    assert abs(_final_loss(dptp_out) - sp_loss) < 5e-3 * max(abs(sp_loss), 1.0)


def test_two_process_prefilter(tmp_path):
    import json

    from taiwan_whisper_tpu.audio.io import write_flac
    from taiwan_whisper_tpu.audio.manifest import Manifest, write_manifest
    from taiwan_whisper_tpu.models.config import WhisperConfig
    from taiwan_whisper_tpu.models.io import save_hf_checkpoint
    from taiwan_whisper_tpu.models.params import init_params
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, bytes_to_unicode

    workdir = str(tmp_path)
    cfg = WhisperConfig(
        vocab_size=MULTILINGUAL.vocab_size, d_model=64, ffn_dim=128,
        encoder_layers=1, decoder_layers=1, encoder_attention_heads=4,
        decoder_attention_heads=4, max_source_positions=60,
        max_target_positions=64,
    )
    save_hf_checkpoint(os.path.join(workdir, "model"), init_params(cfg, seed=1), cfg)
    tok_dir = os.path.join(workdir, "tok")
    os.makedirs(tok_dir)
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    aud = os.path.join(workdir, "audio")
    os.makedirs(aud)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        name = f"u{i}.flac"
        write_flac(os.path.join(aud, name),
                   (rng.randn(16000) * 0.1).astype(np.float32))
        with open(os.path.join(aud, f"u{i}.txt"), "w") as f:
            f.write(f"<|0.00|>seg {i}<|0.98|>\n\n\n\n\n")
        paths.append(name)
    write_manifest(os.path.join(workdir, "train.tsv"),
                   Manifest(root=aud, paths=paths))
    os.makedirs(os.path.join(workdir, "out"))

    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual-device forcing in children
    env["PYTHONPATH"] = REPO
    script = os.path.join(workdir, "worker.py")
    with open(script, "w") as f:
        f.write(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, script, coord, str(r), "2", workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode(errors="replace"))
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out}"

    # both ranks wrote disjoint shards; rank 0 merged every index
    shard0 = open(os.path.join(workdir, "out", "idx_hyp.0.txt")).read()
    shard1 = open(os.path.join(workdir, "out", "idx_hyp.1.txt")).read()
    idx0 = {int(l.split("\t")[0]) for l in shard0.splitlines() if "\t" in l}
    idx1 = {int(l.split("\t")[0]) for l in shard1.splitlines() if "\t" in l}
    assert idx0 and idx1 and not (idx0 & idx1)
    assert idx0 | idx1 == {0, 1, 2, 3}
    assert os.path.exists(
        os.path.join(workdir, "out", "hallucination_result.csv")
    )
