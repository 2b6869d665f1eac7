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
