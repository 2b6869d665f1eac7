"""Stage 2b: prefiltering — validator re-inference + cross-model MER filter.

TPU-native replacement for prefiltering/validator_inference.py (whisper-base
greedy over every 30 s chunk, Accelerate DDP, per-rank idx\thyp files merged
by sort) and prefiltering/elim_hallucination.py (MER threshold + n-gram
filters writing a cleaned TSV). Here validator decoding is a batched jit
greedy decode; multi-host sharding is by segment index with a single global
gather at the end (hosts write per-process TSV shards exactly like the
reference so the merge tooling stays compatible).
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..audio.io import load_audio_16k
from ..audio.manifest import Manifest, read_manifest, write_manifest
from ..audio.mel import log_mel, pad_or_trim
from ..decode.greedy import greedy_decode
from ..decode.rules import DecodeRules
from ..models import whisper as M
from ..models.config import DtypePolicy, WhisperConfig
from ..parallel.mesh import host_local_slice
from ..text.hallucination import CrossModelFilter, FilterDecision
from ..text.tokenizer import WhisperTokenizer


@dataclasses.dataclass
class PrefilterConfig:
    language: str = "zh"
    batch_size: int = 16
    max_decode_len: int = 448
    threshold: float = 0.4  # MER cutoff (reference elim_hallucination.sh)
    mix_detection: bool = False
    empty_error_rate: float = 1.0


def validator_transcribe(
    params,
    config: WhisperConfig,
    tok: WhisperTokenizer,
    audio_paths: Sequence[str],
    cfg: PrefilterConfig = PrefilterConfig(),
    policy: DtypePolicy = DtypePolicy(),
    *,
    mel_fn=None,
) -> List[Tuple[int, str]]:
    """Greedy-decode every chunk; returns [(global_index, hyp_text)] for this
    host's shard. Chunks are padded/trimmed to exactly 30 s
    (reference validator_inference.py:131-137)."""
    rules = DecodeRules.from_special(tok.special, timestamps=True)
    mel_fn = mel_fn or (lambda a: log_mel(a, config.num_mel_bins))
    sot_seq = tok.sot_sequence(cfg.language, "transcribe", timestamps=True)

    # params is an explicit jit argument (closure constants overflow the
    # remote-compile payload at real model sizes — HTTP 413; see label.py)
    @jax.jit
    def decode_batch(params, audio_batch, prefix):
        mel = mel_fn(audio_batch)
        enc = M.encode(params, mel, config, policy)
        return greedy_decode(
            params, enc, prefix, config, rules, policy,
            max_len=cfg.max_decode_len,
        )

    n_window = config.max_source_positions * 2 * 160
    shard = host_local_slice(len(audio_paths))
    indices = list(range(len(audio_paths)))[shard]
    results: List[Tuple[int, str]] = []
    bs = cfg.batch_size
    prefix = jnp.asarray([sot_seq] * bs, jnp.int32)
    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(max_workers=4)

    def _load(gi):
        return pad_or_trim(load_audio_16k(audio_paths[gi]), n_window)

    for i in range(0, len(indices), bs):
        chunk_ids = indices[i : i + bs]
        arrs = list(pool.map(_load, chunk_ids))
        while len(arrs) < bs:  # pad batch for compile stability
            arrs.append(np.zeros_like(arrs[0]))
        res = decode_batch(params, jnp.asarray(np.stack(arrs)), prefix)
        tokens = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        for j, gi in enumerate(chunk_ids):
            sampled = tokens[j][len(sot_seq) : len(sot_seq) + int(lengths[j])]
            hyp = tok.decode(sampled.tolist(), skip_special_tokens=True)
            results.append((gi, hyp))
    return results


def write_hyps_tsv(path: str, hyps: Sequence[Tuple[int, str]]):
    """idx\thyp per line (the reference's per-rank format,
    dataset/cool_dataset.py:216-225)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for idx, hyp in hyps:
            f.write(f"{idx}\t{hyp.replace(chr(9), ' ')}\n")


def read_hyps_tsv(paths: Sequence[str]) -> Dict[int, str]:
    """Merge (possibly per-rank) hyp TSVs, tolerating invalid lines
    (reference elim_hallucination.py:117-132)."""
    merged: Dict[int, str] = {}
    invalid = 0
    for p in paths:
        with open(p, encoding="utf-8") as f:
            for line in f:
                items = line.rstrip("\n").split("\t")
                if len(items) != 2:
                    invalid += 1
                    continue
                try:
                    merged[int(items[0])] = items[1]
                except ValueError:
                    invalid += 1
    if invalid:
        print(f"[prefilter] invalid hyp lines skipped: {invalid}")
    return merged


def filter_manifest(
    manifest: Manifest,
    hyps: Dict[int, str],
    cfg: PrefilterConfig = PrefilterConfig(),
    output_dir: Optional[str] = None,
    lexicon_path: Optional[str] = None,
    phonemize: bool = False,
) -> Tuple[Manifest, List[FilterDecision]]:
    """Apply the cross-model filter; returns (cleaned manifest, decisions)
    and writes hallucination_result.csv + cleaned TSV when output_dir given
    (reference whisper_checker output, elim_hallucination.py:202-237)."""
    txt_paths = manifest.transcript_paths()
    checker = CrossModelFilter(
        threshold=cfg.threshold,
        mix_detection=cfg.mix_detection,
        empty_error_rate=cfg.empty_error_rate,
        phonemize=phonemize,
        lexicon_path=lexicon_path,
    )
    decisions: List[FilterDecision] = []
    for idx, hyp in sorted(hyps.items()):
        with open(txt_paths[idx], encoding="utf-8") as f:
            transcript = f.readline()
        decisions.append(checker.check(idx, transcript, hyp))

    kept = [d.index for d in decisions if not d.hallucinated]
    cleaned = Manifest(
        root=manifest.root,
        paths=[manifest.paths[i] for i in kept],
        frames=[manifest.frames[i] for i in kept] if manifest.frames else None,
    )
    n_bad = sum(d.hallucinated for d in decisions)
    print(f"[prefilter] hallucinated: {n_bad}/{len(decisions)} "
          f"({n_bad / max(len(decisions), 1):.1%})")

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "hallucination_result.csv"), "w",
                  newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["index", "path", "hallucinated", "mer", "reason"])
            for d in decisions:
                w.writerow([d.index, manifest.paths[d.index], int(d.hallucinated),
                            "" if d.mer is None else f"{d.mer:.4f}", d.reason])
        name = f"train_non-hallucinated-threshold{cfg.threshold}"
        if cfg.mix_detection:
            name += "-mix_detection"
        write_manifest(os.path.join(output_dir, f"{name}.tsv"), cleaned)
    return cleaned, decisions


def run_prefilter(
    manifest_path: str,
    validator_model_dir: str,
    output_dir: str,
    cfg: PrefilterConfig = PrefilterConfig(),
    tokenizer_dir: Optional[str] = None,
) -> Manifest:
    """CLI entry: validator inference (sharded) + filter + cleaned TSV."""
    from ..models.io import load_model

    params, config = load_model(validator_model_dir)
    tok = (
        WhisperTokenizer.from_pretrained_dir(tokenizer_dir)
        if tokenizer_dir
        else WhisperTokenizer()
    )
    manifest = read_manifest(manifest_path)
    paths = manifest.absolute_paths()
    hyps_local = validator_transcribe(params, config, tok, paths, cfg)
    rank = jax.process_index()
    hyp_path = os.path.join(output_dir, f"idx_hyp.{rank}.txt")
    write_hyps_tsv(hyp_path, hyps_local)
    if jax.process_count() > 1:
        # all ranks must have flushed their shard before rank 0 merges
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("prefilter_shards_written")
    # single-host: merge immediately; multi-host: rank 0 merges all shards
    if jax.process_count() == 1 or rank == 0:
        import glob

        all_shards = sorted(glob.glob(os.path.join(output_dir, "idx_hyp.*.txt")))
        hyps = read_hyps_tsv(all_shards)
        cleaned, _ = filter_manifest(manifest, hyps, cfg, output_dir)
        return cleaned
    return manifest
