"""Stage 4: evaluation — MER + RTF over test manifests.

TPU-native counterpart of training/run_eval.py:
* short-form: batched greedy/beam decode of 30 s chunks;
* long-form: sequential (timestamp sliding + temperature ladder) or chunked
  (stride merge) via decode/longform.py;
* metrics: MixErrorRate (+ separate-language), RTF = wall / audio-seconds,
  audio-seconds/s per chip (run_eval.py:678-681,768-795 measures the same).

Test data: fairseq TSV manifest; ground truth read from the sibling .txt's
first line (markers stripped before scoring).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..audio.io import load_audio_16k
from ..audio.manifest import read_manifest
from ..audio.mel import log_mel, pad_or_trim
from ..decode.beam import beam_decode
from ..decode.greedy import greedy_decode
from ..decode.longform import chunked_decode, sequential_decode
from ..decode.rules import DecodeRules
from ..models import whisper as M
from ..models.config import DtypePolicy, WhisperConfig
from ..text.metrics import MixErrorRate
from ..text.normalizer import BasicTextNormalizer
from ..text.tokenizer import WhisperTokenizer, strip_markers


@dataclasses.dataclass
class EvalConfig:
    # "none" -> English-only models' prefix [sot(, notimestamps)]
    language: Optional[str] = "zh"
    task: str = "transcribe"
    mode: str = "short"  # short | sequential | chunked | speculative
    batch_size: int = 16
    num_beams: int = 1
    max_decode_len: int = 448
    separate_language: bool = True
    num_draft_tokens: int = 5  # speculative mode

    def __post_init__(self):
        if isinstance(self.language, str) and self.language.lower() in (
            "none", "en-only", ""
        ):
            self.language = None


@dataclasses.dataclass
class EvalResult:
    mer: float
    en_wer: Optional[float]
    zh_cer: Optional[float]
    rtf: float
    audio_seconds_per_second: float
    n_samples: int
    predictions: List[str]
    references: List[str]


def _decode_short_batch(params, config, tok, rules, policy, cfg, audio_batch):
    sot_seq = tok.sot_sequence(cfg.language, cfg.task, timestamps=True)
    prefix = jnp.asarray([sot_seq] * audio_batch.shape[0], jnp.int32)
    mel = log_mel(jnp.asarray(audio_batch), config.num_mel_bins)
    enc = M.encode(params, mel, config, policy)
    if cfg.num_beams > 1:
        res = beam_decode(
            params, enc, prefix, config, rules, policy,
            num_beams=cfg.num_beams, max_len=cfg.max_decode_len,
        )
        return res.tokens, None
    res = greedy_decode(
        params, enc, prefix, config, rules, policy, max_len=cfg.max_decode_len
    )
    return res.tokens, res.lengths


def evaluate_manifest(
    params,
    config: WhisperConfig,
    tok: WhisperTokenizer,
    manifest_path: str,
    cfg: EvalConfig = EvalConfig(),
    policy: DtypePolicy = DtypePolicy(),
    output_dir: Optional[str] = None,
    assistant: Optional[tuple] = None,  # (params, config) for speculative mode
) -> EvalResult:
    manifest = read_manifest(manifest_path)
    audio_paths = manifest.absolute_paths()
    txt_paths = manifest.transcript_paths()
    rules = DecodeRules.from_special(tok.special, timestamps=True)
    sot_len = len(tok.sot_sequence(cfg.language, cfg.task, timestamps=True))

    # params is an explicit jit argument: closure constants get serialized
    # into the lowered program and overflow the remote-compile payload at
    # real model sizes (HTTP 413 on the TPU tunnel)
    decode_jit = jax.jit(
        lambda params, audio: _decode_short_batch(
            params, config, tok, rules, policy, cfg, audio
        )
    )

    predictions: List[str] = []
    references: List[str] = []
    audio_seconds = 0.0
    t0 = time.time()

    if cfg.mode == "speculative":
        # assistant-model decoding per utterance (reference
        # run_eval.py:524-545 uses batch 1 with an assistant model)
        assert assistant is not None, "speculative mode needs assistant=(params, config)"
        from ..decode.speculative import speculative_decode

        a_params, a_config = assistant
        n_window = config.max_source_positions * 2 * 160
        sot_seq = tok.sot_sequence(cfg.language, cfg.task, timestamps=True)

        @jax.jit
        def spec_one(params, a_params, audio):
            mel = log_mel(audio[None], config.num_mel_bins)
            t_enc = M.encode(params, mel, config, policy)
            a_mel = log_mel(audio[None], a_config.num_mel_bins)
            s_enc = M.encode(a_params, a_mel, a_config, policy)
            prefix = jnp.asarray([sot_seq], jnp.int32)
            return speculative_decode(
                params, config, a_params, a_config, t_enc, s_enc, prefix,
                rules, policy, num_draft_tokens=cfg.num_draft_tokens,
                max_len=cfg.max_decode_len,
            )

        for p in audio_paths:
            raw = load_audio_16k(p)
            audio_seconds += min(len(raw), n_window) / 16000.0
            res = spec_one(params, a_params, jnp.asarray(pad_or_trim(raw, n_window)))
            ids = np.asarray(res.tokens)[0][len(sot_seq): len(sot_seq) + int(res.length)]
            predictions.append(tok.decode(ids.tolist(), skip_special_tokens=True))
    elif cfg.mode == "short":
        import concurrent.futures as cf

        n_window = config.max_source_positions * 2 * 160
        bs = cfg.batch_size
        pool = cf.ThreadPoolExecutor(max_workers=4)
        for i in range(0, len(audio_paths), bs):
            paths = audio_paths[i : i + bs]
            raw = list(pool.map(load_audio_16k, paths))
            audio_seconds += sum(min(len(a), n_window) for a in raw) / 16000.0
            arrs = [pad_or_trim(a, n_window) for a in raw]
            while len(arrs) < bs:
                arrs.append(np.zeros_like(arrs[0]))
            tokens, lengths = decode_jit(params, np.stack(arrs))
            tokens = np.asarray(tokens)
            for j in range(len(paths)):
                ids = tokens[j][sot_len:]
                if lengths is not None:
                    ids = ids[: int(np.asarray(lengths)[j])]
                predictions.append(tok.decode(ids.tolist(), skip_special_tokens=True))
    else:
        for p in audio_paths:
            audio = load_audio_16k(p)
            audio_seconds += len(audio) / 16000.0
            if cfg.mode == "sequential":
                res = sequential_decode(
                    params, audio, config, tok, policy,
                    language=cfg.language, task=cfg.task,
                    num_beams=cfg.num_beams,
                )
            else:
                res = chunked_decode(
                    params, audio, config, tok, policy,
                    language=cfg.language, task=cfg.task,
                    batch_size=cfg.batch_size,
                    num_beams=cfg.num_beams,
                )
            predictions.append(res.text(tok))

    wall = time.time() - t0

    normalizer = BasicTextNormalizer()
    for txt in txt_paths:
        with open(txt, encoding="utf-8") as f:
            references.append(strip_markers(f.readline().strip()))
    predictions_n = [normalizer(p) for p in predictions]
    references_n = [normalizer(r) for r in references]

    metric = MixErrorRate(separate_language=cfg.separate_language)
    scores = metric.compute(predictions_n, references_n)
    if isinstance(scores, dict):
        mer = scores["MER"]
        en_wer = scores.get("EN WER")
        zh_cer = scores.get("ZH CER")
    else:
        mer, en_wer, zh_cer = float(scores), None, None

    result = EvalResult(
        mer=float(mer),
        en_wer=en_wer,
        zh_cer=zh_cer,
        rtf=wall / max(audio_seconds, 1e-9),
        audio_seconds_per_second=audio_seconds / max(wall, 1e-9),
        n_samples=len(predictions),
        predictions=predictions,
        references=references,
    )
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "eval_predictions.tsv"), "w",
                  encoding="utf-8") as f:
            f.write("path\thyp\tref\n")
            for p, hyp, ref in zip(manifest.paths, predictions, references):
                f.write(f"{p}\t{hyp}\t{ref}\n")
    return result
