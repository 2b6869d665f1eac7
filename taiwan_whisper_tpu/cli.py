"""Command-line entry points for the four pipeline stages + utilities.

The reference drives each stage with a separate script + shell wrapper
(README.md:4-10, SURVEY.md §1 L8); here one CLI exposes them as subcommands:

    python -m taiwan_whisper_tpu.cli label      --manifest ... --model ...
    python -m taiwan_whisper_tpu.cli segment    --trans_dir ... --audio_dir ...
    python -m taiwan_whisper_tpu.cli prefilter  --manifest ... --validator ...
    python -m taiwan_whisper_tpu.cli distill    --manifest ... --teacher ...
    python -m taiwan_whisper_tpu.cli evaluate   --manifest ... --model ...
    python -m taiwan_whisper_tpu.cli init-student --teacher ... --out ...
    python -m taiwan_whisper_tpu.cli make-manifest --root ... --out ...

Multi-host: launch the same command on every host after
jax.distributed.initialize (pass --distributed); manifest sharding is
automatic via jax.process_index.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _quant_arg(v: str):
    """--quantize_kv value: off/0/false | 8/int8/true | 4/int4 | fp8."""
    s = str(v).strip().lower()
    if s in ("", "0", "off", "false", "none"):
        return 0
    if s in ("8", "int8", "true", "1"):
        return 8
    if s in ("4", "int4"):
        return 4
    if s in ("fp8", "e4m3", "float8"):
        return "fp8"
    raise argparse.ArgumentTypeError(
        f"--quantize_kv must be off/8/4/fp8, got {v!r}")


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--tokenizer_dir", default=None,
                   help="dir with vocab.json/merges.txt (optional)")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() first")


def _maybe_init_distributed(args):
    if getattr(args, "distributed", False):
        import jax

        jax.distributed.initialize()


def cmd_label(args):
    from .pipeline.label import LabelConfig, run_labelling

    _maybe_init_distributed(args)
    stats = run_labelling(
        args.manifest, args.model, args.output_dir,
        LabelConfig(
            language=args.language, strategy=args.strategy,
            batch_size=args.batch_size,
            energy_vad_threshold=args.energy_vad_threshold,
            vad_regions=args.vad_mode != "off",
            vad_mode=args.vad_mode,
            quantize_kv=args.quantize_kv,
            num_beams=args.num_beams,
            pooled=not args.no_pooled,
            wire_mode=args.wire_mode,
            pack_regions=args.pack_regions,
            group_segs=args.group_segs,
            max_decode_tokens=args.max_decode_tokens,
            num_draft_tokens=args.num_draft_tokens,
        ),
        tokenizer_dir=args.tokenizer_dir,
        assistant_dir=args.assistant,
        validation_manifest=args.validation_manifest,
    )
    print(json.dumps(stats))
    return stats


def cmd_segment(args):
    from .audio.io import load_audio_16k
    from .audio.manifest import Manifest, write_manifest
    from .pipeline.segment import read_pseudo_label_csv, segment_audio_file

    csvs = {os.path.splitext(os.path.basename(p))[0]: p
            for p in glob.glob(os.path.join(args.trans_dir, "*.csv"))}
    rel_paths = []
    for audio_path in sorted(glob.glob(os.path.join(args.audio_dir, f"*.{args.ext}"))):
        stem = os.path.splitext(os.path.basename(audio_path))[0]
        if stem not in csvs:
            print(f"[segment] no transcription for {stem}")
            continue
        audio = load_audio_16k(audio_path)
        utts = read_pseudo_label_csv(csvs[stem])
        rel_paths.extend(
            segment_audio_file(audio, utts, args.output_dir, stem,
                               audio_format=args.ext)
        )
    write_manifest(
        os.path.join(args.output_dir, "train.tsv"),
        Manifest(root=os.path.abspath(args.output_dir), paths=rel_paths),
    )
    print(f"[segment] wrote {len(rel_paths)} segments")


def cmd_prefilter(args):
    from .pipeline.prefilter import PrefilterConfig, run_prefilter

    _maybe_init_distributed(args)
    run_prefilter(
        args.manifest, args.validator, args.output_dir,
        PrefilterConfig(
            language=args.language, batch_size=args.batch_size,
            threshold=args.threshold, mix_detection=args.mix_detection,
        ),
        tokenizer_dir=args.tokenizer_dir,
    )


def cmd_distill(args):
    from .pipeline.dataset import TrainPrepConfig
    from .pipeline.distill_driver import DistillRunConfig, run_distillation
    from .train.distill import DistillConfig
    from .train.state import OptimConfig

    _maybe_init_distributed(args)
    metrics = run_distillation(
        args.manifest, args.teacher, args.output_dir,
        student_dir=args.student,
        student_decoder_layers=args.student_decoder_layers,
        student_encoder_layers=args.student_encoder_layers,
        run_cfg=DistillRunConfig(
            max_steps=args.max_steps, batch_size=args.batch_size,
            model_parallel=args.model_parallel, save_steps=args.save_steps,
            eval_steps=args.eval_steps, use_wandb=args.wandb,
            gen_eval_batches=args.gen_eval_batches,
        ),
        dcfg=DistillConfig(
            ce_weight=args.ce_weight, kl_weight=args.kl_weight,
            temperature=args.temperature, mse_weight=args.mse_weight,
        ),
        opt_cfg=OptimConfig(
            learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
            total_steps=args.max_steps, schedule=args.lr_schedule,
        ),
        prep_cfg=TrainPrepConfig(
            language=args.language,
            timestamp_probability=args.timestamp_probability,
            condition_on_prev_probability=args.condition_on_prev_probability,
        ),
        tokenizer_dir=args.tokenizer_dir,
        eval_manifest_path=args.eval_manifest,
    )
    print(json.dumps(metrics))
    return metrics


def cmd_finetune(args):
    from .pipeline.dataset import TrainPrepConfig
    from .pipeline.distill_driver import DistillRunConfig, run_finetuning
    from .train.state import OptimConfig

    _maybe_init_distributed(args)
    metrics = run_finetuning(
        args.manifest, args.model, args.output_dir,
        freeze_encoder=args.freeze_encoder,
        run_cfg=DistillRunConfig(
            max_steps=args.max_steps, batch_size=args.batch_size,
            model_parallel=args.model_parallel, save_steps=args.save_steps,
            eval_steps=args.eval_steps, mix_lang_embeddings=False,
        ),
        opt_cfg=OptimConfig(
            learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
            total_steps=args.max_steps,
        ),
        prep_cfg=TrainPrepConfig(language=args.language),
        tokenizer_dir=args.tokenizer_dir,
        eval_manifest_path=args.eval_manifest,
    )
    print(json.dumps(metrics))
    return metrics


def cmd_evaluate(args):
    from .models.io import load_model
    from .pipeline.evaluate import EvalConfig, evaluate_manifest
    from .text.tokenizer import WhisperTokenizer, special_for_vocab

    _maybe_init_distributed(args)
    params, config = load_model(args.model)
    special = special_for_vocab(config.vocab_size)
    tok = (WhisperTokenizer.from_pretrained_dir(args.tokenizer_dir, special=special)
           if args.tokenizer_dir else WhisperTokenizer(special))
    assistant = None
    if args.assistant:
        assistant = load_model(args.assistant)
    res = evaluate_manifest(
        params, config, tok, args.manifest,
        EvalConfig(
            language=args.language, mode=args.mode,
            batch_size=args.batch_size, num_beams=args.num_beams,
        ),
        output_dir=args.output_dir,
        assistant=assistant,
    )
    metrics = {
        "mer": res.mer, "en_wer": res.en_wer, "zh_cer": res.zh_cer,
        "rtf": res.rtf,
        "audio_seconds_per_second": res.audio_seconds_per_second,
        "n_samples": res.n_samples,
    }
    print(json.dumps(metrics))
    return metrics


def cmd_init_student(args):
    from .models.io import load_model, save_hf_checkpoint
    from .models.params import init_student_from_teacher, mix_language_embeddings
    from .text.tokenizer import MULTILINGUAL

    teacher, tcfg = load_model(args.teacher)
    if args.mix_lang_emb:
        zh, en = MULTILINGUAL.language_id("zh"), MULTILINGUAL.language_id("en")
        teacher = mix_language_embeddings(teacher, zh, [zh, en])
    layers = ([int(x) for x in args.decoder_layers_numbers.split(",")]
              if args.decoder_layers_numbers else None)
    student = init_student_from_teacher(
        teacher, tcfg, args.decoder_layers, layers,
        encoder_layers=args.encoder_layers,
    )
    scfg = tcfg.with_decoder_layers(args.decoder_layers)
    if args.encoder_layers is not None:
        scfg = scfg.with_encoder_layers(args.encoder_layers)
    save_hf_checkpoint(args.out, student, scfg)
    print(f"[init-student] wrote {args.out}")


def cmd_transcribe(args):
    """Long-form transcription of audio files to txt/srt/vtt/json — the
    user-facing counterpart of the reference's long-form drivers
    (training/flax/run_long_form_transcription.py, FlaxWhisperPipeline)."""
    from .audio.io import load_audio_16k
    from .decode.longform import chunked_decode, sequential_decode
    from .models.io import load_model
    from .text.subtitles import Cue, write_srt, write_vtt
    from .text.tokenizer import WhisperTokenizer, special_for_vocab

    _maybe_init_distributed(args)
    params, config = load_model(args.model)
    special = special_for_vocab(config.vocab_size)
    tok = (WhisperTokenizer.from_pretrained_dir(args.tokenizer_dir, special=special)
           if args.tokenizer_dir else WhisperTokenizer(special))
    language = None if args.language.lower() in ("none", "") else args.language

    files = []
    for pattern in args.audio:
        if os.path.isdir(pattern):
            files.extend(sorted(glob.glob(os.path.join(pattern, "*.flac")))
                         + sorted(glob.glob(os.path.join(pattern, "*.wav"))))
        else:
            files.extend(sorted(glob.glob(pattern)) or [pattern])
    os.makedirs(args.output_dir, exist_ok=True)
    results = {}
    for path in files:
        audio = load_audio_16k(path)
        if args.strategy == "sequential":
            res = sequential_decode(
                params, audio, config, tok,
                language=language, quantize_cross_kv=args.quantize_kv,
                num_beams=args.num_beams,
            )
        else:
            res = chunked_decode(
                params, audio, config, tok,
                language=language, batch_size=args.batch_size,
                quantize_cross_kv=args.quantize_kv,
                num_beams=args.num_beams,
            )
        stem = os.path.splitext(os.path.basename(path))[0]
        cues = [Cue(s.start, s.end, s.text(tok)) for s in res.segments]
        out_base = os.path.join(args.output_dir, stem)
        if args.format == "txt":
            with open(out_base + ".txt", "w", encoding="utf-8") as f:
                f.write(res.text(tok).strip() + "\n")
        elif args.format == "srt":
            write_srt(out_base + ".srt", cues)
        elif args.format == "vtt":
            write_vtt(out_base + ".vtt", cues)
        else:  # json
            with open(out_base + ".json", "w", encoding="utf-8") as f:
                json.dump(
                    [{"start": c.start, "end": c.end, "text": c.text}
                     for c in cues],
                    f, ensure_ascii=False, indent=1,
                )
        results[path] = len(cues)
        print(f"[transcribe] {path}: {len(cues)} segments")
    return results


def cmd_sweep(args):
    from .pipeline.sweep import run_sweep, run_sweep_agent

    if not args.agent and not args.config:
        raise SystemExit("sweep: --config is required without --agent")
    if args.agent:
        summary = run_sweep_agent(
            args.config, args.target, args.output_dir,
            extra_argv=args.extra, sweep_id=args.sweep_id,
            project=args.project, entity=args.entity, count=args.count,
        )
    else:
        summary = run_sweep(
            args.config, args.target, args.output_dir,
            extra_argv=args.extra, max_runs=args.max_runs, seed=args.seed,
        )
    print(json.dumps(summary))
    return summary


def cmd_make_manifest(args):
    from .audio.manifest import Manifest, split_valid, write_manifest

    paths = sorted(
        os.path.relpath(p, args.root)
        for p in glob.glob(os.path.join(args.root, "**", f"*.{args.ext}"),
                           recursive=True)
    )
    m = Manifest(root=os.path.abspath(args.root), paths=paths)
    if args.valid_percent > 0:
        train, valid = split_valid(m, args.valid_percent, args.seed)
        write_manifest(os.path.join(args.out, "train.tsv"), train)
        write_manifest(os.path.join(args.out, "valid.tsv"), valid)
        print(f"[manifest] train={len(train)} valid={len(valid)}")
    else:
        write_manifest(os.path.join(args.out, "train.tsv"), m)
        print(f"[manifest] train={len(m)}")


def cmd_collect_hallucinations(args):
    from .pipeline.audit import collect_hallucinations

    collect_hallucinations(
        args.original_tsv, args.cleaned_tsv, args.hyp_tsv, args.output_dir,
        num_samples=args.num_samples, seed=args.seed,
        filter_csv=args.filter_csv, copy_audio=not args.no_audio,
    )


def build_parser() -> argparse.ArgumentParser:
    # @file support: `cli distill @configs/distill_32_2.args` reads one
    # argument per line — the role of the reference's per-experiment shell
    # scripts (SURVEY.md §2.2 F13)
    ap = argparse.ArgumentParser(
        prog="taiwan_whisper_tpu", fromfile_prefix_chars="@"
    )
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("label", help="stage 1: pseudo-label long audio")
    p.add_argument("--manifest", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--language", default="zh")
    p.add_argument("--strategy", default="chunked", choices=["chunked", "sequential"])
    p.add_argument("--batch_size", type=int, default=96,
                   help="pooled chunk batch; default = the measured v5e "
                        "greedy knee (PERF.md)")
    p.add_argument("--energy_vad_threshold", type=float, default=0.0)
    p.add_argument("--vad_mode", default="spectral",
                   choices=["spectral", "spectral-device", "spectral-host",
                            "energy", "off"],
                   help="region-gated decode: spectral (default; rejects "
                        "music/noise; scores on-device on TPU), "
                        "spectral-device/-host force a scorer backend, "
                        "energy (RMS only), off (whole file)")
    p.add_argument("--quantize_kv", type=_quant_arg, nargs="?", const=8,
                   default=0, metavar="MODE",
                   help="cross-KV quantization: bare flag or 8 -> int8 "
                        "(recommended, PERF.md), 4 -> int4, fp8 -> e4m3, "
                        "off -> disabled")
    p.add_argument("--num_beams", type=int, default=1,
                   help="beam-search teacher decode (reference labels with "
                        "beam 5)")
    p.add_argument("--no_pooled", action="store_true",
                   help="disable the pooled cross-file chunk scheduler "
                        "(debug/A-B only; pooled is the fast path)")
    p.add_argument("--wire_mode", default="auto",
                   choices=["auto", "resident", "chunks"],
                   help="pooled transport: resident (one int16 upload per "
                        "file, VAD + chunk gathers on device — the fast "
                        "path), chunks (staged batches), auto")
    p.add_argument("--group_segs", type=int, default=None,
                   help="120 s segments per resident device group buffer "
                        "(default 16 = 32 min); smaller groups pipeline "
                        "ingest/VAD with decode on compute-bound shapes")
    p.add_argument("--pack_regions", action="store_true",
                   help="pack short VAD regions into shared decode windows "
                        "(resident transport; the reference packs "
                        "utterances the same way, "
                        "run_pseudo_labelling.py:644-734)")
    p.add_argument("--max_decode_tokens", type=int, default=None,
                   help="cap sampled tokens per 30 s chunk (None = model "
                        "max 448)")
    p.add_argument("--assistant", default=None,
                   help="draft model dir: label with speculative decoding "
                        "(teacher-exact; reference run_eval.py:524-545)")
    p.add_argument("--num_draft_tokens", type=int, default=5)
    p.add_argument("--validation_manifest", default=None,
                   help="labelled split to score pseudo-label quality "
                        "against (live CER/MER, reference "
                        "run_pseudo_labelling.py:959-979)")
    _add_common(p)
    p.set_defaults(fn=cmd_label)

    p = sub.add_parser("segment", help="stage 2a: 30s re-segmentation")
    p.add_argument("--trans_dir", required=True)
    p.add_argument("--audio_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ext", default="flac")
    p.set_defaults(fn=cmd_segment)

    p = sub.add_parser("prefilter", help="stage 2b: validator + MER filter")
    p.add_argument("--manifest", required=True)
    p.add_argument("--validator", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--language", default="zh")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--threshold", type=float, default=0.4)
    p.add_argument("--mix_detection", action="store_true")
    _add_common(p)
    p.set_defaults(fn=cmd_prefilter)

    p = sub.add_parser("distill", help="stage 3: knowledge distillation")
    p.add_argument("--manifest", required=True)
    p.add_argument("--teacher", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--student", default=None)
    p.add_argument("--student_decoder_layers", type=int, default=2)
    p.add_argument("--student_encoder_layers", type=int, default=None,
                   help="slice the teacher encoder to N max-spaced layers "
                        "(e.g. the 16-2 variant from large-v2)")
    p.add_argument("--max_steps", type=int, default=120_000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--eval_steps", type=int, default=1000)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--lr_schedule", default="constant_with_warmup")
    p.add_argument("--ce_weight", type=float, default=0.8)
    p.add_argument("--kl_weight", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--mse_weight", type=float, default=0.0)
    p.add_argument("--language", default="zh")
    p.add_argument("--timestamp_probability", type=float, default=0.2)
    p.add_argument("--condition_on_prev_probability", type=float, default=0.2)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--eval_manifest", default=None)
    p.add_argument("--gen_eval_batches", type=int, default=0,
                   help="also greedy-decode N eval batches and log MER")
    _add_common(p)
    p.set_defaults(fn=cmd_distill)

    p = sub.add_parser("finetune", help="CE-only seq2seq fine-tuning")
    p.add_argument("--manifest", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_steps", type=int, default=10_000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--eval_steps", type=int, default=1000)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--freeze_encoder", action="store_true")
    p.add_argument("--language", default="zh")
    p.add_argument("--eval_manifest", default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_finetune)

    p = sub.add_parser("evaluate", help="stage 4: MER + RTF eval")
    p.add_argument("--manifest", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--language", default="zh",
                   help="forced language; 'none' for *.en models")
    p.add_argument("--mode", default="short",
                   choices=["short", "sequential", "chunked", "speculative"])
    p.add_argument("--assistant", default=None,
                   help="assistant (draft) model dir for --mode speculative")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_beams", type=int, default=1)
    _add_common(p)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("init-student", help="maximally-spaced student init")
    p.add_argument("--teacher", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--decoder_layers", type=int, default=2)
    p.add_argument("--decoder_layers_numbers", default=None,
                   help="comma-separated explicit teacher layer indices")
    p.add_argument("--encoder_layers", type=int, default=None,
                   help="slice the encoder to N max-spaced teacher layers")
    p.add_argument("--mix_lang_emb", action="store_true")
    p.set_defaults(fn=cmd_init_student)

    p = sub.add_parser("transcribe", help="long-form ASR -> txt/srt/vtt/json")
    p.add_argument("--audio", nargs="+", required=True,
                   help="audio files, globs, or directories")
    p.add_argument("--model", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--language", default="zh",
                   help="forced language; 'none' for *.en models")
    p.add_argument("--strategy", default="chunked",
                   choices=["chunked", "sequential"])
    p.add_argument("--format", default="srt",
                   choices=["txt", "srt", "vtt", "json"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--quantize_kv", type=_quant_arg, nargs="?", const=8,
                   default=0, metavar="MODE",
                   help="off/8/4/fp8 (bare flag = int8)")
    p.add_argument("--num_beams", type=int, default=1)
    _add_common(p)
    p.set_defaults(fn=cmd_transcribe)

    p = sub.add_parser("sweep", help="HP sweep over a wandb-style YAML: "
                                     "local expansion (default) or a "
                                     "hosted wandb agent (--agent)")
    p.add_argument("--config", default=None, help="sweep YAML path "
                   "(required unless --agent with --sweep_id)")
    p.add_argument("--target", required=True,
                   choices=["distill", "finetune", "evaluate"],
                   help="subcommand every run invokes")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_runs", type=int, default=0,
                   help="cap grid size / number of random samples")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--agent", action="store_true",
                   help="join/create a HOSTED wandb sweep (the reference's "
                        "wandb agent mode; needs wandb + network)")
    p.add_argument("--sweep_id", default=None,
                   help="existing wandb sweep to join (with --agent)")
    p.add_argument("--project", default=None)
    p.add_argument("--entity", default=None)
    p.add_argument("--count", type=int, default=None,
                   help="max runs this agent executes")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="extra argv appended to every run")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser(
        "collect-hallucinations",
        help="sample N prefilter-dropped chunks for human audit "
             "(reference utils/collect_hallucinations.py)",
    )
    p.add_argument("--original_tsv", required=True,
                   help="manifest BEFORE the prefilter")
    p.add_argument("--cleaned_tsv", required=True,
                   help="non-hallucinated manifest written by `prefilter`")
    p.add_argument("--hyp_tsv", nargs="+", required=True,
                   help="validator idx\\thyp file(s), per-rank shards ok")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_samples", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--filter_csv", default=None,
                   help="hallucination_result.csv for per-row MER + reason")
    p.add_argument("--no_audio", action="store_true",
                   help="skip copying audio files")
    p.set_defaults(fn=cmd_collect_hallucinations)

    p = sub.add_parser("make-manifest", help="build fairseq-style TSVs")
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ext", default="flac")
    p.add_argument("--valid_percent", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_make_manifest)

    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
