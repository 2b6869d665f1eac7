"""Stage 3 driver: knowledge-distillation training loop.

TPU-native counterpart of training/run_distillation.py main():798-1838 —
teacher + student setup (frozen shared encoder, language-embedding mix,
maximally-spaced student init), streaming manifest batches, jit train step
over a (data, model) mesh, checkpoint save/rotate/resume, periodic eval.
The log-mel frontend runs ON DEVICE inside the train step (Pallas on TPU)
instead of on CPU dataloader workers (reference :1208-1305) — the host only
decodes FLAC and tokenizes.
"""

from __future__ import annotations

import dataclasses
import os
import signal
import time
from typing import Dict, Iterator, Optional

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..audio.manifest import read_manifest
from ..audio.mel import log_mel
from ..models.config import DtypePolicy
from ..models.params import init_student_from_teacher, mix_language_embeddings
from ..ops.mel_kernel import log_mel_pallas
from ..parallel.mesh import make_mesh, use_mesh
from ..parallel.specs import shard_params
from ..train.distill import DistillConfig, make_eval_step, make_train_step
from ..train.state import (
    CheckpointManager,
    OptimConfig,
    make_optimizer,
    trainable_mask,
)
from ..text.tokenizer import WhisperTokenizer
from ..utils.logging import MetricsLogger
from ..utils.prefetch import prefetch
from .dataset import TrainPrepConfig, train_batches


def _gather_to_host(tree, mesh):
    """Materialise a (possibly model-sharded) param pytree on every host.

    Under multi-process TP some shards live on other hosts' devices, so a
    plain device_get would fail; an out_shardings=replicated jit inserts the
    allgather on device (the role NCCL gather plays in the reference's
    accelerator.save_state path). process_allgather is NOT suitable here:
    it stacks fully-addressable (replicated) leaves along a new axis."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    rep = NamedSharding(mesh, P())
    replicated = jax.jit(
        lambda t: t, out_shardings=jax.tree.map(lambda _: rep, tree)
    )(tree)
    return jax.device_get(replicated)


@dataclasses.dataclass
class DistillRunConfig:
    max_steps: int = 120_000
    batch_size: int = 32  # GLOBAL batch: every host builds the identical
    # batch from the shared manifest (deterministic seed) and device_put
    # scatters it over the mesh's data axis — no per-rank files to merge
    model_parallel: int = 1
    save_steps: int = 1000
    eval_steps: int = 1000
    logging_steps: int = 25
    save_total_limit: Optional[int] = 3
    seed: int = 42
    mix_lang_embeddings: bool = True  # zh <- (zh+en)/2, the K2D trick
    resume: bool = True
    use_wandb: bool = False
    gen_eval_batches: int = 0  # >0: also greedy-decode N eval batches -> MER
    gen_eval_max_tokens: int = 128
    gen_eval_table_rows: int = 32  # per-sample prediction-table cap
    num_workers: int = 4  # parallel audio-decode threads (0 = inline);
    # native FLAC decode releases the GIL so threads scale on host cores


def run_distillation(
    train_manifest_path: str,
    teacher_dir: str,
    output_dir: str,
    *,
    student_dir: Optional[str] = None,
    student_decoder_layers: int = 2,
    student_encoder_layers: Optional[int] = None,
    run_cfg: DistillRunConfig = DistillRunConfig(),
    dcfg: DistillConfig = DistillConfig(),
    opt_cfg: Optional[OptimConfig] = None,
    prep_cfg: TrainPrepConfig = TrainPrepConfig(),
    tokenizer_dir: Optional[str] = None,
    eval_manifest_path: Optional[str] = None,
    policy: DtypePolicy = DtypePolicy(),
) -> Dict[str, float]:
    from ..models.io import load_model, save_hf_checkpoint

    tok = (
        WhisperTokenizer.from_pretrained_dir(tokenizer_dir)
        if tokenizer_dir
        else WhisperTokenizer()
    )

    teacher_params, teacher_cfg = load_model(teacher_dir)
    if run_cfg.mix_lang_embeddings:
        # reference: utils/model_utils.py applied to teacher AND student init
        zh = tok.special.language_id("zh")
        en = tok.special.language_id("en")
        teacher_params = mix_language_embeddings(teacher_params, zh, [zh, en])

    if student_dir:
        student_params, student_cfg = load_model(student_dir)
    else:
        student_cfg = teacher_cfg.with_decoder_layers(student_decoder_layers)
        if student_encoder_layers is not None:
            student_cfg = student_cfg.with_encoder_layers(student_encoder_layers)
        student_params = init_student_from_teacher(
            teacher_params, teacher_cfg, student_decoder_layers,
            encoder_layers=student_encoder_layers,
        )

    opt_cfg = opt_cfg or OptimConfig(total_steps=run_cfg.max_steps)
    # no AdamW moments for frozen subtrees (the 32-2 encoder is ~2/3 of the
    # student's params — this is multiple GB of HBM at large-v2 scale)
    optimizer = make_optimizer(
        opt_cfg, mask=trainable_mask(student_params, dcfg.freeze_encoder)
    )

    # pad/trim audio to the student's context and labels to its decoder
    # length (30 s / 448 for real models)
    prep_cfg = dataclasses.replace(
        prep_cfg,
        chunk_samples=student_cfg.max_source_positions * 320,
        max_label_length=min(
            prep_cfg.max_label_length, student_cfg.max_target_positions
        ),
    )
    mesh = make_mesh(data=-1, model=run_cfg.model_parallel)
    n_frames = student_cfg.max_source_positions * 2
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    use_pallas_mel = on_tpu and n_frames % 200 == 0
    base_step = make_train_step(student_cfg, teacher_cfg, dcfg, optimizer, policy)

    def step_with_mel(student_params, opt_state, teacher_params, batch):
        audio = batch.pop("audio", None)
        if audio is not None:
            mel = (log_mel_pallas(audio, student_cfg.num_mel_bins)
                   if use_pallas_mel
                   else log_mel(audio, student_cfg.num_mel_bins))
            batch = dict(batch, mel=mel)
        return base_step(student_params, opt_state, teacher_params, batch)

    ckpt = CheckpointManager(
        os.path.join(output_dir, "checkpoints"), run_cfg.save_total_limit
    )
    logger = MetricsLogger(output_dir, use_wandb=run_cfg.use_wandb)

    manifest = read_manifest(train_manifest_path)
    if not manifest.paths:
        # an empty manifest (e.g. an over-aggressive prefilter) would make
        # the epoch stream spin forever — fail loudly instead
        raise ValueError(f"empty train manifest: {train_manifest_path}")

    need_teacher = dcfg.kl_weight > 0.0 or dcfg.mse_weight > 0.0
    with use_mesh(mesh):
        student_s = shard_params(mesh, student_params)
        # CE-only fine-tuning never reads teacher params: alias them to the
        # student so no second copy occupies HBM
        teacher_s = shard_params(mesh, teacher_params) if need_teacher else student_s
        opt_state = optimizer.init(student_s)
        start_step = 0
        if run_cfg.resume:
            restored, step0 = ckpt.restore(
                like={"params": student_s, "opt_state": opt_state}
            )
            if restored is not None:
                student_s = restored["params"]
                opt_state = restored["opt_state"]
                start_step = step0
                print(f"[distill] resumed from step {start_step}")

        jit_step = jax.jit(step_with_mel, donate_argnums=(0, 1))
        batch_sharding = NamedSharding(mesh, P("data"))

        # held-out eval: loss-only step over a fixed batch set, tracking the
        # best checkpoint (reference eval_step:1554-1578 + save_valid_best)
        eval_batches = []
        if eval_manifest_path:
            eval_prep = dataclasses.replace(
                prep_cfg, timestamp_probability=1.0,
                condition_on_prev_probability=0.0,
            )
            eval_manifest = read_manifest(eval_manifest_path)
            for eb in train_batches(
                eval_manifest, tok, eval_prep, run_cfg.batch_size,
                seed=0, shuffle=False,
            ):
                eval_batches.append(eb)
                if len(eval_batches) >= 8:
                    break
        base_eval = make_eval_step(student_cfg, teacher_cfg, dcfg, policy)

        def eval_with_mel(student_params, teacher_params, batch):
            audio = batch.pop("audio", None)
            if audio is not None:
                mel = (log_mel_pallas(audio, student_cfg.num_mel_bins)
                       if use_pallas_mel
                       else log_mel(audio, student_cfg.num_mel_bins))
                batch = dict(batch, mel=mel)
            return base_eval(student_params, teacher_params, batch)

        jit_eval = jax.jit(eval_with_mel)
        best_eval_loss = float("inf")

        # generation-based eval: greedy-decode eval batches and score MER vs
        # the label texts (reference logs eval WER + prediction tables,
        # run_distillation.py:1709-1808)
        gen_eval_fn = None
        if run_cfg.gen_eval_batches > 0 and eval_batches:
            import jax.numpy as jnp

            from ..decode.greedy import greedy_decode
            from ..decode.rules import DecodeRules
            from ..models import whisper as W
            from ..text.metrics import MixErrorRate
            from ..text.normalizer import BasicTextNormalizer

            rules = DecodeRules.from_special(tok.special, timestamps=True)
            sot_seq = tok.sot_sequence(prep_cfg.language, prep_cfg.task)
            gen_max_len = min(
                len(sot_seq) + run_cfg.gen_eval_max_tokens,
                student_cfg.max_target_positions,
            )

            @jax.jit
            def decode_eval(student_params, audio):
                mel = (log_mel_pallas(audio, student_cfg.num_mel_bins)
                       if use_pallas_mel
                       else log_mel(audio, student_cfg.num_mel_bins))
                enc = W.encode(student_params, mel, student_cfg, policy)
                prefix = jnp.asarray([sot_seq] * audio.shape[0], jnp.int32)
                return greedy_decode(
                    student_params, enc, prefix, student_cfg, rules, policy,
                    max_len=gen_max_len,
                )

            metric = MixErrorRate()
            norm = BasicTextNormalizer()

            def gen_eval_fn(step):
                preds, refs = [], []
                raw_preds, raw_refs = [], []
                for eb in eval_batches[: run_cfg.gen_eval_batches]:
                    res = decode_eval(student_s, jnp.asarray(eb["audio"]))
                    toks = np.asarray(res.tokens)
                    lens = np.asarray(res.lengths)
                    for j in range(toks.shape[0]):
                        ids = toks[j][len(sot_seq): len(sot_seq) + int(lens[j])]
                        raw = tok.decode(ids.tolist(), skip_special_tokens=True)
                        raw_preds.append(raw)
                        preds.append(norm(raw))
                        ref_ids = [int(t) for t in eb["labels"][j]
                                   if t >= 0 and t < tok.special.eot]
                        raw_ref = tok.decode(ref_ids, skip_special_tokens=True)
                        raw_refs.append(raw_ref)
                        refs.append(norm(raw_ref))
                mer = metric.compute(preds, refs)
                logger.log({"gen_mer": float(mer)}, step, prefix="eval")
                # per-sample prediction tables + incorrect-only view
                # (reference run_distillation.py:534-570)
                cols = ("pred", "label", "norm_pred", "norm_label")
                rows = list(zip(raw_preds, raw_refs, preds, refs))
                cap = run_cfg.gen_eval_table_rows
                logger.log_table("predictions", cols, rows[:cap], step)
                wrong = [r for r in rows if r[2] != r[3]]
                logger.log_table("incorrect_predictions", cols, wrong[:cap],
                                 step)

        def run_eval(step):
            nonlocal best_eval_loss
            if not eval_batches:
                return
            totals: Dict[str, float] = {}
            for eb in eval_batches:
                m = jit_eval(
                    student_s, teacher_s, jax.device_put(eb, batch_sharding)
                )
                for k, v in m.items():
                    totals[k] = totals.get(k, 0.0) + float(v)
            avg = {k: v / len(eval_batches) for k, v in totals.items()}
            logger.log(avg, step, prefix="eval")
            if gen_eval_fn is not None:
                gen_eval_fn(step)
            if avg["loss"] < best_eval_loss:
                best_eval_loss = avg["loss"]
                ckpt.save(step, {"params": student_s, "opt_state": opt_state},
                          keep=True)
                print(f"[distill] new best eval loss {best_eval_loss:.4f} "
                      f"@ step {step} (kept)")

        def batch_stream() -> Iterator[Dict[str, np.ndarray]]:
            epoch = 0
            while True:
                yield from train_batches(
                    manifest, tok, prep_cfg, run_cfg.batch_size,
                    seed=run_cfg.seed + epoch, mel_fn=None,
                    num_workers=run_cfg.num_workers,
                )
                epoch += 1

        # preemption safety the reference lacks (SURVEY.md §5 "no preemption
        # handling despite TPU targeting"): SIGTERM/SIGINT set a flag; the
        # loop checkpoints and exits cleanly at the next step boundary
        preempted = {"flag": False}

        def _on_signal(signum, frame):
            preempted["flag"] = True
            print(f"[distill] signal {signum}: checkpointing at next step")

        old_handlers = {
            s: signal.signal(s, _on_signal)
            for s in (signal.SIGTERM, signal.SIGINT)
        }

        t_last = time.time()
        step = start_step
        final_metrics: Dict[str, float] = {}
        stream = batch_stream()
        # skip already-consumed batches on resume (reference :1607-1640)
        for _ in range(start_step):
            next(stream, None)
        for batch in prefetch(stream, buffer_size=2):
            if step >= run_cfg.max_steps:
                break
            if preempted["flag"]:
                ckpt.save(step, {"params": student_s, "opt_state": opt_state})
                print(f"[distill] preempted; saved checkpoint-{step}")
                break
            batch = jax.device_put(batch, batch_sharding)
            student_s, opt_state, metrics = jit_step(
                student_s, opt_state, teacher_s, batch
            )
            step += 1
            if step % run_cfg.logging_steps == 0 or step == run_cfg.max_steps:
                host = {k: float(v) for k, v in metrics.items()}
                host["steps_per_s"] = run_cfg.logging_steps / max(
                    time.time() - t_last, 1e-6
                )
                t_last = time.time()
                logger.log(host, step)
                final_metrics = host
            if step % run_cfg.eval_steps == 0 or step == run_cfg.max_steps:
                run_eval(step)
            if step % run_cfg.save_steps == 0 or step == run_cfg.max_steps:
                ckpt.save(step, {"params": student_s, "opt_state": opt_state})
                # model-sharded params are not host-addressable under
                # multi-process TP: allgather before the host-side export,
                # and only rank 0 writes the shared file
                host_params = _gather_to_host(student_s, mesh)
                if jax.process_index() == 0:
                    save_hf_checkpoint(
                        os.path.join(output_dir, "hf_export"),
                        host_params, student_cfg,
                    )
        for s, h in old_handlers.items():
            signal.signal(s, h)
        logger.close()
    return final_metrics


def run_finetuning(
    train_manifest_path: str,
    model_dir: str,
    output_dir: str,
    *,
    freeze_encoder: bool = False,
    run_cfg: DistillRunConfig = DistillRunConfig(),
    opt_cfg: Optional[OptimConfig] = None,
    prep_cfg: TrainPrepConfig = TrainPrepConfig(),
    tokenizer_dir: Optional[str] = None,
    eval_manifest_path: Optional[str] = None,
    policy: DtypePolicy = DtypePolicy(),
) -> Dict[str, float]:
    """Plain CE seq2seq fine-tuning (reference flax/run_finetuning.py):
    the same loop with the teacher path disabled."""
    return run_distillation(
        train_manifest_path, model_dir, output_dir,
        student_dir=model_dir,
        run_cfg=run_cfg,
        dcfg=DistillConfig(
            ce_weight=1.0, kl_weight=0.0, mse_weight=0.0,
            freeze_encoder=freeze_encoder,
        ),
        opt_cfg=opt_cfg,
        prep_cfg=prep_cfg,
        tokenizer_dir=tokenizer_dir,
        eval_manifest_path=eval_manifest_path,
        policy=policy,
    )
