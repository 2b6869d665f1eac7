"""Optimizer construction, schedules, train state and checkpointing.

Replaces the reference's Accelerate/optax plumbing: AdamW + warmup schedules
(training/run_distillation.py:1423-1472), fp32 master updates with global
norm clip (flax/run_distillation.py TrainState.apply_gradients:661-734),
checkpoint save/rotate/resume (run_distillation.py:746-775, flax msgpack
:720-763). Checkpoints are orbax PyTree checkpoints — multi-host safe and
resumable, with HF-format export available via models/params.params_to_hf.
"""

from __future__ import annotations

import dataclasses
import os
import re
import shutil
from typing import Any, Dict, List, Optional

import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-4
    schedule: str = "constant_with_warmup"  # | linear
    warmup_steps: int = 50
    total_steps: int = 120_000
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    grad_accum_steps: int = 1


def make_schedule(cfg: OptimConfig):
    if cfg.schedule == "constant_with_warmup":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
                optax.constant_schedule(cfg.learning_rate),
            ],
            [cfg.warmup_steps],
        )
    if cfg.schedule == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
                optax.linear_schedule(
                    cfg.learning_rate, 0.0, max(cfg.total_steps - cfg.warmup_steps, 1)
                ),
            ],
            [cfg.warmup_steps],
        )
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def trainable_mask(params, freeze_encoder: bool = True):
    """Bool pytree marking which params train (True) vs stay frozen.

    Mirrors make_train_step's zero_frozen: the encoder (when frozen) and
    the decoder positional table get no gradient — so AdamW should hold no
    moments for them either. For a 32-2 student this avoids ~2/3 of the
    optimizer-state HBM (reference freezing: run_distillation.py:1039-1066).
    """
    import jax

    def full(tree, val):
        return jax.tree.map(lambda _: val, tree)

    m = {k: full(v, True) for k, v in params.items()}
    if freeze_encoder and "encoder" in params:
        m["encoder"] = full(params["encoder"], False)
    if "decoder" in params:
        dec = dict(m["decoder"])
        if "embed_positions" in dec:
            dec["embed_positions"] = False
        m["decoder"] = dec
    return m


def make_optimizer(cfg: OptimConfig, mask=None):
    """AdamW (+warmup schedule, +grad accumulation). ``mask`` (a bool pytree
    from :func:`trainable_mask`) restricts moments to trainable leaves."""
    tx = optax.adamw(
        learning_rate=make_schedule(cfg),
        b1=cfg.adam_b1,
        b2=cfg.adam_b2,
        eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay,
    )
    if mask is not None:
        tx = optax.masked(tx, mask)
    # updates (not params) are returned; gradient accumulation wraps the
    # whole transform (reference: optax.MultiSteps in flax/run_distillation)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


class CheckpointManager:
    """Step-numbered orbax checkpoints with rotation and best-tracking
    (reference rotate_checkpoints:746-759 + save_valid_best:426-434)."""

    def __init__(self, directory: str, save_total_limit: Optional[int] = None):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_total_limit = save_total_limit
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"checkpoint-{step}")

    def all_steps(self) -> List[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = _CKPT_RE.match(name)
            if m and os.path.isdir(os.path.join(self.directory, name)):
                steps.append(int(m.group(1)))
        return sorted(steps)

    @staticmethod
    def _barrier(name: str):
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)

    def save(self, step: int, state: Dict[str, Any], keep: bool = False):
        """All processes must call (orbax writes each host's shards); the
        shared-directory mutations (rmtree, .keep, rotation) are rank-0-only
        with barriers so no rank races another's write."""
        import jax

        path = self._path(step)
        if os.path.exists(path):
            # re-saving the same step must not demote a protected checkpoint
            keep = keep or os.path.exists(os.path.join(path, ".keep"))
            if jax.process_index() == 0:
                shutil.rmtree(path)
            self._barrier(f"ckpt_clear_{step}")
        self._ckptr.save(path, state)
        if jax.process_index() == 0:
            if keep:  # mark as protected from rotation (best checkpoint)
                open(os.path.join(path, ".keep"), "w").close()
            self._rotate()
        self._barrier(f"ckpt_done_{step}")

    def _rotate(self):
        if self.save_total_limit is None:
            return
        steps = self.all_steps()
        removable = [
            s for s in steps
            if not os.path.exists(os.path.join(self._path(s), ".keep"))
        ]
        while len(removable) > self.save_total_limit:
            victim = removable.pop(0)
            shutil.rmtree(self._path(victim))

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, step: Optional[int] = None, like: Optional[Any] = None):
        """Restore (state, step); `like` provides the pytree structure/dtypes."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        import orbax.checkpoint as ocp

        if like is not None:
            restored = self._ckptr.restore(
                self._path(step), item=like
            )
        else:
            restored = self._ckptr.restore(self._path(step))
        return restored, step
