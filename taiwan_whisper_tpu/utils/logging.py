"""Pluggable metrics sinks (stdout, JSONL, optional wandb).

The reference hard-requires wandb (training/run_eval.py:445-446,
run_distillation.py log_metric). Here wandb is one optional sink; the JSONL
file is the system of record so training is observable offline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        output_dir: Optional[str] = None,
        use_wandb: bool = False,
        wandb_project: str = "taiwan-whisper-tpu",
        run_name: Optional[str] = None,
    ):
        # only rank 0 owns the shared metrics file / wandb run — other hosts
        # log to stdout only (the reference gates on
        # accelerator.is_main_process the same way)
        is_main = True
        try:
            import jax

            is_main = jax.process_index() == 0
        except Exception:  # pragma: no cover - jax always present in practice
            pass
        self._jsonl = None
        if output_dir and is_main:
            os.makedirs(output_dir, exist_ok=True)
            self._jsonl = open(
                os.path.join(output_dir, "metrics.jsonl"), "a", encoding="utf-8"
            )
        self._wandb = None
        if use_wandb and is_main:
            try:  # pragma: no cover - wandb optional
                import wandb

                self._wandb = wandb
                wandb.init(project=wandb_project, name=run_name)
            except Exception as e:
                print(f"[metrics] wandb unavailable ({e}); continuing without")

    def log(self, metrics: Dict[str, float], step: int, prefix: str = "train"):
        payload = {f"{prefix}/{k}": float(v) for k, v in metrics.items()}
        payload["step"] = step
        payload["time"] = time.time()
        line = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in payload.items() if k != "time"
        )
        print(f"[{prefix}] {line}", flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps(payload) + "\n")
            self._jsonl.flush()
        if self._wandb:  # pragma: no cover
            self._wandb.log(payload, step=step)

    def log_table(self, name: str, columns, rows, step: int,
                  prefix: str = "eval"):
        """Per-sample prediction tables (reference run_distillation.py:534-570
        logs wandb tables of (pred, label, norm_pred, norm_label) plus an
        incorrect-only view). JSONL gets one structured record; wandb gets a
        native Table when active."""
        payload = {
            "table": f"{prefix}/{name}",
            "columns": list(columns),
            "rows": [list(r) for r in rows],
            "step": step,
            "time": time.time(),
        }
        print(f"[{prefix}] table {name}: {len(rows)} rows", flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps(payload, ensure_ascii=False) + "\n")
            self._jsonl.flush()
        if self._wandb:  # pragma: no cover
            self._wandb.log(
                {f"{prefix}/{name}": self._wandb.Table(
                    columns=list(columns), data=[list(r) for r in rows]
                )},
                step=step,
            )

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._wandb:  # pragma: no cover
            self._wandb.finish()
