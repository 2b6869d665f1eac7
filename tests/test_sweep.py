"""Local sweep driver over wandb-style YAMLs (SURVEY.md §2.2 F13)."""

import json
import math
import os

from taiwan_whisper_tpu.pipeline.sweep import (
    expand_configs,
    load_sweep,
    run_sweep,
)

GRID_YAML = """
method: grid
metric:
  goal: minimize
  name: train/loss
parameters:
  learning_rate:
    values: [0.001, 0.0001]
  batch_size:
    values: [2, 4]
  max_steps:
    value: 3
"""

RANDOM_YAML = """
method: random
metric:
  goal: maximize
  name: mer
parameters:
  learning_rate:
    min: 0.00001
    max: 0.001
    distribution: log_uniform_values
  temperature:
    values: [1.0, 2.0]
"""


def test_grid_expansion(tmp_path):
    p = tmp_path / "sweep.yaml"
    p.write_text(GRID_YAML)
    spec = load_sweep(str(p))
    configs = expand_configs(spec)
    assert len(configs) == 4
    assert all(c["max_steps"] == 3 for c in configs)
    assert {(c["learning_rate"], c["batch_size"]) for c in configs} == {
        (0.001, 2), (0.001, 4), (0.0001, 2), (0.0001, 4)
    }


def test_random_expansion_log_uniform(tmp_path):
    p = tmp_path / "sweep.yaml"
    p.write_text(RANDOM_YAML)
    spec = load_sweep(str(p))
    configs = expand_configs(spec, max_runs=16, seed=1)
    assert len(configs) == 16
    for c in configs:
        assert 1e-5 <= c["learning_rate"] <= 1e-3
        assert c["temperature"] in (1.0, 2.0)
    # log-uniform: medians land near the geometric midpoint, not 5e-4
    med = sorted(c["learning_rate"] for c in configs)[8]
    assert med < 3e-4, med
    # deterministic under the same seed
    assert configs == expand_configs(spec, max_runs=16, seed=1)


def test_run_sweep_picks_best_and_records(tmp_path):
    p = tmp_path / "sweep.yaml"
    p.write_text(GRID_YAML)
    calls = []

    def fake_runner(argv):
        calls.append(argv)
        assert argv[0] == "distill"
        lr = float(argv[argv.index("--learning_rate") + 1])
        bs = float(argv[argv.index("--batch_size") + 1])
        if math.isclose(lr, 1e-4) and bs == 4:
            raise RuntimeError("boom")  # failures are recorded, not fatal
        return {"loss": lr * bs}

    out = tmp_path / "out"
    summary = run_sweep(
        str(p), "distill", str(out), extra_argv=["--manifest", "m.tsv"],
        runner=fake_runner,
    )
    assert summary["n_runs"] == 4 and len(calls) == 4
    assert all("--manifest" in argv for argv in calls)
    # best = minimal lr*bs among non-failing runs = 1e-4 * 2
    assert math.isclose(summary["best"]["metric"], 2e-4)
    lines = [json.loads(l) for l in open(out / "sweep_results.jsonl")]
    assert len(lines) == 4
    assert sum("error" in l for l in lines) == 1
    assert os.path.exists(out / "best.json")
    # per-run output dirs are distinct
    dirs = {l["params"]["output_dir"] for l in lines}
    assert len(dirs) == 4
