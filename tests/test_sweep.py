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


def test_run_sweep_agent_with_stubbed_wandb(tmp_path, monkeypatch):
    """Hosted-agent mode (reference: wandb sweep + wandb agent over
    run_bs_sweep.yaml). A stub wandb module verifies: the YAML registers
    as a sweep, each agent iteration runs the scheduler-served config
    through the CLI runner, and the target metric is logged back."""
    import sys
    import types

    from taiwan_whisper_tpu.pipeline.sweep import run_sweep_agent

    p = tmp_path / "sweep.yaml"
    p.write_text(GRID_YAML)

    served = [
        {"learning_rate": 1e-3, "batch_size": 2, "max_steps": 3},
        {"learning_rate": 1e-4, "batch_size": 4, "max_steps": 3},
    ]
    logged, finished, state = [], [], {}

    class _Run:
        def __init__(self, cfg, rid):
            self.config = dict(cfg)
            self.id = rid

        def log(self, d):
            logged.append(d)

        def finish(self):
            finished.append(self.id)

    wandb = types.ModuleType("wandb")

    def _sweep(doc, project=None, entity=None):
        assert doc["method"] == "grid"
        assert doc["metric"]["name"] == "train/loss"
        state["project"] = project
        return "sw-123"

    def _agent(sweep_id, function=None, count=None, project=None,
               entity=None):
        assert sweep_id == "sw-123" and count == 2
        for i in range(count):
            state["next"] = _Run(served[i], f"r{i}")
            function()

    wandb.sweep = _sweep
    wandb.agent = _agent
    wandb.init = lambda *a, **k: state["next"]
    monkeypatch.setitem(sys.modules, "wandb", wandb)

    calls = []

    def fake_runner(argv):
        calls.append(argv)
        lr = float(argv[argv.index("--learning_rate") + 1])
        return {"loss": lr * 10}

    out = run_sweep_agent(
        str(p), "distill", str(tmp_path / "out"),
        project="k2d", count=2, runner=fake_runner,
    )
    assert out == {"sweep_id": "sw-123", "runs": 2}
    assert state["project"] == "k2d"
    assert len(calls) == 2 and all(a[0] == "distill" for a in calls)
    # metric logged under the sweep's metric name for the scheduler
    assert logged[0]["train/loss"] == 1e-3 * 10
    assert logged[1]["train/loss"] == 1e-4 * 10
    assert finished == ["r0", "r1"]
    # distinct per-run output dirs derived from the wandb run ids
    dirs = {a[a.index("--output_dir") + 1] for a in calls}
    assert len(dirs) == 2


def test_run_sweep_agent_join_existing(tmp_path, monkeypatch):
    import sys
    import types

    from taiwan_whisper_tpu.pipeline.sweep import run_sweep_agent

    wandb = types.ModuleType("wandb")
    ran = []

    class _Run:
        config = {"learning_rate": 1e-3}
        id = "rX"

        def log(self, d):
            pass

        def finish(self):
            pass

    def _agent(sweep_id, function=None, count=None, **kw):
        assert sweep_id == "existing-id"
        function()
        ran.append(1)

    wandb.sweep = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("must not create a new sweep"))
    wandb.agent = _agent
    wandb.init = lambda *a, **k: _Run()
    monkeypatch.setitem(sys.modules, "wandb", wandb)

    out = run_sweep_agent(
        None, "distill", str(tmp_path / "out"), sweep_id="existing-id",
        runner=lambda argv: {"loss": 1.0},
    )
    assert ran and out["sweep_id"] == "existing-id"
