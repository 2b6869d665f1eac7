"""Every shipped config file must parse against the CLI.

The reference records its hyperparameters in ~60 shell scripts
(SURVEY.md §2.2 F13); here they live as @-file argument lists in configs/.
This guards them against CLI flag drift.
"""

import glob
import os

from taiwan_whisper_tpu.cli import build_parser

_CONFIG_SUBCOMMAND = {
    "distill": "distill",
    "finetune": "finetune",
    "eval": "evaluate",
    "label": "label",
    "prefilter": "prefilter",
}


def _subcommand_for(name: str) -> str:
    for prefix, sub in _CONFIG_SUBCOMMAND.items():
        if name.startswith(prefix):
            return sub
    raise AssertionError(f"unknown config family for {name}")


def test_all_configs_parse():
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "*.args")))
    assert len(paths) >= 10
    parser = build_parser()
    for path in paths:
        name = os.path.basename(path)
        sub = _subcommand_for(name)
        args = parser.parse_args([sub, f"@{path}"])
        assert args is not None, name
