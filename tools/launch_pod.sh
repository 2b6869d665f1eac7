#!/usr/bin/env bash
# Multi-host launcher for TPU pod slices.
#
# Replaces the reference's tmux-pane fan-out (training/flax/tpu_connect.sh):
# instead of mirroring keystrokes into per-worker ssh panes, every worker
# runs the SAME command with --distributed, and jax.distributed.initialize()
# (auto-configured on TPU VMs) forms the job; manifests shard automatically
# by jax.process_index inside the framework.
#
# Usage:
#   ./tools/launch_pod.sh <tpu-name> <zone> -- python -m taiwan_whisper_tpu.cli \
#       distill @configs/distill_32_2.args --distributed
set -euo pipefail

TPU_NAME="${1:?tpu name}"
ZONE="${2:?zone}"
shift 2
[ "${1:-}" = "--" ] && shift

exec gcloud compute tpus tpu-vm ssh "${TPU_NAME}" \
  --zone "${ZONE}" \
  --worker=all \
  --command "cd $(pwd) && $*"
