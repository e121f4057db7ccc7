#!/usr/bin/env bash
# Launch dual-encoder (CLIP) training.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
python -m forde_tpu.train.clip_loop "$@"
