#!/usr/bin/env bash
# Launch decoder-LM training (reference scripts/run_training.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
python -m forde_tpu.train.loop "$@"
