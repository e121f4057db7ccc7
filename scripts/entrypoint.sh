#!/usr/bin/env bash
# Container entrypoint: verification gate before every command
# (reference scripts/entrypoint.sh:4-8).
set -euo pipefail
bash "$(dirname "$0")/run_verification.sh"
exec "$@"
