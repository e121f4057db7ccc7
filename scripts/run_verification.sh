#!/usr/bin/env bash
# Run the print-based verification scripts in order (reference
# scripts/run_verification.sh). Exits nonzero on the first failure.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"

# Cheap guard: the whole suite must at least COLLECT cleanly (a missing
# import in any test file kills every pytest invocation at collection).
echo "=== pytest --collect-only gate ==="
python -m pytest tests/ --collect-only -q >/dev/null

for script in verify_hoyer verify_init verify_reset verify_grad_tap; do
    echo "=== tests/${script}.py ==="
    python "tests/${script}.py"
done
echo "All verification scripts passed."
