#!/usr/bin/env bash
# Slow tier in BOUNDED processes. A single 144-test slow-tier process
# accumulates enough XLA:CPU compiler state on this box to flake
# (observed 2026-08-21: a pjit-compile segfault at ~test 254 of a full
# 297-test run and an abort + 2 false failures at ~test 55 of a
# one-process slow tier; every implicated test passes in a fresh
# process — docs/TESTING.md "Known flake"). Chunking by file keeps each
# process ~10 minutes and the results trustworthy.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT="${1:-runs/pytest_r5}"
mkdir -p "$OUT"

CHUNK1="tests/test_bf16.py tests/test_chunked_prefill.py tests/test_decode_pool.py tests/test_decoder_model.py tests/test_distill.py tests/test_distributed.py tests/test_dual_encoder.py tests/test_ema.py tests/test_embed.py tests/test_eval_lm.py tests/test_expert_parallel.py tests/test_flash_mha.py"
CHUNK2="tests/test_fuse_steps.py tests/test_generate.py tests/test_lora.py tests/test_lr_schedule.py tests/test_nsa_context.py tests/test_nsa_modules.py tests/test_nsa_ragged.py tests/test_obs.py tests/test_ops_attention.py tests/test_parallel.py tests/test_parallel_wiring.py tests/test_pipeline.py"
CHUNK3="tests/test_pool_admin.py tests/test_pool_sampling.py tests/test_prefix.py tests/test_quant.py tests/test_reference_fidelity.py tests/test_ring_attention.py tests/test_scan_layers.py tests/test_sense_stride.py tests/test_serve.py tests/test_serve_http.py tests/test_speculative.py tests/test_stateful.py tests/test_train_loop.py"

rc=0
i=1
for chunk in "$CHUNK1" "$CHUNK2" "$CHUNK3"; do
    echo "=== slow tier chunk $i ==="
    # shellcheck disable=SC2086
    python -m pytest $chunk -m slow -q 2>&1 | tee "$OUT/slow_chunk$i.log" | tail -1
    s=${PIPESTATUS[0]}
    [ "$s" -ne 0 ] && rc=$s
    i=$((i + 1))
done
exit $rc
