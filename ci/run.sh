#!/usr/bin/env bash
# CI entry point (reference analog: ci/run.sh — build matrix + E2E smoke).
# Usage: ci/run.sh [fast|full|bench]
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-fast}"

echo "== native library build =="
make -C native

echo "== test suite =="
if [ "$MODE" = "fast" ]; then
    python -m pytest tests/ -q -x --ignore=tests/test_examples.py
else
    python -m pytest tests/ -q -x
fi

echo "== multi-chip dry run (8 virtual devices) =="
python __graft_entry__.py

if [ "$MODE" = "bench" ]; then
    echo "== on-chip smoke (flash attention, fused dequant, q8 KV) =="
    python ci/tpu_smoke.py
    echo "== headline bench (real chip) =="
    python bench.py
fi
echo "CI OK"
