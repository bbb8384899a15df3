#!/usr/bin/env bash
# CI pipeline — the local analog of the reference's workflow (reference:
# .github/workflows/cmake-single-platform.yml:34-68):
#   1. static format/lint gate (hard failure)
#   2. native library build
#   3. test suite in RANDOMIZED order with a JUnit XML artifact
# Run from the repo root: bash tools/ci.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== static gate (tools/lint_gate.py) =="
python tools/lint_gate.py

if command -v ruff >/dev/null 2>&1; then
    echo "== ruff (config in pyproject.toml) =="
    ruff check .
fi

echo "== native build =="
make -C native -s

echo "== tests (randomized order, JUnit -> test-results.xml) =="
SDSP_TEST_ORDER=random python -m pytest tests/ -q \
    --junitxml=test-results.xml "$@"

echo "CI OK"
