"""Opt-in performance-regression gate on the real TPU.

The reference executes its Catch2 BENCHMARK blocks on every CI run
(reference: test/testIIR.cpp:465-559, workflow yml:57-61); here the analog
is asserted: every bench_ops.py row must stay above 50x its measured C++
single-core baseline, or the gate fails loudly.

Opt-in because it needs the real chip and ~5 minutes of compiles:

    SDSP_PERF_GATE=1 python -m pytest tests/test_perf_gate.py -q

(The main suite runs on the virtual CPU mesh where throughput numbers are
meaningless, so this cannot be an always-on test.)
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
FLOOR = 50.0


@pytest.mark.skipif(not os.environ.get("SDSP_PERF_GATE"),
                    reason="TPU perf gate is opt-in: set SDSP_PERF_GATE=1")
def test_all_ops_hold_50x_over_reference():
    # Fresh subprocess: this test process is pinned to the CPU mesh
    # (conftest), but a clean python in the repo root gets the TPU.
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "bench_ops.py", "--assert-floor", str(FLOOR)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, (
        f"perf gate failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
