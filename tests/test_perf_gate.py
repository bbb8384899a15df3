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
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"perf gate failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


# Net-new SDR banks have no reference baseline row; gate on absolute
# floors set ~50% below measured medians (FM 8.1 / AM 9.0 Gs/s padded,
# PERF.md r2f) — the axon tunnel drifts >1.5x run to run, so tighter
# floors would flap.  bench_banks itself hard-fails on fused-vs-XLA and
# padded-vs-fused parity before timing, so this also gates correctness
# of the compiled kernels on the real chip.
BANK_FLOORS_MSPS = {"fm_padded": 4000.0, "am_padded": 4500.0}


@pytest.mark.skipif(not os.environ.get("SDSP_PERF_GATE"),
                    reason="TPU perf gate is opt-in: set SDSP_PERF_GATE=1")
def test_receiver_banks_hold_floor():
    import json

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "-m", "tools.bench_banks"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"bench_banks failed (parity or runtime):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    results = json.loads(proc.stdout.strip().splitlines()[-1])
    for key, floor in BANK_FLOORS_MSPS.items():
        msps = results[key]["Msps"]
        assert msps >= floor, (
            f"{key} regressed: {msps} Ms/s < floor {floor}")
