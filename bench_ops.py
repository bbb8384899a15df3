"""Per-op benchmarks against every BASELINE.md row (the reference's own
Catch2 BENCHMARK workloads, scaled to TPU batch throughput).

The reference benchmarks single blocks on one CPU core; TPU throughput
comes from batch, so each op runs on a large batch with fetch-forced
timing (see PERF.md methodology) and reports Msamples/s against the
measured C++ single-core number.  Prints one JSON line per row.

Run on the real chip: python bench_ops.py

Regression gate: ``python bench_ops.py --assert-floor 50`` exits nonzero
if ANY row drops below 50x its reference baseline — the executable analog
of the reference running its BENCHMARK blocks on every CI pass (reference:
test/testIIR.cpp:465-559, .github/workflows yml:57-61).  Wired into the
test suite as an opt-in TPU gate (tests/test_perf_gate.py).
"""

import argparse
import json
import time

import numpy as np

# BASELINE.md measured reference numbers (1 Xeon core, f64 C++).
BASE = {
    "fft_radix2_1024": 116.0,
    "fft_radix4_1024": 121.3,
    "fft_radix2_4096": 90.2,
    "fft_radix4_4096": 81.0,
    "iir_lp_8th_order": 168.5,
    "iir_hp_8th_order": 168.0,
    "iir_bp_8th_order": 165.8,
    "chain_iir8_fft4096": 47.1,
}

# Per-row regression floors: ~60% of the recorded round-4 medians
# (PERF.md per-op table), NOT a blanket multiple of the C++ baseline —
# a 2x slowdown on any row now fails the gate, while staying below each
# row's observed tunnel-drift window (>1.5x run to run; chain measured
# 8.7-12.4 Gs/s across rounds, FFT rows 8.2-11.6).
FLOOR_MSPS = {
    "fft_radix2_1024": 4890.0,    # r4 median 8152
    "fft_radix4_1024": 4890.0,    # r4 median 8152
    "fft_radix2_4096": 5240.0,    # r4 median 8734
    "fft_radix4_4096": 5240.0,    # r4 median 8734
    "iir_lp_8th_order": 13800.0,  # r4 median 23022
    "iir_hp_8th_order": 15800.0,  # r4 median 26345
    "iir_bp_8th_order": 13500.0,  # r4 median 22467
    "chain_iir8_fft4096": 7400.0,  # r4 median 12367; window min 8700
}


def check_row_floors(rows, floors=None):
    """Return the list of (metric, msps, floor) violations for measured
    rows against the per-row floors.  Pure function so the gate logic is
    unit-testable without a TPU (tests/test_perf_gate.py)."""
    floors = FLOOR_MSPS if floors is None else floors
    bad = []
    for r in rows:
        floor = floors.get(r["metric"])
        if floor is not None and r["value"] < floor:
            bad.append((r["metric"], r["value"], floor))
    return bad


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.design.biquad import (
        design_bandpass, design_highpass, design_lowpass)
    from simpledsp_tpu.kernels.fft import rfft_frames
    from simpledsp_tpu.ops.iir import BlockIIR

    rng = np.random.default_rng(0)
    results = []

    def timed(fn, *args, iters=12, loops=3):
        # Median of `loops` chained loops: the FIRST loop after a cold
        # compile runs 10-30x slow through the axon tunnel (one-time
        # transfer/queue setup the single warmup call does not absorb —
        # measured 0.35 vs 12.5 Gs/s on the chain row), and run-to-run
        # drift is >1.5x (PERF.md methodology, same as bench.py).
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[:8]))
        dts = []
        for _ in range(loops):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.ravel()[:8]))
            t_loop = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(leaf.ravel()[:8]))
            t_fetch = time.perf_counter() - t0
            dts.append(max(t_loop - t_fetch, 1e-9) / iters)
        return sorted(dts)[len(dts) // 2]

    def emit(name, nsamples, dt):
        msps = nsamples / dt / 1e6
        rec = {"metric": name, "value": round(msps, 1), "unit": "Msamples/s",
               "vs_baseline": round(msps / BASE[name], 1),
               "baseline_cpp_1core": BASE[name]}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # FFT rows: batched frames of the reference's sizes (radix choice is an
    # internal schedule in the reference; both map to the same fused kernel).
    total = 1 << 26
    for n in (1024, 4096):
        x = jnp.asarray(rng.standard_normal((total // n, n)), jnp.float32)
        fn = jax.jit(lambda a: rfft_frames(a, frames_per_tile=16))
        dt = timed(fn, x)
        emit(f"fft_radix2_{n}", total, dt)
        emit(f"fft_radix4_{n}", total, dt)

    # IIR rows: 8th-order (4-SOS) block-state-space, 64ch x 1M samples.
    c, t = 64, 1 << 20
    x = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)
    fs = 39000.0
    for name, design in (
            ("iir_lp_8th_order", design_lowpass(4, 2000.0, fs)),
            ("iir_hp_8th_order", design_highpass(4, 2000.0, fs)),
            ("iir_bp_8th_order", design_bandpass(4, 2000.0, fs, 0.8))):
        f = BlockIIR(design, block_size=256, dtype=jnp.float32)
        xb = x.reshape(c, -1, 256)
        s0 = jnp.zeros((c, 10), jnp.float32)
        dt = timed(jax.jit(f.run_blocks), xb, s0)
        emit(name, c * t, dt)

    # Chain row: delegate to bench.py's configuration.
    from simpledsp_tpu.models.northstar import NorthStarChain
    chain = NorthStarChain(fft_size=4096, block_size=256, dtype=jnp.float32,
                           precision=jax.lax.Precision.HIGH)
    x = chain.frame_input(np.asarray(x))  # pre-framed upload (see bench.py)
    s0 = jnp.zeros((c, 10), jnp.float32)
    fwd = chain._jit   # pinned output layout (models/northstar.py)
    out, s = fwd(x, s0)
    float(jnp.sum(s))
    iters = 16
    dts = []
    for _ in range(3):  # median-of-3 chained loops (see timed())
        s = s0
        t0 = time.perf_counter()
        for _ in range(iters):
            out, s = fwd(x, s)
        float(jnp.sum(s))
        t_loop = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(s))
        t_fetch = time.perf_counter() - t0
        dts.append(max(t_loop - t_fetch, 1e-9) / iters)
    emit("chain_iir8_fft4096", c * t, sorted(dts)[1])

    worst = min(r["vs_baseline"] for r in results)
    print(json.dumps({"metric": "bench_ops_summary",
                      "rows": len(results),
                      "min_vs_baseline": worst,
                      "all_beat_reference": worst > 1.0}))
    return worst, results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--assert-floor", type=float, default=None,
                    help="exit 1 if any row's vs_baseline drops below this")
    ap.add_argument("--assert-row-floors", action="store_true",
                    help="exit 1 if any row drops below its per-row "
                         "FLOOR_MSPS (~60%% of the round-4 median)")
    args = ap.parse_args()
    worst, rows = main()
    if args.assert_floor is not None and worst < args.assert_floor:
        raise SystemExit(
            f"PERF REGRESSION: min vs_baseline {worst} < floor "
            f"{args.assert_floor}")
    if args.assert_row_floors:
        bad = check_row_floors(rows)
        if bad:
            raise SystemExit("PERF REGRESSION (per-row floors): " + "; ".join(
                f"{m} {v:.0f} < {f:.0f} Ms/s" for m, v, f in bad))
