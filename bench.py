"""Benchmark: north-star chain throughput on the real TPU chip.

Workload (BASELINE.md): 8th-order (4-SOS) Butterworth IIR into framed
4096-pt FFT, streaming with carried state — the TPU-native composition of
the reference's two capabilities (reference: include/sdsp/casc_2o_iir.h:36 +
include/sdsp/fft.h:301).  Reference baseline: 47.1 Msamples/s single-core
C++ f64 (BASELINE.md, measured in this environment).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}

After printing it, every run re-executes the full compiled-path smoke
suite (tools/tpu_smoke: fused chain vs f64 oracle, compiled shard_map
parity, dp-sharded bank) in a subprocess, writing TPU_SMOKE.json — so a
benchmark artifact always ships with fresh compiled-correctness evidence
(the analog of the reference running its tests on every CI pass).  Set
SDSP_SKIP_SMOKE=1 for quick manual timing runs; a smoke failure makes
this process exit nonzero (the JSON line is already out).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_MSPS = 47.1  # BASELINE.md north-star chain, 1 Xeon core


def run_smoke() -> int:
    """tools.tpu_smoke in a fresh process (own compiles, own device
    handle); its stdout goes to stderr so this script still prints
    exactly one stdout line."""
    proc = subprocess.run(
        [sys.executable, "-m", "tools.tpu_smoke", "TPU_SMOKE.json"],
        stdout=sys.stderr, stderr=sys.stderr, timeout=900)
    return proc.returncode


def _parity_snr(chain, x_framed, x_ref_host) -> float:
    """SNR (dB) of the compiled chain's first two channels vs the float64
    scipy oracle (sosfilt + rfft, packed halfcomplex)."""
    import jax.numpy as jnp  # noqa: F401  (jax already imported by caller)
    import scipy.signal as sig

    from simpledsp_tpu.design.biquad import sos_matrix
    from simpledsp_tpu.utils.host import to_numpy

    (sr, si), _ = chain(x_framed)
    nh = chain.fft_size // 2
    got = (to_numpy(sr[:2]).astype(np.float64)
           + 1j * to_numpy(si[:2]).astype(np.float64))
    y64 = sig.sosfilt(sos_matrix(chain.design),
                      x_ref_host.astype(np.float64), axis=-1)
    ref = np.fft.rfft(y64.reshape(2, -1, chain.fft_size))
    packed = ref[..., :nh].copy()
    packed[..., 0] += 1j * ref[..., nh].real
    err = got - packed
    return float(10 * np.log10((np.abs(packed) ** 2).sum()
                               / max((np.abs(err) ** 2).sum(), 1e-300)))


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.models.northstar import NorthStarChain

    # 64 channels x 1M samples = 67 Msamples/call (f32 in, packed
    # one-sided spectra out).  Streaming pipeline: state chained
    # call-to-call, sync only at the end — the production pattern, and it
    # hides this runtime's ~25 ms dispatch latency behind device compute.
    # Batch size does NOT move the chained-loop rate (measured flat
    # 64/128/256 channels, tools/bench_headline.py) — cost is purely
    # per-sample once the pipeline is full.
    c, t = 64, 1 << 20
    # precision=None -> HIGHEST everywhere (prepass einsums + in-kernel
    # dots): 137.1 dB SNR vs the f64 reference, measured on-chip
    # (tools/verify_chain_tpu.py).  The HIGH (3-pass bf16) prepass is
    # ~10% faster but measures 101.0 dB — the bf16_3x rounding of the
    # big x -> starts projection dominates — below the 130 dB bar this
    # benchmark is quoted at, so it is NOT used here.
    chain = NorthStarChain(fft_size=4096, block_size=256, dtype=jnp.float32,
                           precision=None)
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((c, t)).astype(np.float32)
    # Upload pre-framed (C, F, n1, n2): the same samples in the same order,
    # in the kernel's tiling — what a streaming producer would emit —
    # skipping a 268 MB device-side re-tiling copy per call.
    x = chain.frame_input(x_host)
    s0 = jnp.zeros((c, 2 * (chain.design.nsections + 1)), dtype=jnp.float32)

    fwd = chain._jit   # pins spectra output layout (models/northstar.py)
    # Warm-up / compile, synced by a VALUE FETCH: block_until_ready is not
    # reliable through this TPU runtime's tunnel (it can return before the
    # work executes), but fetching a value data-dependent on the result
    # cannot lie.
    out, s = fwd(x, s0)
    float(jnp.sum(s))

    # Compiled-path correctness gate: every benchmark run re-proves the
    # compiled kernel (not interpret mode) against the f64 scipy oracle.
    # chain() reuses the SAME jitted executable as fwd — zero extra
    # compiles; only 2 channels are fetched (~4 MB each plane).
    snr_db = _parity_snr(chain, x, x_host[:2])
    if snr_db < 130.0:
        raise SystemExit(
            f"compiled-path parity FAILED: {snr_db:.1f} dB < 130 dB")

    def one_loop(iters=16):
        s = s0
        start = time.perf_counter()
        for _ in range(iters):
            out, s = fwd(x, s)
        # The chained state forces the whole 16-call dependency chain.
        float(jnp.sum(s))
        t_loop = time.perf_counter() - start
        # Calibrate out the fetch round-trip on the (now ready) value.
        start = time.perf_counter()
        float(jnp.sum(s))
        t_fetch = time.perf_counter() - start
        del out
        return max(t_loop - t_fetch, 1e-9) / iters

    # Median of 5 loops: the tunnel shows >1.5x run-to-run drift.
    dt = sorted(one_loop() for _ in range(5))[2]

    msps = c * t / dt / 1e6
    result = {
        "metric": "northstar_chain_8sos_iir_4096fft_throughput",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
        "detail": {
            "channels": c, "samples_per_channel": t,
            "seconds_per_call": round(dt, 6),
            "device": str(jax.devices()[0]),
            "dtype": "float32",
            "parity_snr_db": round(snr_db, 1),
            "baseline": f"{BASELINE_MSPS} Msamples/s (1 Xeon core, f64 C++)",
        },
    }
    print(json.dumps(result), flush=True)

    if not os.environ.get("SDSP_SKIP_SMOKE"):
        rc = run_smoke()
        if rc != 0:
            raise SystemExit(f"tpu_smoke FAILED (rc={rc}); see stderr "
                             f"and TPU_SMOKE.json")
        print("tpu_smoke OK (TPU_SMOKE.json)", file=sys.stderr)


if __name__ == "__main__":
    main()
