"""Benchmark: north-star chain throughput on the real TPU chip.

Workload (BASELINE.md): 8th-order (4-SOS) Butterworth IIR into framed
4096-pt FFT, streaming with carried state — the TPU-native composition of
the reference's two capabilities (reference: include/sdsp/casc_2o_iir.h:36 +
include/sdsp/fft.h:301).  Reference baseline: 47.1 Msamples/s single-core
C++ f64 (BASELINE.md, measured in this environment).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

BASELINE_MSPS = 47.1  # BASELINE.md north-star chain, 1 Xeon core


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.models.northstar import NorthStarChain

    # 64 channels x 1M samples = 67 Msamples/call (f32 in, c64 spectra out).
    # Streaming pipeline: state chained call-to-call, sync only at the end —
    # the production pattern, and it hides this runtime's ~25 ms dispatch
    # latency behind device compute.
    c, t = 64, 1 << 20
    chain = NorthStarChain(fft_size=4096, block_size=256, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, t)), dtype=jnp.float32)
    s0 = jnp.zeros((c, 2 * (chain.design.nsections + 1)), dtype=jnp.float32)

    fwd = jax.jit(chain._forward)
    # Warm-up / compile.
    out, s = fwd(x, s0)
    jax.block_until_ready(out)

    iters = 16
    s = s0
    start = time.perf_counter()
    for _ in range(iters):
        out, s = fwd(x, s)
    jax.block_until_ready((out, s))
    dt = (time.perf_counter() - start) / iters

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
            "baseline": f"{BASELINE_MSPS} Msamples/s (1 Xeon core, f64 C++)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
