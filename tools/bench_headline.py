"""Pick the headline bench config: chained-loop throughput, repeated.

Runs the EXACT bench.py methodology (16 chained calls, value-fetch sync,
fetch round-trip subtracted) for several (channels, precision) configs,
3 repeats each, interleaved — the axon tunnel shows ~1.5x run-to-run
variance, so single measurements lie.  Prints one JSON line per repeat
and a summary with median/min per config.

Run from the repo root:  python -m tools.bench_headline
"""

import json
import time

import numpy as np


def measure(chain, x, s0, iters=16):
    import jax
    import jax.numpy as jnp

    fwd = chain._jit
    out, s = fwd(x, s0)
    float(jnp.sum(s))
    s = s0
    start = time.perf_counter()
    for _ in range(iters):
        out, s = fwd(x, s)
    float(jnp.sum(s))
    t_loop = time.perf_counter() - start
    start = time.perf_counter()
    float(jnp.sum(s))
    t_fetch = time.perf_counter() - start
    del out
    return max(t_loop - t_fetch, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.models.northstar import NorthStarChain

    t = 1 << 20
    rng = np.random.default_rng(0)
    configs = {}
    for c in (64, 128, 256):
        chain = NorthStarChain(fft_size=4096, block_size=256,
                               dtype=jnp.float32,
                               precision=jax.lax.Precision.HIGH)
        x = chain.frame_input(
            rng.standard_normal((c, t)).astype(np.float32))
        s0 = jnp.zeros((c, 2 * (chain.design.nsections + 1)),
                       dtype=jnp.float32)
        configs[f"c{c}"] = (chain, x, s0, c)

    results = {k: [] for k in configs}
    for rep in range(3):
        for k, (chain, x, s0, c) in configs.items():
            dt = measure(chain, x, s0)
            msps = c * t / dt / 1e6
            results[k].append(msps)
            print(json.dumps({"config": k, "rep": rep,
                              "ms_per_call": round(dt * 1e3, 3),
                              "Msps": round(msps, 1)}), flush=True)

    summary = {k: {"median_Msps": round(float(np.median(v)), 1),
                   "max_Msps": round(float(np.max(v)), 1)}
               for k, v in results.items()}
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
