"""Chain-kernel variant shootout on the real TPU.

Times every fused-chain configuration END TO END with the exact headline
methodology (16 chained calls, value-fetch sync, fetch round-trip
subtracted), 3 interleaved repeats — the axon tunnel shows ~1.5x
run-to-run drift, so adjacent single measurements lie.

Run from the repo root:  python -m tools.bench_chain_v2
"""

import functools
import json
import time

import numpy as np


def timeit_chained(fn, x, s0, iters=16):
    import jax.numpy as jnp
    out, s = fn(x, s0)
    float(jnp.sum(s))
    s = s0
    start = time.perf_counter()
    for _ in range(iters):
        out, s = fn(x, s)
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
    from simpledsp_tpu.kernels.chain import (FusedNorthStarOperators,
                                             fused_chain_frames)
    from simpledsp_tpu.models.northstar import default_design

    c, t, n = 64, 1 << 20, 4096
    ops = FusedNorthStarOperators(default_design(), fft_size=n,
                                  dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, t // n, ops.n1, ops.n2))
                    .astype(np.float32))
    s0 = jnp.zeros((c, ops.state_dim), jnp.float32)
    prec = jax.lax.Precision.HIGH

    cases = [
        ("half_reg_r32", dict(half_spectrum=True, layout="reg",
                              frames_per_tile=32)),
        ("half_regw_r32", dict(half_spectrum=True, layout="regw",
                               frames_per_tile=32)),
        ("half_regw_r16", dict(half_spectrum=True, layout="regw",
                               frames_per_tile=16)),
        ("half_regw_r64", dict(half_spectrum=True, layout="regw",
                               frames_per_tile=64)),
    ]
    fns = {}
    for name, kw in cases:
        fns[name] = jax.jit(functools.partial(fused_chain_frames, ops,
                                              precision=prec, **kw))
    results = {name: [] for name, _ in cases}
    for rep in range(3):
        for name, _ in cases:
            try:
                dt = timeit_chained(fns[name], x, s0)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                results.pop(name, None)
                cases = [(n_, k) for n_, k in cases if n_ != name]
                break
            msps = c * t / dt / 1e6
            results[name].append(msps)
            print(f"{name} rep{rep}: {dt*1e3:.3f} ms = {msps:.0f} Ms/s",
                  flush=True)
    summary = {k: {"median_Msps": round(float(np.median(v)), 1),
                   "max_Msps": round(float(np.max(v)), 1)}
               for k, v in results.items() if v}
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
