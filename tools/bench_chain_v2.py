"""Compare fused-chain variants on the real TPU (see tools/bench_phases.py
for the timing methodology)."""

import functools
import json
import time

import numpy as np


def timeit(fn, x, s0, iters=8):
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
    return max(t_loop - t_fetch, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.kernels.chain import (FusedNorthStarOperators,
                                             fused_chain_frames)
    from simpledsp_tpu.models.northstar import default_design

    c, t = 64, 1 << 20
    n = 4096
    ops = FusedNorthStarOperators(default_design(), n, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, t)).astype(np.float32)
                    .reshape(c, t // n, ops.n1, ops.n2))
    s0 = jnp.zeros((c, ops.state_dim), dtype=jnp.float32)
    prec = jax.lax.Precision.HIGH

    cases = [
        ("full_r16", dict(half_spectrum=False, frames_per_tile=16)),
        ("half_r16", dict(half_spectrum=True, frames_per_tile=16)),
        ("half_r32", dict(half_spectrum=True, frames_per_tile=32)),
        ("half_r8", dict(half_spectrum=True, frames_per_tile=8)),
        ("half_r16_prepass", dict(half_spectrum=True, frames_per_tile=16,
                                  _debug_stage="prepass")),
        ("half_r16_kernel", dict(half_spectrum=True, frames_per_tile=16,
                                 _debug_stage="kernel")),
    ]
    results = {}
    for name, kw in cases:
        fn = jax.jit(functools.partial(fused_chain_frames, ops,
                                       precision=prec, **kw))
        try:
            dt = timeit(fn, x, s0)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        msps = c * t / dt / 1e6
        results[name] = {"ms": round(dt * 1e3, 3), "Msps": round(msps, 1)}
        print(f"{name}: {dt*1e3:.3f} ms = {msps:.0f} Ms/s", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
