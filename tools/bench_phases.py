"""Phase attribution for the fused north-star chain on the real TPU.

Measures, with the value-fetch sync methodology (see PERF.md), the cost of
each stage of kernels/chain.py:fused_chain_frames:

  full      pre-pass + fused kernel + reorder transpose     (production)
  kernel    pre-pass + fused kernel (raw (k1, f, k2) out)
  prepass   pre-pass only (kx / frame scan / start expansion)

Differences give per-phase cost.  Also measures an XLA device copy for the
empirical HBM bandwidth, and optionally captures a jax.profiler trace
(PROFILE=1) of one full call.
"""

import functools
import json
import os
import time

import numpy as np


def timeit(fn, x, s0, iters=8):
    import jax.numpy as jnp
    out, s = fn(x, s0)
    _sync = float(jnp.sum(s))
    s = s0
    start = time.perf_counter()
    for _ in range(iters):
        out, s = fn(x, s)
    checksum = float(jnp.sum(s))
    t_loop = time.perf_counter() - start
    start = time.perf_counter()
    float(jnp.sum(s))
    t_fetch = time.perf_counter() - start
    del checksum
    return max(t_loop - t_fetch, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.kernels.chain import (FusedNorthStarOperators,
                                             fused_chain_frames)
    from simpledsp_tpu.models.northstar import default_design

    c, t = 64, 1 << 20
    n = 4096
    design = default_design()
    ops = FusedNorthStarOperators(design, n, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, t)).astype(np.float32)
                    .reshape(c, t // n, ops.n1, ops.n2))
    s0 = jnp.zeros((c, ops.state_dim), dtype=jnp.float32)
    prec = jax.lax.Precision.HIGH

    results = {}
    for stage in ("prepass", "kernel", "full"):
        fn = jax.jit(functools.partial(
            fused_chain_frames, ops, precision=prec,
            _debug_stage=None if stage == "full" else stage))
        dt = timeit(fn, x, s0)
        results[stage] = round(dt * 1e3, 3)
        print(f"{stage}: {dt*1e3:.3f} ms", flush=True)

    # HBM copy bandwidth: y = x + 1 over the 268 MB input.
    @jax.jit
    def copy_fn(x, s0):
        return x + 1.0, s0 + 1.0
    dt = timeit(copy_fn, x, s0)
    nbytes = x.size * 4 * 2
    results["copy_ms"] = round(dt * 1e3, 3)
    results["copy_GBps"] = round(nbytes / dt / 1e9, 1)
    print(f"copy: {dt*1e3:.3f} ms -> {results['copy_GBps']} GB/s", flush=True)

    # Transpose-alone: same shape as the chain's reorder.
    f_total = c * (t // n)
    y = jnp.asarray(rng.standard_normal((ops.n1, f_total, ops.n2))
                    .astype(np.float32))

    @jax.jit
    def tr_fn(y, s0):
        z = jax.lax.transpose(y, (1, 2, 0))
        return z, s0 + z[0, 0, 0]
    dt = timeit(tr_fn, y, s0)
    results["transpose_one_plane_ms"] = round(dt * 1e3, 3)
    print(f"transpose (one plane): {dt*1e3:.3f} ms", flush=True)

    msps = c * t / (results["full"] / 1e3) / 1e6
    results["full_Msps"] = round(msps, 1)
    print(json.dumps(results), flush=True)

    if os.environ.get("PROFILE"):
        fn = jax.jit(functools.partial(fused_chain_frames, ops,
                                       precision=prec))
        out, s = fn(x, s0)
        float(jnp.sum(s))
        with jax.profiler.trace("/tmp/sdsp_trace"):
            out, s = fn(x, s0)
            float(jnp.sum(s))
        print("trace written to /tmp/sdsp_trace", flush=True)


if __name__ == "__main__":
    main()
