"""Chained-loop phase profile of the fused chain on the real TPU.

Times each _debug_stage prefix of fused_chain_frames with the headline
methodology (16 chained calls, value-fetch sync) so phase costs are
measured UNDER PIPELINING — single-call timings include dispatch bubbles
the production pattern hides.  Phase cost = successive differences.

Also times a pure input-read floor (sum reduction) as the lower bound.

Run:  python -m tools.probe_chain_phases
"""

import functools
import json
import time

import numpy as np


def timeit_chained(fn, x, s0, iters=16):
    import jax.numpy as jnp
    out, s = fn(x, s0)
    float(jnp.sum(jnp.ravel(s)[:1]))
    s = s0
    start = time.perf_counter()
    for _ in range(iters):
        out, s = fn(x, s)
    float(jnp.sum(jnp.ravel(s)[:1]))
    t_loop = time.perf_counter() - start
    start = time.perf_counter()
    float(jnp.sum(jnp.ravel(s)[:1]))
    t_fetch = time.perf_counter() - start
    del out
    return max(t_loop - t_fetch, 1e-9) / iters


def main():
    import sys

    import jax
    import jax.numpy as jnp
    from simpledsp_tpu.kernels.chain import (FusedNorthStarOperators,
                                             fused_chain_frames)
    from simpledsp_tpu.models.northstar import default_design

    c, t = 64, 1 << 20
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ops = FusedNorthStarOperators(default_design(), fft_size=n,
                                  dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, t // n, ops.n1, ops.n2))
                    .astype(np.float32))
    s0 = jnp.zeros((c, ops.state_dim), jnp.float32)
    prec = jax.lax.Precision.HIGH

    def read_floor(xx, s):
        return None, s + jnp.sum(xx) * 0.0

    stages = [("floor_read", None)] + [
        (nm, nm) for nm in ("kx", "kframe", "prefix", "prepass",
                            "kernel")] + [("full", "none")]
    results = {}
    fns = {}
    for name, st in stages:
        if name == "floor_read":
            fns[name] = jax.jit(read_floor)
        else:
            kw = {} if st == "none" else {"_debug_stage": st}
            fns[name] = jax.jit(functools.partial(
                fused_chain_frames, ops, precision=prec,
                half_spectrum=True, layout="k1", frames_per_tile=32, **kw))
    for rep in range(3):
        for name, _ in stages:
            dt = timeit_chained(fns[name], x, s0)
            results.setdefault(name, []).append(dt * 1e3)
            print(f"{name} rep{rep}: {dt*1e3:.3f} ms", flush=True)
    med = {k: round(float(np.median(v)), 3) for k, v in results.items()}
    print(json.dumps({"median_ms": med}), flush=True)
    order = [s[0] for s in stages]
    print("phase deltas (ms):", flush=True)
    for a, b in zip(order[1:-1], order[2:]):
        print(f"  {b} - {a}: {med[b] - med[a]:+.3f}", flush=True)


if __name__ == "__main__":
    main()
