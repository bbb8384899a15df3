"""Where does the fused chain's time go, and how does it scale with batch?

Times the fused path at c=64 and c=256 (t=1M) at each _debug_stage cut:
prepass (everything before the Pallas kernel), kernel (pallas, no
reorder), full half-spectrum (with reorder transpose), and the legacy
full-spectrum path.  Marginal per-phase cost = cut[i] - cut[i-1]; the
phase whose cost grows superlinearly with c is the bench regression.
"""

import functools
import json
import time


def timeit(fn, x, s0, iters=6):
    import jax.numpy as jnp
    out, s = fn(x, s0)
    float(jnp.sum(jnp.asarray(s).ravel()[:1]))
    s = s0
    start = time.perf_counter()
    for _ in range(iters):
        out, s = fn(x, s)
    float(jnp.sum(jnp.asarray(s).ravel()[:1]))
    t_loop = time.perf_counter() - start
    start = time.perf_counter()
    float(jnp.sum(jnp.asarray(s).ravel()[:1]))
    t_fetch = time.perf_counter() - start
    return max(t_loop - t_fetch, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simpledsp_tpu.kernels.chain import (FusedNorthStarOperators,
                                             fused_chain_frames)
    from simpledsp_tpu.models.northstar import default_design

    n = 4096
    t = 1 << 20
    ops = FusedNorthStarOperators(default_design(), n, dtype=jnp.float32)
    prec = jax.lax.Precision.HIGH
    rng = np.random.default_rng(0)

    results = {}
    for c in (64, 256):
        x = jnp.asarray(rng.standard_normal((c, t)).astype(np.float32)
                        .reshape(c, t // n, ops.n1, ops.n2))
        s0 = jnp.zeros((c, ops.state_dim), dtype=jnp.float32)
        cases = [
            ("kx", dict(half_spectrum=True, _debug_stage="kx")),
            ("prefix", dict(half_spectrum=True, _debug_stage="prefix")),
            ("prepass", dict(half_spectrum=True, _debug_stage="prepass")),
            ("kernel", dict(half_spectrum=True, _debug_stage="kernel")),
            ("half_full", dict(half_spectrum=True)),
            ("legacy_full", dict(half_spectrum=False)),
        ]
        for name, kw in cases:
            fn = jax.jit(functools.partial(fused_chain_frames, ops,
                                           precision=prec, **kw))
            try:
                dt = timeit(fn, x, s0)
            except Exception as e:
                print(f"c{c}_{name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            results[f"c{c}_{name}"] = round(dt * 1e3, 3)
            print(f"c{c}_{name}: {dt*1e3:.3f} ms", flush=True)
        del x

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
