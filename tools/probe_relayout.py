"""Probe the chain kernel's last named optimization ideas (STATUS.md r3):

  (a) two pipelined pallas calls: the k1-major compute kernel WITHOUT the
      in-register bin reorder, followed by a dedicated Pallas relayout
      kernel (n1, f, n2) -> (f, n2h, n1)x2 — so the reorder runs at DMA
      bandwidth as its own grid instead of on the compute kernel's VPU;
  (b) the existing arms for reference: "reg" (in-register reorder, the
      production default) and "k1" + XLA transpose.

All arms run interleaved in ONE process (tunnel drift) on the bench
workload (c=64, t=1M, N=4096), chained-state loops, median of reps.

Run:  python -m tools.probe_relayout
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_relayout(n1: int, n2: int, r: int):
    """(n1, f, n2) -> re/im (f, n2h, n1) natural-order planes, one tile of
    r frames per grid step (the reg kernel's in-register transpose as a
    standalone DMA-bound pass)."""
    n2h = n2 // 2

    def body(x_ref, or_ref, oi_ref):
        t5 = jnp.transpose(x_ref[:], (1, 2, 0))     # (r, n2, n1)
        or_ref[:] = t5[:, :n2h]
        oi_ref[:] = t5[:, n2h:]

    def run(x):
        f = x.shape[1]
        in_blk = pl.BlockSpec((n1, r, n2), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        out_blk = pl.BlockSpec((r, n2h, n1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            body, grid=(f // r,),
            in_specs=[in_blk], out_specs=(out_blk, out_blk),
            out_shape=(jax.ShapeDtypeStruct((f, n2h, n1), x.dtype),
                       jax.ShapeDtypeStruct((f, n2h, n1), x.dtype)),
            cost_estimate=pl.CostEstimate(
                flops=0, bytes_accessed=2 * x.size * x.dtype.itemsize,
                transcendentals=0),
        )(x)

    return run


def main():
    from simpledsp_tpu.kernels.chain import (FusedNorthStarOperators,
                                             fused_chain_frames)
    from simpledsp_tpu.models.northstar import default_design

    design = default_design()
    N = 4096
    ops = FusedNorthStarOperators(design, N, dtype=jnp.float32)
    c, t = 64, 1 << 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)
    s0 = jnp.zeros((c, ops.state_dim), jnp.float32)

    def chain_fn(layout, debug_stage=None):
        @jax.jit
        def f(xx, ss):
            return fused_chain_frames(
                ops, xx, ss, half_spectrum=True, layout=layout,
                _debug_stage=debug_stage)
        return f

    f_reg = chain_fn("reg")
    f_k1 = chain_fn("k1")                      # k1 + XLA transpose
    f_k1raw = chain_fn("k1", "kernel")         # k1 compute only

    @jax.jit
    def f_twocall(xx, ss):
        (raw, _), s_fin = fused_chain_frames(
            ops, xx, ss, half_spectrum=True, layout="k1",
            _debug_stage="kernel")
        zr, zi = make_relayout(ops.n1, ops.n2, 64)(raw)
        return (zr, zi), s_fin

    arms = {"reg": f_reg, "k1_xla": f_k1, "k1_raw": f_k1raw,
            "twocall": f_twocall}
    # Interleave: one rep of each arm per round.
    results = {k: [] for k in arms}
    for k, fn in arms.items():   # compile pass
        out, s = fn(x, s0)
        float(jnp.sum(s))
    for _ in range(5):
        for k, fn in arms.items():
            s = s0
            t0 = time.perf_counter()
            for _ in range(8):
                out, s = fn(x, s)
            float(jnp.sum(s))
            t_loop = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(s))
            t_fetch = time.perf_counter() - t0
            results[k].append(max(t_loop - t_fetch, 1e-9) / 8)
    out = {}
    for k, ts in results.items():
        dt = sorted(ts)[len(ts) // 2]
        out[k] = {"ms": round(dt * 1e3, 3),
                  "Msps": round(c * t / dt / 1e6, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
