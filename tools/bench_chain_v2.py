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
        ("half_r32", dict(half_spectrum=True, frames_per_tile=32)),
        ("half_r32_prepass", dict(half_spectrum=True, frames_per_tile=32,
                                  _debug_stage="prepass")),
        ("half_r32_kernel", dict(half_spectrum=True, frames_per_tile=32,
                                 _debug_stage="kernel")),
    ]
    # Diagnostic: DEFAULT precision (1-pass bf16 MXU) isolates the
    # f32-HIGHEST MXU share of the kernel from the VPU/DMA floor.
    cases.append(("half_r32_default",
                  dict(half_spectrum=True, frames_per_tile=32)))
    import os
    results = {}
    for name, kw in cases:
        p = jax.lax.Precision.DEFAULT if name.endswith("default") else prec
        fn = jax.jit(functools.partial(fused_chain_frames, ops,
                                       precision=p, **kw))
        try:
            dt = timeit(fn, x, s0)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        msps = c * t / dt / 1e6
        results[name] = {"ms": round(dt * 1e3, 3), "Msps": round(msps, 1)}
        print(f"{name}: {dt*1e3:.3f} ms = {msps:.0f} Ms/s", flush=True)
        if os.environ.get("PROFILE"):
            with jax.profiler.trace(f"/tmp/sdsp_trace_{name}"):
                out, s = fn(x, s0)
                float(jnp.sum(s))
    # DMA/grid floor: a kernel that fully reads each x tile and writes a
    # full (n1, r, n2) output block with one VPU reduce in between — the
    # non-MXU lower bound of the fused kernel's pipeline.
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, n2 = ops.n1, ops.n2
    f_total = c * (t // n)
    r = 16
    x3 = x.reshape(f_total, n1, n2)

    def run_floor(name, body, out_blk, out_shape, bytes_moved, rr=None):
        rr = rr or r

        def fn(xx):
            return pl.pallas_call(
                body, grid=(f_total // rr,),
                in_specs=[pl.BlockSpec((rr, n1, n2), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=out_blk,
                out_shape=out_shape,
            )(xx)
        fj = jax.jit(fn)
        try:
            o = fj(x3); float(jnp.sum(o.ravel()[0]))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return
        start = time.perf_counter()
        for _ in range(8):
            o = fj(x3)
        float(jnp.sum(o.ravel()[0]))
        dt = (time.perf_counter() - start) / 8
        gb = bytes_moved / dt / 1e9
        results[name] = {"ms": round(dt * 1e3, 3)}
        print(f"{name}: {dt*1e3:.3f} ms ({gb:.0f} GB/s)", flush=True)

    nbytes = x3.size * 4

    def body_k1major(x_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(
            jnp.sum(x_ref[:], axis=0)[:, None, :], (n1, r, n2))

    def body_fmajor(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    def body_inonly(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:], axis=0)[None]

    # Per-grid-step overhead scan: same traffic, fewer/bigger tiles.
    for rr in (16, 64, 128, 256):
        run_floor(f"floor_fmajor_r{rr}", body_fmajor,
                  pl.BlockSpec((rr, n1, n2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  jax.ShapeDtypeStruct((f_total, n1, n2), jnp.float32),
                  2 * nbytes, rr=rr)
    run_floor("floor_inonly", body_inonly,
              pl.BlockSpec((1, n1, n2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
              jax.ShapeDtypeStruct((f_total // r, n1, n2), jnp.float32),
              nbytes)

    # Manual input-DMA ring with DEPTH in-flight copies: does concurrency
    # beat the auto-pipeline's ~68 GB/s single-stream read rate?
    for depth, rr in ((2, 32), (4, 32), (8, 32), (4, 128)):
        n_steps = f_total // rr

        def ring_body(x_any, o_ref, scr, sem, depth=depth, rr=rr,
                      n_steps=n_steps):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                for d in range(depth):
                    pltpu.make_async_copy(
                        x_any.at[pl.ds(d * rr, rr)], scr.at[d],
                        sem.at[d]).start()
            sl = i % depth
            pltpu.make_async_copy(x_any.at[pl.ds(i * rr, rr)], scr.at[sl],
                                  sem.at[sl]).wait()
            o_ref[:] = jnp.sum(scr[sl], axis=0)[None]

            @pl.when(i + depth < n_steps)
            def _():
                pltpu.make_async_copy(
                    x_any.at[pl.ds((i + depth) * rr, rr)], scr.at[sl],
                    sem.at[sl]).start()

        def ring_fn(xx, depth=depth, rr=rr, body=ring_body):
            return pl.pallas_call(
                body, grid=(f_total // rr,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, n1, n2), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((f_total // rr, n1, n2),
                                               jnp.float32),
                scratch_shapes=[pltpu.VMEM((depth, rr, n1, n2),
                                           jnp.float32),
                                pltpu.SemaphoreType.DMA((depth,))],
            )(xx)

        name = f"floor_ring_d{depth}_r{rr}"
        fj = jax.jit(ring_fn)
        try:
            o = fj(x3); float(jnp.sum(o.ravel()[0]))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)
            continue
        start = time.perf_counter()
        for _ in range(8):
            o = fj(x3)
        float(jnp.sum(o.ravel()[0]))
        dt = (time.perf_counter() - start) / 8
        print(f"{name}: {dt*1e3:.3f} ms ({nbytes / dt / 1e9:.0f} GB/s read)",
              flush=True)
        results[name] = {"ms": round(dt * 1e3, 3)}

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
