"""Frames-per-tile sweep for the fused chain kernel (one process).

r controls the Pallas grid tile: bigger r = fewer grid steps (less
per-step overhead, fatter dots) but more VMEM pressure and a coarser
DMA/compute pipeline.  Default has been 32; sweep 8..128 interleaved at
the headline config.

Run from the repo root:  python -m tools.probe_tile_r
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    from simpledsp_tpu.kernels import chain as _kchain
    from simpledsp_tpu.models.northstar import NorthStarChain

    chain = NorthStarChain(fft_size=4096, block_size=256, dtype=jnp.float32)
    ops = chain._fused_ops
    rm = Format(Layout(major_to_minor=(0, 1, 2)),
                SingleDeviceSharding(jax.local_devices()[0]))

    def make_fwd(r):
        def fwd(x, s0):
            return _kchain.fused_chain_frames(
                ops, x, s0, precision=None, half_spectrum=True,
                flat_out=True, frames_per_tile=r)
        return jax.jit(fwd, out_shardings=((rm, rm), None))

    rng = np.random.default_rng(0)
    c, t = 64, 1 << 20
    x = chain.frame_input(rng.standard_normal((c, t)).astype(np.float32))
    s0 = jnp.zeros((c, ops.state_dim), jnp.float32)
    fwds = {r: make_fwd(r) for r in (8, 16, 32, 64)}

    def measure(fwd, iters=16):
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

    results = {r: [] for r in fwds}
    for rep in range(4):
        for r, fwd in fwds.items():
            dt = measure(fwd)
            results[r].append(round(c * t / dt / 1e6, 1))
            print(json.dumps({"rep": rep, "r": r,
                              "Msps": results[r][-1]}), flush=True)
    print(json.dumps({"median_Msps": {r: sorted(v)[len(v) // 2]
                                      for r, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
