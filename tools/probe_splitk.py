"""Interleaved on-chip shootout: reg vs regs (split-K step-1) chain kernel.

The regs layout replaces the HIGHEST step-1 dot (384 bf16 passes/tile at
r = 64 — half of ALL kernel MXU passes, at 1/8 tile utilization) with an
explicit exact-bf16 split-K dot (128 single passes, same f32-grade
accuracy; kernels/chain._make_packed_regs_kernel).  This probe times both
in ONE process (the tunnel drifts >1.5x run to run) and checks the regs
SNR against the f64 scipy oracle on a small block.

Run from the repo root:  python -m tools.probe_splitk
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import scipy.signal as sig
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    from simpledsp_tpu.design.biquad import sos_matrix
    from simpledsp_tpu.kernels import chain as _kchain
    from simpledsp_tpu.models.northstar import NorthStarChain

    chain = NorthStarChain(fft_size=4096, block_size=256, dtype=jnp.float32)
    ops = chain._fused_ops
    rm = Format(Layout(major_to_minor=(0, 1, 2)),
                SingleDeviceSharding(jax.local_devices()[0]))

    def make_fwd(layout, r):
        def fwd(x, s0):
            return _kchain.fused_chain_frames(
                ops, x, s0, precision=None, half_spectrum=True,
                flat_out=True, layout=layout, frames_per_tile=r)
        return jax.jit(fwd, out_shardings=((rm, rm), None))

    rng = np.random.default_rng(0)

    # ---- SNR vs f64 oracle (small block, on-chip) ----
    c_s, t_s = 2, 8 * 4096
    xs = rng.standard_normal((c_s, t_s))
    y64 = sig.sosfilt(sos_matrix(chain.design), xs, axis=-1)
    ref = np.fft.rfft(y64.reshape(c_s, -1, 4096))
    packed = ref[..., :2048].copy()
    packed[..., 0] += 1j * ref[..., 2048].real
    xs_f = chain.frame_input(xs.astype(np.float32))
    s0s = jnp.zeros((c_s, ops.state_dim), jnp.float32)
    for layout in ("reg", "regs"):
        (sr, si), _ = make_fwd(layout, 8)(xs_f, s0s)
        got = (np.asarray(sr).astype(np.float64).reshape(c_s, -1, 2048)
               + 1j * np.asarray(si).astype(np.float64).reshape(
                   c_s, -1, 2048))
        err = got - packed
        snr = 10 * np.log10((np.abs(packed) ** 2).sum()
                            / max((np.abs(err) ** 2).sum(), 1e-300))
        print(json.dumps({"layout": layout, "snr_db": round(snr, 1)}),
              flush=True)

    # ---- interleaved chained-loop throughput ----
    c, t = 64, 1 << 20
    x = chain.frame_input(rng.standard_normal((c, t)).astype(np.float32))
    s0 = jnp.zeros((c, ops.state_dim), jnp.float32)
    configs = [("reg", 64), ("regs", 64), ("regs", 32)]
    fwds = {}
    for layout, r in configs:
        try:
            f = make_fwd(layout, r)
            out, s = f(x, s0)          # compile + run once
            float(jnp.sum(s))
            fwds[(layout, r)] = f
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"layout": layout, "r": r,
                              "error": str(e)[:300]}), flush=True)

    def measure(fwd, iters=16):
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

    results = {k: [] for k in fwds}
    for rep in range(5):
        for key, fwd in fwds.items():
            dt = measure(fwd)
            results[key].append(round(c * t / dt / 1e6, 1))
            print(json.dumps({"rep": rep, "layout": key[0], "r": key[1],
                              "Msps": results[key][-1]}), flush=True)
    print(json.dumps({"median_Msps": {f"{k[0]}-r{k[1]}":
                                      sorted(v)[len(v) // 2]
                                      for k, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
