"""Per-stage precision shootout for the two-step prepass projection.

two_step splits the projection into kb = K x (the M-bound dot: 4096
f32-pass tiles/call at the headline shape) and the F-power block-Toeplitz
combine (1152).  HIGHEST costs 6 bf16 passes per f32 pass, HIGH costs 3 —
if kb tolerates HIGH while the combine stays HIGHEST (or vice versa), the
projection halves again.  Measures SNR vs the f64 scipy oracle and
chained-loop throughput for all four combos IN ONE PROCESS.

Run from the repo root:  python -m tools.probe_proj_prec
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

    P = jax.lax.Precision
    chain = NorthStarChain(fft_size=4096, block_size=256, dtype=jnp.float32)
    ops = chain._fused_ops
    rm = Format(Layout(major_to_minor=(0, 1, 2)),
                SingleDeviceSharding(jax.local_devices()[0]))

    def make_fwd(pp):
        def fwd(x, s0):
            return _kchain.fused_chain_frames(
                ops, x, s0, precision=None, half_spectrum=True,
                flat_out=True, projection="two_step", _proj_prec=pp)
        return jax.jit(fwd, out_shardings=((rm, rm), None))

    combos = {f"kb_{a}__comb_{b}": (getattr(P, a), getattr(P, b))
              for a in ("HIGH", "HIGHEST") for b in ("HIGH", "HIGHEST")}

    rng = np.random.default_rng(0)
    # SNR vs f64 oracle (small block)
    c_s, t_s = 2, 8 * 4096
    xs = rng.standard_normal((c_s, t_s))
    y64 = sig.sosfilt(sos_matrix(chain.design), xs, axis=-1)
    ref = np.fft.rfft(y64.reshape(c_s, -1, 4096))
    packed = ref[..., :2048].copy()
    packed[..., 0] += 1j * ref[..., 2048].real
    xs_f = chain.frame_input(xs.astype(np.float32))
    s0s = jnp.zeros((c_s, ops.state_dim), jnp.float32)
    snrs = {}
    fwds = {k: make_fwd(pp) for k, pp in combos.items()}
    for k, fwd in fwds.items():
        (sr, si), _ = fwd(xs_f, s0s)
        got = (np.asarray(sr).astype(np.float64).reshape(c_s, -1, 2048)
               + 1j * np.asarray(si).astype(np.float64).reshape(
                   c_s, -1, 2048))
        err = got - packed
        snrs[k] = round(10 * np.log10(
            (np.abs(packed) ** 2).sum()
            / max((np.abs(err) ** 2).sum(), 1e-300)), 1)
    print(json.dumps({"snr_db": snrs}), flush=True)

    # chained-loop throughput, interleaved
    c, t = 64, 1 << 20
    x = chain.frame_input(rng.standard_normal((c, t)).astype(np.float32))
    s0 = jnp.zeros((c, ops.state_dim), jnp.float32)

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

    results = {k: [] for k in fwds}
    for rep in range(4):
        for k, fwd in fwds.items():
            dt = measure(fwd)
            results[k].append(round(c * t / dt / 1e6, 1))
            print(json.dumps({"rep": rep, "combo": k,
                              "Msps": results[k][-1]}), flush=True)
    print(json.dumps({
        "snr_db": snrs,
        "median_Msps": {k: sorted(v)[len(v) // 2]
                        for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
