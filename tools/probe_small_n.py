"""Small-N fused-chain layout shootout on the real TPU, chained-loop
methodology, with an on-chip compiled parity gate vs the f64 scipy
oracle per config.

Round-5 findings so far: "regp" (block-diagonal packed step 1) tied
"reg" exactly at N=1024 — the step-1-underfill hypothesis is DEAD.  The
real 1024 killer is the reg layout's OUTPUT: (F, n2/2, n1) planes have
an n1 = 8-lane minor dim, stored at ~1/16 tile efficiency (measured
15.9 ms vs the k1 layout's 8.0 incl. its XLA reorder).  This probe
compares reg / k1 / regw (qf bins packed per 128-lane row — full-width
stores) per fft_size.

Run:  python -m tools.probe_small_n
"""

import functools
import json

import numpy as np

from tools.timing import timeit_chained


def main():
    import jax
    import jax.numpy as jnp
    import scipy.signal as sig
    from simpledsp_tpu.design.biquad import sos_matrix
    from simpledsp_tpu.kernels.chain import (FusedNorthStarOperators,
                                             fused_chain_frames)
    from simpledsp_tpu.models.northstar import default_design
    from simpledsp_tpu.utils.host import to_numpy

    c, t = 64, 1 << 20
    design = default_design()
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((c, t)).astype(np.float32)

    def timeit(fn, x, s0, iters=16):
        return timeit_chained(lambda s: fn(x, s)[1], s0, iters=iters)

    results = {}
    fns, inputs = {}, {}
    layouts = {1024: ("reg", "k1", "regw"), 4096: ("reg", "regw")}
    for n in (1024, 4096):
        ops = FusedNorthStarOperators(design, fft_size=n, dtype=jnp.float32)
        xf = jnp.asarray(x_host.reshape(c, t // n, ops.n1, ops.n2))
        s0 = jnp.zeros((c, ops.state_dim), jnp.float32)
        inputs[n] = (xf, s0)
        for layout in layouts[n]:
            fns[(n, layout)] = jax.jit(functools.partial(
                fused_chain_frames, ops, half_spectrum=True,
                layout=layout, frames_per_tile=64))
            # Compiled parity vs f64 oracle (2 channels).
            (sr, si), _ = fns[(n, layout)](xf, s0)
            nh = n // 2
            got = (to_numpy(sr[:2]).astype(np.float64).reshape(2, -1, nh)
                   + 1j * to_numpy(si[:2]).astype(np.float64)
                   .reshape(2, -1, nh))
            y64 = sig.sosfilt(sos_matrix(design),
                              x_host[:2].astype(np.float64), axis=-1)
            ref = np.fft.rfft(y64.reshape(2, -1, n))
            packed = ref[..., :nh].copy()
            packed[..., 0] += 1j * ref[..., nh].real
            err = got - packed
            snr = float(10 * np.log10((np.abs(packed) ** 2).sum()
                                      / max((np.abs(err) ** 2).sum(),
                                            1e-300)))
            print(f"N={n} {layout}: parity {snr:.1f} dB", flush=True)
            results[f"snr_{n}_{layout}"] = round(snr, 1)
            if snr < 130.0:
                raise SystemExit(f"parity FAILED for N={n} {layout}")
    for rep in range(3):
        for (n, layout), fn in fns.items():
            dt = timeit(fn, *inputs[n])
            results.setdefault(f"ms_{n}_{layout}", []).append(dt * 1e3)
            print(f"N={n} {layout} rep{rep}: {dt*1e3:.3f} ms "
                  f"({c * t / dt / 1e9:.2f} Gs/s)", flush=True)
    med = {k: round(float(np.median(v)), 3)
           for k, v in results.items() if isinstance(v, list)}
    out = {k: v for k, v in results.items() if not isinstance(v, list)}
    out["median_ms"] = med
    out["Gsps"] = {k: round(c * t / (v / 1e3) / 1e9, 2)
                   for k, v in med.items()}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
