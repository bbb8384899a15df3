"""On-chip check of the production chain: compiles, SNR vs f64, throughput.

Run from the repo root:  python -m tools.verify_chain_tpu [high] [sizes...]

Args: 'high' selects the HIGH-precision prepass; any integers are
fft_sizes to verify (default 4096; e.g. `1024 4096 16384` produces the
multi-shape evidence table in one process).
"""

import json
import sys
import time

import numpy as np


def check_size(fft_size: int, prec, rng) -> dict:
    import jax.numpy as jnp
    import scipy.signal as sig

    from simpledsp_tpu.design.biquad import sos_matrix
    from simpledsp_tpu.models.northstar import NorthStarChain

    chain = NorthStarChain(fft_size=fft_size, block_size=256,
                           dtype=jnp.float32, precision=prec)

    # ---- SNR vs the float64 scipy oracle (small block) ----
    c_s, t_s = 2, 8 * fft_size
    xs = rng.standard_normal((c_s, t_s))
    (sr, si), _ = chain(chain.frame_input(xs.astype(np.float32)))
    got = (np.asarray(sr).astype(np.float64)
           + 1j * np.asarray(si).astype(np.float64))
    y64 = sig.sosfilt(sos_matrix(chain.design), xs, axis=-1)
    ref = np.fft.rfft(y64.reshape(c_s, -1, fft_size))
    packed = ref[..., : fft_size // 2].copy()
    packed[..., 0] += 1j * ref[..., fft_size // 2].real
    err = got - packed
    snr_db = 10 * np.log10((np.abs(packed) ** 2).sum()
                           / max((np.abs(err) ** 2).sum(), 1e-300))
    print(f"N={fft_size}: SNR vs f64 oracle: {snr_db:.1f} dB", flush=True)

    # ---- chained-loop throughput (bench.py methodology) ----
    c, t = 64, 1 << 20
    x = chain.frame_input(rng.standard_normal((c, t)).astype(np.float32))
    s0 = jnp.zeros((c, 2 * (chain.design.nsections + 1)), jnp.float32)
    fwd = chain._jit
    out, s = fwd(x, s0)
    float(jnp.sum(s))

    def one_loop(iters=16):
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

    dts = sorted(one_loop() for _ in range(5))
    dt = dts[2]
    rec = {
        "fft_size": fft_size,
        "snr_db": round(float(snr_db), 1),
        "ms_per_call": [round(d * 1e3, 3) for d in dts],
        "median_Msps": round(c * t / dt / 1e6, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax

    prec = (jax.lax.Precision.HIGH if "high" in sys.argv[1:]
            else None)  # None -> HIGHEST prepass (the >=130 dB config)
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4096]
    rng = np.random.default_rng(0)
    for fft_size in sizes:
        check_size(fft_size, prec, rng)


if __name__ == "__main__":
    sys.exit(main())
