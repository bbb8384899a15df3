"""One-process shootout: dense vs two-step prepass projection (HIGHEST).

The axon tunnel drifts >1.5x run to run, so the two configs are measured
interleaved in ONE process (PERF.md methodology: chained loops, value-fetch
sync, fetch round-trip subtracted).  Also reports each config's SNR vs the
float64 scipy oracle — the two-step factorization's extra error source is
f32 rounding of the per-block k-vectors amplified by F-power cancellation
(at HIGH it measured 99.9 dB; the question is where HIGHEST lands).

Run from the repo root:  python -m tools.probe_projection
"""

import json
import time

import numpy as np


def measure(chain, x, s0, iters=16):
    import jax.numpy as jnp

    fwd = chain._jit
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


def snr_vs_oracle(chain, rng):
    import scipy.signal as sig

    from simpledsp_tpu.design.biquad import sos_matrix

    c_s, t_s = 2, 8 * 4096
    xs = rng.standard_normal((c_s, t_s))
    (sr, si), _ = chain(chain.frame_input(xs.astype(np.float32)))
    got = (np.asarray(sr).astype(np.float64)
           + 1j * np.asarray(si).astype(np.float64))
    y64 = sig.sosfilt(sos_matrix(chain.design), xs, axis=-1)
    ref = np.fft.rfft(y64.reshape(c_s, -1, 4096))
    packed = ref[..., :2048].copy()
    packed[..., 0] += 1j * ref[..., 2048].real
    err = got - packed
    return 10 * np.log10((np.abs(packed) ** 2).sum()
                         / max((np.abs(err) ** 2).sum(), 1e-300))


def main():
    import jax.numpy as jnp

    from simpledsp_tpu.models.northstar import NorthStarChain

    rng = np.random.default_rng(0)
    c, t = 64, 1 << 20
    chains = {}
    for proj in ("dense", "two_step"):
        chains[proj] = NorthStarChain(fft_size=4096, block_size=256,
                                      dtype=jnp.float32, precision=None,
                                      projection=proj)
    x = chains["dense"].frame_input(
        rng.standard_normal((c, t)).astype(np.float32))
    s0 = jnp.zeros((c, 2 * (chains["dense"].design.nsections + 1)),
                   jnp.float32)

    snrs = {k: round(float(snr_vs_oracle(ch, np.random.default_rng(1))), 1)
            for k, ch in chains.items()}
    print(json.dumps({"snr_db": snrs}), flush=True)

    results = {k: [] for k in chains}
    for rep in range(5):
        for k, ch in chains.items():
            dt = measure(ch, x, s0)
            results[k].append(round(c * t / dt / 1e6, 1))
            print(json.dumps({"rep": rep, "proj": k,
                              "Msps": results[k][-1]}), flush=True)
    print(json.dumps({
        "snr_db": snrs,
        "median_Msps": {k: sorted(v)[len(v) // 2]
                        for k, v in results.items()},
        "max_Msps": {k: max(v) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
