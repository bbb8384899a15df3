"""TPU A/B: spectrogram_ri method='direct' (window-folded DFT matmul) vs
method='fft' (four-step engine) across nfft — validates the 'auto'
routing threshold in ops/spectral.spectrogram_ri.

Run from the repo root:  python -m tools.probe_stft_direct
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from simpledsp_tpu.ops.spectral import spectrogram_ri
from simpledsp_tpu.utils.benchmark import _force


def time_enqueued(fn, args, iters=8, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    t_loop = time.perf_counter() - t0
    t0 = time.perf_counter()
    _force(out)
    t_fetch = time.perf_counter() - t0
    return max(t_loop - t_fetch, 1e-9) / iters


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", flush=True)
    x = jnp.asarray(rng.standard_normal((64, 262144)), dtype=jnp.float32)
    for nfft in (256, 1024, 2048, 4096):
        for method in ("direct", "fft"):
            fn = jax.jit(lambda a, n=nfft, m=method: spectrogram_ri(
                a, n, hop=n // 2, window="hann", onesided=True, method=m))
            sec = time_enqueued(fn, (x,))
            print(json.dumps({
                "nfft": nfft, "method": method,
                "msamples_per_s": round(x.size / sec / 1e6, 1),
                "sec_per_call": round(sec, 6),
            }), flush=True)


if __name__ == "__main__":
    main()
