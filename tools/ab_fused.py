"""Within-process A/B of the fused-kernel FFT dispatch (ops/fft.py hook).

The axon tunnel drifts >1.5x run to run, so cross-process comparisons lie
(PERF.md methodology).  This tool times each op BOTH ways in one process,
interleaved (fused, jnp, fused, jnp, ...), and reports medians.

Run:  python -m tools.ab_fused
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from simpledsp_tpu.ops import conv as _oconv
from simpledsp_tpu.ops import fft as _offt
from simpledsp_tpu.ops.conv import convolve
from simpledsp_tpu.ops.fft import fft_ri, rfft2_ri
from simpledsp_tpu.ops.fir import resample
from simpledsp_tpu.ops.spectral import istft_ri, stft_ri
from simpledsp_tpu.ops.transforms import analytic_ri, dct
from simpledsp_tpu.utils.benchmark import _force


def time_enqueued(fn, args, iters=8):
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


def ab(name, make_fn, args, n_samples, reps=5):
    # The dispatch flag is read at TRACE time — trace + compile each arm
    # eagerly while its flag is set (jit traces lazily at first call), and
    # verify the arms really differ by counting Pallas custom-calls in
    # the lowered HLO.
    _offt._FUSED_DISPATCH = True
    _oconv._FUSED_OLS = True
    f_on = jax.jit(make_fn())
    k_on = f_on.lower(*args).as_text().count("tpu_custom_call")
    _force(f_on(*args))
    _offt._FUSED_DISPATCH = False
    _oconv._FUSED_OLS = False
    f_off = jax.jit(make_fn())
    k_off = f_off.lower(*args).as_text().count("tpu_custom_call")
    _force(f_off(*args))
    _offt._FUSED_DISPATCH = True
    _oconv._FUSED_OLS = True
    on, off = [], []
    for _ in range(reps):
        on.append(time_enqueued(f_on, args))
        off.append(time_enqueued(f_off, args))
    t_on, t_off = sorted(on)[reps // 2], sorted(off)[reps // 2]
    print(json.dumps({
        "op": name,
        "fused_Msps": round(n_samples / t_on / 1e6, 1),
        "jnp_Msps": round(n_samples / t_off / 1e6, 1),
        "speedup": round(t_off / t_on, 2),
        "kernel_calls": [k_on, k_off],
    }), flush=True)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", flush=True)

    x1 = jnp.asarray(rng.standard_normal((1024, 4096)), dtype=jnp.float32)
    ab("dct2_4096", lambda: (lambda a: dct(a, type=2)), (x1,), x1.size)
    ab("hilbert_4096", lambda: (lambda a: analytic_ri(a)), (x1,), x1.size)

    xp = jnp.asarray(rng.standard_normal((512, 4099)), dtype=jnp.float32)
    ab("bluestein_4099",
       lambda: (lambda a: fft_ri(a, jnp.zeros_like(a))), (xp,), xp.size)

    xs = jnp.asarray(rng.standard_normal((64, 262144)), dtype=jnp.float32)
    ab("stft_4096", lambda: (lambda a: stft_ri(a, 4096, hop=2048)),
       (xs,), xs.size)
    sr, si = jax.jit(lambda a: stft_ri(a, 1024, hop=512))(xs)
    ab("istft_1024",
       lambda: (lambda a, b: istft_ri(a, b, 1024, hop=512)),
       (sr, si), xs.size)

    ab("resample_4096_to_3000", lambda: (lambda a: resample(a, 3000)),
       (x1,), x1.size)

    xc = jnp.asarray(rng.standard_normal((256, 65536)), dtype=jnp.float32)
    taps = np.asarray(rng.standard_normal(301), dtype=np.float32)
    ab("fftconvolve_301", lambda: (lambda a: convolve(a, taps, "same")),
       (xc,), xc.size)

    xi = jnp.asarray(rng.standard_normal((32, 512, 512)), dtype=jnp.float32)
    ab("rfft2_512", lambda: (lambda a: rfft2_ri(a)), (xi,), xi.size)
    from simpledsp_tpu.ops.conv2d import convolve2d
    k64 = np.asarray(rng.standard_normal((64, 64)), dtype=np.float32)
    ab("convolve2d_64x64_fft",
       lambda: (lambda a: convolve2d(a, k64, mode="same", method="fft")),
       (xi,), xi.size)


if __name__ == "__main__":
    main()
