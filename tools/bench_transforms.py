"""TPU smoke + throughput of the extended transform layer (round 3 ops):
DCT, Hilbert/analytic, arbitrary-N (Bluestein) FFT, STFT/ISTFT, mel/MFCC,
Fourier resample, FFT convolve.

Run on the real chip from the repo root:  python -m tools.bench_transforms

Prints one JSON line per op (Msamples/s of INPUT samples).  Methodology:
enqueue `iters` independent calls without intermediate syncs (the tunnel
pipelines dispatch), force ONE data-dependent fetch at the end, subtract a
calibrated fetch round-trip (PERF.md "Measurement methodology").
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from simpledsp_tpu.models.audio import MelSpectrogram, mfcc
from simpledsp_tpu.ops.conv import convolve
from simpledsp_tpu.ops.fft import fft_ri
from simpledsp_tpu.ops.fir import resample
from simpledsp_tpu.ops.spectral import istft_ri, stft_ri
from simpledsp_tpu.ops.transforms import analytic_ri, dct
from simpledsp_tpu.utils.benchmark import _force


def time_enqueued(fn, args, iters=8, warmup=2, reps=5):
    """Median of `reps` enqueued loops.  A single post-compile window is
    NOT enough on this runtime: per-executable warm-up spans the first
    ~dozen calls (measured: dct2 read 1.8 Gs/s cold vs 18 Gs/s warm —
    fast ops were understated up to 10x in the round-3 table; slow ops
    with >= 5 ms calls were unaffected)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        t_loop = time.perf_counter() - t0
        t0 = time.perf_counter()
        _force(out)
        t_fetch = time.perf_counter() - t0
        ts.append(max(t_loop - t_fetch, 1e-9) / iters)
    return sorted(ts)[reps // 2]


def row(name, fn, args, n_samples, iters=8):
    sec = time_enqueued(jax.jit(fn), args, iters=iters)
    print(json.dumps({
        "metric": f"{name}_throughput",
        "value": round(n_samples / sec / 1e6, 1),
        "unit": "Msamples/s",
        "detail": {"seconds_per_call": round(sec, 6),
                   "device": jax.devices()[0].device_kind},
    }), flush=True)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", flush=True)

    x1 = jnp.asarray(rng.standard_normal((1024, 4096)), dtype=jnp.float32)
    row("dct2_4096", lambda a: dct(a, type=2), (x1,), x1.size)
    row("hilbert_4096", analytic_ri, (x1,), x1.size)

    xp = jnp.asarray(rng.standard_normal((512, 4099)), dtype=jnp.float32)
    row("fft_bluestein_4099", lambda a: fft_ri(a, jnp.zeros_like(a)),
        (xp,), xp.size)

    xs = jnp.asarray(rng.standard_normal((64, 262144)), dtype=jnp.float32)
    row("stft_1024", lambda a: stft_ri(a, 1024, hop=512), (xs,), xs.size)
    sr, si = jax.jit(lambda a: stft_ri(a, 1024, hop=512))(xs)
    row("istft_1024", lambda a, b: istft_ri(a, b, 1024, hop=512),
        (sr, si), xs.size)

    melspec = MelSpectrogram(512, 256, 64, 16000.0)
    row("mel_spectrogram_512x64", melspec, (xs,), xs.size)
    row("mfcc13", lambda a: mfcc(a, 13, nfft=512, hop=256, n_mels=64,
                                 fs=16000.0), (xs,), xs.size)

    row("resample_4096_to_3000", lambda a: resample(a, 3000), (x1,),
        x1.size)

    xc = jnp.asarray(rng.standard_normal((256, 65536)), dtype=jnp.float32)
    taps = np.asarray(rng.standard_normal(301), dtype=np.float32)
    row("fftconvolve_301", lambda a: convolve(a, taps, "same"),
        (xc,), xc.size)

    from simpledsp_tpu.ops.conv2d import convolve2d
    from simpledsp_tpu.ops.fft import rfft2_ri

    xi = jnp.asarray(rng.standard_normal((32, 512, 512)), dtype=jnp.float32)
    row("rfft2_512", rfft2_ri, (xi,), xi.size)
    k9 = np.asarray(rng.standard_normal((9, 9)), dtype=np.float32)
    row("convolve2d_9x9", lambda a: convolve2d(a, k9, mode="same"),
        (xi,), xi.size)
    k64 = np.asarray(rng.standard_normal((64, 64)), dtype=np.float32)
    row("convolve2d_64x64_fft",
        lambda a: convolve2d(a, k64, mode="same", method="fft"),
        (xi,), xi.size)


if __name__ == "__main__":
    main()
