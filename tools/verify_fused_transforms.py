"""On-chip parity of the transform layer after fused-kernel FFT dispatch.

Each op runs compiled on the TPU in f32 and is gated in SNR against its
f64 scipy/numpy oracle.  Run:  python -m tools.verify_fused_transforms
"""

import json
import sys

import numpy as np


def _snr(ref, got):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    err = got - ref
    return float(10 * np.log10((ref ** 2).sum()
                               / max((err ** 2).sum(), 1e-300)))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import scipy.fft as sfft
    import scipy.signal as sig

    from simpledsp_tpu.ops.conv import convolve
    from simpledsp_tpu.ops.fft import fft_ri, ifft_ri, irfft_ri, rfft_ri
    from simpledsp_tpu.ops.transforms import analytic_ri, dct
    from simpledsp_tpu.ops.spectral import istft_ri, stft_ri

    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        print(f"not a TPU backend: {dev}", file=sys.stderr)
        return 2

    rng = np.random.default_rng(3)
    out = {}

    def rec(k, v):
        out[k] = v
        print(f"{k}: {v:.1f} dB", flush=True)

    # fft round trip + vs numpy, N = 4096
    x = rng.standard_normal((4, 4096))
    xr = jnp.asarray(x, jnp.float32)
    yr, yi = jax.jit(lambda a: fft_ri(a, jnp.zeros_like(a)))(xr)
    ref = np.fft.fft(x)
    rec("fft4096", _snr(ref.real, yr))
    rec("fft4096_im", _snr(ref.imag, yi))
    zr, zi = jax.jit(lambda a, b: ifft_ri(a, b))(yr, yi)
    rec("ifft_roundtrip", _snr(x, zr))

    # rfft/irfft half packing, N = 8192
    x2 = rng.standard_normal((4, 8192))
    rr, ri_ = jax.jit(rfft_ri)(jnp.asarray(x2, jnp.float32))
    ref2 = np.fft.rfft(x2)
    rec("rfft8192", _snr(ref2.real, rr))
    xrec = jax.jit(irfft_ri)(rr, ri_)
    rec("irfft_roundtrip", _snr(x2, xrec))

    # dct-II, N = 4096
    d = jax.jit(lambda a: dct(a, 2, norm="ortho"))(jnp.asarray(x, jnp.float32))
    rec("dct2", _snr(sfft.dct(x, 2, norm="ortho"), d))

    # Bluestein (prime N = 4099)
    xp = rng.standard_normal((2, 4099))
    pr, pi = jax.jit(lambda a: fft_ri(a, jnp.zeros_like(a)))(
        jnp.asarray(xp, jnp.float32))
    refp = np.fft.fft(xp)
    rec("bluestein4099", _snr(refp.real, pr))

    # hilbert, N = 4096
    hr, hi = jax.jit(analytic_ri)(jnp.asarray(x, jnp.float32))
    refh = sig.hilbert(x)
    rec("hilbert", min(_snr(refh.real, hr), _snr(refh.imag, hi)))

    # convolve same (FFT route), n = 65536 m = 301
    xc = rng.standard_normal((2, 65536))
    h = sig.firwin(301, 0.1)
    yc = jax.jit(lambda a: convolve(a, h, mode="same"))(
        jnp.asarray(xc, jnp.float32))
    refc = np.stack([np.convolve(r, h, mode="same") for r in xc])
    rec("convolve_same", _snr(refc, yc))

    # stft + istft round trip, nfft = 4096 (the FFT-engine route)
    sr_, si_ = jax.jit(lambda a: stft_ri(a, 4096, hop=2048))(
        jnp.asarray(xc, jnp.float32))
    xrt = jax.jit(lambda a, b: istft_ri(a, b, 4096, hop=2048))(sr_, si_)
    t_valid = np.asarray(xrt).shape[-1]
    # WOLA edges lack overlap coverage (inherent taper, identical on CPU);
    # gate the interior.
    sl = slice(4096, t_valid - 4096)
    rec("istft_roundtrip", _snr(xc[..., sl], np.asarray(xrt)[..., sl]))

    ok = all(v > 100.0 for v in out.values())
    out = {k: round(v, 1) for k, v in out.items()}
    out["ok"] = ok
    out["device"] = str(dev)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
