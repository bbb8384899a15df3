"""Spectral analysis conveniences built on the batched FFT engine.

Welch power-spectral-density estimation and spectrograms — the analysis
layer a user of the reference's FFT typically builds by hand (frame,
window, transform, average).  Windows are host-side float64 constants;
transforms run through ops/fft (MXU matmuls, Pallas-fused on TPU via the
chain/kernels when applicable).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from simpledsp_tpu.ops import fft as _fft

__all__ = ["spectrogram_ri", "welch_psd", "window_taps"]


def window_taps(kind: str, n: int) -> np.ndarray:
    """Host-side analysis window, PERIODIC form (float64) — the spectral-
    analysis convention (scipy.signal.get_window default), not the
    symmetric filter-design form."""
    if kind in ("rect", "boxcar", "none"):
        return np.ones(n)
    import scipy.signal as sig

    return sig.get_window(kind, n, fftbins=True).astype(np.float64)


def _detrend_frames(frames: jnp.ndarray, detrend) -> jnp.ndarray:
    """Per-segment detrend (scipy.signal.welch semantics): ``'constant'``
    removes each segment's mean, ``'linear'`` its least-squares line;
    False/None is a no-op."""
    if detrend in (False, None, "none"):
        return frames
    if detrend == "constant":
        return frames - jnp.mean(frames, axis=-1, keepdims=True)
    if detrend == "linear":
        n = frames.shape[-1]
        # Least-squares [1, t] projection, basis precomputed host-side:
        # trend = B (B^+ x) with B (n, 2), pinv(B) (2, n).
        t = np.arange(n, dtype=np.float64)
        basis = np.stack([np.ones(n), t], axis=1)
        pinv = np.linalg.pinv(basis)
        coef = jnp.einsum("cn,...n->...c",
                          jnp.asarray(pinv, dtype=frames.dtype), frames)
        return frames - jnp.einsum("nc,...c->...n",
                                   jnp.asarray(basis, dtype=frames.dtype),
                                   coef)
    raise ValueError(f"unknown detrend {detrend!r}")


def _windowed_frames(x: jnp.ndarray, nfft: int, hop: Optional[int],
                     window: str, detrend) -> jnp.ndarray:
    hop = hop or nfft
    t = x.shape[-1]
    nframes = (t - nfft) // hop + 1
    if nframes < 1:
        raise ValueError(f"signal length {t} shorter than nfft={nfft}")
    starts = np.arange(nframes) * hop
    idx = jnp.asarray(starts[:, None] + np.arange(nfft)[None, :])
    frames = jnp.take(x, idx, axis=-1)  # (..., nframes, nfft)
    frames = _detrend_frames(frames, detrend)
    w = jnp.asarray(window_taps(window, nfft), dtype=x.dtype)
    return frames * w


def spectrogram_ri(x: jnp.ndarray, nfft: int = 1024, *,
                   hop: Optional[int] = None, window: str = "hann",
                   detrend=False, onesided: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Framed windowed FFT of a real signal: (..., T) -> (re, im) planes of
    shape (..., nframes, nfft) — or (..., nframes, nfft//2 + 1) with
    ``onesided=True``, which routes through the half-cost real-input
    transform (ops/fft.rfft_ri).  hop defaults to nfft (no overlap); for
    50% overlap pass hop=nfft//2.  ``detrend`` (False | 'constant' |
    'linear') removes each frame's mean/line BEFORE windowing."""
    frames = _windowed_frames(x, nfft, hop, window, detrend)
    if onesided:
        return _fft.rfft_ri(frames)
    return _fft.fft_ri(frames, jnp.zeros_like(frames))


def welch_psd(x: jnp.ndarray, nfft: int = 1024, *, fs: float = 1.0,
              window: str = "hann", overlap: bool = True,
              detrend="constant") -> Tuple[np.ndarray, jnp.ndarray]:
    """Welch-averaged one-sided PSD of a real signal.

    Returns (freqs (nfft//2+1,), psd (..., nfft//2+1)) with scipy.signal
    `welch(..., scaling='density')` conventions (validated in tests),
    including the per-segment ``detrend='constant'`` default.
    """
    hop = nfft // 2 if overlap else nfft
    sr, si = spectrogram_ri(x, nfft, hop=hop, window=window,
                            detrend=detrend, onesided=True)
    w = window_taps(window, nfft)
    power = sr * sr + si * si            # (..., nframes, nfft//2+1)
    half = jnp.mean(power, axis=-2)      # (..., nfft//2+1)
    # one-sided: double everything except DC — and Nyquist, which only
    # exists for even nfft.
    top = nfft // 2 if nfft % 2 == 0 else nfft // 2 + 1
    scale_mid = jnp.ones(nfft // 2 + 1).at[1:top].set(2.0)
    psd = half * scale_mid / (fs * np.sum(w ** 2))
    freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
    return freqs, psd
