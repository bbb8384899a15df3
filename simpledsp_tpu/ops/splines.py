"""B-spline interpolation family (scipy.signal parity, host-side f64).

The spline PREFILTER is the interesting part: converting samples to
B-spline coefficients inverts the sampled basis — a first-order IIR run
forward and backward with exact mirror-symmetric initialization.  Here
that two-pass filter IS the framework's own :func:`ops.lfilter.lfilter`
with :func:`lfiltic`-style states (the same machinery the rest of the
repo uses), not a separate C routine.  Basis evaluation uses the
closed-form cubic/quadratic B-spline pieces.  Validated against
scipy.signal in tests/test_splines.py.

The 2-D smoothing-spline variants (cspline2d/qspline2d/spline_filter)
remain dispositioned in PARITY.md; :func:`sepfir2d` (separable
mirror-boundary FIR, the piece the 2-D pipelines build on) is provided.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["gauss_spline", "cspline1d", "qspline1d", "cspline1d_eval",
           "qspline1d_eval", "sepfir2d"]


def gauss_spline(x, n: int):
    """Gaussian approximation of an order-``n`` B-spline
    (scipy.signal.gauss_spline semantics)."""
    x = jnp.asarray(x)
    sigsq = (n + 1) / 12.0
    return jnp.exp(-x * x / (2.0 * sigsq)) / math.sqrt(2.0 * np.pi * sigsq)


def _spline_coeff(signal: np.ndarray, zi: float, gain: float) -> np.ndarray:
    """Forward+backward first-order inverse-basis filter with the exact
    mirror-symmetric initialization (scipy's _cubic_coeff/_quadratic_coeff
    recurrences, run through the framework lfilter)."""
    from simpledsp_tpu.ops.lfilter import lfilter_scan

    x = np.asarray(signal, dtype=np.float64)
    k = x.size
    powers = zi ** np.arange(k)
    if k == 1:
        # scipy's single-sample branch returns BEFORE its gain multiply
        # (an upstream quirk) — replicated for exact parity.
        yplus = x[0] + zi * np.sum(powers * x)
        return np.atleast_1d(zi / (zi - 1.0) * yplus)
    # Forward: yplus[n] = x[n] + zi yplus[n-1], seeded by the mirror sum.
    y0 = np.sum(powers * x)
    a = np.asarray([1.0, -zi])
    # DF2T state for b=[1], a=[1,-zi] reproducing y[-1] = y0: z0 = zi*y0.
    yplus, _ = lfilter_scan([1.0], a, jnp.asarray(x),
                            zi=jnp.asarray([zi * y0]))
    yplus = np.asarray(yplus)
    # Backward: out[k] = zi (out[k+1] - yplus[k]), anchored at the end.
    out_last = zi / (zi - 1.0) * yplus[-1]
    # Same filter with b=[-zi] on the reversed sequence; state makes the
    # first output equal zi*(out_last - yplus[-2]).
    rev, _ = lfilter_scan([-zi], a, jnp.asarray(yplus[-2::-1]),
                          zi=jnp.asarray([zi * out_last]))
    out = np.concatenate([np.asarray(rev)[::-1], [out_last]])
    return out * gain


def cspline1d(signal, lamb: float = 0.0) -> np.ndarray:
    """Cubic-spline coefficients of equally spaced samples
    (scipy.signal.cspline1d semantics; only the exact lamb=0 form —
    smoothing splines are out of scope here as in qspline1d)."""
    if lamb != 0.0:
        raise ValueError("smoothing (lamb != 0) not supported")
    return _spline_coeff(signal, -2.0 + math.sqrt(3.0), 6.0)


def qspline1d(signal, lamb: float = 0.0) -> np.ndarray:
    """Quadratic-spline coefficients (scipy.signal.qspline1d semantics)."""
    if lamb != 0.0:
        raise ValueError("smoothing quadratic splines not supported")
    return _spline_coeff(signal, -3.0 + 2.0 * math.sqrt(2.0), 8.0)


def _bspline3(x: np.ndarray) -> np.ndarray:
    """Cubic B-spline basis (closed form)."""
    ax = np.abs(x)
    out = np.where(ax <= 1.0, 2.0 / 3.0 - ax * ax + ax ** 3 / 2.0, 0.0)
    mid = (ax > 1.0) & (ax < 2.0)
    out = np.where(mid, (2.0 - ax) ** 3 / 6.0, out)
    return out


def _bspline2(x: np.ndarray) -> np.ndarray:
    """Quadratic B-spline basis (closed form)."""
    ax = np.abs(x)
    out = np.where(ax <= 0.5, 0.75 - ax * ax, 0.0)
    mid = (ax > 0.5) & (ax < 1.5)
    out = np.where(mid, (ax - 1.5) ** 2 / 2.0, out)
    return out


def _mirror_fold(t: np.ndarray, n: int) -> np.ndarray:
    """Fold arbitrary sample positions into [0, n-1] by mirror symmetry
    about both ends (one modular step instead of scipy's recursion)."""
    period = 2.0 * (n - 1)
    if period <= 0:
        return np.zeros_like(t)
    t = np.abs(t) % period
    return np.minimum(t, period - t)


def _spline_eval(cj, newx, dx: float, x0: float, basis, support: int
                 ) -> np.ndarray:
    cj = np.asarray(cj, dtype=np.float64)
    if cj.size == 0:
        raise ValueError("spline coefficients must not be empty")
    t = _mirror_fold((np.asarray(newx, dtype=np.float64) - x0) / float(dx),
                     cj.size)
    if support == 4:
        jlower = np.floor(t - 2.0).astype(np.int64) + 1
    else:
        jlower = np.floor(t - 1.5).astype(np.int64) + 1
    res = np.zeros_like(t)
    for i in range(support):
        thisj = jlower + i
        indj = np.clip(thisj, 0, cj.size - 1)
        res += cj[indj] * basis(t - thisj)
    return res


def cspline1d_eval(cj, newx, dx: float = 1.0, x0: float = 0.0) -> np.ndarray:
    """Evaluate a cubic spline at ``newx`` from its coefficients
    (scipy.signal.cspline1d_eval semantics: mirror-symmetric extension
    beyond the knots, handled here by one modular fold instead of
    recursion)."""
    return _spline_eval(cj, newx, dx, x0, _bspline3, 4)


def qspline1d_eval(cj, newx, dx: float = 1.0, x0: float = 0.0) -> np.ndarray:
    """Evaluate a quadratic spline (scipy.signal.qspline1d_eval
    semantics)."""
    return _spline_eval(cj, newx, dx, x0, _bspline2, 3)


def sepfir2d(x: jnp.ndarray, hrow, hcol) -> jnp.ndarray:
    """Separable 2-D FIR with mirror-symmetric boundaries and same-size
    output (scipy.signal.sepfir2d semantics; odd-length filters).
    Batched over leading axes; the two 1-D passes are the framework's
    shifted-FMA convolutions on reflected-padded planes."""
    hrow = np.asarray(hrow, dtype=np.float64)
    hcol = np.asarray(hcol, dtype=np.float64)
    if hrow.ndim != 1 or hcol.ndim != 1 or not (hrow.size % 2) \
            or not (hcol.size % 2):
        raise ValueError("hrow and hcol must be 1-D with odd length")
    x = jnp.asarray(x)
    if x.ndim < 2:
        raise ValueError("sepfir2d needs at least 2 dims")

    def pass1d(img, taps, axis):
        half = taps.size // 2
        pad = [(0, 0)] * img.ndim
        pad[axis] = (half, half)
        xp = jnp.pad(img, pad, mode="symmetric") if half else img
        n_out = img.shape[axis]
        taps_j = jnp.asarray(taps[::-1], dtype=img.dtype)
        acc = jnp.zeros_like(img)
        for j in range(taps.size):
            sl = [slice(None)] * img.ndim
            sl[axis] = slice(j, j + n_out)
            acc = acc + taps_j[j] * xp[tuple(sl)]
        return acc

    return pass1d(pass1d(x, hrow, -1), hcol, -2)

