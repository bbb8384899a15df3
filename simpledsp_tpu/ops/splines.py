"""B-spline interpolation family (scipy.signal parity, host-side f64).

The spline PREFILTER is the interesting part: converting samples to
B-spline coefficients inverts the sampled basis — a first-order IIR run
forward and backward with exact mirror-symmetric initialization.  Here
that two-pass filter IS the framework's own :func:`ops.lfilter.lfilter`
with :func:`lfiltic`-style states (the same machinery the rest of the
repo uses), not a separate C routine.  Basis evaluation uses the
closed-form cubic/quadratic B-spline pieces.  Validated against
scipy.signal in tests/test_splines.py.

The exact-interpolation regime is complete in 1-D and 2-D
(cspline1d/2d, qspline1d/2d via the separable :func:`symiirorder1`
passes) plus :func:`sepfir2d`; only the SMOOTHING-spline branch
(lamb > 0: symiirorder2 + spline_filter) remains dispositioned in
PARITY.md.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["gauss_spline", "cspline1d", "qspline1d", "cspline1d_eval",
           "qspline1d_eval", "sepfir2d", "symiirorder1", "cspline2d",
           "qspline2d"]


def gauss_spline(x, n: int):
    """Gaussian approximation of an order-``n`` B-spline
    (scipy.signal.gauss_spline semantics)."""
    x = jnp.asarray(x)
    sigsq = (n + 1) / 12.0
    return jnp.exp(-x * x / (2.0 * sigsq)) / math.sqrt(2.0 * np.pi * sigsq)


def _iir1_np(x: np.ndarray, z1: float, y_prev: np.ndarray) -> np.ndarray:
    """First-order recurrence y[k] = x[k] + z1 y[k-1] over the LAST axis
    in pure NumPy float64 (these are host-side design/analysis filters:
    no JAX backend, no x64 flag dependence, no device dispatch).  Chunked
    lower-triangular Toeplitz matmuls — O(n L) with L = 64, ~vectorized.
    ``y_prev``: (...,) carried value y[-1]."""
    n = x.shape[-1]
    L = 64
    powers = z1 ** np.arange(1, L + 1)
    tt = np.zeros((L, L))
    for d in range(L):
        tt[np.arange(d, L), np.arange(L - d)] = z1 ** d
    out = np.empty_like(x)
    carry = np.asarray(y_prev, dtype=np.float64)
    for s0 in range(0, n, L):
        chunk = x[..., s0: s0 + L]
        m = chunk.shape[-1]
        y = np.einsum("kj,...j->...k", tt[:m, :m], chunk) \
            + carry[..., None] * powers[:m]
        out[..., s0: s0 + L] = y
        carry = y[..., -1]
    return out


def _spline_coeff(signal: np.ndarray, zi: float, gain: float) -> np.ndarray:
    """Forward+backward first-order inverse-basis filter with the exact
    mirror-symmetric initialization (scipy's _cubic_coeff/_quadratic_coeff
    recurrences), in host NumPy float64."""
    x0 = np.asarray(signal)
    if np.iscomplexobj(x0):
        raise ValueError("complex signals are carried as RI planes "
                         "framework-wide; spline prefilters take real "
                         "arrays")
    x = x0.astype(np.float64)
    k = x.size
    powers = zi ** np.arange(k)
    if k == 1:
        # scipy's single-sample branch returns BEFORE its gain multiply
        # (an upstream quirk) — replicated for exact parity.
        yplus = x[0] + zi * np.sum(powers * x)
        return np.atleast_1d(zi / (zi - 1.0) * yplus)
    # Forward: yplus[n] = x[n] + zi yplus[n-1], seeded by the mirror sum.
    y0 = np.sum(powers * x)
    yplus = _iir1_np(x, zi, np.asarray(y0))
    # Backward: out[k] = zi (out[k+1] - yplus[k]), anchored at the end.
    out_last = zi / (zi - 1.0) * yplus[-1]
    rev = _iir1_np(-zi * yplus[-2::-1], zi, np.asarray(out_last))
    out = np.concatenate([rev[::-1], [out_last]])
    return (out * gain).astype(x0.dtype, copy=False) \
        if np.issubdtype(x0.dtype, np.floating) else out * gain


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


def symiirorder1(signal, c0: float, z1: float,
                 precision: float = -1.0) -> np.ndarray:
    """First-order mirror-symmetric IIR c0 / ((1 - z1 z^-1)(1 - z1 z))
    (scipy.signal.symiirorder1 semantics), batched over leading axes:
    forward and backward first-order passes through the framework's own
    lfilter, with the initial condition x[0] + z1 sum_k z1^k x[k]
    truncated at the first k with |z1|^k < precision (raises if the
    truncated sum has not converged within the signal — scipy's rule,
    pinned empirically)."""
    xin = np.asarray(signal)
    if np.iscomplexobj(xin):
        raise ValueError("complex signals are carried as RI planes "
                         "framework-wide; symiirorder1 takes real arrays")
    x = xin.astype(np.float64)
    if abs(z1) >= 1.0:
        raise ValueError("|z1| must be less than 1.0")
    if x.ndim == 0 or x.shape[-1] < 2:
        raise ValueError("signal must have at least 2 samples")
    n = x.shape[-1]
    if precision <= 0.0 or precision >= 1.0:
        # scipy's default: machine-epsilon truncation (agreement with
        # scipy's own default at ~1e-12), same raise rule as explicit.
        precision = float(np.finfo(np.float64).eps)
    k_conv = int(np.ceil(np.log(precision) / np.log(abs(z1)))) \
        if abs(z1) > 0 else 1
    if k_conv > n:
        raise ValueError("Sum to find symmetric boundary conditions "
                         "did not converge.")
    powers = z1 ** np.arange(k_conv)
    y0 = x[..., 0] + z1 * np.einsum("k,...k->...", powers,
                                    x[..., :k_conv])
    y1_tail = _iir1_np(x[..., 1:], z1, np.asarray(y0))
    y1 = np.concatenate([y0[..., None], y1_tail], axis=-1)
    out_last = -c0 / (z1 - 1.0) * y1[..., -1]
    rev = _iir1_np(c0 * y1[..., -2::-1], z1, np.asarray(out_last))
    out = np.concatenate([rev[..., ::-1], out_last[..., None]], axis=-1)
    return out.astype(xin.dtype, copy=False) \
        if np.issubdtype(xin.dtype, np.floating) else out


def _spline2d(signal, c0: float, z1: float, precision: float) -> np.ndarray:
    if precision <= 0.0 or precision >= 1.0:
        # scipy's dtype rule, applied BEFORE the symiir passes.
        dt = np.asarray(signal).dtype
        precision = 1e-3 if dt in (np.float32, np.complex64) else 1e-6
    out = symiirorder1(signal, c0, z1, precision)
    out = np.moveaxis(symiirorder1(np.moveaxis(out, -2, -1), c0, z1,
                                   precision), -1, -2)
    return out


def cspline2d(signal, lamb: float = 0.0,
              precision: float = -1.0) -> np.ndarray:
    """2-D cubic-spline coefficients (scipy.signal.cspline2d semantics
    for the exact-interpolation regime lamb <= 1/144: the separable
    symiirorder1 prefilter along both trailing axes; the smoothing-
    spline branch remains dispositioned)."""
    if lamb > 1.0 / 144.0:
        raise ValueError("smoothing splines (lamb > 1/144) are "
                         "dispositioned — see PARITY.md")
    r = -2.0 + math.sqrt(3.0)
    return _spline2d(signal, -r * 6.0, r, precision)


def qspline2d(signal, lamb: float = 0.0,
              precision: float = -1.0) -> np.ndarray:
    """2-D quadratic-spline coefficients (scipy.signal.qspline2d
    semantics; lamb must be 0, as in scipy)."""
    if lamb > 0.0:
        raise ValueError("lambda must be negative or zero")
    r = -3.0 + 2.0 * math.sqrt(2.0)
    return _spline2d(signal, -r * 8.0, r, precision)
