"""Optimal FIR design: Parks-McClellan (remez), least-squares (firls),
and minimum-phase conversion (host-side float64).

The reference library carries no FIR design at all (its filters are biquad
IIR cascades, reference: include/sdsp/casc_2o_iir.h); these are the standard
design tools a DSP user expects next to the windowed-sinc family in
design/fir.py.  Everything here is the framework's own implementation of
the textbook algorithms — the Remez exchange runs on a barycentric-Lagrange
equioscillation solve in x = cos(2*pi*f), and synthesis inverts the exact
DTFT samples (no window) — validated against scipy.signal in tests.

All run once at trace time on the host; taps become constants in the
jitted HLO like the reference's compile-time tables (fft.h:197-214).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

__all__ = ["remez", "firls", "minimum_phase"]


# ---------------------------------------------------------------------------
# Remez exchange (Parks-McClellan)


def _pm_grid(num_taps: int, bands: np.ndarray, desired: np.ndarray,
             weight: np.ndarray, ftype: str, grid_density: int, nfcns: int):
    """Dense frequency grid (cycles/sample, 0..0.5) with per-point desired
    response and weight, per the classic PM grid rules."""
    delf = 0.5 / (grid_density * nfcns)
    grid, des, wt, seg = [], [], [], []
    for b in range(len(bands) // 2):
        f_lo, f_hi = bands[2 * b], bands[2 * b + 1]
        n_pts = max(int(math.ceil((f_hi - f_lo) / delf)) + 1, 2)
        f = np.linspace(f_lo, f_hi, n_pts)
        d = np.full(n_pts, desired[b])
        w = np.full(n_pts, weight[b])
        if ftype == "differentiator":
            # Desired is a slope: D = slope * f; relative-error weighting.
            d = desired[b] * f
            nz = desired[b] != 0
            if nz:
                w = weight[b] / np.maximum(f, 1e-30)
        grid.append(f)
        des.append(d)
        wt.append(w)
        seg.append(np.full(n_pts, b))
    return (np.concatenate(grid), np.concatenate(des), np.concatenate(wt),
            np.concatenate(seg))


def _pm_transform(grid, des, wt, neg: bool, nodd: bool):
    """Fold the linear-phase type's fixed trig factor into D and W so the
    exchange always fits a pure cosine polynomial P(f) = sum a_k cos(2πkf):
    H(f) = P(f) * q(f) with q = 1 / cos(πf) / sin(2πf) / sin(πf) for
    types I / II / III / IV."""
    if not neg:
        if nodd:
            q = np.ones_like(grid)
        else:
            q = np.cos(np.pi * grid)
    else:
        if nodd:
            q = np.sin(2 * np.pi * grid)
        else:
            q = np.sin(np.pi * grid)
    ok = np.abs(q) > 1e-12
    return des / np.where(ok, q, 1.0), wt * q, ok


def _bary_weights(x: np.ndarray):
    """Barycentric weights on nodes x, log-scaled against under/overflow:
    returns b with b_k proportional to 1/prod_j (x_k - x_j)."""
    n = len(x)
    d = x[:, None] - x[None, :]
    np.fill_diagonal(d, 1.0)
    logs = -np.sum(np.log(np.abs(d)), axis=1)
    sign = np.prod(np.sign(d), axis=1)
    return sign * np.exp(logs - logs.max())


def _remez_exchange(grid, des, wt, seg, nfcns: int, maxiter: int):
    """Core equioscillation exchange on the cosine-polynomial problem.
    Returns (extremal x nodes, node values C_k, delta)."""
    ngrid = len(grid)
    x_all = np.cos(2 * np.pi * grid)
    r = nfcns + 1  # extremal count
    iext = np.round(np.linspace(0, ngrid - 1, r)).astype(int)
    # Band-segment boundaries: extrema detection never looks across a
    # transition gap, and band edges are always candidates (classic PM).
    edges = np.nonzero(np.diff(seg) != 0)[0]
    seg_start = np.concatenate([[0], edges + 1])
    seg_end = np.concatenate([edges, [ngrid - 1]])
    is_edge = np.zeros(ngrid, dtype=bool)
    is_edge[seg_start] = True
    is_edge[seg_end] = True

    for _ in range(maxiter):
        xe = x_all[iext]
        b = _bary_weights(xe)
        signs = (-1.0) ** np.arange(r)
        delta = (b @ des[iext]) / (b @ (signs / wt[iext]))
        ce = des[iext] - signs * delta / wt[iext]

        # Barycentric evaluation of P on the whole grid through the first
        # nfcns nodes (degree nfcns-1 polynomial in x).
        xn, cn = xe[:nfcns], ce[:nfcns]
        bn = _bary_weights(xn)
        diff = x_all[:, None] - xn[None, :]
        hit = np.abs(diff) < 1e-14
        with np.errstate(divide="ignore", invalid="ignore"):
            k = bn[None, :] / diff
            p = (k @ cn) / k.sum(axis=1)
        rows = np.nonzero(hit.any(axis=1))[0]
        for i in rows:
            p[i] = cn[np.argmax(hit[i])]

        err = (p - des) * wt

        # Candidate extrema per band segment: interior local maxima of
        # |err| plus both segment ends.
        ae = np.abs(err)
        cand = []
        for s, e in zip(seg_start, seg_end):
            cand.append(s)
            for i in range(s + 1, e):
                if ae[i] >= ae[i - 1] and ae[i] >= ae[i + 1]:
                    cand.append(i)
            if e != s:
                cand.append(e)
        cand = np.unique(cand)

        # Enforce sign alternation: among same-sign runs keep the largest
        # (band edges win ties so transition edges stay represented).
        keep = []
        for i in cand:
            if keep and np.sign(err[i]) == np.sign(err[keep[-1]]):
                if ae[i] > ae[keep[-1]]:
                    keep[-1] = int(i)
            else:
                keep.append(int(i))
        # Trim to r extrema, dropping the weaker end first.
        while len(keep) > r:
            if ae[keep[0]] < ae[keep[-1]]:
                keep.pop(0)
            else:
                keep.pop()
        if len(keep) < r:
            # Degenerate (fewer alternations than needed this iteration):
            # pad with the strongest unused candidates, order preserved.
            extra = [int(i) for i in cand if int(i) not in set(keep)]
            extra.sort(key=lambda i: -ae[i])
            keep = sorted(set(keep) | set(extra[: r - len(keep)]))
            if len(keep) < r:
                # Not enough candidates at all: top up from the raw grid.
                rest = [i for i in np.argsort(-ae) if i not in set(keep)]
                keep = sorted(set(keep) | set(
                    int(i) for i in rest[: r - len(keep)]))
            keep = keep[:r]

        new_iext = np.asarray(keep[:r], dtype=int)
        if np.array_equal(new_iext, iext):
            break
        iext = new_iext

    xe = x_all[iext]
    b = _bary_weights(xe)
    signs = (-1.0) ** np.arange(r)
    delta = (b @ des[iext]) / (b @ (signs / wt[iext]))
    ce = des[iext] - signs * delta / wt[iext]
    return xe[:nfcns], ce[:nfcns], delta


def remez(num_taps: int, bands: Sequence[float], desired: Sequence[float],
          *, weight: Optional[Sequence[float]] = None,
          ftype: str = "bandpass", maxiter: int = 25,
          grid_density: int = 16, fs: float = 1.0) -> np.ndarray:
    """Parks-McClellan optimal equiripple FIR design
    (scipy.signal.remez semantics).

    ``bands`` is a flat, monotonic list of band edges in the units of
    ``fs``; ``desired`` one gain per band (a slope for
    ``ftype='differentiator'``); ``weight`` one relative ripple weight per
    band.  ``ftype`` selects symmetric ('bandpass') or antisymmetric
    ('differentiator', 'hilbert') linear phase.  Host float64; validated
    against scipy.signal.remez in tests.
    """
    if ftype not in ("bandpass", "differentiator", "hilbert"):
        raise ValueError(f"unknown ftype {ftype!r}")
    bands = np.asarray(bands, dtype=np.float64) / fs  # cycles/sample
    desired = np.asarray(desired, dtype=np.float64)
    if bands.ndim != 1 or len(bands) % 2 or len(bands) < 2:
        raise ValueError("bands must be a flat list of edge pairs")
    if (np.diff(bands) < 0).any() or bands[0] < 0 or bands[-1] > 0.5:
        raise ValueError("band edges must ascend within [0, fs/2]")
    if len(desired) != len(bands) // 2:
        raise ValueError("need one desired value per band")
    if weight is None:
        weight = np.ones(len(desired))
    weight = np.asarray(weight, dtype=np.float64)
    if len(weight) != len(desired):
        raise ValueError("need one weight per band")
    if num_taps < 3:
        raise ValueError("num_taps must be >= 3")

    neg = ftype != "bandpass"
    nodd = bool(num_taps % 2)
    nfcns = num_taps // 2
    if nodd and not neg:
        nfcns += 1

    grid, des, wt, seg = _pm_grid(num_taps, bands, desired, weight, ftype,
                                  grid_density, nfcns)
    des_t, wt_t, ok = _pm_transform(grid, des, wt, neg, nodd)
    grid, des_t, wt_t, seg = grid[ok], des_t[ok], wt_t[ok], seg[ok]

    xn, cn, _ = _remez_exchange(grid, des_t, wt_t, seg, nfcns, maxiter)

    # Synthesis: a length-L FIR is exactly determined by >= L uniform DTFT
    # samples.  Evaluate H(f) = P(f) * q(f) * phase on an rFFT grid and
    # invert — no window, no approximation.
    nfft = 1 << max(int(math.ceil(math.log2(2 * num_taps))), 4)
    f = np.arange(nfft // 2 + 1) / nfft
    bn = _bary_weights(xn)
    xg = np.cos(2 * np.pi * f)
    diff = xg[:, None] - xn[None, :]
    hit = np.abs(diff) < 1e-14
    with np.errstate(divide="ignore", invalid="ignore"):
        k = bn[None, :] / diff
        pf = (k @ cn) / k.sum(axis=1)
    rows = np.nonzero(hit.any(axis=1))[0]
    for i in rows:
        pf[i] = cn[np.argmax(hit[i])]
    if not neg:
        q = np.ones_like(f) if nodd else np.cos(np.pi * f)
    else:
        q = np.sin(2 * np.pi * f) if nodd else np.sin(np.pi * f)
    amp = pf * q
    phase = np.exp(-1j * np.pi * f * (num_taps - 1))
    if neg:
        # Antisymmetric taps: H = j A e^{-j pi f (N-1)} (type-III/IV
        # convention matching scipy's remez output sign).
        phase = phase * 1j
    h = np.fft.irfft(amp * phase, nfft)[:num_taps]
    return h


# ---------------------------------------------------------------------------
# Least-squares linear-phase design


def firls(num_taps: int, bands: Sequence[float], desired: Sequence[float],
          *, weight: Optional[Sequence[float]] = None,
          fs: float = 2.0) -> np.ndarray:
    """Least-squares linear-phase FIR (scipy.signal.firls semantics,
    type I: odd num_taps).

    ``bands`` is a flat list of edge pairs; ``desired`` gives the response
    at EACH edge (linear within a band); ``weight`` one value per band.
    Minimizes the weighted integrated squared error in closed form: the
    normal equations' Gram matrix is Toeplitz+Hankel of band sinc
    integrals.  Host float64; validated against scipy.signal.firls.
    """
    if num_taps % 2 == 0 or num_taps < 3:
        raise ValueError("firls needs odd num_taps >= 3 (type I)")
    bands = np.asarray(bands, dtype=np.float64) * (2.0 / fs)  # Nyquist = 1
    desired = np.asarray(desired, dtype=np.float64)
    if len(bands) % 2 or len(desired) != len(bands):
        raise ValueError("bands must be edge pairs with desired per edge")
    if (np.diff(bands) < 0).any() or bands[0] < 0 or bands[-1] > 1:
        raise ValueError("band edges must ascend within [0, fs/2]")
    nb = len(bands) // 2
    if weight is None:
        weight = np.ones(nb)
    weight = np.asarray(weight, dtype=np.float64)
    if len(weight) != nb:
        raise ValueError("need one weight per band")

    m = (num_taps - 1) // 2  # cosine-series order
    k = np.arange(m + 1, dtype=np.float64)

    def int_cos(n, f1, f2):
        """∫ cos(pi n f) df over [f1, f2] (Nyquist-normalized f)."""
        n = np.asarray(n, dtype=np.float64)
        out = np.where(n == 0, f2 - f1, 0.0)
        nz = n != 0
        ns = np.where(nz, n, 1.0)
        out = np.where(
            nz,
            (np.sin(np.pi * ns * f2) - np.sin(np.pi * ns * f1)) / (np.pi * ns),
            out)
        return out

    def int_fcos(n, f1, f2):
        """∫ f cos(pi n f) df over [f1, f2]."""
        n = np.asarray(n, dtype=np.float64)
        out = np.where(n == 0, 0.5 * (f2 * f2 - f1 * f1), 0.0)
        nz = n != 0
        ns = np.where(nz, n, 1.0) * np.pi
        val = ((np.cos(ns * f2) - np.cos(ns * f1)) / ns ** 2
               + (f2 * np.sin(ns * f2) - f1 * np.sin(ns * f1)) / ns)
        return np.where(nz, val, out)

    # Gram matrix Q[i,j] = sum_b w ∫ cos(pi i f) cos(pi j f) df
    #                    = 0.5 * (T[|i-j|] + H[i+j]).
    tvec = np.zeros(m + 1)
    hvec = np.zeros(2 * m + 1)
    bvec = np.zeros(m + 1)
    for b in range(nb):
        f1, f2 = bands[2 * b], bands[2 * b + 1]
        w = weight[b]
        tvec += w * int_cos(np.arange(m + 1), f1, f2)
        hvec += w * int_cos(np.arange(2 * m + 1), f1, f2)
        # Desired is linear over the band: D(f) = c0 + c1 f.
        d1, d2 = desired[2 * b], desired[2 * b + 1]
        if f2 > f1:
            c1 = (d2 - d1) / (f2 - f1)
            c0 = d1 - c1 * f1
        else:
            c0, c1 = d1, 0.0
        bvec += w * (c0 * int_cos(k, f1, f2) + c1 * int_fcos(k, f1, f2))

    i = np.arange(m + 1)
    q = 0.5 * (tvec[np.abs(i[:, None] - i[None, :])]
               + hvec[i[:, None] + i[None, :]])
    a = np.linalg.solve(q, bvec)

    # Cosine series -> symmetric taps: h[m] = a0, h[m±k] = a_k / 2.
    h = np.zeros(num_taps)
    h[m] = a[0]
    h[m + 1:] = a[1:] / 2.0
    h[:m] = h[m + 1:][::-1]
    return h


# ---------------------------------------------------------------------------
# Minimum-phase conversion


def minimum_phase(h: np.ndarray, *, n_fft: Optional[int] = None
                  ) -> np.ndarray:
    """Homomorphic minimum-phase conversion of a linear-phase FIR
    (scipy.signal.minimum_phase 'homomorphic' method): returns
    ``(len(h)+1)//2`` taps whose magnitude response is the square root of
    the input's — the standard half-length minimum-phase equivalent.

    Real cepstrum route: log|H| -> fold the anticausal cepstrum onto the
    causal side -> exp.  Host float64.
    """
    h = np.asarray(h, dtype=np.float64)
    if h.ndim != 1 or len(h) < 2:
        raise ValueError("h must be a 1-D filter with >= 2 taps")
    n_half = len(h) // 2
    if n_fft is None:
        n_fft = 2 ** int(math.ceil(math.log2(2 * (len(h) - 1) / 0.01)))
    if n_fft < len(h):
        raise ValueError("n_fft must be at least len(h)")
    mag = np.abs(np.fft.fft(h, n_fft))
    # Floor tiny bins so log is finite (scipy's relative epsilon trick).
    tiny = mag[mag > 0].min() * 1e-7 if (mag > 0).any() else 1e-300
    lm = 0.5 * np.log(mag ** 2 + tiny ** 2)  # log|H| with a smooth floor
    cep = np.fft.ifft(lm).real
    # Fold: keep quefrency 0, double 1..n-1 of the causal side (sqrt of
    # magnitude comes from halving the log first).
    win = np.zeros(n_fft)
    win[0] = 1.0
    stop = n_fft // 2
    win[1:stop] = 2.0
    if n_fft % 2 == 0:
        win[stop] = 1.0
    else:
        win[stop] = 2.0
    cep *= 0.5 * win  # 0.5: sqrt of the magnitude response
    h_min = np.fft.ifft(np.exp(np.fft.fft(cep))).real
    n_out = n_half + len(h) % 2
    return h_min[:n_out]
