"""Fused Pallas TPU kernel for the batched four-step FFT.

The jnp four-step FFT (ops/fft.py) is algorithmically right for TPU — all
matmuls — but XLA materializes the inter-step intermediates (two cmatmuls,
twiddle, transpose, for re and im planes) in HBM, costing ~3x the roofline
traffic.  This kernel performs the ENTIRE transform of each frame tile in
VMEM: one read of the input planes, one write of the output planes, with
the DFT matrices and twiddles folded in as constant operands (the
reference's compile-time-table economics, reference:
include/sdsp/fft.h:264-265, done the Pallas way).

Mosaic constraint shaping: in-register reshapes may not split the lane
dimension, so frames enter the kernel pre-shaped (r, n1, n2) (a free HBM
view on the host), all contractions are 3-D `dot_general`s that keep the
lane dimension whole, and the final digit-reversal "transpose" is a
minor-dim `swapaxes` in VMEM.

    x (r, n1, n2)
    step 1: contract n1 with W1 -> (r, n2, k1)       (MXU)
    step 2: * twiddle' [n2, k1]                      (VPU, fused)
    step 3: contract n2 with W2 -> (r, k1, k2)       (MXU)
    step 4: swapaxes -> (r, k2, k1) == frames of y[k1 + n1 k2]

Supports N = n1 * n2 with n1, n2 <= 128 (N up to 16384); larger sizes
compose on the host.  Real-input forward transforms skip the known-zero
imaginary plane (1/3 less input traffic and step-1 work).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simpledsp_tpu.ops.fft import _dft_mats_f64, _twiddle_f64

__all__ = ["fft_frames_ri", "rfft_frames", "pallas_fft_supported"]


def _best_split(n: int) -> Optional[Tuple[int, int]]:
    """Factor n = n1 * n2 with n2 as LARGE as possible (<= 128).

    n2 is the lane dimension of the input/output blocks; lanes below 128
    waste most of the HBM<->VMEM DMA bandwidth (measured: 64-lane blocks
    move ~133 GB/s vs ~750 GB/s at 128 lanes on v5e), so DMA efficiency
    trumps matmul squareness.
    """
    for n2 in range(min(n, 128), 0, -1):
        if n % n2 == 0 and n // n2 <= 128:
            return n // n2, n2
    return None


def pallas_fft_supported(n: int) -> bool:
    return _best_split(n) is not None


@functools.lru_cache(maxsize=None)
def _consts(n: int, inverse: bool, dtype_name: str):
    """Constant tables for n = n1 * n2, in the kernel's layouts."""
    n1, n2 = _best_split(n)
    dt = np.dtype(dtype_name)
    w1c, w1s = _dft_mats_f64(n1)   # true (re, im): W = c + i s, s = -sin fwd
    w2c, w2s = _dft_mats_f64(n2)
    tc, ts = _twiddle_f64(n1, n2)  # T[k1, n2]
    sgn = 1.0 if not inverse else -1.0
    return (n1, n2,
            w1c.astype(dt), (sgn * w1s).astype(dt),
            w2c.astype(dt), (sgn * w2s).astype(dt),
            # twiddle transposed to the post-step-1 (n2, k1) layout
            tc.T.copy().astype(dt), (sgn * ts.T).copy().astype(dt))


def _make_kernel(real_input: bool, precision=None):
    # In-kernel dot precision: HIGHEST (6-pass bf16, true-f32, ~140 dB)
    # unless DEFAULT is explicitly requested (1-pass bf16, ~54 dB, ~3x
    # faster — for callers that do not care about accuracy).  A hand-rolled
    # 3-pass split-bf16 scheme was tried for the HIGH tier and measured
    # SLOWER than native HIGHEST on v5e (the VPU hi/lo splits and tripled
    # dot count cost more than the saved MXU passes), so HIGH maps up.
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(*refs):
        if real_input:
            (xr_ref, w1c_ref, w1s_ref, w2c_ref, w2s_ref, tc_ref, ts_ref,
             yr_ref, yi_ref) = refs
            xi_ref = None
        else:
            (xr_ref, xi_ref, w1c_ref, w1s_ref, w2c_ref, w2s_ref, tc_ref,
             ts_ref, yr_ref, yi_ref) = refs
        dtype = xr_ref.dtype

        def make_dot(dims):
            return functools.partial(
                jax.lax.dot_general, dimension_numbers=(dims, ((), ())),
                preferred_element_type=dtype, precision=prec)

        # step 1: W1 (k1, n1) x (r, n1, n2) contracting n1 -> (k1, r, n2)
        dot1 = make_dot(((1,), (1,)))
        # step 3: (k1, r, n2) x W2 (k2, n2) contracting n2 -> (k1, r, k2)
        dot3 = make_dot(((2,), (1,)))

        xr = xr_ref[:]
        c_r = dot1(w1c_ref[:], xr)
        s_r = dot1(w1s_ref[:], xr)
        if real_input:
            yr1, yi1 = c_r, s_r
        else:
            xi = xi_ref[:]
            yr1 = c_r - dot1(w1s_ref[:], xi)
            yi1 = dot1(w1c_ref[:], xi) + s_r

        # step 2: twiddle T (k1, n2) broadcast over the frame (middle) axis.
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        tr = yr1 * T_c - yi1 * T_s
        ti = yi1 * T_c + yr1 * T_s

        # step 3 -> (k1, r, k2); emitted as-is (bin reorder on the host).
        yr_ref[:] = dot3(tr, w2c_ref[:]) - dot3(ti, w2s_ref[:])
        yi_ref[:] = dot3(ti, w2c_ref[:]) + dot3(tr, w2s_ref[:])

    return body


def _vma(x):
    """Varying-mesh-axes of a traced value (None outside shard_map) —
    required on pallas out_shapes when called under shard_map."""
    try:
        return jax.typeof(x).vma or None
    except Exception:
        return None


def _fft_frames(xr: jnp.ndarray, xi: Optional[jnp.ndarray], *,
                inverse: bool, frames_per_tile: int = 8,
                interpret: bool = False, precision=None,
                scale: bool = True):
    """Core entry: frames (F, N) float planes -> (F, N) output planes.

    ``scale=False`` skips the inverse 1/N factor (the unscaled contract of
    ops.fft._fft_ri, whose public wrappers scale once at the top level)."""
    f, n = xr.shape
    split = _best_split(n)
    if split is None:
        raise ValueError(f"size {n} not supported by the fused kernel")
    # VMEM budget: multi-pass f32 matmuls keep ~32 live (r, n) planes of
    # scratch; stay under ~13 MB of the 16 MB VMEM.
    max_r = max(1, (13 << 20) // (20 * n * xr.dtype.itemsize))
    max_r = 1 << (max_r.bit_length() - 1)
    r = min(frames_per_tile, max_r)
    if not interpret:
        # Mosaic requires the output block's (frames, n2) tail dims to be
        # (8, 128)-divisible (or equal to the array's); keep r >= 8 and
        # zero-pad the frame count up to a tile multiple instead of
        # degrading the tile (max_r >= 8 for every supported n <= 16384).
        r = max(r, min(8, max_r))
    pad_f = -f % r
    if pad_f:
        zeros = jnp.zeros((pad_f, n), xr.dtype)
        xr = jnp.concatenate([xr, zeros], axis=0)
        if xi is not None:
            xi = jnp.concatenate([xi, zeros], axis=0)
    fp = f + pad_f
    real_input = xi is None

    n1, n2, w1c, w1s, w2c, w2s, tc, ts = _consts(
        n, inverse, np.dtype(xr.dtype).name)

    # Free HBM views: frames pre-split so the kernel never reshapes lanes.
    xr3 = xr.reshape(fp, n1, n2)
    args = (xr3,) if real_input else (xr3, xi.reshape(fp, n1, n2))

    kernel = _make_kernel(real_input, precision)
    grid = (fp // r,)
    in_blk = pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    # Output in (k1, frames, k2) layout: lane axis k2 = n2 (128-wide DMA).
    out_blk = pl.BlockSpec((n1, r, n2), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    # numpy (host) constants: they embed into the HLO directly at trace
    # time — a jnp array here would force a device->host fetch during
    # tracing (slow, and unsupported for some dtypes on this runtime).
    # twiddles enter in (n1, n2) orientation for the (k1, r, n2) layout.
    tables = tuple(np.ascontiguousarray(a) for a in
                   (w1c, w1s, w2c, w2s, tc.T, ts.T))
    vma = _vma(xr3)
    if vma:
        # Under shard_map every kernel operand must carry matching varying
        # axes; broadcast the (identical-everywhere) tables accordingly.
        tables = tuple(jax.lax.pcast(jnp.asarray(a), tuple(vma),
                                     to="varying") for a in tables)
    in_specs = ([in_blk] if real_input else [in_blk, in_blk]) + [
        const_spec(a) for a in tables]

    flops_per = 8 * n * (n1 + n2) * (0.75 if real_input else 1.0)
    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((n1, fp, n2), xr.dtype, vma=vma),
                   jax.ShapeDtypeStruct((n1, fp, n2), xr.dtype, vma=vma)),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per * fp),
            bytes_accessed=(2 if real_input else 3) * fp * n
            * xr.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*args + tables)
    # Digit-reversal reorder (k1, f, k2) -> (f, k2, k1) == bin order
    # k = k1 + n1 k2: one XLA transpose at near-roofline bandwidth; the
    # frame padding (if any) is dropped by the same slice-free reshape.
    yr = yr[:, :f].transpose(1, 2, 0).reshape(f, n)
    yi = yi[:, :f].transpose(1, 2, 0).reshape(f, n)
    if inverse and scale:
        s = jnp.asarray(1.0 / n, dtype=xr.dtype)
        return yr * s, yi * s
    return yr, yi


def fft_frames_ri(xr: jnp.ndarray, xi: jnp.ndarray, *,
                  inverse: bool = False, frames_per_tile: int = 8,
                  interpret: bool = False, precision=None):
    """Fused-kernel FFT over the last axis of (..., F, N) (re, im) planes."""
    shape = xr.shape
    yr, yi = _fft_frames(xr.reshape(-1, shape[-1]),
                         xi.reshape(-1, shape[-1]),
                         inverse=inverse, frames_per_tile=frames_per_tile,
                         interpret=interpret, precision=precision)
    return yr.reshape(shape), yi.reshape(shape)


def rfft_frames(x: jnp.ndarray, *, frames_per_tile: int = 8,
                interpret: bool = False, precision=None):
    """Fused-kernel forward FFT of REAL frames (..., N) -> (re, im) planes.

    Skips the known-zero imaginary input plane (1/3 fewer step-1 matmuls
    and 1/3 less input traffic than the complex path).
    """
    shape = x.shape
    yr, yi = _fft_frames(x.reshape(-1, shape[-1]), None, inverse=False,
                         frames_per_tile=frames_per_tile,
                         interpret=interpret, precision=precision)
    return yr.reshape(shape), yi.reshape(shape)
