"""Fused Pallas TPU kernel for direct VALID 2-D convolution.

The XLA shifted-FMA route (ops/conv2d.py:_conv2d_direct_real) re-reads
the image from HBM once per tap position — at 9x9 that is 81 passes over
the input, and the measured ~1.6 Gs/s on v5e sits right at
81 reads x 4 B x rate ~= the 756 GB/s HBM roofline: the op is
bandwidth-bound on redundant reads, not compute-bound.  This kernel
keeps the whole padded image resident in VMEM per batch element and does
the kh*kw shifted FMAs from on-chip memory, so HBM sees exactly one read
of the image and one write of the output.

Layout: grid (B, row_tiles); the input BlockSpec maps every row tile of
a batch element to the SAME (1, Hp, Wp) block, so Pallas leaves it
resident across the inner grid axis (re-DMAed only when b changes); the
output block is (1, th, OW).  Tap values are Python floats baked into
the unrolled FMA chain (the reference's compile-time-table economics —
reference: include/sdsp/fft.h:264-265).  Row offsets use pl.ds with the
grid-derived base; lane offsets are static slices of the loaded rows
(Mosaic lane shifts).

Gating (conv2d_fused_supported): f32, taps concrete and <= 169 (13x13 —
larger kernels take the FFT route anyway), and the resident image +
accumulator fit the ~16 MB VMEM budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv2d_valid_fused", "conv2d_fused_supported"]

_MAX_TAPS = 169


def conv2d_fused_supported(hp: int, wp: int, kh: int, kw: int,
                           itemsize: int = 4) -> bool:
    """Shape gate: resident padded image (double-buffered) + output tile
    + slice temporaries within the VMEM budget."""
    if kh * kw > _MAX_TAPS:
        return False
    ow = wp - kw + 1
    th = min(128, hp - kh + 1)
    resident = 2 * hp * wp * itemsize          # double-buffered input
    work = 6 * th * max(ow, wp) * itemsize     # acc + rows + shift temps
    return resident + work <= 14 << 20


def _make_body(k64: np.ndarray, th: int, ow: int, wp: int, lh: int):
    kh, kw = k64.shape
    taps = [[float(k64[i, j]) for j in range(kw)] for i in range(kh)]

    def body(x_ref, o_ref):
        # ONE aligned load per tile (Mosaic requires dynamic sublane
        # starts provably % 8 == 0 — th is, th + i is not), then the
        # per-tap row shifts are static register slices.
        base = pl.program_id(1) * th
        rows_all = x_ref[0, pl.ds(base, lh), :]            # (lh, Wp)
        acc = None
        for i in range(kh):
            rows = jax.lax.slice(rows_all, (i, 0), (i + th, wp))
            for j in range(kw):
                if taps[i][j] == 0.0:
                    continue
                term = taps[i][j] * jax.lax.slice(
                    rows, (0, j), (th, j + ow))
                acc = term if acc is None else acc + term
        if acc is None:                                    # all-zero taps
            acc = jnp.zeros((th, ow), o_ref.dtype)
        o_ref[0] = acc

    return body


def conv2d_valid_fused(xp: jnp.ndarray, k64: np.ndarray, *,
                       interpret: bool = False) -> jnp.ndarray:
    """VALID 2-D convolution of the pre-padded (..., Hp, Wp) f32 image
    with the already-FLIPPED concrete (kh, kw) kernel — the fused
    drop-in for ops/conv2d.py:_conv2d_direct_real."""
    k64 = np.asarray(k64, dtype=np.float64)
    kh, kw = k64.shape
    lead = xp.shape[:-2]
    hp, wp = xp.shape[-2:]
    oh, ow = hp - kh + 1, wp - kw + 1
    if oh < 1 or ow < 1:
        raise ValueError(f"image {hp}x{wp} smaller than kernel {kh}x{kw}")
    x3 = xp.reshape((-1, hp, wp))
    b = x3.shape[0]
    th = min(64, -(-oh // 8) * 8)      # multiple of 8: aligned pl.ds base
    nrt = -(-oh // th)
    lh = -(-(th + kh - 1) // 8) * 8    # aligned super-slice length
    # Pad rows so the last tile's super-slice stays in bounds.
    need = (nrt - 1) * th + lh
    if need > hp:
        x3 = jnp.pad(x3, [(0, 0), (0, need - hp), (0, 0)])
    body = _make_body(k64, th, ow, wp, lh)
    # The unrolled tap chain keeps several (th, ow) slices live; give
    # Mosaic stack headroom beyond the 16 MB default when the estimate
    # is tight (same adaptive pattern as kernels/chain.py).
    scoped_est = (kh + 6) * th * wp * xp.dtype.itemsize
    cparams = (pltpu.CompilerParams(
        vmem_limit_bytes=int(min(2 * scoped_est + (8 << 20), 100 << 20)))
        if scoped_est > (10 << 20) else None)
    out = pl.pallas_call(
        body,
        grid=(b, nrt),
        in_specs=[pl.BlockSpec((1, x3.shape[1], wp), lambda bb, r: (bb, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, ow), lambda bb, r: (bb, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nrt * th, ow), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * kh * kw * b * oh * ow,
            bytes_accessed=(b * hp * wp + b * oh * ow) * xp.dtype.itemsize,
            transcendentals=0),
        compiler_params=cparams,
        interpret=interpret,
    )(x3)
    return out[:, :oh].reshape(lead + (oh, ow))
