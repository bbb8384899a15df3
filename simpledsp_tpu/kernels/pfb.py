"""Fused Pallas TPU kernel for the polyphase filter-bank receiver banks.

The XLA channelizer (ops/channelizer.py:_run_ri_cm) is conv-lowering
bound: its stride-M masked conv burns (M-1)/M of its MACs on structural
zeros and still re-reads the signal for the demodulator pass.  This kernel
runs the WHOLE per-channel receiver front-end in VMEM per time tile:

    branch FIR (K lane-shifted VPU FMAs, zero wasted MACs)
      -> M-point inverse DFT across branches (one MXU dot, sublane contract)
      -> FM discriminator / AM envelope (VPU, fused)

so each input plane is read from HBM exactly once and only the
demodulated audio-rate signal is written back.

Layout contract (the channel-major trick, cf. ops/channelizer.py): the
history-prefixed input planes are framed to (B, nfr, M) — a FREE row-major
reshape — then transposed once in XLA to (B, M, nfr) so the kernel's lane
axis is the long frame/time axis and every HBM<->VMEM DMA moves full
tiles.  Sublane m of the transposed frame holds samples x[f*M + m], which
is branch r = M-1-m's input lag line; the flip is folded into the tap and
DFT tables at trace time (see PFBOperators).

Branch math (ops/channelizer.py docstring, verified against scipy in
tests/test_channelizer_demod.py):

    u[g, r]  = sum_j h[jM+r] * xp[(g+K-1-j)M + M-1-r]
    ub[m, g] = u[g, M-1-m] = sum_j taps_t[m, j] * Ft[m, g+K-1-j]
    y[c, g]  = sum_m Wf[c, m] ub[m, g],   Wf[c, m] = e^{+2 pi i c(M-1-m)/M}

Each grid step manually DMAs its (M, gt + halo) overlapping tile from HBM
(overlap = the K-1 frame halo; plain BlockSpecs cannot express it), and
the FM phase carry lives in VMEM scratch across the sequential grid —
exact streaming semantics with zero recompute at tile seams.

Mosaic alignment contract (learned on-chip: a gt + K - 1 = 527-lane slice
fails "must be aligned to tiling (128)"): compiled DMA slices need
128-multiple lane starts AND lengths.  So the compiled path uses
halo = roundup(K - 1, 128) and requires g % 128 == 0; the caller pads the
framed input to >= g + halo lanes (PFBChannelizer.frames_t(pad_to=...) —
pad values are never read: the FIR touches only lags < K).  The over-read
is halo - (K - 1) < 128 lanes per >= 128-lane tile, amortized away at the
default gt = 1024.  Interpret mode keeps halo = K - 1 (no constraint).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["PFBOperators", "pfb_fm_frames", "pfb_am_frames",
           "pfb_channelize_frames"]


class PFBOperators:
    """Host-precomputed f64 tables for one (M, K) prototype filter,
    in the kernel's flipped-row layout."""

    def __init__(self, branch_taps: np.ndarray, dtype=jnp.float32):
        branch = np.asarray(branch_taps, dtype=np.float64)  # (M, K)
        m = branch.shape[0]
        npdt = np.dtype(jnp.dtype(dtype).name)
        self.m, self.k = m, branch.shape[1]
        # Row m of the transposed frame is branch M-1-m's lag line.
        self.taps_t = np.ascontiguousarray(branch[::-1]).astype(npdt)
        # Unscaled inverse DFT with the same row flip folded in.
        c = np.arange(m)[:, None]
        r = (m - 1 - np.arange(m))[None, :]
        ang = 2.0 * np.pi * (c * r % m) / m   # exact mod-M phase reduction
        self.wfc = np.cos(ang).astype(npdt)
        self.wfs = np.sin(ang).astype(npdt)
        self.dtype = dtype


def _atan2(y, x):
    """Vectorized atan2 from VPU primitives — Mosaic has no atan2 lowering.

    Octant reduction (swap + tan(pi/8) fold) brings the argument to
    |u| <= 0.4142, where a 7-term Chebyshev-fit odd polynomial is accurate
    to ~1.2e-12 rad (beyond f32; ~240 dB below full scale) — so the fused
    FM path's only precision loss vs jnp.arctan2 is the f32 compute dtype
    itself.  atan2(0, 0) = 0, matching numpy.
    """
    dt = y.dtype
    coeffs = (-0.04045486369618831, 0.07136381620369958,
              -0.09029156993030023, 0.11107506250954066,
              -0.14285612640783202, 0.19999998908119504,
              -0.3333333333128498)
    pi = np.pi
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    den = jnp.maximum(ax, ay)
    num = jnp.minimum(ax, ay)
    r = num / jnp.where(den == 0, jnp.ones_like(den), den)
    red = r > 0.41421357
    u = jnp.where(red, (r - 1.0) / (r + 1.0), r)
    s = u * u
    acc = jnp.asarray(coeffs[0], dt)
    for c in coeffs[1:]:
        acc = acc * s + c
    p = u + u * s * acc
    a = jnp.where(red, jnp.asarray(pi / 4, dt) + p, p)
    a = jnp.where(swap, jnp.asarray(pi / 2, dt) - a, a)
    a = jnp.where(x < 0, jnp.asarray(pi, dt) - a, a)
    return jnp.where(y < 0, -a, a)


def _fir_dft(scr_r, scr_i, taps_ref, wfc_ref, wfs_ref, gt: int, k: int,
             prec):
    """Shared tile core: branch FIRs + cross-branch inverse DFT.

    scr_* hold (M, gt + halo) frame tiles; returns (yr, yi) each (M, gt).
    """
    dtype = scr_r.dtype
    # ONE aligned load per plane; the k lag lines are static value-level
    # lane slices (VPU shifts) of the loaded registers.
    vr = scr_r[:]
    vi = scr_i[:]
    ur = None
    ui = None
    for j in range(k):
        t = taps_ref[:, j][:, None]           # (M, 1), lane-broadcast
        lag = k - 1 - j
        fr = t * vr[:, lag: lag + gt]
        fi = t * vi[:, lag: lag + gt]
        ur = fr if ur is None else ur + fr
        ui = fi if ui is None else ui + fi
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dtype, precision=prec)
    yr = dot(wfc_ref[:], ur) - dot(wfs_ref[:], ui)
    yi = dot(wfc_ref[:], ui) + dot(wfs_ref[:], ur)
    return yr, yi


def _copy_tile(x_ref, b, start, scr, sem):
    return pltpu.make_async_copy(
        x_ref.at[b, :, pl.ds(start, scr.shape[1])], scr, sem)


def _make_fm_kernel(gt: int, k: int, gain: float, prec):
    def body(xr_ref, xi_ref, pr_ref, pi_ref, taps_ref, wfc_ref, wfs_ref,
             o_ref, ylr_ref, yli_ref, scr_r, scr_i, cr, ci, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        dma_r = _copy_tile(xr_ref, b, i * gt, scr_r, sems.at[0])
        dma_i = _copy_tile(xi_ref, b, i * gt, scr_i, sems.at[1])
        dma_r.start()
        dma_i.start()

        @pl.when(i == 0)
        def _():
            # Fresh stream shard: phase carry from the demod state.
            cr[:] = pr_ref[0]
            ci[:] = pi_ref[0]

        dma_r.wait()
        dma_i.wait()
        yr, yi = _fir_dft(scr_r, scr_i, taps_ref, wfc_ref, wfs_ref, gt, k,
                          prec)
        # Quadrature discriminator: d = y[g] * conj(y[g-1]); the g-1 line
        # is a one-lane shift with the carried last sample spliced in.
        sr = jax.lax.concatenate([cr[:], yr[:, : gt - 1]], 1)
        si = jax.lax.concatenate([ci[:], yi[:, : gt - 1]], 1)
        dr = yr * sr + yi * si
        di = yi * sr - yr * si
        o_ref[0] = _atan2(di, dr) * jnp.asarray(gain, yr.dtype)
        cr[:] = yr[:, gt - 1:]
        ci[:] = yi[:, gt - 1:]
        ylr_ref[0] = yr[:, gt - 1:]
        yli_ref[0] = yi[:, gt - 1:]

    return body


def _make_am_kernel(gt: int, k: int, prec):
    def body(xr_ref, xi_ref, taps_ref, wfc_ref, wfs_ref, o_ref,
             scr_r, scr_i, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        dma_r = _copy_tile(xr_ref, b, i * gt, scr_r, sems.at[0])
        dma_i = _copy_tile(xi_ref, b, i * gt, scr_i, sems.at[1])
        dma_r.start()
        dma_i.start()
        dma_r.wait()
        dma_i.wait()
        yr, yi = _fir_dft(scr_r, scr_i, taps_ref, wfc_ref, wfs_ref, gt, k,
                          prec)
        o_ref[0] = jnp.sqrt(yr * yr + yi * yi)

    return body


def _make_chan_kernel(gt: int, k: int, prec):
    def body(xr_ref, xi_ref, taps_ref, wfc_ref, wfs_ref, or_ref, oi_ref,
             scr_r, scr_i, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        dma_r = _copy_tile(xr_ref, b, i * gt, scr_r, sems.at[0])
        dma_i = _copy_tile(xi_ref, b, i * gt, scr_i, sems.at[1])
        dma_r.start()
        dma_i.start()
        dma_r.wait()
        dma_i.wait()
        yr, yi = _fir_dft(scr_r, scr_i, taps_ref, wfc_ref, wfs_ref, gt, k,
                          prec)
        or_ref[0] = yr
        oi_ref[0] = yi

    return body


def _tile(g_total: int, g_tile: int, align: int) -> int:
    gt = (min(g_tile, g_total) // align) * align
    while gt > 0 and g_total % gt:
        gt -= align
    if gt <= 0:
        raise ValueError(
            f"frame count {g_total} has no tile size that is a multiple "
            f"of {align} (compiled Mosaic DMA alignment); pad the input "
            f"so the output frame count is a multiple of {align}")
    return gt


def halo_frames(k: int, interpret: bool) -> int:
    """Lane halo the kernels over-read past the g output frames: K - 1 in
    interpret mode, rounded up to the 128-lane DMA tiling when compiled."""
    return (k - 1) if interpret else max(128, -(-(k - 1) // 128) * 128)


def _setup(ops: PFBOperators, xtr: jnp.ndarray, g_tile: int,
           g: "int | None", interpret: bool):
    b, m, nfr = xtr.shape
    if m != ops.m:
        raise ValueError(f"input has {m} rows, operators expect {ops.m}")
    halo = halo_frames(ops.k, interpret)
    if g is None:
        g = nfr - halo
    if nfr < g + halo:
        raise ValueError(
            f"input has {nfr} frame lanes; need >= g + halo = {g + halo} "
            f"(pad with PFBChannelizer.frames_t(xp, pad_to={g + halo}))")
    gt = _tile(g, g_tile, 1 if interpret else 128)
    dtype = xtr.dtype
    consts = tuple(jnp.asarray(a, dtype=dtype)
                   for a in (ops.taps_t, ops.wfc, ops.wfs))
    const_specs = [pl.BlockSpec(a.shape, lambda bb, ii: (0, 0),
                                memory_space=pltpu.VMEM) for a in consts]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_blk = pl.BlockSpec((1, m, gt), lambda bb, ii: (bb, 0, ii))
    scratch = [pltpu.VMEM((m, gt + halo), dtype),
               pltpu.VMEM((m, gt + halo), dtype)]
    cost = pl.CostEstimate(
        flops=int(b * g * m * (2 * ops.k + 4 * m + 8)),
        bytes_accessed=int(3 * b * m * g * np.dtype(jnp.dtype(dtype).name
                                                    ).itemsize),
        transcendentals=int(b * g * m))
    return b, m, g, gt, dtype, consts, const_specs, any_spec, out_blk, \
        scratch, cost


def pfb_fm_frames(ops: PFBOperators, xtr: jnp.ndarray, xti: jnp.ndarray,
                  prev_r: jnp.ndarray, prev_i: jnp.ndarray, *,
                  gain: float = 1.0, g_tile: int = 1024,
                  g: "int | None" = None,
                  precision=None, interpret: bool = False):
    """Channelize + FM-discriminate in one pass.

    Args:
      xtr, xti: (B, M, nfr) transposed-frame planes of the history-prefixed
        input (see module docstring), nfr >= G + halo (see
        :func:`halo_frames`; lanes past G + K - 1 are never read).
      prev_r, prev_i: (B, M, 1) demod phase carry (ops/demod.py
        DemodStateRI semantics: ones/zeros for a fresh stream).
      gain: static discriminator gain (folded into the kernel).
      g: output frame count; default nfr - halo.  Compiled (non-interpret)
        kernels require g % 128 == 0.

    Returns (disc (B, M, G), (y_last_r, y_last_i) each (B, M, 1)) — the
    per-channel instantaneous frequency and the new phase carry.
    """
    (b, m, g, gt, dtype, consts, const_specs, any_spec, out_blk, scratch,
     cost) = _setup(ops, xtr, g_tile, g, interpret)
    prec = (jax.lax.Precision.DEFAULT if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)
    prev_blk = pl.BlockSpec((1, m, 1), lambda bb, ii: (bb, 0, 0))
    disc, ylr, yli = pl.pallas_call(
        _make_fm_kernel(gt, ops.k, float(gain), prec),
        grid=(b, g // gt),
        in_specs=[any_spec, any_spec, prev_blk, prev_blk] + const_specs,
        out_specs=(out_blk, prev_blk, prev_blk),
        out_shape=(jax.ShapeDtypeStruct((b, m, g), dtype),
                   jax.ShapeDtypeStruct((b, m, 1), dtype),
                   jax.ShapeDtypeStruct((b, m, 1), dtype)),
        scratch_shapes=scratch + [pltpu.VMEM((m, 1), dtype),
                                  pltpu.VMEM((m, 1), dtype),
                                  pltpu.SemaphoreType.DMA((2,))],
        cost_estimate=cost,
        interpret=interpret,
    )(xtr, xti, prev_r, prev_i, *consts)
    return disc, (ylr, yli)


def pfb_am_frames(ops: PFBOperators, xtr: jnp.ndarray, xti: jnp.ndarray, *,
                  g_tile: int = 1024, g: "int | None" = None,
                  precision=None,
                  interpret: bool = False) -> jnp.ndarray:
    """Channelize + AM envelope in one pass: returns env (B, M, G)."""
    (b, m, g, gt, dtype, consts, const_specs, any_spec, out_blk, scratch,
     cost) = _setup(ops, xtr, g_tile, g, interpret)
    prec = (jax.lax.Precision.DEFAULT if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)
    return pl.pallas_call(
        _make_am_kernel(gt, ops.k, prec),
        grid=(b, g // gt),
        in_specs=[any_spec, any_spec] + const_specs,
        out_specs=out_blk,
        out_shape=jax.ShapeDtypeStruct((b, m, g), dtype),
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((2,))],
        cost_estimate=cost,
        interpret=interpret,
    )(xtr, xti, *consts)


def pfb_channelize_frames(ops: PFBOperators, xtr: jnp.ndarray,
                          xti: jnp.ndarray, *, g_tile: int = 1024,
                          g: "int | None" = None,
                          precision=None, interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bare channelizer: returns (yr, yi) each (B, M, G), channel-major —
    bit-compatible with ops/channelizer.py:_run_ri_cm."""
    (b, m, g, gt, dtype, consts, const_specs, any_spec, out_blk, scratch,
     cost) = _setup(ops, xtr, g_tile, g, interpret)
    prec = (jax.lax.Precision.DEFAULT if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)
    return pl.pallas_call(
        _make_chan_kernel(gt, ops.k, prec),
        grid=(b, g // gt),
        in_specs=[any_spec, any_spec] + const_specs,
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((b, m, g), dtype),
                   jax.ShapeDtypeStruct((b, m, g), dtype)),
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((2,))],
        cost_estimate=cost,
        interpret=interpret,
    )(xtr, xti, *consts)
