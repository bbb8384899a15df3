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

TWO input layouts:

* FLAT (``pfb_fm_flat`` / ``pfb_am_flat`` — what the receiver banks use):
  the kernels DMA contiguous 128-sample rows straight from the
  history-prefixed (B, W) stream at full rate and re-lay them to
  channel-major IN REGISTERS (:func:`_untranspose`), because (a) Mosaic
  rejects any HBM slice whose minor dim is not 128-aligned, so a
  (B, M, nfr) layout with M = 16 cannot even be DMAed efficiently, and
  (b) the XLA (nfr, M) -> (M, nfr) transpose measured 10.4 ms/call —
  more than the whole fused kernel.
* FRAMES (``pfb_*_frames``): pre-transposed (B, M, nfr) channel-major
  planes (ops/channelizer.py frames_t) — kept as the bare-channelizer
  entry and the oracle for the flat kernels' tests.

Channel-major row semantics (both layouts): sublane m holds samples
x[f*M + m], which is branch r = M-1-m's input lag line; the flip is
folded into the tap and DFT tables at trace time (see PFBOperators).

Branch math (ops/channelizer.py docstring, verified against scipy in
tests/test_channelizer_demod.py):

    u[g, r]  = sum_j h[jM+r] * xp[(g+K-1-j)M + M-1-r]
    ub[m, g] = u[g, M-1-m] = sum_j taps_t[m, j] * Ft[m, g+K-1-j]
    y[c, g]  = sum_m Wf[c, m] ub[m, g],   Wf[c, m] = e^{+2 pi i c(M-1-m)/M}

P = 128 // M streams are PACKED on the sublane axis per grid step (a free
(B, M, nfr) -> (B/P, P*M, nfr) leading-dims view): the cross-branch DFT
becomes ONE stacked block-diagonal (2PM, PM) dot per plane serving all P
streams — a per-stream (16, 16) dot uses 1/64 of every 128x128 MXU pass,
so packing + cos/sin stacking cuts MXU passes 16x (measured: the unpacked
HIGHEST dots were ~80% of the kernel).  Each flat grid step manually DMAs
its (PM, gt + halo) overlapping tile from HBM (overlap = the K-1 frame
halo; plain BlockSpecs cannot express it) through a 2-slot prefetch ring
(step s issues s+1's copy before its own wait), and the FM phase carry
lives in VMEM scratch across the sequential grid — exact streaming
semantics with zero recompute at tile seams.

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
           "pfb_channelize_frames", "pfb_fm_flat", "pfb_am_flat",
           "flat_pad_to", "halo_frames"]


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
        self._packed = {}

    def packed_tables(self, p: int):
        """Tables for P streams packed on the sublane axis: taps tiled to
        (P M, K) and the STACKED block-diagonal DFT matrix (2 P M, P M) —
        rows [0, PM) are cos blocks, [PM, 2 PM) sin blocks.

        Per-stream (M, M) DFT dots at M = 16 use 1/64 of every 128x128 MXU
        pass; packing 128 // M streams fills the sublane/contraction tiles
        (one dot per plane serves all P streams), and stacking cos over sin
        halves the dot count again.
        """
        if p in self._packed:
            return self._packed[p]
        m = self.m
        wc = np.zeros((p * m, p * m), dtype=self.wfc.dtype)
        ws = np.zeros((p * m, p * m), dtype=self.wfs.dtype)
        for q in range(p):
            wc[q * m:(q + 1) * m, q * m:(q + 1) * m] = self.wfc
            ws[q * m:(q + 1) * m, q * m:(q + 1) * m] = self.wfs
        tabs = (np.ascontiguousarray(np.tile(self.taps_t, (p, 1))),
                np.ascontiguousarray(np.concatenate([wc, ws], axis=0)))
        self._packed[p] = tabs
        return tabs


def _atan2(y, x):
    """Vectorized atan2 from VPU primitives — Mosaic has no atan2 lowering.

    Octant reduction (swap + tan(pi/8) fold) brings the argument to
    |u| <= 0.4142, where a Chebyshev-fit odd polynomial approximates
    atan: 7 terms at ~1.2e-12 rad for f64, 4 terms at ~2.9e-8 rad for
    f32 (below the f32 compute dtype's own roundoff, and 3 fewer
    full-register Horner FMAs on the discriminator's hot path) — so the
    fused FM path's only precision loss vs jnp.arctan2 is the compute
    dtype itself.  atan2(0, 0) = 0, matching numpy.
    """
    dt = y.dtype
    if jnp.dtype(dt).itemsize >= 8:
        coeffs = (-0.04045486369618831, 0.07136381620369958,
                  -0.09029156993030023, 0.11107506250954066,
                  -0.14285612640783202, 0.19999998908119504,
                  -0.3333333333128498)
    else:
        coeffs = (0.08520492036833542, -0.14024142842175355,
                  0.19991237743060408, -0.33333286563943515)
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


def _vma(x):
    """Varying-mesh-axes of a traced value (None outside shard_map) —
    required on pallas out_shapes when called under shard_map (same
    contract as kernels/chain.py)."""
    try:
        return jax.typeof(x).vma or None
    except Exception:
        return None


def _fir_packed(vr, vi, taps_ref, gt: int, k: int):
    """Branch FIRs on loaded (PM, gt + halo) registers -> (ur, ui) (PM, gt).

    The k lag lines are static value-level lane slices (VPU shifts) of the
    loaded registers — zero wasted MACs.
    """
    ur = None
    ui = None
    for j in range(k):
        t = taps_ref[:, j][:, None]           # (PM, 1), lane-broadcast
        lag = k - 1 - j
        fr = t * vr[:, lag: lag + gt]
        fi = t * vi[:, lag: lag + gt]
        ur = fr if ur is None else ur + fr
        ui = fi if ui is None else ui + fi
    return ur, ui


def _dft_packed(ur, ui, wst_ref, pm: int, prec):
    """Cross-branch inverse DFT for all P packed streams at once: ONE
    stacked block-diagonal dot per plane (PFBOperators.packed_tables)."""
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=ur.dtype, precision=prec)
    cu = dot(wst_ref[:], ur)                  # [wfc.ur ; wfs.ur]
    cv = dot(wst_ref[:], ui)                  # [wfc.ui ; wfs.ui]
    yr = cu[:pm] - cv[pm:]
    yi = cv[:pm] + cu[pm:]
    return yr, yi


def _untranspose(v, m: int):
    """(R, 128) register tile of the FLAT stream view (rows of f8 =
    128 // M frames x M branches, i.e. 128 contiguous samples) -> the
    PHASE-MAJOR split form (f8, M, R): out[f, m, r] = v[r, f * M + m],
    frame index g = f8 * r + f.

    One XLU transpose + one leading-dim split — both Mosaic-legal.  The
    direct channel-major (M, f8 R) form needs a lane-merging reshape
    Mosaic cannot lower ("unsupported shape cast"), so every downstream
    stage works phase-major: lanes stay the row index r, the in-row
    phase f is a leading dim, and cross-frame shifts are leading concats.
    """
    r = v.shape[0]
    wt = jnp.transpose(v, (1, 0))          # (128, R): [f * M + m, r]
    return wt.reshape(128 // m, m, r)      # [f, m, r]


def _shift_fwd(v, s: int, rt: int, f8: int):
    """Phase-major forward shift: out[f, ., r] = v at merged frame index
    f8 r + f + s, over rt output rows (v has >= rt + s // f8 + 1 rows).
    One leading concat + lane slices."""
    q, p = divmod(s, f8)
    if p == 0:
        return v[:, :, q: q + rt]
    return jax.lax.concatenate(
        [v[p:, :, q: q + rt], v[:p, :, q + 1: q + 1 + rt]], 0)


def _fir_split(vr, vi, taps_ref, rt: int, k: int, f8: int):
    """Branch FIRs on phase-major (f8, PM, R) registers -> (f8, PM, rt)."""
    ur = None
    ui = None
    for j in range(k):
        t = taps_ref[:, j][None, :, None]
        lag = k - 1 - j
        fr = t * _shift_fwd(vr, lag, rt, f8)
        fi = t * _shift_fwd(vi, lag, rt, f8)
        ur = fr if ur is None else ur + fr
        ui = fi if ui is None else ui + fi
    return ur, ui


def _fir_split_v2(vr, vi, taps_ref, rt: int, k: int, f8: int):
    """Shift-reuse variant of :func:`_fir_split` — MEASURED AND REJECTED
    (kept importable for the probes, never auto-selected): precomputes
    the f8 phase-rolled planes once (f8 - 1 concats per plane instead of
    one per tap) and serves every tap from a lane slice, with dual
    accumulators breaking the K-long add chain.  On-chip (production
    config, tools/probe_bank_fir): fir stage 1.524 vs v1's 1.295 ms
    median, full kernel 2.339 vs 2.325 — a wash, because the FIR phase
    is VMEM-bandwidth-bound (every shifted (f8, PM, R) temporary
    round-trips ~550 kB of VMEM regardless of how it was built), not
    concat- or dependency-chain-bound."""
    rows = vr.shape[-1]

    def rolls(v):
        # R_p[f] = v[(f + p) % f8] with the wrap rows advanced one lane;
        # lane budget rows - 1 >= q_max + rt for any legal (k, hrows).
        out = [v[:, :, : rows - 1]]
        for p in range(1, f8):
            out.append(jax.lax.concatenate(
                [v[p:, :, : rows - 1], v[:p, :, 1: rows]], 0))
        return out

    rr = rolls(vr)
    ri = rolls(vi)
    acc = [None, None, None, None]   # re0, re1, im0, im1
    for j in range(k):
        t = taps_ref[:, j][None, :, None]
        q, p = divmod(k - 1 - j, f8)
        fr = t * rr[p][:, :, q: q + rt]
        fi = t * ri[p][:, :, q: q + rt]
        s = j & 1
        acc[s] = fr if acc[s] is None else acc[s] + fr
        acc[2 + s] = fi if acc[2 + s] is None else acc[2 + s] + fi
    ur = acc[0] if acc[1] is None else acc[0] + acc[1]
    ui = acc[2] if acc[3] is None else acc[2] + acc[3]
    return ur, ui


def _dft_split(ur, ui, wstb_ref, pm: int, prec):
    """Packed cross-branch DFT on phase-major operands: one BATCHED dot
    per plane against the f8-broadcast stacked table (Mosaic requires
    batch dims in matching leading positions)."""
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((2,), (1,)), ((0,),
                                                               (0,))),
        preferred_element_type=ur.dtype, precision=prec)
    cu = dot(wstb_ref[:], ur)              # (f8, 2PM, rt)
    cv = dot(wstb_ref[:], ui)
    yr = cu[:, :pm] - cv[:, pm:]
    yi = cv[:, :pm] + cu[:, pm:]
    return yr, yi


def _make_flat_body(mode: str, m: int, f8: int, rt: int, hrows: int,
                    k: int, pm: int, pack: int, ntiles: int, total: int,
                    gain: float, prec, crows: int = 0,
                    emit_sum: bool = False, _debug_stage=None,
                    fir_variant: "str | None" = None):
    """Flat-input kernel body: tiles are read STRAIGHT from the flat
    (prefixed) stream through the aligned (B, nfr/8, 128) view — full-rate
    contiguous DMA — and re-laid to channel-major in registers
    (:func:`_untranspose`).  Kills the XLA (nfr, M) -> (M, nfr) transpose
    that cost more than the whole fused kernel (measured 10.4 ms vs 1.6).

    Grid step s: stream group bb = s // ntiles, row tile i = s % ntiles
    covering rt rows = 8 rt frames (+ hrows halo rows).
    """
    # v1 stays the default: the shift-reuse v2 measured a wash on chip
    # (fir stage 1.295 vs 1.524 ms median, full kernel 2.325 vs 2.339 —
    # tools/probe_bank_fir round 5), consistent with the FIR being
    # VMEM-bandwidth-bound (each shifted (f8, PM, R) temp round-trips
    # ~550 kB of VMEM; the concats v2 removes were already cheap).
    if fir_variant is None:
        fir_variant = "v1"
    if fir_variant == "v2" and hrows <= (k - 1) // f8:
        fir_variant = "v1"    # rolled-plane lane budget needs hrows > q_max
    fir = _fir_split_v2 if fir_variant == "v2" else _fir_split

    def body(xr_ref, xi_ref, *rest):
        if mode == "fm":
            (pr_ref, pi_ref, taps_ref, wstb_ref, o_ref, ylr_ref, yli_ref,
             scr_r, scr_i, cr, ci, sem_r, sem_i) = rest
        elif mode == "fm_dec":
            (pr_ref, pi_ref, ah_ref, taps_ref, wstb_ref, dmat_ref, o_ref,
             ylr_ref, yli_ref, aho_ref, scr_r, scr_i, cr, ci, acr,
             sem_r, sem_i) = rest
        elif mode == "am":
            taps_ref, wstb_ref, o_ref, scr_r, scr_i, sem_r, sem_i = rest
        elif emit_sum:  # am_dec + per-call env sums (exact DC removal)
            (ah_ref, taps_ref, wstb_ref, dmat_ref, o_ref, aho_ref,
             es_ref, scr_r, scr_i, acr, eacc, sem_r, sem_i) = rest
        else:  # am_dec
            (ah_ref, taps_ref, wstb_ref, dmat_ref, o_ref, aho_ref,
             scr_r, scr_i, acr, sem_r, sem_i) = rest
        s = pl.program_id(0)
        i32 = lambda v: jnp.asarray(v, s.dtype)  # noqa: E731

        def dma(x_ref, scr, sem, step, slot):
            bb = step // i32(ntiles)
            ii = step - bb * i32(ntiles)
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(bb * i32(pack), pack),
                         pl.ds(ii * i32(rt), rt + hrows), :],
                scr.at[slot], sem.at[slot])

        @pl.when(s == 0)
        def _():
            dma(xr_ref, scr_r, sem_r, i32(0), 0).start()
            dma(xi_ref, scr_i, sem_i, i32(0), 0).start()

        @pl.when(s + 1 < total)
        def _():
            nslot = jax.lax.rem(s + i32(1), i32(2))
            dma(xr_ref, scr_r, sem_r, s + i32(1), nslot).start()
            dma(xi_ref, scr_i, sem_i, s + i32(1), nslot).start()

        slot = jax.lax.rem(s, i32(2))
        dma(xr_ref, scr_r, sem_r, s, slot).wait()
        dma(xi_ref, scr_i, sem_i, s, slot).wait()

        # Phase-probe early exits (modes "fm"/"fm_dec";
        # tools/probe_bank_phases): each stage writes the SAME output
        # volume from the newest intermediate, so successive stage deltas
        # isolate phase cost without dead-code elimination eating the
        # measured work.  "fm" carries the full-rate disc write; "fm_dec"
        # carries the production audio-rate write.
        def _stage_exit(ar, ai):
            if mode == "fm_dec":
                # Audio-rate write volume; the lane reduction anchors
                # every lane of the intermediate against DCE and is the
                # same for all stages, so it cancels in stage deltas.
                red = jnp.sum(ar + ai, axis=(0, 2))[:, None]   # (pm, 1)
                o_ref[0] = jnp.broadcast_to(red, o_ref.shape[1:])
            else:
                o_ref[0] = ar[:, :, :rt] + ai[:, :, :rt]
            ylr_ref[0] = ar[0, :, :1]
            yli_ref[0] = ai[0, :, :1]

        if _debug_stage == "dma":
            v0 = scr_r[slot, 0, 0, 0] + scr_i[slot, 0, 0, 0]
            _stage_exit(jax.lax.broadcast(v0, (f8, pm, rt)),
                        jax.lax.broadcast(v0, (f8, pm, rt)))
            return
        vr = jax.lax.concatenate(
            [_untranspose(scr_r[slot, q], m) for q in range(pack)], 1)
        vi = jax.lax.concatenate(
            [_untranspose(scr_i[slot, q], m) for q in range(pack)], 1)
        if _debug_stage == "untrans":
            _stage_exit(vr, vi)
            return
        ur, ui = fir(vr, vi, taps_ref, rt, k, f8)
        if _debug_stage == "fir":
            _stage_exit(ur, ui)
            return
        yr, yi = _dft_split(ur, ui, wstb_ref, pm, prec)
        if _debug_stage == "dft":
            _stage_exit(yr, yi)
            return

        def decimate(sig):
            """Phase-major streaming decimator: batched dot over the
            leading phase axis against the (f8, crows + rt, T') Toeplitz
            tap tensor, batch-reduced (kd - 1 history left-padded to
            crows full rows; pad positions carry zero taps)."""
            @pl.when(jax.lax.rem(s, i32(ntiles)) == 0)
            def _():
                acr[:] = ah_ref[0]

            ext = jax.lax.concatenate([acr[:], sig], 2)
            parts = jax.lax.dot_general(
                ext, dmat_ref[:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=sig.dtype, precision=prec)
            o_ref[0] = jnp.sum(parts, axis=0)
            tail = sig[:, :, rt - crows:]
            acr[:] = tail
            aho_ref[0] = tail

        if mode == "am":
            o_ref[0] = jnp.sqrt(yr * yr + yi * yi)
            return
        if mode == "am_dec":
            env = jnp.sqrt(yr * yr + yi * yi)
            decimate(env)
            if emit_sum:
                # Per-call env sum (for exact post-hoc DC removal): the
                # block mean is non-causal, but mean removal is LINEAR —
                # the model corrects the raw audio with mu and the
                # carried mu_prev (models/sdr.py AM path).
                @pl.when(jax.lax.rem(s, i32(ntiles)) == 0)
                def _():
                    eacc[:] = jnp.zeros_like(eacc)

                eacc[:] = eacc[:] + jnp.sum(env, axis=(0, 2))[:, None]
                es_ref[0] = eacc[:]
            return

        # FM discriminator, phase-major: the g-1 line rotates the phase
        # axis down one, with phase f8-1 shifted one row and the carried
        # last sample spliced in.
        @pl.when(jax.lax.rem(s, i32(ntiles)) == 0)
        def _():
            cr[:] = pr_ref[0][None]
            ci[:] = pi_ref[0][None]

        def prev_line(y, c):
            up = jax.lax.concatenate([c[:], y[f8 - 1:, :, : rt - 1]], 2)
            return jax.lax.concatenate([up, y[: f8 - 1]], 0)

        sr = prev_line(yr, cr)
        si = prev_line(yi, ci)
        dr = yr * sr + yi * si
        di = yi * sr - yr * si
        disc = _atan2(di, dr) * jnp.asarray(gain, yr.dtype)
        last_r = yr[f8 - 1:, :, rt - 1:]
        last_i = yi[f8 - 1:, :, rt - 1:]
        if _debug_stage == "disc":
            _stage_exit(disc, disc)
            return
        if mode == "fm_dec":
            decimate(disc)
        else:
            o_ref[0] = disc
        cr[:] = last_r
        ci[:] = last_i
        ylr_ref[0] = last_r[0]
        yli_ref[0] = last_i[0]

    return body


def _make_packed_body(mode: str, gt: int, k: int, pm: int, ntiles: int,
                      total: int, halo: int, gain: float, prec,
                      dec: int = 1, kd: int = 0):
    """Flat-grid kernel body: step s covers stream-group bb = s // ntiles,
    time tile i = s % ntiles.  Input tiles are manually DMAed with a
    2-slot prefetch ring (step s issues s + 1's copy before waiting on its
    own), so the copy engine runs a tile ahead of compute — the old
    start-then-wait-in-step form left the DMA entirely serialized.

    With dec > 1 ("fm_dec"/"am_dec") the audio decimator is FUSED: the
    demodulated tile is contracted with a constant (kd-1+gt, gt/dec)
    Toeplitz tap matrix on the MXU (the separate XLA strided conv measured
    ~0.7 Tflop/s and re-read the 4x-larger pre-decimation signal from
    HBM), with the kd-1-sample FIR history carried in VMEM scratch —
    bit-matching the streaming PolyphaseResampler (ops/fir.py) contract.
    """

    def body(xr_ref, xi_ref, *rest):
        if mode == "fm":
            (pr_ref, pi_ref, taps_ref, wst_ref, o_ref, ylr_ref, yli_ref,
             scr_r, scr_i, cr, ci, sem_r, sem_i) = rest
        elif mode == "fm_dec":
            (pr_ref, pi_ref, ah_ref, taps_ref, wst_ref, dmat_ref, o_ref,
             ylr_ref, yli_ref, aho_ref, scr_r, scr_i, cr, ci, acr,
             sem_r, sem_i) = rest
        elif mode == "am":
            taps_ref, wst_ref, o_ref, scr_r, scr_i, sem_r, sem_i = rest
        elif mode == "am_dec":
            (ah_ref, taps_ref, wst_ref, dmat_ref, o_ref, aho_ref,
             scr_r, scr_i, acr, sem_r, sem_i) = rest
        else:  # chan
            (taps_ref, wst_ref, or_ref, oi_ref, scr_r, scr_i,
             sem_r, sem_i) = rest
        s = pl.program_id(0)
        i32 = lambda v: jnp.asarray(v, s.dtype)  # noqa: E731

        def dma(x_ref, scr, sem, step, slot):
            bb = step // i32(ntiles)
            ii = step - bb * i32(ntiles)
            return pltpu.make_async_copy(
                x_ref.at[bb, :, pl.ds(ii * i32(gt), gt + halo)],
                scr.at[slot], sem.at[slot])

        @pl.when(s == 0)
        def _():
            dma(xr_ref, scr_r, sem_r, i32(0), 0).start()
            dma(xi_ref, scr_i, sem_i, i32(0), 0).start()

        @pl.when(s + 1 < total)
        def _():
            nslot = jax.lax.rem(s + i32(1), i32(2))
            dma(xr_ref, scr_r, sem_r, s + i32(1), nslot).start()
            dma(xi_ref, scr_i, sem_i, s + i32(1), nslot).start()

        slot = jax.lax.rem(s, i32(2))
        dma(xr_ref, scr_r, sem_r, s, slot).wait()
        dma(xi_ref, scr_i, sem_i, s, slot).wait()
        vr = scr_r[slot]
        vi = scr_i[slot]
        ur, ui = _fir_packed(vr, vi, taps_ref, gt, k)
        yr, yi = _dft_packed(ur, ui, wst_ref, pm, prec)

        if mode == "chan":
            or_ref[0] = yr
            oi_ref[0] = yi
            return

        def decimate(sig):
            """Streaming audio FIR + downsample on the MXU: one dot of
            [carry(kd-1) | sig(gt)] with the Toeplitz tap matrix."""
            @pl.when(jax.lax.rem(s, i32(ntiles)) == 0)
            def _():
                acr[:] = ah_ref[0]

            ext = jax.lax.concatenate([acr[:], sig], 1)
            dot = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=sig.dtype, precision=prec)
            o_ref[0] = dot(ext, dmat_ref[:])
            acr[:] = sig[:, gt - (kd - 1):]
            aho_ref[0] = sig[:, gt - (kd - 1):]

        if mode == "am":
            o_ref[0] = jnp.sqrt(yr * yr + yi * yi)
            return
        if mode == "am_dec":
            decimate(jnp.sqrt(yr * yr + yi * yi))
            return

        # FM quadrature discriminator: d = y[g] * conj(y[g-1]); the g-1
        # line is a one-lane shift with the carried last sample spliced in.
        @pl.when(jax.lax.rem(s, i32(ntiles)) == 0)
        def _():
            # Fresh stream group: phase carry from the demod state.
            cr[:] = pr_ref[0]
            ci[:] = pi_ref[0]

        sr = jax.lax.concatenate([cr[:], yr[:, : gt - 1]], 1)
        si = jax.lax.concatenate([ci[:], yi[:, : gt - 1]], 1)
        dr = yr * sr + yi * si
        di = yi * sr - yr * si
        disc = _atan2(di, dr) * jnp.asarray(gain, yr.dtype)
        if mode == "fm_dec":
            decimate(disc)
        else:
            o_ref[0] = disc
        cr[:] = yr[:, gt - 1:]
        ci[:] = yi[:, gt - 1:]
        ylr_ref[0] = yr[:, gt - 1:]
        yli_ref[0] = yi[:, gt - 1:]

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


def _auto_pack(b: int, m: int, pack: "int | None") -> int:
    """Streams per grid step: the largest divisor of B with pack*M <= 128
    (fills the MXU sublane/contraction tiles — packed_tables docstring)."""
    if pack is None:
        pack = max(1, 128 // m)
        while b % pack:
            pack -= 1
    if pack < 1 or b % pack or pack * m > 128:
        raise ValueError(
            f"pack={pack} invalid for B={b}, M={m} (need B % pack == 0 "
            f"and pack * M <= 128)")
    return pack


def _run_packed(mode: str, ops: PFBOperators, xtr: jnp.ndarray,
                xti: jnp.ndarray, extra, *, gain: float, g_tile: int,
                g: "int | None", precision, interpret: bool,
                pack: "int | None", dec_taps=None, decim: int = 1,
                ahist=None):
    b, m, nfr = xtr.shape
    if m != ops.m:
        raise ValueError(f"input has {m} rows, operators expect {ops.m}")
    pack = _auto_pack(b, m, pack)
    pm = pack * m
    bp = b // pack
    if pack > 1:
        # (B, M, nfr) -> (B/P, P*M, nfr): a free leading-dims view.
        xtr = xtr.reshape(bp, pm, nfr)
        xti = xti.reshape(bp, pm, nfr)
    halo = halo_frames(ops.k, interpret)
    if g is None:
        g = nfr - halo
    if nfr < g + halo:
        raise ValueError(
            f"input has {nfr} frame lanes; need >= g + halo = {g + halo} "
            f"(pad with PFBChannelizer.frames_t(xp, pad_to={g + halo}))")
    gt = _tile(g, g_tile, 1 if interpret else 128)
    ntiles = g // gt
    total = bp * ntiles
    dtype = xtr.dtype
    consts = tuple(jnp.asarray(a, dtype=dtype)
                   for a in ops.packed_tables(pack))
    const_specs = [pl.BlockSpec(a.shape, lambda s: (0, 0),
                                memory_space=pltpu.VMEM) for a in consts]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_blk = pl.BlockSpec((1, pm, gt),
                           lambda s: (s // ntiles, 0, s % ntiles))
    prev_blk = pl.BlockSpec((1, pm, 1), lambda s: (s // ntiles, 0, 0))
    scratch = [pltpu.VMEM((2, pm, gt + halo), dtype),
               pltpu.VMEM((2, pm, gt + halo), dtype)]
    sems = [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)
    itemsize = np.dtype(jnp.dtype(dtype).name).itemsize
    cost = pl.CostEstimate(
        flops=int(bp * g * pm * (2 * ops.k + 4 * pm + 8)),
        bytes_accessed=int(3 * bp * pm * g * itemsize),
        transcendentals=int(bp * g * pm if mode == "fm" else 0))
    kd = 0
    if mode in ("fm_dec", "am_dec"):
        # Toeplitz decimation matrix: audio[m] = sum_j h[j] ext[kd-1+m*dec-j]
        # over ext = [fir history (kd-1) | demod tile (gt)].
        h = np.asarray(dec_taps, dtype=np.float64)
        kd = h.size
        if gt % decim:
            raise ValueError(f"tile {gt} not a multiple of decim={decim}")
        if g % decim:
            raise ValueError(f"g={g} not a multiple of decim={decim}")
        dmat = np.zeros((kd - 1 + gt, gt // decim))
        rows = np.arange(kd - 1 + gt)[:, None]
        cols = np.arange(gt // decim)[None, :]
        j = kd - 1 + cols * decim - rows
        np.putmask(dmat, (j >= 0) & (j < kd),
                   h[np.clip(j, 0, kd - 1)])
        consts = consts + (jnp.asarray(dmat, dtype=dtype),)
        const_specs = const_specs + [
            pl.BlockSpec(dmat.shape, lambda s: (0, 0),
                         memory_space=pltpu.VMEM)]
        audio_blk = pl.BlockSpec(
            (1, pm, gt // decim), lambda s: (s // ntiles, 0, s % ntiles))
        ah_blk = pl.BlockSpec((1, pm, kd - 1), lambda s: (s // ntiles, 0, 0))
        ah_in = ahist.reshape(bp, pm, kd - 1)
        acr_scr = [pltpu.VMEM((pm, kd - 1), dtype)]
    body = _make_packed_body(mode, gt, ops.k, pm, ntiles, total, halo,
                             float(gain), prec, dec=decim, kd=kd)
    if mode in ("fm", "fm_dec"):
        prev_r, prev_i = extra
        pr3 = prev_r.reshape(bp, pm, 1)
        pi3 = prev_i.reshape(bp, pm, 1)
        if mode == "fm":
            disc, ylr, yli = pl.pallas_call(
                body, grid=(total,),
                in_specs=[any_spec, any_spec, prev_blk, prev_blk]
                + const_specs,
                out_specs=(out_blk, prev_blk, prev_blk),
                out_shape=(jax.ShapeDtypeStruct((bp, pm, g), dtype),
                           jax.ShapeDtypeStruct((bp, pm, 1), dtype),
                           jax.ShapeDtypeStruct((bp, pm, 1), dtype)),
                scratch_shapes=scratch + [pltpu.VMEM((pm, 1), dtype),
                                          pltpu.VMEM((pm, 1), dtype)]
                + sems,
                cost_estimate=cost, interpret=interpret,
            )(xtr, xti, pr3, pi3, *consts)
            return (disc.reshape(b, m, g),
                    (ylr.reshape(b, m, 1), yli.reshape(b, m, 1)))
        audio, ylr, yli, aho = pl.pallas_call(
            body, grid=(total,),
            in_specs=[any_spec, any_spec, prev_blk, prev_blk, ah_blk]
            + const_specs,
            out_specs=(audio_blk, prev_blk, prev_blk, ah_blk),
            out_shape=(jax.ShapeDtypeStruct((bp, pm, g // decim), dtype),
                       jax.ShapeDtypeStruct((bp, pm, 1), dtype),
                       jax.ShapeDtypeStruct((bp, pm, 1), dtype),
                       jax.ShapeDtypeStruct((bp, pm, kd - 1), dtype)),
            scratch_shapes=scratch + [pltpu.VMEM((pm, 1), dtype),
                                      pltpu.VMEM((pm, 1), dtype)]
            + acr_scr + sems,
            cost_estimate=cost, interpret=interpret,
        )(xtr, xti, pr3, pi3, ah_in, *consts)
        return (audio.reshape(b, m, g // decim),
                (ylr.reshape(b, m, 1), yli.reshape(b, m, 1)),
                aho.reshape(b, m, kd - 1))
    if mode == "am":
        env = pl.pallas_call(
            body, grid=(total,),
            in_specs=[any_spec, any_spec] + const_specs,
            out_specs=out_blk,
            out_shape=jax.ShapeDtypeStruct((bp, pm, g), dtype),
            scratch_shapes=scratch + sems,
            cost_estimate=cost, interpret=interpret,
        )(xtr, xti, *consts)
        return env.reshape(b, m, g)
    if mode == "am_dec":
        audio, aho = pl.pallas_call(
            body, grid=(total,),
            in_specs=[any_spec, any_spec, ah_blk] + const_specs,
            out_specs=(audio_blk, ah_blk),
            out_shape=(jax.ShapeDtypeStruct((bp, pm, g // decim), dtype),
                       jax.ShapeDtypeStruct((bp, pm, kd - 1), dtype)),
            scratch_shapes=scratch + acr_scr + sems,
            cost_estimate=cost, interpret=interpret,
        )(xtr, xti, ah_in, *consts)
        return (audio.reshape(b, m, g // decim),
                aho.reshape(b, m, kd - 1))
    yr, yi = pl.pallas_call(
        body, grid=(total,),
        in_specs=[any_spec, any_spec] + const_specs,
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((bp, pm, g), dtype),
                   jax.ShapeDtypeStruct((bp, pm, g), dtype)),
        scratch_shapes=scratch + sems,
        cost_estimate=cost, interpret=interpret,
    )(xtr, xti, *consts)
    return yr.reshape(b, m, g), yi.reshape(b, m, g)


def pfb_fm_frames(ops: PFBOperators, xtr: jnp.ndarray, xti: jnp.ndarray,
                  prev_r: jnp.ndarray, prev_i: jnp.ndarray, *,
                  gain: float = 1.0, g_tile: int = 1024,
                  g: "int | None" = None, pack: "int | None" = None,
                  precision=None, dec_taps=None, decim: int = 1,
                  ahist=None, interpret: bool = False):
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
      pack: streams packed per grid step (default: largest divisor of B
        with pack*M <= 128 — fills the MXU tiles the per-stream M-point
        DFT would waste 1 - (M/128)^2 of).
      dec_taps, decim, ahist: when given, the audio decimator is fused
        in-kernel (Toeplitz MXU dot — _make_packed_body docstring):
        dec_taps (Kd,) FIR taps, decim the downsample factor, ahist
        (B, M, Kd-1) the streaming FIR history (ops/fir.py FIRState,
        bit-matching PolyphaseResampler splitting semantics).

    Returns (disc (B, M, G), (y_last_r, y_last_i) each (B, M, 1)) — the
    per-channel instantaneous frequency and the new phase carry.  With
    dec_taps: (audio (B, M, G//decim), (y_last_r, y_last_i),
    ahist_out (B, M, Kd-1)).
    """
    mode = "fm" if dec_taps is None else "fm_dec"
    return _run_packed(mode, ops, xtr, xti, (prev_r, prev_i), gain=gain,
                       g_tile=g_tile, g=g, precision=precision,
                       interpret=interpret, pack=pack, dec_taps=dec_taps,
                       decim=decim, ahist=ahist)


def pfb_am_frames(ops: PFBOperators, xtr: jnp.ndarray, xti: jnp.ndarray, *,
                  g_tile: int = 1024, g: "int | None" = None,
                  pack: "int | None" = None, precision=None,
                  dec_taps=None, decim: int = 1, ahist=None,
                  interpret: bool = False):
    """Channelize + AM envelope in one pass: returns env (B, M, G) — or
    (audio (B, M, G//decim), ahist_out) with fused decimation (dec_taps /
    decim / ahist as in :func:`pfb_fm_frames`)."""
    mode = "am" if dec_taps is None else "am_dec"
    return _run_packed(mode, ops, xtr, xti, None, gain=0.0, g_tile=g_tile,
                       g=g, precision=precision, interpret=interpret,
                       pack=pack, dec_taps=dec_taps, decim=decim,
                       ahist=ahist)


def pfb_channelize_frames(ops: PFBOperators, xtr: jnp.ndarray,
                          xti: jnp.ndarray, *, g_tile: int = 1024,
                          g: "int | None" = None,
                          pack: "int | None" = None, precision=None,
                          interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bare channelizer: returns (yr, yi) each (B, M, G), channel-major —
    bit-compatible with ops/channelizer.py:_run_ri_cm."""
    return _run_packed("chan", ops, xtr, xti, None, gain=0.0,
                       g_tile=g_tile, g=g, precision=precision,
                       interpret=interpret, pack=pack)


def flat_pad_to(ops: PFBOperators, g: int, interpret: bool = False) -> int:
    """Required FLAT prefixed-stream length (samples) for g output frames
    through the flat kernels: g + halo-rows frames, 128-sample aligned."""
    if 128 % ops.m:
        raise ValueError(f"flat kernels need M | 128, got {ops.m}")
    f8 = 128 // ops.m
    hrows = -(-(ops.k - 1) // f8)
    if not interpret:
        hrows = -(-hrows // 8) * 8
    return ops.m * g + hrows * 128


def _run_flat(mode: str, ops: PFBOperators, xpr: jnp.ndarray,
              xpi: jnp.ndarray, extra, *, gain: float, row_tile: int,
              g: "int | None", precision, interpret: bool,
              pack: "int | None", dec_taps=None, decim: int = 1,
              ahist=None, emit_sum: bool = False, _debug_stage=None,
              fir_variant=None):
    """Flat-input driver: xpr/xpi are (B, W) history-prefixed padded flat
    planes, W % 128 == 0.  See _make_flat_body."""
    if _debug_stage is not None and mode not in ("fm", "fm_dec"):
        raise ValueError("_debug_stage probes the FM kernel bodies only")
    if _debug_stage not in (None, "dma", "untrans", "fir", "dft", "disc"):
        raise ValueError(f"unknown _debug_stage {_debug_stage!r}")
    b, w = xpr.shape
    m, k = ops.m, ops.k
    if 128 % m:
        raise ValueError(f"flat kernels need M | 128, got {m}")
    f8 = 128 // m
    if w % 128:
        raise ValueError(
            f"flat input length {w} must be a multiple of 128 "
            f"(pad to kernels.pfb.flat_pad_to(ops, g))")
    nrows = w // 128
    hrows = -(-(k - 1) // f8)
    if not interpret:
        hrows = -(-hrows // 8) * 8    # DMA sublane-slice alignment
    if g is None:
        g = (nrows - hrows) * f8
    if g % f8:
        raise ValueError(f"g={g} must be a multiple of {f8} (= 128/M)")
    grows = g // f8
    if nrows < grows + hrows:
        raise ValueError(
            f"input has {nrows} rows; need >= {grows + hrows} "
            f"(pad to flat_pad_to(ops, g) = {flat_pad_to(ops, g, interpret)})")
    pack = _auto_pack(b, m, pack)
    pm = pack * m
    bp = b // pack
    rt = _tile(grows, row_tile, 1 if interpret else 8)
    ntiles = grows // rt
    total = bp * ntiles
    dtype = xpr.dtype
    x4r = xpr.reshape(b, nrows, 128)
    x4i = xpi.reshape(b, nrows, 128)
    taps_p, wst = ops.packed_tables(pack)
    # Phase-major batched DFT table: the stacked block-diagonal matrix
    # broadcast over the f8 leading batch (Mosaic batch-dim contract).
    wstb = np.ascontiguousarray(
        np.broadcast_to(wst[None], (f8,) + wst.shape))
    # Under shard_map (dp-sharded banks) every kernel operand and output
    # must carry matching varying mesh axes; the (identical-everywhere)
    # tables are pcast accordingly (same contract as kernels/chain.py).
    vma = _vma(xpr)

    def _cast(a):
        a = jnp.asarray(a, dtype=dtype)
        return jax.lax.pcast(a, tuple(vma), to="varying") if vma else a

    consts = tuple(_cast(a) for a in (taps_p, wstb))
    const_specs = [pl.BlockSpec(a.shape,
                                lambda s, nd=a.ndim: (0,) * nd,
                                memory_space=pltpu.VMEM) for a in consts]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_blk = pl.BlockSpec((1, f8, pm, rt),
                           lambda s: (s // ntiles, 0, 0, s % ntiles))
    prev_blk = pl.BlockSpec((1, pm, 1), lambda s: (s // ntiles, 0, 0))
    scratch = [pltpu.VMEM((2, pack, rt + hrows, 128), dtype),
               pltpu.VMEM((2, pack, rt + hrows, 128), dtype)]
    sems = [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)
    itemsize = np.dtype(jnp.dtype(dtype).name).itemsize
    cost = pl.CostEstimate(
        flops=int(bp * g * pm * (2 * k + 4 * pm + 8)),
        bytes_accessed=int(3 * bp * pm * g * itemsize),
        transcendentals=int(bp * g * pm if mode.startswith("fm") else 0))
    crows = 0
    if mode in ("fm_dec", "am_dec"):
        h = np.asarray(dec_taps, dtype=np.float64)
        kd = h.size
        gt = rt * f8
        if gt % decim or g % decim:
            raise ValueError(
                f"tile {gt} / g {g} not multiples of decim={decim}")
        crows = -(-(kd - 1) // f8)
        pad0 = crows * f8 - (kd - 1)
        # audio[t'] = sum_j h[j] ext[pad0 + kd-1 + t'*decim - j] over
        # ext = [pad0 zeros | fir hist (kd-1) | demod tile (gt)].
        rows_e = crows * f8 + gt
        dmat = np.zeros((rows_e, gt // decim))
        ridx = np.arange(rows_e)[:, None]
        cols = np.arange(gt // decim)[None, :]
        j = pad0 + kd - 1 + cols * decim - ridx
        np.putmask(dmat, (j >= 0) & (j < kd), h[np.clip(j, 0, kd - 1)])
        # Leading-batch layout (f8, rows, T') for the in-kernel batched dot.
        dmat3 = np.ascontiguousarray(np.moveaxis(
            dmat.reshape(crows + rt, f8, gt // decim), 1, 0))
        consts = consts + (_cast(dmat3),)
        const_specs = const_specs + [
            pl.BlockSpec(dmat3.shape, lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM)]
        audio_blk = pl.BlockSpec(
            (1, pm, gt // decim), lambda s: (s // ntiles, 0, s % ntiles))
        ah_blk = pl.BlockSpec((1, f8, pm, crows),
                              lambda s: (s // ntiles, 0, 0, 0))
        ah_in = jnp.pad(ahist.astype(dtype), [(0, 0), (0, 0), (pad0, 0)]) \
            .reshape(bp, pm, crows, f8).transpose(0, 3, 1, 2)
        acr_scr = [pltpu.VMEM((f8, pm, crows), dtype)]
    body = _make_flat_body(mode, m, f8, rt, hrows, k, pm, pack, ntiles,
                           total, float(gain), prec, crows=crows,
                           emit_sum=emit_sum, _debug_stage=_debug_stage,
                           fir_variant=fir_variant)
    # Mosaic scoped-vmem raise for deep prototypes AND non-flagship bank
    # shapes: K = 32 measured a 40.2 MB stack vs the 16 MB default, and
    # M = 8 (f8 = 16 doubles every phase-major register slab) measured
    # 20.1 MB at K = 16.  Gate so the flagship M = 16, K <= 16 config
    # compiles byte-identically with the limit unset.
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=96 << 20)
               if (k > 16 or m != 16) else None)
    if mode.startswith("fm"):
        prev_r, prev_i = extra
        pr3 = prev_r.reshape(bp, pm, 1)
        pi3 = prev_i.reshape(bp, pm, 1)
        fm_scr = [pltpu.VMEM((1, pm, 1), dtype), pltpu.VMEM((1, pm, 1),
                                                            dtype)]
        if mode == "fm":
            disc, ylr, yli = pl.pallas_call(
                body, grid=(total,),
                in_specs=[any_spec, any_spec, prev_blk, prev_blk]
                + const_specs,
                out_specs=(out_blk, prev_blk, prev_blk),
                out_shape=(jax.ShapeDtypeStruct((bp, f8, pm, grows),
                                                dtype),
                           jax.ShapeDtypeStruct((bp, pm, 1), dtype, vma=vma),
                           jax.ShapeDtypeStruct((bp, pm, 1), dtype, vma=vma)),
                scratch_shapes=scratch + fm_scr + sems,
                cost_estimate=cost, compiler_params=cparams,
                interpret=interpret,
            )(x4r, x4i, pr3, pi3, *consts)
            disc = disc.transpose(0, 2, 3, 1).reshape(b, m, g)
            return (disc,
                    (ylr.reshape(b, m, 1), yli.reshape(b, m, 1)))
        audio, ylr, yli, aho = pl.pallas_call(
            body, grid=(total,),
            in_specs=[any_spec, any_spec, prev_blk, prev_blk, ah_blk]
            + const_specs,
            out_specs=(audio_blk, prev_blk, prev_blk, ah_blk),
            out_shape=(jax.ShapeDtypeStruct((bp, pm, g // decim), dtype, vma=vma),
                       jax.ShapeDtypeStruct((bp, pm, 1), dtype, vma=vma),
                       jax.ShapeDtypeStruct((bp, pm, 1), dtype, vma=vma),
                       jax.ShapeDtypeStruct((bp, f8, pm, crows), dtype, vma=vma)),
            scratch_shapes=scratch + fm_scr + acr_scr + sems,
            cost_estimate=cost, compiler_params=cparams,
                interpret=interpret,
        )(x4r, x4i, pr3, pi3, ah_in, *consts)
        kd = np.asarray(dec_taps).size
        aho2 = aho.transpose(0, 2, 3, 1).reshape(b, m, crows * f8) \
            [..., crows * f8 - (kd - 1):]
        return (audio.reshape(b, m, g // decim),
                (ylr.reshape(b, m, 1), yli.reshape(b, m, 1)), aho2)
    if mode == "am":
        env = pl.pallas_call(
            body, grid=(total,),
            in_specs=[any_spec, any_spec] + const_specs,
            out_specs=out_blk,
            out_shape=jax.ShapeDtypeStruct((bp, f8, pm, grows), dtype, vma=vma),
            scratch_shapes=scratch + sems,
            cost_estimate=cost, compiler_params=cparams,
                interpret=interpret,
        )(x4r, x4i, *consts)
        return env.transpose(0, 2, 3, 1).reshape(b, m, g)
    if emit_sum:
        sum_blk = pl.BlockSpec((1, pm, 1), lambda s: (s // ntiles, 0, 0))
        audio, aho, esum = pl.pallas_call(
            body, grid=(total,),
            in_specs=[any_spec, any_spec, ah_blk] + const_specs,
            out_specs=(audio_blk, ah_blk, sum_blk),
            out_shape=(jax.ShapeDtypeStruct((bp, pm, g // decim), dtype, vma=vma),
                       jax.ShapeDtypeStruct((bp, f8, pm, crows), dtype, vma=vma),
                       jax.ShapeDtypeStruct((bp, pm, 1), dtype, vma=vma)),
            scratch_shapes=scratch + acr_scr
            + [pltpu.VMEM((pm, 1), dtype)] + sems,
            cost_estimate=cost, compiler_params=cparams,
                interpret=interpret,
        )(x4r, x4i, ah_in, *consts)
    else:
        audio, aho = pl.pallas_call(
            body, grid=(total,),
            in_specs=[any_spec, any_spec, ah_blk] + const_specs,
            out_specs=(audio_blk, ah_blk),
            out_shape=(jax.ShapeDtypeStruct((bp, pm, g // decim), dtype, vma=vma),
                       jax.ShapeDtypeStruct((bp, f8, pm, crows), dtype, vma=vma)),
            scratch_shapes=scratch + acr_scr + sems,
            cost_estimate=cost, compiler_params=cparams,
                interpret=interpret,
        )(x4r, x4i, ah_in, *consts)
    kd = np.asarray(dec_taps).size
    aho2 = aho.transpose(0, 2, 3, 1).reshape(b, m, crows * f8) \
        [..., crows * f8 - (kd - 1):]
    if emit_sum:
        return (audio.reshape(b, m, g // decim), aho2,
                esum.reshape(b, m))
    return audio.reshape(b, m, g // decim), aho2


def pfb_fm_flat(ops: PFBOperators, xpr: jnp.ndarray, xpi: jnp.ndarray,
                prev_r: jnp.ndarray, prev_i: jnp.ndarray, *,
                gain: float = 1.0, row_tile: int = 128,
                g: "int | None" = None, pack: "int | None" = None,
                precision=None, dec_taps=None, decim: int = 1,
                ahist=None, interpret: bool = False, _debug_stage=None,
                fir_variant=None):
    """FLAT-input channelize + FM (+ optional fused decimation): xpr/xpi
    are the history-prefixed (B, W) planes, W = flat_pad_to(ops, g) —
    no channel-major transpose anywhere (the XLA (nfr, M) -> (M, nfr)
    relayout cost more than the whole fused kernel; the kernel re-lays
    contiguous 128-sample rows in registers instead).  Same returns as
    :func:`pfb_fm_frames`.  ``_debug_stage`` ("dma"/"untrans"/"fir"/
    "dft") truncates the kernel after that phase for the phase probe
    (tools/probe_bank_phases) — measurement hook, not a produce path."""
    mode = "fm" if dec_taps is None else "fm_dec"
    return _run_flat(mode, ops, xpr, xpi, (prev_r, prev_i), gain=gain,
                     row_tile=row_tile, g=g, precision=precision,
                     interpret=interpret, pack=pack, dec_taps=dec_taps,
                     decim=decim, ahist=ahist, _debug_stage=_debug_stage,
                     fir_variant=fir_variant)


def pfb_am_flat(ops: PFBOperators, xpr: jnp.ndarray, xpi: jnp.ndarray, *,
                row_tile: int = 128, g: "int | None" = None,
                pack: "int | None" = None, precision=None,
                dec_taps=None, decim: int = 1, ahist=None,
                emit_sum: bool = False, interpret: bool = False):
    """FLAT-input channelize + AM envelope (+ optional fused decimation);
    see :func:`pfb_fm_flat` / :func:`pfb_am_frames`.

    emit_sum (with dec_taps): also return the per-call env sums (B, M) —
    mean removal is linear, so the model applies EXACT block-mean DC
    removal to the fused raw audio after the fact (models/sdr.py)."""
    mode = "am" if dec_taps is None else "am_dec"
    return _run_flat(mode, ops, xpr, xpi, None, gain=0.0,
                     row_tile=row_tile, g=g, precision=precision,
                     interpret=interpret, pack=pack, dec_taps=dec_taps,
                     decim=decim, ahist=ahist, emit_sum=emit_sum)
