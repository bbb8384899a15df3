"""Fully-fused north-star chain kernel: block IIR + framed FFT in one pass.

The unfused chain writes the filtered signal y to HBM and reads it back for
the FFT — 2x the signal size in wasted traffic.  This kernel computes, per
frame tile, y = H x_blk + Phi s_start IN VMEM and feeds it straight into
the four-step FFT, so the signal's only HBM trips are: read x, write
spectra planes.

Layout trick: with IIR block size 64 and frame size n1*64, a frame's
(block, sample) view (64-sample blocks) IS the four-step FFT's (n1, n2)
view — no lane-splitting reshape (unsupported in Mosaic) is ever needed:

    x frame (n1 blocks, 64)            s = n1*64 + n2
    y = dot(x, H^T) + dot(s_starts, Phi^T)     (MXU, lane contraction)
    -> four-step FFT steps (kernels/fft.py)    (MXU + VPU, all in VMEM)
    -> spectra (k2, k1) planes                  one HBM write

The per-block incoming states s_starts are computed OUTSIDE the kernel by
the usual two-level condensation (ops/iir.py math): a cheap frame-level
scan plus one (64 D, 64 D) matmul per frame expanding to sub-block starts.
All operators are float64 host-side constants (reference compile-time-table
economics, reference: include/sdsp/fft.h:264-265).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simpledsp_tpu.design.biquad import BiquadCascadeDesign
from simpledsp_tpu.kernels.fft import _best_split, _consts
from simpledsp_tpu.ops.fft import _dft_mats_f64
from simpledsp_tpu.ops.iir import block_operators_f64

__all__ = ["FusedNorthStarOperators", "fused_chain_frames",
           "resolve_layout"]


def _vma(x):
    """Varying-mesh-axes of a traced value (None outside shard_map) —
    required on pallas out_shapes when called under shard_map."""
    try:
        return jax.typeof(x).vma or None
    except Exception:
        return None

# IIR sub-block size == FFT n2 (the layout-sharing trick).  n2 is chosen
# by _best_split as the 128-lane axis for full-bandwidth DMA.


class FusedNorthStarOperators:
    """Host-precomputed f64 operators for one design + frame size."""

    def __init__(self, design: BiquadCascadeDesign, fft_size: int,
                 dtype=jnp.float32):
        split = _best_split(fft_size)
        if split is None:
            raise ValueError(
                f"fused chain needs fft_size = n1 * n2 with factors <= 128; "
                f"got {fft_size}")
        self.n1, self.n2 = split
        self.fft_size = fft_size
        self.design = design
        npdt = np.dtype(dtype)

        H, Phi, K, F64, *_ = block_operators_f64(design, self.n2)
        D = F64.shape[0]
        self.state_dim = D
        nb = self.n1  # sub-blocks per frame

        # Powers of the n2-sample transition.
        pw = np.empty((nb + 1, D, D))
        pw[0] = np.eye(D)
        for i in range(1, nb + 1):
            pw[i] = F64 @ pw[i - 1]

        # Frame-level transition.
        self.Ff = pw[nb].astype(npdt)

        # ONE direct x -> prepass table (the K projection, the sub-block
        # start input parts, and the frame-k rows all fused), in D-MAJOR
        # start ordering:
        #   x_flat (F, N) @ TKt -> [starts_x (n1 D, d-major) | k_frame (D)]
        # with big[:, d*n1 + p] = (sum_{j<p} F^{p-1-j} K x[j-th blk])[d]
        # and big[:, n1 D + d] = (sum_j F^{nb-1-j} K x[j])[d].  Each
        # pw @ K product is computed HERE in float64.  The two-matmul
        # factorization (KT/TO below) is precision-sensitive: at HIGH it
        # loses ~37 dB (the near-unit-radius F powers cancel against
        # f32-rounded kb), at HIGHEST it holds 136.8 dB and runs ~1-3%
        # faster e2e — fused_chain_frames picks per precision.  The
        # D-major column order makes the downstream (F, n1 D) ->
        # (F, D, n1) view a free row-major bitcast (n1 stays minor),
        # deleting the 0.40 ms/call relayout copy the profiler exposed
        # (copy.41) for the old p-major (F, n1, 10) operand.
        TKt = np.zeros((nb * self.n2, (nb + 1) * D))
        for p in range(1, nb):
            for j in range(p):
                TKt[j * self.n2:(j + 1) * self.n2,
                    [d * nb + p for d in range(D)]] = (pw[p - 1 - j] @ K).T
        for j in range(nb):
            TKt[j * self.n2:(j + 1) * self.n2, nb * D:] = \
                (pw[nb - 1 - j] @ K).T
        self.TKt = np.ascontiguousarray(TKt).astype(npdt)
        # Two-step projection tables (projection="two_step"): kb = K x per
        # sub-block, then the F-power block-Toeplitz combine, same D-major
        # column order as TKt.  ~2.3x fewer MXU passes than the dense dot;
        # its extra error source is the f32 rounding of kb amplified by
        # F-power cancellation — acceptable only with HIGHEST dots (at
        # HIGH it measured 99.9 dB end-to-end; at HIGHEST 136.8 dB).
        self.KT = np.ascontiguousarray(K.T).astype(npdt)       # (n2, D)
        # Grouped kb table: g sub-blocks per matmul row via a
        # block-diagonal kron(I_g, K^T).  The (F n1, D) kb intermediate
        # has a D(=10)-lane minor dim, so its T(8,128) padding is ~13x —
        # the profiler showed the padded write + the lane-merging
        # reshape re-read cost ~0.7 ms/call (fusion.1 + reshape.18) on a
        # logically 21 MB array.  Grouping keeps the MXU pass count
        # IDENTICAL (N pads to 128 lanes either way: M/8 passes at g=1
        # vs (M/8g)*g at g>1) and the zero blocks contribute exact zeros
        # (bit-identical kb), but shrinks the padded intermediate by g.
        g = next((gg for gg in (8, 4, 2) if nb % gg == 0), 1)
        self.kb_group = g
        self.KTg = np.ascontiguousarray(
            np.kron(np.eye(g), K.T)).astype(npdt)      # (g n2, g D)
        TO = np.zeros((nb * D, (nb + 1) * D))
        for p in range(1, nb):
            for j in range(p):
                TO[j * D:(j + 1) * D,
                   [d * nb + p for d in range(D)]] = pw[p - 1 - j].T
        for j in range(nb):
            TO[j * D:(j + 1) * D, nb * D:] = pw[nb - 1 - j].T
        self.TO = np.ascontiguousarray(TO).astype(npdt)
        # State part of the start expansion, same D-major ordering:
        # starts[f, d*n1 + p] += (F^p s_frame[f])[d].
        FpT = np.zeros((D, nb * D))
        for p in range(nb):
            FpT[:, [d * nb + p for d in range(D)]] = pw[p].T
        self.FpT = FpT.astype(npdt)

        self.H = H.astype(npdt)          # (n2, n2) lower-tri Toeplitz
        self.Phi = Phi.astype(npdt)      # (n2, D)
        self.K = K.astype(npdt)          # (D, n2)
        self.dtype = dtype
        self._npdt = npdt
        self._Ff64 = pw[nb]              # frame transition, float64
        self._ptabs = {}

    def shard_powers(self, frames_per_shard: int,
                     n_shards: int) -> np.ndarray:
        """(n_shards + 1, D, D) stack of Fs^p with Fs = Ff^{frames_per_shard}
        in float64 — the cross-shard transition powers for the
        sequence-parallel fused chain."""
        Fs = np.linalg.matrix_power(self._Ff64, frames_per_shard)
        D = Fs.shape[0]
        out = np.empty((n_shards + 1, D, D))
        out[0] = np.eye(D)
        for i in range(1, n_shards + 1):
            out[i] = Fs @ out[i - 1]
        return out

    def frame_prefix_tables(self, F: int):
        """Host f64->dtype tables for the two-level frame-state prefix
        over F frames (see :func:`_frame_prefix_start`).

        Frames split into G groups of bg ~ sqrt(F); one dense inclusive
        block-Toeplitz matmul expands each group, a second (strict) one
        resolves group incoming states — replacing lax.associative_scan,
        whose log2(F) rounds of F-batched (D, D) matmuls were
        dispatch/relayout-bound on the axon runtime (~0.4 ms at F = 256).
        """
        if F in self._ptabs:
            return self._ptabs[F]
        D = self.state_dim
        Ff = self._Ff64
        bg = 1 << min(7, max(0, int(round(np.log2(max(F, 2)) / 2))))
        bg = min(bg, F)
        G = -(-F // bg)
        pwf = [np.eye(D)]
        for _ in range(bg):
            pwf.append(Ff @ pwf[-1])
        LTfT = np.zeros((bg * D, bg * D))     # inclusive: power p - j, j <= p
        for p in range(bg):
            for j in range(p + 1):
                LTfT[j * D:(j + 1) * D, p * D:(p + 1) * D] = pwf[p - j].T
        Fg = pwf[bg]
        pwg = [np.eye(D)]
        for _ in range(G):
            pwg.append(Fg @ pwg[-1])
        LTgT = np.zeros((G * D, G * D))       # strict: power q - 1 - r, r < q
        for q in range(G):
            for r_ in range(q):
                LTgT[r_ * D:(r_ + 1) * D, q * D:(q + 1) * D] = \
                    pwg[q - 1 - r_].T
        FgPT = np.zeros((D, G * D))           # s_in -> group starts
        for q in range(G):
            FgPT[:, q * D:(q + 1) * D] = pwg[q].T
        FpLT = np.zeros((D, bg * D))          # group start -> after-frame p
        for p in range(bg):
            FpLT[:, p * D:(p + 1) * D] = pwf[p + 1].T
        q_l, p_l = divmod(F - 1, bg)
        tabs = dict(
            bg=bg, G=G, q_l=q_l, p_l=p_l,
            LTfT=LTfT.astype(self._npdt), LTgT=LTgT.astype(self._npdt),
            FgPT=FgPT.astype(self._npdt), FpLT=FpLT.astype(self._npdt),
            FfpT=pwf[p_l + 1].T.astype(self._npdt))
        self._ptabs[F] = tabs
        return tabs


def _tdot(a, tab, prec, dtype):
    """a @ (trace-time-constant table), MXU-shaped."""
    return jnp.dot(a, jnp.asarray(tab, dtype=dtype), precision=prec,
                   preferred_element_type=dtype)


def _frame_prefix_start(tabs, kf_t, prec, dtype):
    """Input-driven half of the frame-state prefix s' = Ff s + k.

    kf_t: (F, C, D) frame-k vectors.  Returns (L, W, vc_last):
      L (G C, bg D): inclusive within-group prefix values,
        L[(q, c), (p, d)] = (sum_{j<=p} Ff^{p-j} k[q bg + j])[d]
      W (C, G D): input-driven state entering each group,
        W[c, (q, d)] = (sum_{r<q} Fg^{q-1-r} kgrp[r])[d]
      vc_last (C, D): input-driven state after frame F-1 (the shard k of
        the sequence-parallel closed form).
    Two dense matmuls against host block-Toeplitz tables — every operand
    keeps a >= bg*D-lane minor dim (no D-lane relayouts).
    """
    F, C, D = kf_t.shape
    bg, G = tabs["bg"], tabs["G"]
    ft = bg * G
    kp = kf_t if ft == F else jnp.pad(kf_t, ((0, ft - F), (0, 0), (0, 0)))
    kgq = jnp.transpose(kp.reshape(G, bg, C, D), (0, 2, 1, 3))
    kgq = kgq.reshape(G * C, bg * D)
    L = _tdot(kgq, tabs["LTfT"], prec, dtype)            # (G C, bg D)
    kgrp = jnp.transpose(L[:, -D:].reshape(G, C, D), (1, 0, 2))
    W = _tdot(kgrp.reshape(C, G * D), tabs["LTgT"], prec, dtype)
    q_l, p_l = tabs["q_l"], tabs["p_l"]
    vc_last = (_tdot(W[:, q_l * D:(q_l + 1) * D], tabs["FfpT"], prec, dtype)
               + L.reshape(G, C, bg * D)[q_l, :, p_l * D:(p_l + 1) * D])
    return L, W, vc_last


def _frame_prefix_finish(tabs, L, W, s_in, F, prec, dtype):
    """States after every frame given the true incoming state s_in (C, D):
    s_after[c, f = q bg + p] = Ff^{p+1} (Fg^q s_in + W[q]) + L_q[p]."""
    C, D = s_in.shape
    bg, G = tabs["bg"], tabs["G"]
    S = W + _tdot(s_in, tabs["FgPT"], prec, dtype)       # (C, G D)
    term = _tdot(S.reshape(C * G, D), tabs["FpLT"], prec, dtype)
    Lr = jnp.transpose(L.reshape(G, C, bg * D), (1, 0, 2))
    s_after = (term.reshape(C, G, bg * D) + Lr).reshape(C, G * bg, D)
    return s_after[:, :F]                                # (C, F, D)


def _iir_block(x_ref, s_ref, h_ref, phi_ref, prec):
    """IIR block conv in VMEM: y = x @ H^T + state response (r, n1, n2).

    s_ref holds the sub-block starts in D-MAJOR layout (r, D, n1) — the
    layout the XLA prepass emits as a free row-major bitcast — so the
    state dot contracts the MIDDLE dim against Phi (n2, D): out dims =
    (lhs free r, n1) x (rhs free n2).  Same result as the old (r, n1, D)
    lane contraction, but the upstream (F, n1, 10) relayout copy
    (profiler copy.41, 0.40 ms/call) becomes a no-op.
    """
    dtype = x_ref.dtype
    dot_lane = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=dtype, precision=prec)
    dot_mid = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dtype, precision=prec)
    return dot_lane(x_ref[:], h_ref[:]) + dot_mid(s_ref[:], phi_ref[:])


def _make_packed_kernel(precision, n2h: int, n1: int):
    """Fused chain kernel emitting the PACKED HALF SPECTRUM of each frame.

    The chain input is real, so the spectrum is Hermitian — computing and
    writing bins above N/2 is pure waste.  Bins k = k1 + n1*k2 with
    k2 < n2/2 cover k in [0, N/2); step 3 therefore contracts with the
    STACKED table [W2c[:n2/2]; W2s[:n2/2]] (n2 x n2) so each of the TWO
    dots fills all 128 output lanes: lanes [0, n2h) hold the real half,
    [n2h, n2) the imaginary half.  One lane-roll + signed add combines
    them; output traffic is HALF the full-spectrum kernel's, in ONE plane.

    The recombination is FREE: with the two stacked constant tables

        P = [W2c[:h]; W2s[:h]],   Q = [-W2s[:h]; W2c[:h]]   (n2 x n2)

    the single expression ``out = tr . P + ti . Q`` yields lanes [0, h) =
    Re X (tr.Wc - ti.Ws) and lanes [h, n2) = Im X (tr.Ws + ti.Wc) — two
    full-width MXU dots, no lane shuffles (an earlier roll+select variant
    crashed the Mosaic compiler at r >= 16 and lowered slowly at r = 8).

    The Nyquist bin X[N/2] (real for real input) is packed into the
    Im X[0] slot (k1 = 0, lane n2h) — the FFTW halfcomplex convention.
    X[N/2] = sum_t tr[k1=0, :, t] * (-1)^t since W2[n2/2, t] = (-1)^t.

    Step 1 contracts with the STACKED table [W1c; W1s] (2 n1, n1): the MXU
    cost of a dot is ceil(M/128) ceil(K/128) ceil(N/128) full passes
    regardless of how little of each 128-tile is used, so two separate
    (n1, n1) x (n1, r n2) dots at n1 = 32 burn 2x16 passes at 1/16
    utilization — stacking doubles M to 64 and halves the pass count for
    free (measured: the step-1 pair was ~2/3 of all kernel MXU passes).
    """
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1cs_ref, p_ref, q_ref,
             tc_ref, ts_ref, alt_ref, o_ref):
        dtype = x_ref.dtype

        def make_dot(contract_axis):
            return functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((contract_axis,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=prec)

        dot_lane = make_dot(2)
        dot1f = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=((((1,), (1,))), ((), ())),
            preferred_element_type=dtype, precision=prec)

        # IIR block conv in VMEM (see _make_fused_kernel).
        y = _iir_block(x_ref, s_ref, h_ref, phi_ref, prec)

        # Four-step FFT, steps 1-2: ONE stacked step-1 dot, then sublane
        # halves (8-aligned slices) split the cos/sin planes.
        cs = dot1f(w1cs_ref[:], y)
        c_r = cs[:n1]
        s_r = cs[n1:]
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        tr = c_r * T_c - s_r * T_s
        ti = s_r * T_c + c_r * T_s

        # Step 3, packed: [Re X | Im X] in one register, two dots.
        out = dot_lane(tr, p_ref[:]) + dot_lane(ti, q_ref[:])

        # Nyquist row fix (sublane k1 = 0 only): replace the Im X[0] == 0
        # slot (lane n2h) with X[N/2].re.  Value-level select + two stores
        # — never read o_ref back (a read-after-write on the output ref
        # serializes the pipeline).
        nyq = jnp.sum(tr[0] * alt_ref[:], axis=-1, keepdims=True)  # (r, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, out.shape[1:], 1)
        o_ref[:] = out
        o_ref[0] = jnp.where(lane == n2h, nyq, out[0])

    return body


def _make_packed_reg_kernel(precision, n2h: int, n1: int):
    """k1-major packed compute (see :func:`_make_packed_kernel`) plus an
    IN-REGISTER bin reorder: (n1, r, n2) -> (r, n2, n1) — a Mosaic-legal
    relayout (lane-split reshapes are not).  Emits SEPARATE
    natural-bin-order re/im planes (r, n2h, n1); row-major flatten of the
    last two axes is bin k = k1 + n1 k2.  Replaces the XLA-side
    (n1, f, n2) -> (f, n2, n1) transpose that cost 2.0 ms/call (134 GB/s —
    the frame axis crossing the minor tiles), and turns the tile store
    into one contiguous block.

    (A 3-pass split-bf16 HIGH variant with host-pre-split constant tables
    was built and measured on v5e: 98.9 dB at the SAME e2e throughput as
    native HIGHEST's 137 dB — the kernel is not MXU-pass-bound; the VPU
    splits and extra dispatches ate the saved passes — so it was removed.)
    """
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1cs_ref, p_ref, q_ref,
             tc_ref, ts_ref, alt_ref, or_ref, oi_ref):
        dtype = x_ref.dtype

        def make_dot(contract_axis):
            return functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((contract_axis,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=prec)

        dot_lane = make_dot(2)
        dot1f = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=((((1,), (1,))), ((), ())),
            preferred_element_type=dtype, precision=prec)

        y = _iir_block(x_ref, s_ref, h_ref, phi_ref, prec)
        cs = dot1f(w1cs_ref[:], y)
        c_r = cs[:n1]
        s_r = cs[n1:]
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        tr = c_r * T_c - s_r * T_s
        ti = s_r * T_c + c_r * T_s
        out = dot_lane(tr, p_ref[:]) + dot_lane(ti, q_ref[:])

        # Nyquist into (k1 = 0, lane n2h) at value level, pre-permute.
        nyq = jnp.sum(tr[0] * alt_ref[:], axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, out.shape[1:], 1)
        row0 = jnp.where(lane == n2h, nyq, out[0])
        out = jax.lax.concatenate([row0[None], out[1:]], 0)

        # (n1, r, n2) -> (r, n2, n1) relayout in registers (the merged
        # XLU route needs a lane-splitting reshape Mosaic rejects as
        # "unsupported shape cast"; the direct 3-D transpose lowers).
        t5 = jnp.transpose(out, (1, 2, 0))
        or_ref[:] = t5[:, :n2h]
        oi_ref[:] = t5[:, n2h:]

    return body




def _make_fused_kernel(precision, n1: int):
    # See kernels/fft.py _make_kernel: in-kernel dots run at HIGHEST unless
    # DEFAULT is explicitly requested (split-bf16 measured slower on v5e).
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1cs_ref, w2c_ref,
             w2s_ref, tc_ref, ts_ref, yr_ref, yi_ref):
        dtype = x_ref.dtype

        def make_dot(contract_axis):
            return functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((contract_axis,), (1,)), ((), ())),
                preferred_element_type=dtype, precision=prec)

        dot_lane = make_dot(2)   # contract the minor (lane) axis
        dot1f = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=((((1,), (1,))), ((), ())),
            preferred_element_type=dtype, precision=prec)

        # --- IIR block conv, entirely in VMEM (lane = n2 = 128) --------
        # y[r, blk, i] = sum_j H[i, j] x[r, blk, j] + sum_d Phi[i, d] s[r, blk, d]
        y = _iir_block(x_ref, s_ref, h_ref, phi_ref, prec)

        # --- four-step FFT, all intermediates 128-lane -----------------
        # step 1, stacked [W1c; W1s] (2 n1, n1) x y (r, n1, n2): one dot,
        # half the MXU passes of the separate pair (_make_packed_kernel
        # docstring); sublane halves split the planes.
        cs = dot1f(w1cs_ref[:], y)
        c_r = cs[:n1]
        s_r = cs[n1:]
        # step 2: twiddle T (k1, n2), broadcast over frames (middle axis).
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        tr = c_r * T_c - s_r * T_s
        ti = s_r * T_c + c_r * T_s
        # step 3: contract n2 (lane) -> (k1, r, k2); bin reorder on host.
        yr_ref[:] = dot_lane(tr, w2c_ref[:]) - dot_lane(ti, w2s_ref[:])
        yi_ref[:] = dot_lane(ti, w2c_ref[:]) + dot_lane(tr, w2s_ref[:])

    return body


def resolve_layout(n1: int) -> str:
    """The auto-selected half-spectrum kernel layout for a step-1 factor
    n1 (round-5 shootout, tools/probe_small_n + probe_1024_prod): "reg"
    (in-register reorder, zero XLA relayout) wins at n1 >= 32 where its
    (F, n2/2, n1) output minor dim stores near full tile width (4096:
    reg 7.9 vs k1 ~9.9 ms); below that the n1-lane minor craters store
    efficiency (1024: reg 15.9 ms at 1/16 tile fill) and "k1" + one XLA
    reorder transpose wins (7.5-7.7 ms = 8.7-9.0 Gs/s).  Callers that
    pin output layouts must derive them from THIS function so the pin
    tracks the kernel (models/northstar.py).  regw/reg2/reg4/regp were
    measured and rejected (kernels/chain_variants.py)."""
    return "reg" if n1 >= 32 else "k1"


def fused_chain_frames(ops: FusedNorthStarOperators, x: jnp.ndarray,
                       s0: jnp.ndarray, *, frames_per_tile: int = 64,
                       precision=None, interpret: bool = False,
                       axis_name: Optional[str] = None,
                       shard_powers: Optional[np.ndarray] = None,
                       half_spectrum: bool = False,
                       layout: Optional[str] = None,
                       flat_out: bool = False,
                       projection: Optional[str] = None,
                       _debug_stage: Optional[str] = None,
                       _proj_prec=None):
    """Run the fused chain.

    Args:
      x: (C, T) real input, T a multiple of fft_size.
      s0: (C, D) flat incoming state.
      axis_name: if set, x is one TIME SHARD inside a shard_map over this
        mesh axis; the cross-shard incoming state is resolved with ONE
        all_gather of the tiny (C, D) input-driven states (the closed form
        of parallel/iir.py), and s0/s_final are the GLOBAL stream states.
      shard_powers: required with axis_name — host-precomputed
        (n_shards + 1, D, D) stack of Fs^p, Fs = Ff^{frames_per_shard}
        (see :meth:`FusedNorthStarOperators.shard_powers`).
      half_spectrum: emit the PACKED ONE-SIDED spectrum (real input is
        Hermitian): half the step-3 matmuls, half the output traffic, half
        the reorder-transpose bytes.  Returns planes (C, F, n2/2, n1)
        whose flattened bin order is k = k1 + n1*k2 for k < N/2, with
        X[N/2].re packed in the imag plane's bin-0 slot (FFTW halfcomplex;
        see ops.fft.unpack_rfft_ri).
      layout: half-spectrum kernel variant — "reg" (k1-major
        compute + in-register bin reorder, natural-order planes out, zero
        XLA relayout), "regs" (reg with the split-K exact-bf16 step-1
        dot: same output contract and f32-grade accuracy, 128 single MXU
        passes where HIGHEST's step 1 pays 384 — f32 dtype only, see
        _make_packed_regs_kernel), "regw" (reg with qf bins packed per 128-lane
        output row: same bytes/order as (C F, h/qf, qf n1) planes, wide
        stores), "reg2"/"reg4" (reg plus 2-/4-frame block-diagonal
        step 1 — halves step-1 MXU passes, same output contract),
        "k1" (k1-major blocks + XLA reorder transpose),
      projection: "dense" (ONE x_flat @ TKt matmul) or "two_step"
        (kb = K x per sub-block, then the F-power block-Toeplitz
        combine — ~2.3x fewer prepass MXU passes).  Default (None)
        picks "two_step" iff the projection precision is HIGHEST:
        measured on v5e interleaved in one process, two_step wins
        every rep (median 10.70 vs 10.56 Gs/s e2e) at 136.8 dB vs
        dense's 137.1; at HIGH its f32-rounded kb vectors cancel
        against the near-unit-radius F-powers and it craters to
        99.9 dB, so HIGH keeps the dense table.
        "fmajor" (frame-major contiguous stores, but 32-64-lane
        intermediates), or "pair" (2-frame block-diagonal step 1; 4-D
        reorder transpose).  Measured e2e chained on v5e (c=64, HIGH):
        reg 9.3-9.6 Gs/s, k1 9.0, pair 8.9, fmajor 6.2 —
        tools/bench_chain_v2.py.  A later same-process shootout: reg 8.5,
        reg2 8.2, reg4 6.8 (and r >= 64 tiles fail Mosaic compilation) —
        halving step-1 MXU passes LOSES, confirming the kernel is
        relayout/VPU-bound, not pass-bound; reg2/reg4 are kept as
        documented measured-and-rejected variants.

    Returns ((spec_re, spec_im) each (C, F, n2, n1) — or (C, F, n2/2, n1)
    with half_spectrum — and s_final (C, D)).  The spectra's last two axes
    flatten (freely, outside jit) to natural bin order.
    """
    n1, n2, N = ops.n1, ops.n2, ops.fft_size
    if layout is None:
        layout = resolve_layout(n1)
    if half_spectrum and n2 % 2:
        raise ValueError(f"half_spectrum requires even n2, got {n2}")
    if x.ndim == 4:
        # Pre-framed input (C, F, n1, n2) — the same samples as (C, T) in
        # the same order, but already in the kernel's tiling, so the
        # device-side re-tiling copy of a flat (C, T) operand is skipped.
        # Producers can upload this layout at no cost: device_put(
        # x.reshape(C, F, n1, n2)).
        c, nf = x.shape[:2]
        t = nf * N
        xsub = x
    else:
        c, t = x.shape
        nf = t // N
        xsub = x.reshape(c, nf, n1, n2)
    D = ops.state_dim
    dtype = x.dtype

    prec_x = precision or jax.lax.Precision.HIGHEST
    # The state-CHAIN dots (frame prefix, start/shard expansions) are tiny
    # (~2 GFLOP/call vs the 44 GFLOP input projection) but their rounding
    # errors compound through F-powers across all frames of the stream —
    # always run them at HIGHEST; only the big x projection follows the
    # caller's precision.
    prec_s = jax.lax.Precision.HIGHEST
    f_total = c * nf
    # Framed input -> all prepass vectors (the sub-block start
    # input-parts, d-major, and the frame-k rows) — f64-precomputed
    # operator products; dense vs two-step per the `projection` arg.
    x_flat = xsub.reshape(f_total, N)
    if projection is None:
        projection = ("two_step" if prec_x == jax.lax.Precision.HIGHEST
                      else "dense")
    if projection == "two_step":
        # kb_j = K x_j per sub-block, then the F-power block-Toeplitz
        # combine (tables KT/TO; same D-major column order as TKt).
        # _proj_prec: measurement hook — (kb_prec, combine_prec) override
        # (tools/probe_proj_prec).  Shootout verdict: any HIGH stage
        # craters SNR (kb HIGH -> 101 dB even with HIGHEST combine; comb
        # HIGH -> 106 dB) while throughput is identical within tunnel
        # noise (~10.8-11.0 Gs/s all four combos — the prepass is
        # pipeline-hidden), so both stages stay at the caller's HIGHEST.
        pk, pc = _proj_prec or (prec_x, prec_x)
        g = getattr(ops, "kb_group", 1)
        kb = _tdot(x_flat.reshape(f_total * (n1 // g), g * n2),
                   ops.KTg if g > 1 else ops.KT, pk, dtype)
        big = _tdot(kb.reshape(f_total, n1 * D), ops.TO, pc, dtype)
    elif projection == "dense":
        big = _tdot(x_flat, ops.TKt, prec_x, dtype)  # (cf, (nb + 1) D)
    else:
        raise ValueError(f"unknown projection {projection!r}")
    if _debug_stage == "kx":
        return ((big, big), big[-1:, -D:])
    kxs = big[:, : n1 * D]                         # starts, input part
    k_frame = big[:, n1 * D:].reshape(c, nf, D)
    if _debug_stage == "kframe":
        return ((k_frame, k_frame), k_frame[:, -1])

    # Frame-level state chain: two-level block-Toeplitz prefix.
    kf_t = jnp.moveaxis(k_frame, 1, 0)  # (F, C, D)
    tabs = ops.frame_prefix_tables(nf)
    L_, W_, vc_last = _frame_prefix_start(tabs, kf_t, prec_s, dtype)

    if axis_name is None:
        s_local_in = s0
    else:
        # Sequence-parallel: vc_last is this shard's input-driven final
        # state; the closed form over one all_gather yields the shard's
        # true incoming state (cf. parallel/iir.py).
        if shard_powers is None:
            raise ValueError("axis_name requires shard_powers")
        apow = jnp.asarray(shard_powers, dtype=dtype)
        n_sh = shard_powers.shape[0] - 1
        k_shard = vc_last
        kall = jax.lax.all_gather(k_shard, axis_name)  # (P, C, D)
        i = jax.lax.axis_index(axis_name)
        j = jnp.arange(n_sh)
        sel = jnp.clip(i - 1 - j, 0, n_sh)
        w = jnp.where((j < i)[:, None, None], jnp.take(apow, sel, axis=0),
                      0.0)
        s_local_in = (jnp.einsum("de,ce->cd", jnp.take(apow, i, axis=0),
                                 s0, preferred_element_type=dtype,
                                 precision=prec_s)
                      + jnp.einsum("jde,jce->cd", w, kall,
                                   preferred_element_type=dtype,
                                   precision=prec_s))

    # States after each frame; frame STARTS prepend the incoming state.
    s_after = _frame_prefix_finish(tabs, L_, W_, s_local_in, nf, prec_s,
                                   dtype)
    s_fin = s_after[:, -1]
    s_frames = jnp.concatenate([s_local_in[:, None], s_after[:, :-1]],
                               axis=1)                  # (C, F, D)
    if _debug_stage == "prefix":
        return ((s_frames, s_frames), s_fin)

    if axis_name is not None:
        # Replicated GLOBAL final state via psum (streaming handoff).
        own_w = jnp.take(apow, n_sh - 1 - jax.lax.axis_index(axis_name),
                         axis=0)
        s_fin = (jnp.einsum("de,ce->cd", apow[n_sh], s0,
                            preferred_element_type=dtype, precision=prec_s)
                 + jax.lax.psum(jnp.einsum("de,ce->cd", own_w, k_shard,
                                           preferred_element_type=dtype,
                                           precision=prec_s),
                                axis_name))

    # Sub-block start expansion: state part + input part, both flat in
    # D-major order, so the (f, n1 D) -> (f, D, n1) view is a free
    # row-major bitcast (n1 stays the minor dim — no relayout copy).
    starts = _tdot(s_frames.reshape(f_total, D), ops.FpT, prec_s,
                   dtype) + kxs

    # ---- fused Pallas kernel over frame tiles ----
    x3 = xsub.reshape(f_total, n1, n2)
    s3 = starts.reshape(f_total, D, n1)
    if _debug_stage == "prepass":
        # Measurement hook (tools/bench_phases.py): stop after the XLA
        # pre-pass so its cost can be attributed separately.
        return ((s3, s3), s_fin)

    # Per-frame VMEM: x + state + output planes, double-buffered across
    # grid steps (~4.2 frame-units of N*itemsize for half-spectrum, ~6.2
    # full) against the ~16 MB/core budget; the denominators carry ~40%
    # slack for Mosaic's own scratch.
    per_frame = 6 if half_spectrum else 9
    max_r = max(1, (13 << 20) // (per_frame * N * np.dtype(dtype).itemsize))
    max_r = 1 << (max_r.bit_length() - 1)  # power of two for divisibility
    # Cap 64: the kernel body keeps ~6 live (n1, r, n2) tensors (cs, tr,
    # ti, out, t5) whose register spill scales with r — r = 128 fails
    # Mosaic with a 22 MB scoped-vmem stack (measured).  Sweep on v5e
    # (tools/probe_tile_r, N=4096, interleaved medians): r=8 6.7, r=16
    # 9.1, r=32 10.8, r=64 11.6 Gs/s e2e — fewer grid steps win
    # monotonically up to the spill wall, hence the 64 default.
    max_r = min(max_r, 64)
    r = min(frames_per_tile, max_r)
    while f_total % r != 0:
        r //= 2
        if r == 0:
            raise ValueError(f"frame count {f_total} not tileable")

    # Mosaic's scoped-vmem (kernel stack) limit defaults to 16 MB; the
    # body keeps ~9 live (r, n1, n2) frame-unit temporaries, which
    # exceeds the default once n1 reaches 128 (N = 16384: measured
    # 18.14 MB request -> compile error).  Raise the limit only when the
    # estimate says the default is tight; the limit is a ceiling, not an
    # allocation, so smaller shapes compile identically with it unset.
    # regp keeps extra live frame-units (the grouped cs + both un-group
    # transposes): N=4096 regp measured a 17.5 MB stack (16.4 units at
    # r=64) vs the 16 MB default — budget 18 units for it.
    scoped_est = ((18 if layout == "regp" else 9)
                  * r * n1 * n2 * np.dtype(dtype).itemsize)
    cparams = (pltpu.CompilerParams(
        vmem_limit_bytes=int(min(2 * scoped_est, 100 << 20)))
        if scoped_est > (14 << 20) else None)

    _, _, w1c, w1s, w2c, w2s, tc, ts = _consts(N, False, np.dtype(dtype).name)
    # dot_lane contracts b's axis 1 (the "in" index), so H (out, in) and
    # Phi (out, D) are passed as-is.  Step-1 cos/sin enter STACKED (2 n1,
    # n1) — one fat dot instead of two 1/16-utilization ones.
    w1cs = np.concatenate([w1c, w1s], axis=0)
    tables = (ops.H, ops.Phi) + tuple(
        np.ascontiguousarray(a) for a in (w1cs, w2c, w2s, tc.T, ts.T))
    vma = _vma(x3)
    if vma:
        # Under shard_map every kernel operand must carry matching varying
        # axes; broadcast the (identical-everywhere) tables accordingly.
        tables = tuple(jax.lax.pcast(jnp.asarray(a), tuple(vma),
                                     to="varying") for a in tables)

    in_blk = pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    s_blk = pl.BlockSpec((r, D, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((n1, r, n2), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if half_spectrum:
        # Packed half-spectrum kernel: stacked P/Q step-3 tables + the
        # Nyquist (-1)^t row, ONE output plane (see _make_packed_kernel).
        h = n2 // 2
        p_tab = np.ascontiguousarray(np.concatenate([w2c[:h], w2s[:h]], 0))
        q_tab = np.ascontiguousarray(np.concatenate([-w2s[:h], w2c[:h]], 0))
        alt = ((-1.0) ** np.arange(n2)).reshape(1, n2).astype(p_tab.dtype)
        if layout not in ("reg", "regp", "regs", "regw", "reg2", "reg4",
                          "k1", "fmajor", "pair"):
            raise ValueError(f"unknown layout {layout!r}")
        if layout not in ("reg", "k1"):
            # Measured-and-rejected variants live in their own module
            # (kernels/chain_variants.py) — importable for the parity
            # tests and measurement tools, never a production default.
            from simpledsp_tpu.kernels import chain_variants as _cv
        pair = layout == "pair" and r % 2 == 0
        fmajor = layout == "fmajor"
        if layout.startswith("reg"):
            # In-register reorder kernel: natural-order re/im planes out,
            # zero XLA-side relayout (_make_packed_reg_kernel docstring).
            # Variant layouts (regs/regw/reg2/reg4) are documented in
            # kernels/chain_variants.py.
            splitk = layout == "regs"
            qf = _cv._regw_qf(n1, h) if layout == "regw" else 1
            g = int(layout[3:]) if layout in ("reg2", "reg4") else 1
            gp = 1
            if layout == "regp":
                gp = max(1, 128 // n1)
                while gp > 1 and r % gp:
                    gp //= 2
            while g > 1 and r % g:
                g //= 2
            if splitk:
                if np.dtype(dtype) != np.float32:
                    raise ValueError("layout 'regs' requires float32 "
                                     "(the split targets a 24-bit "
                                     "significand)")
                w1c64, w1s64 = _dft_mats_f64(n1)
                w1s3 = _cv._bf16_split3(np.concatenate([w1c64, w1s64], axis=0))
                tables = tables[:2] + (w1s3,) + tables[3:]
            if g > 1:
                w1cs_t = tables[2]
                w1g = np.zeros((g * 2 * n1, g * n1), dtype=p_tab.dtype)
                for gq in range(g):
                    w1g[2 * n1 * gq: 2 * n1 * (gq + 1),
                        n1 * gq: n1 * (gq + 1)] = w1cs_t
                tables = tables[:2] + (np.ascontiguousarray(w1g),) \
                    + tables[3:]
            if gp > 1:
                # regp table: cos blocks stacked over sin blocks, each
                # block-diagonal over gp frames (halves split as OUTER
                # slices in the kernel).
                w1p = np.zeros((2 * gp * n1, gp * n1), dtype=p_tab.dtype)
                for gq in range(gp):
                    w1p[n1 * gq: n1 * (gq + 1),
                        n1 * gq: n1 * (gq + 1)] = w1c
                    w1p[gp * n1 + n1 * gq: gp * n1 + n1 * (gq + 1),
                        n1 * gq: n1 * (gq + 1)] = w1s
                tables = tables[:2] + (np.ascontiguousarray(w1p),) \
                    + tables[3:]
            if qf > 1:
                # ROW-permute the step-3 tables (dot_lane contracts their
                # dim 1, so output lane l = table row l) so within each
                # re/im half, output lane b*w + qq holds bin
                # k2 = qf*qq + b — the order the quarter-transpose +
                # lane-concat emits as natural-bin-order
                # (f, h/qf, qf*n1) planes.
                wq = h // qf
                idx = np.empty(h, dtype=np.int64)
                for k2 in range(h):
                    idx[(k2 % qf) * wq + k2 // qf] = k2
                full = np.concatenate([idx, h + idx])
                p_tab = np.ascontiguousarray(p_tab[full])
                q_tab = np.ascontiguousarray(q_tab[full])
            tables = tables[:3] + (p_tab, q_tab) + tables[5:] + (alt,)
            if vma:
                # Only the NEW numpy tables still need the varying cast
                # (the shared ones were cast above).
                tables = tuple(
                    t if isinstance(t, jnp.ndarray) else jax.lax.pcast(
                        jnp.asarray(t), tuple(vma), to="varying")
                    for t in tables)
            reg_blk = pl.BlockSpec((r, h // qf, qf * n1),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
            reg_shape = jax.ShapeDtypeStruct((f_total, h // qf, qf * n1),
                                             dtype, vma=_vma(x3))
            if qf > 1:
                reg_kernel = _cv._make_packed_regw_kernel(precision, h, n1, qf)
            elif gp > 1:
                reg_kernel = _cv._make_packed_regp_kernel(precision, h, n1,
                                                          gp)
            elif g > 1:
                reg_kernel = _cv._make_packed_regg_kernel(precision, h, n1, g)
            elif splitk:
                reg_kernel = _cv._make_packed_regs_kernel(precision, h, n1)
            else:
                reg_kernel = _make_packed_reg_kernel(precision, h, n1)
            zr, zi = pl.pallas_call(
                reg_kernel,
                grid=(f_total // r,),
                in_specs=[in_blk, s_blk] + [const_spec(a) for a in tables],
                out_specs=(reg_blk, reg_blk),
                out_shape=(reg_shape, reg_shape),
                cost_estimate=pl.CostEstimate(
                    flops=int(8 * N * (n1 + n2) * f_total),
                    bytes_accessed=2 * f_total * N
                    * np.dtype(dtype).itemsize,
                    transcendentals=0),
                compiler_params=cparams,
                interpret=interpret,
            )(x3, s3, *tables)
            if _debug_stage == "kernel" or flat_out:
                # flat_out: (C F, n2/2/qf, qf n1) planes, already natural
                # bin order when row-major-flattened — reshaping to
                # (C, F, ...) INSIDE jit forces XLA to copy both planes
                # to the canonical entry layout (268 MB/call, seen as
                # copy.48/49 in the profiler trace); callers split the
                # leading dim OUTSIDE jit for free.
                return ((zr, zi), s_fin)
            return ((zr.reshape(c, nf, h, n1),
                     zi.reshape(c, nf, h, n1)), s_fin)
        if pair:
            # Block-diagonal 2-frame step-1 table
            # (_make_packed_pair_kernel docstring).
            w1cs_t = tables[2]
            w1p = np.zeros((4 * n1, 2 * n1), dtype=p_tab.dtype)
            w1p[: 2 * n1, :n1] = w1cs_t
            w1p[2 * n1:, n1:] = w1cs_t
            tables = tables[:2] + (np.ascontiguousarray(w1p),) + tables[3:]
        if fmajor:
            # Frame-major kernel: transposed step-1/3 tables, twiddles in
            # (n2, k1) orientation (_make_packed_fmajor_kernel docstring).
            tables = tables[:2] + (
                np.ascontiguousarray(tables[2].T),
                np.ascontiguousarray(p_tab.T),
                np.ascontiguousarray(q_tab.T),
                np.ascontiguousarray(tc), np.ascontiguousarray(ts), alt)
        else:
            tables = tables[:3] + (p_tab, q_tab) + tables[5:] + (alt,)
        if vma:
            tables = tuple(
                t if isinstance(t, jnp.ndarray) else jax.lax.pcast(
                    jnp.asarray(t), tuple(vma), to="varying")
                for t in tables)
        if pair:
            kernel = _cv._make_packed_pair_kernel(precision, h, n1)
            out_blk_p = pl.BlockSpec((n1, r // 2, 2, n2),
                                     lambda i: (0, i, 0, 0),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((n1, f_total // 2, 2, n2),
                                             dtype, vma=_vma(x3))
        elif fmajor:
            kernel = _cv._make_packed_fmajor_kernel(precision, h, n1)
            out_blk_p = pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((f_total, n1, n2), dtype,
                                             vma=_vma(x3))
        else:
            kernel = _make_packed_kernel(precision, h, n1)
            out_blk_p = out_blk
            out_shape = jax.ShapeDtypeStruct((n1, f_total, n2), dtype,
                                             vma=_vma(x3))
        out = pl.pallas_call(
            kernel,
            grid=(f_total // r,),
            in_specs=[in_blk, s_blk] + [const_spec(a) for a in tables],
            out_specs=out_blk_p,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=int(8 * N * (n1 + n2) * f_total),
                bytes_accessed=2 * f_total * N * np.dtype(dtype).itemsize,
                transcendentals=0),
            compiler_params=cparams,
            interpret=interpret,
        )(x3, s3, *tables)
        if _debug_stage == "kernel":
            return ((out, out), s_fin)
        # Bin reorder on the HALVED data: ONE transpose (k1, f, n2) ->
        # (f, n2, k1) on the full 128-lane block, THEN split re/im halves
        # as cheap middle-axis slices (slicing lanes BEFORE the transpose
        # produced two 64-lane transposes at ~1/2 DMA bandwidth each).
        # Flattening the last two axes (outside jit, free) gives the packed
        # one-sided order k = k1 + n1*k2, k2 < n2/2, with X[N/2].re in the
        # imag plane's bin-0 slot (FFTW halfcomplex — see
        # ops.fft.unpack_rfft_ri for the pure N/2+1 form).
        if pair:
            z = jax.lax.transpose(out, (1, 2, 3, 0))  # (f/2, 2, n2, n1)
            zr = z[:, :, :h]
            zi = z[:, :, h:]
        elif fmajor:
            # Per-frame (n1, n2) -> (n2, n1) tile transpose: the frame
            # axis never enters the minor tiles.
            z = jax.lax.transpose(out, (0, 2, 1))     # (f, n2, n1)
            zr = z[:, :h]
            zi = z[:, h:]
        else:
            z = jax.lax.transpose(out, (1, 2, 0))
            zr = z[:, :h]
            zi = z[:, h:]
            if flat_out:
                # (C F, n2/2, n1) planes, natural order on flatten —
                # the c/nf split happens outside jit (free), matching
                # the reg flat_out contract.
                return ((zr, zi), s_fin)
        return ((zr.reshape(c, nf, h, n1), zi.reshape(c, nf, h, n1)), s_fin)

    kernel = _make_fused_kernel(precision, n1)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(f_total // r,),
        in_specs=[in_blk, s_blk] + [const_spec(a) for a in tables],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((n1, f_total, n2), dtype,
                                        vma=_vma(x3)),
                   jax.ShapeDtypeStruct((n1, f_total, n2), dtype,
                                        vma=_vma(x3))),
        cost_estimate=pl.CostEstimate(
            flops=int(8 * N * (n1 + 2 * n2) * f_total),
            bytes_accessed=3 * f_total * N * np.dtype(dtype).itemsize,
            transcendentals=0),
        compiler_params=cparams,
        interpret=interpret,
    )(x3, s3, *tables)
    if _debug_stage == "kernel":
        # Measurement hook: raw (k1, f, k2) kernel output, no reorder.
        return ((yr, yi), s_fin)
    # Bin reorder (k1, f, k2) -> (f, k2, k1): ONE XLA transpose.  The
    # result is returned as (C, F, n2, n1) whose standard row-major layout
    # already holds bins in natural order k = k1 + n1 k2 — flattening the
    # last two axes OUTSIDE jit is a free metadata reshape, whereas fusing
    # the flatten here makes XLA materialize a second 268 MB copy per
    # plane (measured).
    yr = jax.lax.transpose(yr, (1, 2, 0)).reshape(c, nf, n2, n1)
    yi = jax.lax.transpose(yi, (1, 2, 0)).reshape(c, nf, n2, n1)
    return ((yr, yi), s_fin)
