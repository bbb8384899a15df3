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
from simpledsp_tpu.ops.iir import block_operators_f64

__all__ = ["FusedNorthStarOperators", "fused_chain_frames"]


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

        # Frame-level transition and input-to-frame-state map:
        #   s_{f+1} = Ff s_f + sum_j F64^{nb-1-j} kx[j]
        self.Ff = pw[nb].astype(npdt)
        self.Wlast = np.stack([pw[nb - 1 - j] for j in range(nb)]).astype(npdt)

        # Sub-block start expansion, one (nb*D, nb*D) matrix:
        # inputs v = [s_f, kx[0], ..., kx[nb-2]]  (nb vectors of D)
        # s_start[p] = F64^p s_f + sum_{j<p} F64^{p-1-j} kx[j]
        U = np.zeros((nb, nb, D, D))
        for p in range(nb):
            U[p, 0] = pw[p]
            for j in range(1, nb):
                if j - 1 < p:
                    U[p, j] = pw[p - 1 - (j - 1)]
        self.U2 = U.transpose(0, 2, 1, 3).reshape(nb * D, nb * D).astype(npdt)

        self.H = H.astype(npdt)          # (n2, n2) lower-tri Toeplitz
        self.Phi = Phi.astype(npdt)      # (n2, D)
        self.K = K.astype(npdt)          # (D, n2)
        self.dtype = dtype
        self._Ff64 = pw[nb]              # frame transition, float64

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


def _affine_prefix(Ff: jnp.ndarray, kf_t: jnp.ndarray, precision):
    """Inclusive prefix of the affine frame recurrence s' = Ff s + k.

    Returns (Mc (F, D, D), vc (F, C, D)) such that the state AFTER frame f
    is ``Mc[f] @ s_in + vc[f]``.  Computed with ``lax.associative_scan`` —
    log2(F) rounds of batched (D, D) matmuls instead of F sequential scan
    steps (the length-256 ``lax.scan`` measured ~1 ms of pure dispatch per
    call on the axon runtime; this is ~8 fused batched ops).
    """
    nf, d = kf_t.shape[0], Ff.shape[0]
    dot = functools.partial(jnp.einsum, precision=precision,
                            preferred_element_type=kf_t.dtype)

    def comb(a, b):  # b AFTER a:  (Mb Ma, Mb va + vb)
        ma, va = a
        mb, vb = b
        return dot("fde,fej->fdj", mb, ma), dot("fde,fce->fcd", mb, va) + vb

    m0 = jnp.broadcast_to(Ff, (nf, d, d))
    return jax.lax.associative_scan(comb, (m0, kf_t))


def _make_packed_kernel(precision, n2h: int):
    """Fused chain kernel emitting the PACKED HALF SPECTRUM of each frame.

    The chain input is real, so the spectrum is Hermitian — computing and
    writing bins above N/2 is pure waste.  Bins k = k1 + n1*k2 with
    k2 < n2/2 cover k in [0, N/2); step 3 therefore contracts with the
    STACKED table [W2c[:n2/2]; W2s[:n2/2]] (n2 x n2) so each of the TWO
    dots fills all 128 output lanes: lanes [0, n2h) hold the real half,
    [n2h, n2) the imaginary half.  One lane-roll + signed add combines
    them; output traffic is HALF the full-spectrum kernel's, in ONE plane.

    The Nyquist bin X[N/2] (real for real input) is packed into the
    Im X[0] slot (k1 = 0, lane n2h) — the FFTW halfcomplex convention.
    X[N/2] = sum_t tr[k1=0, :, t] * (-1)^t since W2[n2/2, t] = (-1)^t.
    """
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1c_ref, w1s_ref, w2cs_ref,
             tc_ref, ts_ref, o_ref):
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
        y = dot_lane(x_ref[:], h_ref[:]) + dot_lane(s_ref[:], phi_ref[:])

        # Four-step FFT, steps 1-2 (real input: two step-1 dots).
        c_r = dot1f(w1c_ref[:], y)
        s_r = dot1f(w1s_ref[:], y)
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        tr = c_r * T_c - s_r * T_s
        ti = s_r * T_c + c_r * T_s

        # Step 3, packed: A = [tr.Wc | tr.Ws], B = [ti.Wc | ti.Ws];
        #   Re X = tr.Wc - ti.Ws = A - roll(B)   on lanes <  n2h
        #   Im X = ti.Wc + tr.Ws = B + roll(A)?  -> A + roll(B) on >= n2h.
        a = dot_lane(tr, w2cs_ref[:])
        b = dot_lane(ti, w2cs_ref[:])
        br = pltpu.roll(b, n2h, axis=2)
        lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2)
        sign = jnp.where(lane < n2h, -1.0, 1.0).astype(dtype)
        out = a + sign * br

        # Nyquist into the Im X[0] slot (k1 = 0, lane n2h).
        tl = jax.lax.broadcasted_iota(jnp.int32, tr.shape, 2)
        alt = jnp.where(tl % 2 == 0, 1.0, -1.0).astype(dtype)
        nyq = jnp.sum(tr[0:1] * alt[0:1], axis=2)    # (1, r)
        k1i = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        o_ref[:] = jnp.where((k1i == 0) & (lane == n2h),
                             nyq[:, :, None], out)

    return body


def _make_fused_kernel(precision):
    # See kernels/fft.py _make_kernel: in-kernel dots run at HIGHEST unless
    # DEFAULT is explicitly requested (split-bf16 measured slower on v5e).
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1c_ref, w1s_ref, w2c_ref,
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
        y = dot_lane(x_ref[:], h_ref[:]) + dot_lane(s_ref[:], phi_ref[:])

        # --- four-step FFT, all intermediates 128-lane -----------------
        # step 1: W1 (k1, n1) x y (r, n1, n2) contract n1 -> (k1, r, n2)
        c_r = dot1f(w1c_ref[:], y)
        s_r = dot1f(w1s_ref[:], y)
        # step 2: twiddle T (k1, n2), broadcast over frames (middle axis).
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        tr = c_r * T_c - s_r * T_s
        ti = s_r * T_c + c_r * T_s
        # step 3: contract n2 (lane) -> (k1, r, k2); bin reorder on host.
        yr_ref[:] = dot_lane(tr, w2c_ref[:]) - dot_lane(ti, w2s_ref[:])
        yi_ref[:] = dot_lane(ti, w2c_ref[:]) + dot_lane(tr, w2s_ref[:])

    return body


def fused_chain_frames(ops: FusedNorthStarOperators, x: jnp.ndarray,
                       s0: jnp.ndarray, *, frames_per_tile: int = 16,
                       precision=None, interpret: bool = False,
                       axis_name: Optional[str] = None,
                       shard_powers: Optional[np.ndarray] = None,
                       _debug_stage: Optional[str] = None):
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
    Returns ((spec_re, spec_im) each (C, F, n2, n1), s_final (C, D)).
    The spectra's last two axes flatten (freely, outside jit) to the
    natural bin order: reshape(C, F, fft_size).
    """
    n1, n2, N = ops.n1, ops.n2, ops.fft_size
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
    kx = jnp.einsum("dj,cfbj->cfbd", ops.K, xsub,
                    preferred_element_type=dtype, precision=prec_x)
    k_frame = jnp.einsum("jde,cfje->cfd", ops.Wlast, kx,
                         preferred_element_type=dtype, precision=prec_x)

    # Frame-level scan (C-batched, D-dim — negligible).
    kf_t = jnp.moveaxis(k_frame, 1, 0)  # (F, C, D)

    def step(s, k):
        return jnp.einsum("de,ce->cd", ops.Ff, s,
                          preferred_element_type=dtype,
                          precision=prec_x) + k, s

    if axis_name is None:
        s_local_in = s0
    else:
        # Sequence-parallel: zero-init local scan gives this shard's
        # input-driven final state; the closed form over one all_gather
        # yields the shard's true incoming state (cf. parallel/iir.py).
        if shard_powers is None:
            raise ValueError("axis_name requires shard_powers")
        apow = jnp.asarray(shard_powers, dtype=dtype)
        n_sh = shard_powers.shape[0] - 1
        zero = jax.lax.pcast(jnp.zeros_like(s0), axis_name, to="varying")
        k_shard, _ = jax.lax.scan(step, zero, kf_t)
        kall = jax.lax.all_gather(k_shard, axis_name)  # (P, C, D)
        i = jax.lax.axis_index(axis_name)
        j = jnp.arange(n_sh)
        sel = jnp.clip(i - 1 - j, 0, n_sh)
        w = jnp.where((j < i)[:, None, None], jnp.take(apow, sel, axis=0),
                      0.0)
        s_local_in = (jnp.einsum("de,ce->cd", jnp.take(apow, i, axis=0),
                                 s0, preferred_element_type=dtype,
                                 precision=prec_x)
                      + jnp.einsum("jde,jce->cd", w, kall,
                                   preferred_element_type=dtype,
                                   precision=prec_x))

    s_fin, s_frames = jax.lax.scan(step, s_local_in, kf_t)
    s_frames = jnp.moveaxis(s_frames, 0, 1)  # (C, F, D) frame starts

    if axis_name is not None:
        # Replicated GLOBAL final state via psum (streaming handoff).
        own_w = jnp.take(apow, n_sh - 1 - jax.lax.axis_index(axis_name),
                         axis=0)
        s_fin = (jnp.einsum("de,ce->cd", apow[n_sh], s0,
                            preferred_element_type=dtype, precision=prec_x)
                 + jax.lax.psum(jnp.einsum("de,ce->cd", own_w, k_shard,
                                           preferred_element_type=dtype,
                                           precision=prec_x),
                                axis_name))

    # Sub-block start expansion: one (nb*D, nb*D) matmul per frame.
    v = jnp.concatenate([s_frames[:, :, None, :], kx[:, :, :n1 - 1]], axis=2)
    v2 = v.reshape(c * nf, n1 * D)
    starts = jnp.einsum("pq,fq->fp", jnp.asarray(ops.U2), v2,
                        preferred_element_type=dtype, precision=prec_x)
    starts = starts.reshape(c, nf, n1, D)

    # ---- fused Pallas kernel over frame tiles ----
    f_total = c * nf
    x3 = xsub.reshape(f_total, n1, n2)
    s3 = starts.reshape(f_total, n1, D)
    if _debug_stage == "prepass":
        # Measurement hook (tools/bench_phases.py): stop after the XLA
        # pre-pass so its cost can be attributed separately.
        return ((s3, s3), s_fin)

    max_r = max(1, (13 << 20) // (20 * N * np.dtype(dtype).itemsize))
    max_r = 1 << (max_r.bit_length() - 1)  # power of two for divisibility
    r = min(frames_per_tile, max_r)
    while f_total % r != 0:
        r //= 2
        if r == 0:
            raise ValueError(f"frame count {f_total} not tileable")

    _, _, w1c, w1s, w2c, w2s, tc, ts = _consts(N, False, np.dtype(dtype).name)
    # dot_lane contracts b's axis 1 (the "in" index), so H (out, in) and
    # Phi (out, D) are passed as-is.
    tables = (ops.H, ops.Phi) + tuple(
        np.ascontiguousarray(a) for a in (w1c, w1s, w2c, w2s, tc.T, ts.T))
    vma = _vma(x3)
    if vma:
        # Under shard_map every kernel operand must carry matching varying
        # axes; broadcast the (identical-everywhere) tables accordingly.
        tables = tuple(jax.lax.pcast(jnp.asarray(a), tuple(vma),
                                     to="varying") for a in tables)

    in_blk = pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    s_blk = pl.BlockSpec((r, n1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((n1, r, n2), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = _make_fused_kernel(precision)
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
