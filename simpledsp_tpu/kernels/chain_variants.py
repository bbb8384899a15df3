"""Measured-and-rejected fused-chain kernel variants (quarantined).

Each factory here is a complete, working alternative scheduling of the
packed half-spectrum chain kernel (see kernels/chain.py
:func:`_make_packed_reg_kernel` for the production layout).  All were
built, verified bit-identical to the oracle in interpret mode
(tests/test_kernels.py::test_half_spectrum_layouts_match_oracle) and
MEASURED ON v5e — and lost to the production "reg" layout:

  * regs (split-K exact-bf16 step 1): same ~137 dB accuracy with 1/3 the
    step-1 MXU passes, but ~18% slower e2e — the kernel is not pass-bound.
  * regw (wide 128-lane stores): 6.2 vs reg 8.4 Gs/s — the quarter
    transposes + lane concat cost more than wide stores save.
  * reg2/reg4 (block-diagonal grouped step 1 via
    :func:`_make_packed_regg_kernel`): 8.2 / 6.8 vs reg 8.5 Gs/s —
    halving step-1 passes LOSES; r >= 64 tiles fail Mosaic compilation
    at g = 4.
  * fmajor (frame-major contiguous stores): 6.2 vs 9.3-9.6 Gs/s — the
    32-64-lane intermediates throttle every VPU op.
  * pair (2-frame block-diagonal step 1, 4-D output): 8.9 vs 9.3-9.6.

They are kept importable — dispatched by layout= in
:func:`simpledsp_tpu.kernels.chain.fused_chain_frames` and exercised by
the interpret-mode parity tests — as the evidence base for the
production choice.  Full measurement methodology: tools/bench_chain_v2.py,
tools/probe_splitk.py; history in PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from simpledsp_tpu.kernels.chain import _iir_block

__all__ = [
    "_bf16_split3",
    "_make_packed_regs_kernel",
    "_make_packed_regw_kernel",
    "_regw_qf",
    "_make_packed_regg_kernel",
    "_make_packed_fmajor_kernel",
    "_make_packed_pair_kernel",
    "_make_packed_regp_kernel",
]


def _bf16_split3(a: np.ndarray) -> np.ndarray:
    """Exact 3-way bf16 decomposition of an f64 table, stacked on axis 0.

    a ~= h + m + l with each part bf16 (8 mantissa bits), so h/m/l jointly
    carry ~24 bits — f32-grade — and every MXU product against another
    bf16 operand is exact (16-bit significand fits the f32 accumulator).
    """
    bf = jnp.bfloat16
    h = a.astype(bf)
    r1 = a - h.astype(np.float64)
    m = r1.astype(bf)
    low = (r1 - m.astype(np.float64)).astype(bf)
    return np.concatenate([np.tile(np.ascontiguousarray(p), (1, 3))
                           for p in (h, m, low)], axis=0)


def _make_packed_regs_kernel(precision, n2h: int, n1: int):
    """Split-K step-1 variant of :func:`_make_packed_reg_kernel`.

    The stacked step-1 dot is the kernel's pass sink at HIGHEST: its
    (M = 2 n1 = 64, K = n1 = 32) operand fills 1/8 of each 128x128 MXU
    tile, and HIGHEST's 6-pass f32 emulation multiplies that waste — at
    r = 64 frames/tile it burns 384 of the kernel's ~768 bf16 passes for
    8 passes of useful work.  This kernel reaches the SAME precision with
    128 single passes by doing the f32 emulation EXPLICITLY in the K/M
    geometry instead of in time:

      * y is decomposed in-register into three bf16 planes
        y = y_h + y_m + y_l (exact: 24 mantissa bits = 3 x 8) and stacked
        on the K (sub-block) axis -> (r, 3 n1, n2) bf16;
      * the step-1 table enters as the host-side f64 -> 3 x bf16 split
        [Wh|Wh|Wh; Wm|Wm|Wm; Wl|Wl|Wl] (6 n1, 3 n1): row block b computes
        y_h W_b + y_m W_b + y_l W_b = y W_b with every product EXACT
        (bf16 x bf16 accumulated in f32);
      * cs = sum of the three (2 n1, r, n2) sublane blocks — all NINE
        split products are present, one more than HIGHEST keeps.

    Pass count: M = 6 n1 = 192 -> 2 M-tiles, K = 3 n1 = 96 -> 1 K-tile,
    N = r n2 -> 64 tiles = 128 single bf16 passes vs HIGHEST's 6 x 64.
    Everything downstream (twiddle, packed step 3, Nyquist, in-register
    reorder) is identical to the reg kernel; the output contract matches
    bit-for-bit semantics at f32-grade accuracy (~137 dB end-to-end).
    f32 only (the decomposition targets a 24-bit significand).
    """
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1s3_ref, p_ref, q_ref,
             tc_ref, ts_ref, alt_ref, or_ref, oi_ref):
        dtype = x_ref.dtype
        dot_lane = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=dtype, precision=prec)

        y = _iir_block(x_ref, s_ref, h_ref, phi_ref, prec)

        # In-register exact 3-way bf16 split, stacked on the K axis.
        yh = y.astype(jnp.bfloat16)
        r1 = y - yh.astype(dtype)
        ym = r1.astype(jnp.bfloat16)
        yl = (r1 - ym.astype(dtype)).astype(jnp.bfloat16)
        y3 = jnp.concatenate([yh, ym, yl], axis=1)      # (r, 3 n1, n2)

        cs3 = jax.lax.dot_general(
            w1s3_ref[:], y3,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.DEFAULT)        # (6 n1, r, n2)
        m2 = 2 * n1
        cs = cs3[:m2] + cs3[m2:2 * m2] + cs3[2 * m2:]

        c_r = cs[:n1]
        s_r = cs[n1:]
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        tr = c_r * T_c - s_r * T_s
        ti = s_r * T_c + c_r * T_s
        out = dot_lane(tr, p_ref[:]) + dot_lane(ti, q_ref[:])

        nyq = jnp.sum(tr[0] * alt_ref[:], axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, out.shape[1:], 1)
        row0 = jnp.where(lane == n2h, nyq, out[0])
        out = jax.lax.concatenate([row0[None], out[1:]], 0)

        t5 = jnp.transpose(out, (1, 2, 0))
        or_ref[:] = t5[:, :n2h]
        oi_ref[:] = t5[:, n2h:]

    return body


def _make_packed_regw_kernel(precision, n2h: int, n1: int, qf: int):
    """Wide-store variant of :func:`_make_packed_reg_kernel`.

    The reg kernel's output planes are (f, h, n1) — an n1(=32)-lane minor
    dim, so every store moves sub-128-lane rows.  This kernel emits the
    SAME bytes in the SAME natural bin order as (f, h/qf, qf*n1) planes
    (row-major (qq, b, k1) flattens to bin k = k1 + n1*(qf*qq + b)), with
    qf*n1 = 128 full lanes per row:

      * step-3 tables are COLUMN-PERMUTED host-side so within each re/im
        half, output lane b*w + qq holds bin k2 = qf*qq + b (w = h/qf);
      * the in-register reorder becomes qf quarter-width transposes
        (n1, r, w) -> (r, w, n1) per half plus one lane concatenate —
        the same data movement as the reg kernel's single transpose, but
        the result rows are 128 lanes wide.

    The Nyquist packing slot (Im X[0], global lane n2h) is unchanged:
    k2 = 0 maps to b = 0, qq = 0 — the first lane of the im half.

    MEASURED AND REJECTED on v5e (kept as a documented variant): reg 8.4
    vs regw 6.2 Gs/s e2e in one process (r64 6.7) — the qf quarter
    transposes plus the 32-lane concatenate relayout cost far more than
    the wide stores save; the per-tile (r, h, n1) store region is already
    HBM-contiguous, so the narrow-lane penalty probe_store shows for
    generic narrow copies evidently does not dominate here.
    """
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)
    w = n2h // qf

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

        nyq = jnp.sum(tr[0] * alt_ref[:], axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, out.shape[1:], 1)
        row0 = jnp.where(lane == n2h, nyq, out[0])
        out = jax.lax.concatenate([row0[None], out[1:]], 0)

        parts_r = []
        parts_i = []
        for b in range(qf):
            parts_r.append(jnp.transpose(
                out[:, :, b * w:(b + 1) * w], (1, 2, 0)))
            parts_i.append(jnp.transpose(
                out[:, :, n2h + b * w:n2h + (b + 1) * w], (1, 2, 0)))
        or_ref[:] = jax.lax.concatenate(parts_r, 2)   # (r, w, qf n1)
        oi_ref[:] = jax.lax.concatenate(parts_i, 2)

    return body


def _regw_qf(n1: int, n2h: int) -> int:
    """Largest lane-packing factor: qf*n1 <= 128, qf divides n2h."""
    qf = max(1, 128 // n1)
    while qf > 1 and n2h % qf:
        qf -= 1
    return qf


def _make_packed_regg_kernel(precision, n2h: int, n1: int, g: int):
    """Grouped variant of :func:`_make_packed_reg_kernel`: step 1 contracts
    g frames at once against the block-diagonal table

        Wg = blockdiag(W1cs, ..., W1cs)    (2 g n1, g n1)

    via the FREE leading-dim regroup (r, n1, n2) -> (r/g, g n1, n2).  MXU
    cost is ceil(M/128) ceil(K/128) ceil(N/128) passes; the ungrouped
    stacked dot (M = 2 n1 = 64, K = n1 = 32) runs at 1/8 tile utilization
    and is ~half of ALL kernel passes.  g = 2 fills K = 64 and halves the
    pass count (32 -> 16 per r = 32 tile); g = 4 fills M = 256, K = 128 at
    the same 16 (the block-diagonal zero fraction grows as (g-1)/g, so
    pass count is flat beyond g = 2 — but fewer, fatter dots can still
    schedule better).  Twiddle + packed step 3 + Nyquist run per group
    half exactly as in the reg kernel; the g per-half (r/g, n2, n1)
    register tiles are re-interleaved with one leading-axis concat +
    merge, so the OUTPUT CONTRACT IS IDENTICAL to "reg" (natural-order
    re/im planes, zero XLA relayout).
    """
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1g_ref, p_ref, q_ref,
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
        r, _, n2 = y.shape
        # Frame f = g p + q lands at sublane block q of group row p.
        yg = y.reshape(r // g, g * n1, n2)
        cs = dot1f(w1g_ref[:], yg)          # (2 g n1, r/g, n2)

        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (r // g, n2), 1)
        alt = alt_ref[:]
        parts = []
        for qi in range(g):
            c_r = cs[2 * n1 * qi: 2 * n1 * qi + n1]
            s_r = cs[2 * n1 * qi + n1: 2 * n1 * (qi + 1)]
            tr = c_r * T_c - s_r * T_s
            ti = s_r * T_c + c_r * T_s
            out = dot_lane(tr, p_ref[:]) + dot_lane(ti, q_ref[:])
            nyq = jnp.sum(tr[0] * alt, axis=-1, keepdims=True)
            row0 = jnp.where(lane == n2h, nyq, out[0])
            out = jax.lax.concatenate([row0[None], out[1:]], 0)
            # (n1, r/g, n2) -> (r/g, 1, n2, n1): the same Mosaic-legal 3-D
            # transpose as the reg kernel, plus a free unit leading axis.
            parts.append(jnp.transpose(out, (1, 2, 0))[:, None])
        # Re-interleave groups: (r/g, g, n2, n1) -> (r, n2, n1) is a free
        # leading-dim merge, restoring natural frame order f = g p + q.
        t5 = jax.lax.concatenate(parts, 1).reshape(r, n2, n1)
        or_ref[:] = t5[:, :n2h]
        oi_ref[:] = t5[:, n2h:]

    return body


def _make_packed_regp_kernel(precision, n2h: int, n1: int, g: int):
    """Small-n1 variant of the packed reg kernel — MEASURED AND
    REJECTED on v5e (tools/probe_small_n, one process, parity-gated
    at >= 136.9 dB both layouts): N = 1024 (n1 = 8, g = 16) 15.86 vs
    reg's 15.91 ms — an exact tie, DISPROVING the step-1-underfill
    hypothesis for the 1024 shortfall — and N = 4096 (n1 = 32, g = 4)
    8.76 vs 7.91 ms — the two un-group transposes cost more than the
    6x saved step-1 passes.  Step 1 contracts g frames at once against
    the block-diagonal stacked table

        W1p = [blockdiag(W1c, ..., W1c); blockdiag(W1s, ..., W1s)]
              ((2 g n1, g n1), cos rows first)

    via the FREE leading-dim regroup (r, n1, n2) -> (r/g, g n1, n2), then
    UN-groups the result back to (n1, r, n2) with one register transpose
    per half so steps 2-3 run FULL-WIDTH, unlike reg2/reg4
    (chain_variants._make_packed_regg_kernel) whose per-group downstream
    shrinks the step-3 M dim to r/g and moves the underfill there.

    Rationale (N = 1024, n1 = 8): the ungrouped stacked step-1 dot has
    M = 16, K = 8 — 1% of each 128x128 MXU tile — and costs r passes per
    tile while steps 3 cost ~16; at g = 128/n1 = 16 step 1 fills
    K = 128, M = 256 and drops to 2 r/g passes.  The half split
    cs[:gn1]/cs[gn1:] is an outer-axis slice (free); the un-group
    transpose (g, n1, r/g, n2) -> (n1, r/g, g, n2) never touches the
    lane dim.  Output contract identical to "reg" (natural-order re/im
    planes, zero XLA relayout).
    """
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1p_ref, p_ref, q_ref,
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
        r, _, n2 = y.shape
        yg = y.reshape(r // g, g * n1, n2)
        cs = dot1f(w1p_ref[:], yg)           # (2 g n1, r/g, n2)
        cs5 = cs.reshape(2, g, n1, r // g, n2)
        # Un-group: row (qi, i) of group p is frame p*g + qi; transposing
        # (g, n1, r/g, n2) -> (n1, r/g, g, n2) merges (r/g, g) back to
        # the natural frame order without touching the lane dim.
        c_r = jnp.transpose(cs5[0], (1, 2, 0, 3)).reshape(n1, r, n2)
        s_r = jnp.transpose(cs5[1], (1, 2, 0, 3)).reshape(n1, r, n2)
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        tr = c_r * T_c - s_r * T_s
        ti = s_r * T_c + c_r * T_s
        out = dot_lane(tr, p_ref[:]) + dot_lane(ti, q_ref[:])

        nyq = jnp.sum(tr[0] * alt_ref[:], axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, out.shape[1:], 1)
        row0 = jnp.where(lane == n2h, nyq, out[0])
        out = jax.lax.concatenate([row0[None], out[1:]], 0)

        t5 = jnp.transpose(out, (1, 2, 0))
        or_ref[:] = t5[:, :n2h]
        oi_ref[:] = t5[:, n2h:]

    return body


def _make_packed_fmajor_kernel(precision, n2h: int, n1: int):
    """Packed half-spectrum kernel with FRAME-MAJOR output blocks.

    The k1-major output array (n1, f_total, n2) makes every tile's store
    32 scattered 8 KB chunks (one per k1 row, 8 MB apart) — measured 136
    GB/s on the whole pipeline, the fused kernel's real bottleneck.  This
    variant keeps the frame index LEADING through every step so each tile
    writes ONE contiguous (r, n1, n2) block:

        y  (r, n1, n2)   IIR, as before
        cs (r, n2, 2 n1) step 1 contracts n1 with [W1c; W1s]^T
        tr, ti (r, n2, n1)  twiddle in (t, k1) orientation
        out (r, n1, n2)  step 3 contracts t with P^T / Q^T

    The XLA-side bin reorder becomes a per-frame (n1, n2) -> (n2, n1)
    minor-dims tile transpose (0, 2, 1) instead of hauling the frame axis
    into the minor tiles.
    """
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1t_ref, pt_ref, qt_ref,
             tc_ref, ts_ref, alt_ref, o_ref):
        dtype = x_ref.dtype

        def make_dot(contract_axis, rhs_axis):
            return functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((contract_axis,), (rhs_axis,)),
                                   ((), ())),
                preferred_element_type=dtype, precision=prec)

        dot_lane = make_dot(2, 1)
        dot_mid = make_dot(1, 0)    # contract lhs middle dim with rhs rows

        y = _iir_block(x_ref, s_ref, h_ref, phi_ref, prec)

        # Step 1: (r, n1, n2) x (n1, 2 n1) -> (r, n2, 2 n1).
        cs = dot_mid(y, w1t_ref[:])
        c_r = cs[..., :n1]
        s_r = cs[..., n1:]
        # Step 2: twiddle, (n2, n1) orientation.
        T_c = tc_ref[:][None]
        T_s = ts_ref[:][None]
        tr = c_r * T_c - s_r * T_s
        ti = s_r * T_c + c_r * T_s
        # Step 3: contract t -> (r, n1, n2pack).
        out = dot_mid(tr, pt_ref[:]) + dot_mid(ti, qt_ref[:])

        # Nyquist into [f, k1 = 0, lane n2h] (see _make_packed_kernel).
        nyq = jnp.sum(tr[:, :, 0] * alt_ref[:], axis=-1,
                      keepdims=True)                       # (r, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32,
                                        (out.shape[0], out.shape[2]), 1)
        o_ref[:] = out
        o_ref[:, 0, :] = jnp.where(lane == n2h, nyq, out[:, 0, :])

    return body


def _make_packed_pair_kernel(precision, n2h: int, n1: int):
    """Packed half-spectrum kernel with 2-frame block-diagonal step 1.

    The stacked step-1 dot still wastes the MXU: M = 2 n1 = 64, K = n1 =
    32 uses 1/8 of each 128x128 pass tile.  Grouping frame PAIRS on the
    sublane axis (a FREE leading-dim reshape (r, n1, n2) -> (r/2, 2 n1,
    n2)) and contracting with the block-diagonal table

        B = [[W1cs, 0], [0, W1cs]]    (4 n1, 2 n1)

    doubles both M and K: half the step-1 passes again (16 -> 8 per
    r = 16 tile at n1 = 32).  Everything downstream runs per pair-half;
    the output block gains a pair axis (n1, r/2, 2, n2) that the XLA-side
    reorder folds back (frame f = 2 p + q is row-major in (p, q)).
    """
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, s_ref, h_ref, phi_ref, w1p_ref, p_ref, q_ref,
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

        y = _iir_block(x_ref, s_ref, h_ref, phi_ref, prec)
        r = y.shape[0]
        y2 = y.reshape(r // 2, 2 * n1, y.shape[2])

        cs = dot1f(w1p_ref[:], y2)   # (4 n1, r/2, n2)
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (r // 2, y.shape[2]), 1)
        alt = alt_ref[:]
        for qi in range(2):
            c_r = cs[2 * n1 * qi: 2 * n1 * qi + n1]
            s_r = cs[2 * n1 * qi + n1: 2 * n1 * (qi + 1)]
            tr = c_r * T_c - s_r * T_s
            ti = s_r * T_c + c_r * T_s
            out = dot_lane(tr, p_ref[:]) + dot_lane(ti, q_ref[:])
            nyq = jnp.sum(tr[0] * alt, axis=-1, keepdims=True)
            o_ref[:, :, qi, :] = out
            o_ref[0, :, qi, :] = jnp.where(lane == n2h, nyq, out[0])

    return body
