"""Fused overlap-save convolution kernel: FFT -> H product -> IFFT in VMEM.

The XLA overlap-save route (ops/conv.py -> ops/fir.OverlapSaveFIR) runs
forward FFT, spectrum product, and inverse FFT as separate HBM-level ops —
even with the fused FFT kernels each stage round-trips its full spectrum
planes through HBM (~9x the signal bytes).  This kernel performs the whole
per-frame pipeline in VMEM: read the framed input once, write only the
valid (non-aliased) output samples.

Math (same four-step factorization as kernels/fft.py, N = n1 * n2):

    forward:  x (r, n1, n2) --dot W1--> (k1, r, n2) --twiddle--> --dot W2-->
              F (k1, r, k2),   bin k = k1 + n1 k2
    product:  G = F * H      (H the tap spectrum, constant (k1, k2) planes,
                              1/N inverse scale folded in — free)
    inverse:  y[t1 n2 + t2] = sum_k1 e^{+2 pi i k1 t1 / n1}
                  e^{+2 pi i k1 t2 / N} sum_k2 G[k1, k2] e^{+2 pi i k2 t2 / n2}
              == the four-step run backwards, consuming the forward output
              layout DIRECTLY — no bin reorder ever materializes.
    discard:  overlap rounded UP to whole n2 rows (o1 = ceil((m-1)/n2)), so
              dropping the aliased prefix is a sublane row slice in VMEM
              and each frame stores one contiguous (hop = N - o1 n2) block.

Only the real output plane is computed (real signal * real taps): the
inverse step-C contracts the stacked [W1c; -W1s+] table against [Br; Bi]
in ONE MXU dot.

Cited reference anchor: the compile-time tap/twiddle table economics of
include/sdsp/fft.h:264-265, applied to an op family the reference lacks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simpledsp_tpu.kernels.fft import _best_split, _vma
from simpledsp_tpu.ops.fft import _dft_mats_f64, _twiddle_f64

__all__ = ["ols_supported", "conv_ols_frames", "convolve_ols_fused"]


def ols_supported(nfft: int) -> bool:
    return _best_split(nfft) is not None


@functools.lru_cache(maxsize=64)
def _ols_consts(nfft: int, taps_bytes: bytes, m: int, dtype_name: str):
    """Constant tables: forward DFT mats + twiddles, inverse mats with the
    conjugate signs, and the tap spectrum in the kernel's (k1, k2) layout
    with the 1/N inverse scale folded in."""
    n1, n2 = _best_split(nfft)
    dt = np.dtype(dtype_name)
    w1c, w1s = _dft_mats_f64(n1)     # forward: W = c + i s, s = -sin
    w2c, w2s = _dft_mats_f64(n2)
    tc, ts = _twiddle_f64(n1, n2)    # (n1, n2), forward signs
    taps = np.frombuffer(taps_bytes, dtype=np.float64, count=m)
    H = np.fft.fft(taps, nfft) / nfft          # 1/N folded into H
    # H at position (k1, k2), bin k = k1 + n1 k2.
    Hg = H.reshape(n2, n1).T                   # (n1, n2) = (k1, k2)
    # Forward step-1 stacked [W1c; W1s] (2 n1, n1).
    w1cs = np.concatenate([w1c, w1s], axis=0)
    # Inverse step-C stacked [W1c | +sin(W1)] -> y_re = W1c Br - W1s+ Bi
    # with W1s+ = -w1s (w1s holds -sin), i.e. [W1c | w1s] contracted
    # against [Br; Bi] stacked on the sublane axis... careful with signs:
    #   y = Re{ W1+ (Br + i Bi) } = W1c Br - sin1 Bi,  sin1 = -w1s
    # so the stacked table is [W1c ; w1s] (2 n1, n1) applied to [Br; Bi].
    w1inv = np.concatenate([w1c, w1s], axis=1)  # (n1, 2 n1): [W1c | w1s]
    return (n1, n2,
            w1cs.astype(dt),
            w2c.astype(dt), w2s.astype(dt),
            tc.astype(dt), ts.astype(dt),
            w1inv.astype(dt),
            np.ascontiguousarray(Hg.real).astype(dt),
            np.ascontiguousarray(Hg.imag).astype(dt))


def _make_ols_kernel(n1: int, n2: int, o1: int, precision=None):
    prec = (jax.lax.Precision.DEFAULT
            if precision == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)

    def body(x_ref, w1cs_ref, w2c_ref, w2s_ref, tc_ref, ts_ref,
             w1inv_ref, hr_ref, hi_ref, o_ref):
        dtype = x_ref.dtype

        def make_dot(dims):
            return functools.partial(
                jax.lax.dot_general, dimension_numbers=(dims, ((), ())),
                preferred_element_type=dtype, precision=prec)

        dot1f = make_dot(((1,), (1,)))   # contract sublane vs rhs dim 1
        dot1c = make_dot(((1,), (0,)))   # contract lhs dim 1 vs rhs dim 0
        dot_lane = make_dot(((2,), (1,)))

        # ---- forward four-step (real input) ----
        cs = dot1f(w1cs_ref[:], x_ref[:])          # (2 n1, r, n2)
        c_r = cs[:n1]
        s_r = cs[n1:]
        T_c = tc_ref[:][:, None, :]
        T_s = ts_ref[:][:, None, :]
        tr = c_r * T_c - s_r * T_s
        ti = s_r * T_c + c_r * T_s
        fr = dot_lane(tr, w2c_ref[:]) - dot_lane(ti, w2s_ref[:])
        fi = dot_lane(ti, w2c_ref[:]) + dot_lane(tr, w2s_ref[:])

        # ---- spectrum product (H includes 1/N) ----
        Hr = hr_ref[:][:, None, :]
        Hi = hi_ref[:][:, None, :]
        gr = fr * Hr - fi * Hi
        gi = fr * Hi + fi * Hr

        # ---- inverse four-step consuming the (k1, r, k2) layout ----
        # step A: contract k2 with W2+ = conj(W2) = (w2c, -w2s):
        #   A = G W2+ -> Ar = gr w2c + gi w2s ; Ai = gi w2c - gr w2s
        ar = dot_lane(gr, w2c_ref[:]) + dot_lane(gi, w2s_ref[:])
        ai = dot_lane(gi, w2c_ref[:]) - dot_lane(gr, w2s_ref[:])
        # step B: conjugate twiddle (tc, -ts):
        br = ar * T_c + ai * T_s
        bi = ai * T_c - ar * T_s
        # step C: one stacked dot [W1c | w1s] x [Br; Bi] over 2 n1,
        # keeping only the real output plane; discard the o1 aliased
        # sublane rows (t1 < o1) by slicing the lhs table rows.
        b2 = jax.lax.concatenate([br, bi], 0)      # (2 n1, r, n2)
        y = dot1c(w1inv_ref[:], b2)                # (n1, r, n2) = (t1, r, t2)
        # (t1, r, t2) -> (r, t1, t2): sublane-axes swap, lanes untouched.
        o_ref[:] = jnp.transpose(y[o1:], (1, 0, 2))

    return body


def conv_ols_frames(frames: jnp.ndarray, taps64: np.ndarray, *,
                    overlap_rows: int, frames_per_tile: int = 8,
                    interpret: bool = False, precision=None) -> jnp.ndarray:
    """Fused OLS: frames (F, nfft) real (each = o1*n2 history + hop new
    samples) -> valid outputs (F, hop), hop = nfft - overlap_rows * n2.

    ``overlap_rows`` must satisfy overlap_rows * n2 >= len(taps) - 1.
    """
    f, nfft = frames.shape
    split = _best_split(nfft)
    if split is None:
        raise ValueError(f"size {nfft} not supported by the fused kernel")
    n1, n2 = split
    o1 = int(overlap_rows)
    m = taps64.size
    if o1 * n2 < m - 1:
        raise ValueError(f"overlap {o1}*{n2} < taps-1 ({m - 1})")
    if o1 >= n1:
        raise ValueError(f"overlap rows {o1} leave no output (n1={n1})")
    dt = frames.dtype
    (n1, n2, w1cs, w2c, w2s, tc, ts, w1inv, hgr, hgi) = _ols_consts(
        nfft, np.asarray(taps64, np.float64).tobytes(), m, np.dtype(dt).name)

    # VMEM: ~14 live (r, nfft) planes of scratch through the two
    # transforms; stay under ~13 MB.
    max_r = max(1, (13 << 20) // (14 * nfft * dt.itemsize))
    max_r = 1 << (max_r.bit_length() - 1)
    r = min(frames_per_tile, max_r)
    while f % r != 0:
        r //= 2
        if r == 0:
            raise ValueError(f"frame count {f} not tileable")

    x3 = frames.reshape(f, n1, n2)
    tables = (w1cs, w2c, w2s, tc, ts, w1inv, hgr, hgi)
    vma = _vma(x3)
    if vma:
        tables = tuple(jax.lax.pcast(jnp.asarray(a), tuple(vma),
                                     to="varying") for a in tables)

    in_blk = pl.BlockSpec((r, n1, n2), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((r, n1 - o1, n2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        _make_ols_kernel(n1, n2, o1, precision),
        grid=(f // r,),
        in_specs=[in_blk] + [const_spec(a) for a in tables],
        out_specs=out_blk,
        out_shape=jax.ShapeDtypeStruct((f, n1 - o1, n2), dt, vma=vma),
        cost_estimate=pl.CostEstimate(
            flops=int(14 * nfft * (n1 + n2) * f),
            bytes_accessed=2 * f * nfft * dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x3, *tables)
    return y.reshape(f, (n1 - o1) * n2)


def convolve_ols_fused(x: jnp.ndarray, taps64: np.ndarray, *,
                       nfft: int = 4096, frames_per_tile: int = 8,
                       interpret: bool = False,
                       precision=None) -> jnp.ndarray:
    """FULL linear convolution of real (..., T) with real taps via the
    fused OLS kernel: returns (..., T + m - 1).

    Host-side gather-free framing (the ops/fir.OverlapSaveFIR trick with
    hop-sample blocks): frame f = xp[f*hop : f*hop + nfft] where xp is the
    o-zero-prefixed signal, o = ceil((m-1)/n2) * n2.
    """
    n1, n2 = _best_split(nfft)
    taps64 = np.asarray(taps64, np.float64)
    m = taps64.size
    o1 = -(-(m - 1) // n2)
    o = o1 * n2
    hop = nfft - o
    if hop <= 0:
        raise ValueError(f"taps ({m}) too long for nfft={nfft}")
    lead = x.shape[:-1]
    t = x.shape[-1]
    total = t + m - 1
    nf = -(-total // hop)
    # Zero prefix (o) + tail so that nf * hop + (nfft - hop) samples exist.
    pad_tail = nf * hop + o - (t + o)
    xp = jnp.pad(x.reshape(-1, t), [(0, 0), (o, o + pad_tail)])
    q = -(-nfft // hop)
    nb = nf + q - 1
    need = nb * hop
    if need > xp.shape[-1]:
        xp = jnp.pad(xp, [(0, 0), (0, need - xp.shape[-1])])
    xb = xp[:, : nb * hop].reshape(-1, nb, hop)
    frames = jnp.concatenate([xb[:, j: j + nf, :] for j in range(q)],
                             axis=-1)[..., :nfft]       # (B, nf, nfft)
    y = conv_ols_frames(frames.reshape(-1, nfft), taps64,
                        overlap_rows=o1, frames_per_tile=frames_per_tile,
                        interpret=interpret, precision=precision)
    y = y.reshape(frames.shape[0], nf * hop)[..., :total]
    return y.reshape(lead + (total,))
