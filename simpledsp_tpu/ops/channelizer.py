"""Polyphase filter-bank (PFB) channelizer — net-new component required by
the north star (BASELINE.json: "channelize + resample + FM demod";
SURVEY.md §2b "channelizer (polyphase filter bank + batched FFT)").

Analysis channelizer, critically sampled: splits a wideband stream into M
baseband channels at rate fs/M:

    y_c[n] = sum_k h[k] x[nM - k] e^{-2 pi i c k / M}
           = DFT_M over r of  v_r[n],   v_r[n] = sum_j h[jM + r] x[(n-j)M - r]

i.e. M polyphase branch FIRs (strided shift-add, trace-time-constant taps —
same TPU pattern as ops/fir.py) followed by a length-M FFT across branches
(the four-step matmul FFT from ops/fft.py, batched over time).  Streaming
with explicit carried history; blockwise == whole-signal at multiples of M.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simpledsp_tpu.design.fir import pfb_prototype_taps
from simpledsp_tpu.ops import fft as _fft
from simpledsp_tpu.ops.fir import FIRState, fir_init

__all__ = ["PFBChannelizer", "ChanStateRI"]


class ChanStateRI(NamedTuple):
    """Carried channelizer input history as (re, im) float planes."""

    hist_r: jnp.ndarray  # (..., L-1)
    hist_i: jnp.ndarray  # (..., L-1)


class PFBChannelizer:
    """M-channel analysis polyphase filter bank.

    Args:
      num_channels: M (channel spacing fs/M, output rate fs/M each).
      taps: prototype low-pass of length M*K (defaults to a Kaiser design
        from design/fir.py with cutoff at half the channel spacing).
      dtype: compute dtype of the branch filters (f32 on TPU, f64 for parity).

    Call with x: (..., T) real or complex, T % M == 0; returns
    (y, state) with y: (..., T//M, M) complex channel outputs, channel c
    centered at c*fs/M.
    """

    def __init__(self, num_channels: int, taps: Optional[np.ndarray] = None,
                 taps_per_channel: int = 16, dtype=jnp.float32):
        self.m = int(num_channels)
        if taps is None:
            taps = pfb_prototype_taps(self.m, taps_per_channel)
        taps = np.asarray(taps, dtype=np.float64)
        if taps.size % self.m != 0:
            taps = np.pad(taps, (0, self.m - taps.size % self.m))
        self.num_taps = taps.size
        self.taps_per_branch = taps.size // self.m
        self.hist_len = self.num_taps - 1
        self.dtype = dtype
        # branch_taps[r, j] = h[j*M + r]
        self._branch = taps.reshape(self.taps_per_branch, self.m).T.copy()
        self._jit = jax.jit(self._run)

    def _branch_filter(self, xp: jnp.ndarray) -> jnp.ndarray:
        """Polyphase branch FIRs: (..., L-1+T) -> (..., T//M, M) real/any."""
        M, K, L = self.m, self.taps_per_branch, self.num_taps
        T = xp.shape[-1] - (L - 1)
        G = T // M
        branches = []
        for r in range(M):
            acc = None
            for j in range(K):
                w = float(self._branch[r, j])
                if w == 0.0:
                    continue
                a = L - 1 - r - j * M
                seg = jax.lax.slice_in_dim(
                    xp, a, a + (G - 1) * M + 1, stride=M, axis=-1)
                term = seg * jnp.asarray(w, dtype=seg.dtype)
                acc = term if acc is None else acc + term
            if acc is None:
                acc = jnp.zeros(xp.shape[:-1] + (G,), dtype=xp.dtype)
            branches.append(acc)
        return jnp.stack(branches, axis=-1)  # (..., G, M)

    def _run(self, xp: jnp.ndarray):
        # Channel c downconverts +c*fs/M, i.e. y_c = sum_r v_r e^{+2pi i cr/M}
        # — an UNSCALED inverse DFT across branches, computed with the
        # forward kernel via conjugation: IDFT(v) = conj(DFT(conj(v))).
        v = self._branch_filter(xp)
        return jnp.conj(_fft.fft(jnp.conj(v)))

    def _run_ri(self, xpr: jnp.ndarray, xpi: jnp.ndarray):
        """TPU-native path: IQ carried as (re, im) float planes; the branch
        FIRs (real taps) apply per-plane and the cross-branch (inverse) DFT
        runs on the RI pair — no complex dtype ever materializes."""
        vr = self._branch_filter(xpr)
        vi = self._branch_filter(xpi)
        yr, yi = _fft.fft_ri(vr, -vi)
        return yr, -yi

    def process_ri(self, xr: jnp.ndarray, xi: jnp.ndarray,
                   state: Optional["ChanStateRI"] = None
                   ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], "ChanStateRI"]:
        """Streaming RI entry point: (xr, xi): (..., T) float planes,
        T % M == 0; returns ((yr, yi) each (..., T//M, M), state)."""
        T = xr.shape[-1]
        if T % self.m != 0:
            raise ValueError(f"block length {T} must be a multiple of M={self.m}")
        if state is None:
            z = jnp.zeros(xr.shape[:-1] + (self.hist_len,), dtype=xr.dtype)
            state = ChanStateRI(z, z)
        xpr = jnp.concatenate([state.hist_r, xr], axis=-1)
        xpi = jnp.concatenate([state.hist_i, xi], axis=-1)
        yr, yi = self._run_ri(xpr, xpi)
        new = ChanStateRI(xpr[..., xpr.shape[-1] - self.hist_len:],
                          xpi[..., xpi.shape[-1] - self.hist_len:])
        return (yr, yi), new

    def __call__(self, x: jnp.ndarray, state: Optional[FIRState] = None
                 ) -> Tuple[jnp.ndarray, FIRState]:
        T = x.shape[-1]
        if T % self.m != 0:
            raise ValueError(f"block length {T} must be a multiple of M={self.m}")
        if not jnp.iscomplexobj(x):
            x = x.astype(self.dtype)
        if state is None:
            state = fir_init(self.hist_len, x.shape[:-1],
                             dtype=x.dtype)
        xp = jnp.concatenate([state.hist.astype(x.dtype), x], axis=-1)
        y = self._jit(xp)
        return y, FIRState(xp[..., xp.shape[-1] - self.hist_len:])
