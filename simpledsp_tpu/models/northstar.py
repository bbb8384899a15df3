"""The north-star signal chain: 8-SOS Butterworth IIR -> 4096-pt FFT.

This is the framework's flagship "model" (BASELINE.md headline metric): the
composition of the reference's two capabilities — cascaded-biquad filtering
(reference: include/sdsp/casc_2o_iir.h:36) into a power-of-4 FFT (reference:
include/sdsp/fft.h:301) — batched over channels and framed over time, as one
jitted TPU program.  The reference's tests compose the two manually; here the
chain is a first-class component with carried streaming state.

Serial form (:class:`NorthStarChain`) runs on one chip; the sharded form
(:class:`ShardedNorthStarChain`) runs the IIR sequence-parallel over the
``sp`` mesh axis and keeps the FFT frames local to each shard, so the only
cross-device traffic is the tiny IIR state collective (parallel/iir.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from simpledsp_tpu.design.biquad import BiquadCascadeDesign, design_lowpass
from simpledsp_tpu.ops import fft as _fft
from simpledsp_tpu.kernels import fft as _kfft
from simpledsp_tpu.kernels import chain as _kchain
from simpledsp_tpu.ops.iir import BlockIIR, IIRState, iir_init
from simpledsp_tpu.parallel.iir import ShardedBlockIIR
from simpledsp_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

__all__ = ["default_design", "NorthStarChain", "ShardedNorthStarChain"]


def default_design(fs: float = 39000.0) -> BiquadCascadeDesign:
    """The benchmark configuration: 8th-order (4-SOS) low-pass at the golden
    fixtures' sample rate (reference: test_data/WriteImpulse.m:7-14)."""
    return design_lowpass(4, 2000.0, fs)


class NorthStarChain:
    """Streaming IIR -> framed FFT on one device.

    Call with x: (C, T), T a multiple of fft_size; returns
    (((spec_re, spec_im) each (C, T // fft_size, fft_size // 2)), state) —
    RI float planes (TPU-native; complex never materializes) holding the
    PACKED ONE-SIDED spectrum of each frame: the input is real, so bins
    above N/2 are conjugate-redundant and are never computed, written, or
    reordered (half the FFT matmuls and output traffic).  Bin k of the
    planes is X[k] for k < N/2; the (real) Nyquist bin X[N/2] is packed in
    ``spec_im[..., 0]`` (the Im X[0] == 0 slot — FFTW halfcomplex
    convention).  ``ops.fft.unpack_rfft_ri`` recovers the pure N/2+1 form.
    """

    def __init__(self, design: Optional[BiquadCascadeDesign] = None,
                 fft_size: int = 4096, block_size: int = 256,
                 dtype=jnp.float32, precision=None,
                 use_pallas: Optional[bool] = None,
                 projection: Optional[str] = None):
        self.design = design or default_design()
        self.projection = projection
        self.fft_size = int(fft_size)
        if self.fft_size % 2:
            raise ValueError("fft_size must be even (one-sided output)")
        self.dtype = dtype
        self.precision = precision
        self.iir = BlockIIR(self.design, block_size=block_size, dtype=dtype,
                            precision=precision)
        # The fused Pallas kernels run on real TPU backends; elsewhere
        # (CPU tests, parity runs) use the composable jnp path.
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and _kfft.pallas_fft_supported(self.fft_size))
        self.use_pallas = use_pallas
        # Fully-fused single-kernel path (IIR conv + FFT in VMEM): needs
        # the fft_size = n1 * 64 layout (kernels/chain.py).
        self._fused_ops = None
        if use_pallas:
            try:
                self._fused_ops = _kchain.FusedNorthStarOperators(
                    self.design, self.fft_size, dtype=dtype)
            except ValueError:
                pass
        # Pin the spectra outputs DETERMINISTICALLY; which physical
        # layout depends on the kernel layout fused_chain_frames
        # auto-selects (kernels/chain.py:resolve_layout — derived from
        # it, not duplicated; round-5 matrix, tools/probe_1024_prod):
        # - "reg" (n1 >= 32): row-major (0,1,2).  XLA's entry-layout
        #   heuristic otherwise compacts the planes, inserting two
        #   268 MB/call copies (profiler copy.48/49).
        # - "k1": the kernel's literal emission order (2,0,1) — the
        #   reorder transpose then lowers to a pure layout RELABEL
        #   (probe_1024_prod matrix at 1024: 6.6 ms vs 8.0 with a
        #   (0,2,1) pin, 14.0 with row-major — whose forced relayout
        #   copies were the round-4 1024 shortfall — and 7.8 unpinned).
        #   Bin order on flatten is unchanged (logical shape is
        #   identical); on-device consumers are layout-agnostic, host
        #   fetches pay a strided read.
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
        # local_devices: under jax.distributed a global-device pin would
        # make the output non-addressable on other processes.
        klay = (_kchain.resolve_layout(self._fused_ops.n1)
                if self._fused_ops is not None else "reg")
        rm = Format(Layout(major_to_minor=(0, 1, 2) if klay == "reg"
                           else (2, 0, 1)),
                    SingleDeviceSharding(jax.local_devices()[0]))
        self._jit = jax.jit(self._forward,
                            out_shardings=((rm, rm), None))

    def _forward(self, x: jnp.ndarray, s0: jnp.ndarray):
        """Jittable body: x (C, T); s0 flat state (C, D).  Returns packed
        one-sided RI spectra planes (each (C, F, N/2)) and the final
        state."""
        if self._fused_ops is not None:
            # flat_out: (C F, N/2/n1, n1) planes — reshaping to (C, F,
            # ...) inside jit costs two 268 MB layout copies (profiler
            # trace copy.48/49); __call__ splits the leading dim outside
            # jit for free.
            return _kchain.fused_chain_frames(
                self._fused_ops, x, s0, precision=self.precision,
                half_spectrum=True, flat_out=True,
                projection=self.projection)
        y, s_fin = self.iir.run_blocks(
            x.reshape(x.shape[0], -1, self.iir.block_size), s0)
        y = y.reshape(x.shape[0], -1, self.fft_size)
        sr, si = _fft.pack_rfft_ri(*_fft.rfft_ri(y))
        return (sr, si), s_fin

    def __call__(self, x: jnp.ndarray,
                 state: Optional[IIRState] = None
                 ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], IIRState]:
        """Returns ((spec_re, spec_im), state) — RI planes, TPU-native
        (complex never materializes; see ops/demod.py DemodStateRI).

        x may be (C, T), or — on the fused path — pre-framed
        (C, F, n1, n2) as produced by ``frame_input`` (same samples, saves
        a device-side re-tiling copy).
        """
        if x.ndim == 4:
            if self._fused_ops is None:
                raise ValueError(
                    "pre-framed (C, F, n1, n2) input requires the fused "
                    "kernel path (TPU backend + tileable fft_size); pass "
                    "flat (C, T) input here, e.g. x.reshape(C, -1)")
            c = x.shape[0]
            t = x.shape[1] * self.fft_size
        else:
            c, t = x.shape
        if t % self.fft_size or t % self.iir.block_size:
            raise ValueError(
                f"T={t} must be a multiple of fft_size={self.fft_size} "
                f"and block_size={self.iir.block_size}")
        m = self.design.nsections
        if state is None:
            state = iir_init(m, (c,), dtype=self.dtype)
        s0 = state.y_hist.reshape(c, -1)
        (sr, si), s_fin = self._jit(x.astype(self.dtype), s0)
        if self._fused_ops is not None:
            # Fused path: free flatten to natural bin order outside jit.
            sr = sr.reshape(c, -1, self.fft_size // 2)
            si = si.reshape(c, -1, self.fft_size // 2)
        return (sr, si), IIRState(s_fin.reshape(c, m + 1, 2))

    def frame_input(self, x_host: "np.ndarray") -> jnp.ndarray:
        """Upload a host (C, T) sample block in the fused kernel's framed
        tiling (C, F, n1, n2) — same samples, zero device-side copies."""
        ops = self._fused_ops
        if ops is None:
            return jnp.asarray(x_host, dtype=self.dtype)
        c, t = x_host.shape
        framed = np.asarray(x_host).reshape(c, t // self.fft_size,
                                            ops.n1, ops.n2)
        return jnp.asarray(framed, dtype=self.dtype)


class ShardedNorthStarChain:
    """North-star chain over a (dp, sp) mesh as ONE jitted shard_map program.

    Channels shard over ``dp``; time shards over ``sp``.  The IIR runs
    sequence-parallel (one ICI all_gather + psum of D-dim state vectors,
    parallel/iir.py); each shard then frames its own output and FFTs
    locally — zero cross-device traffic in the FFT.  Output spectra are
    packed one-sided planes (C, T // fft_size, fft_size // 2), exactly as
    :class:`NorthStarChain` (see its docstring for the bin layout).
    """

    def __init__(self, mesh: Mesh,
                 design: Optional[BiquadCascadeDesign] = None,
                 fft_size: int = 4096, block_size: int = 256,
                 dtype=jnp.float32, precision=None,
                 use_pallas: Optional[bool] = None):
        self.mesh = mesh
        self.design = design or default_design()
        self.fft_size = int(fft_size)
        if self.fft_size % 2:
            raise ValueError("fft_size must be even (one-sided output)")
        self.dtype = dtype
        self.precision = precision
        self.iir = ShardedBlockIIR(self.design, mesh, block_size=block_size,
                                   dtype=dtype, precision=precision)
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and _kfft.pallas_fft_supported(self.fft_size))
        self.use_pallas = use_pallas
        # Fully-fused sequence-parallel path: per-shard fused kernel + one
        # all_gather for the cross-shard state (kernels/chain.py axis_name).
        self._fused_ops = None
        self._interpret = False  # tests may set True to run fused on CPU
        if use_pallas:
            try:
                self._fused_ops = _kchain.FusedNorthStarOperators(
                    self.design, self.fft_size, dtype=dtype)
            except ValueError:
                pass
        self._jit_cache = {}

    def _build(self, c: int, t: int):
        key = (c, t)
        if key not in self._jit_cache:
            n_seq = self.iir.n_seq
            if self._fused_ops is not None:
                nf_local = t // n_seq // self.fft_size
                spw = self._fused_ops.shard_powers(nf_local, n_seq)

                def local_fn(xl, s0):
                    return _kchain.fused_chain_frames(
                        self._fused_ops, xl, s0, precision=self.precision,
                        axis_name=SEQ_AXIS, shard_powers=spw,
                        half_spectrum=True, interpret=self._interpret)

                spectra_spec = (P(DATA_AXIS, SEQ_AXIS, None, None),
                                P(DATA_AXIS, SEQ_AXIS, None, None))
            else:
                nb_local = t // n_seq // self.iir.block_size
                apow = self.iir._apow(nb_local)

                def local_fn(xl, s0):
                    y, s_fin = self.iir._local(apow, xl, s0)
                    frames = y.reshape(y.shape[0], -1, self.fft_size)
                    sr, si = _fft.pack_rfft_ri(*_fft.rfft_ri(frames))
                    return (sr, si), s_fin

                spectra_spec = (P(DATA_AXIS, SEQ_AXIS, None),
                                P(DATA_AXIS, SEQ_AXIS, None))

            fn = jax.shard_map(
                local_fn, mesh=self.mesh,
                in_specs=(P(DATA_AXIS, SEQ_AXIS), P(DATA_AXIS, None)),
                out_specs=(spectra_spec, P(DATA_AXIS, None)),
                # Pallas interpret mode (CPU tests) loses vma on its grid
                # loop's output carries; the compiled TPU path keeps the
                # full varying-axes check.
                check_vma=not self._interpret,
            )
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def __call__(self, x: jnp.ndarray,
                 state: Optional[IIRState] = None
                 ) -> Tuple[jnp.ndarray, IIRState]:
        c, t = x.shape
        t_local = t // self.iir.n_seq
        if (t_local * self.iir.n_seq != t or t_local % self.fft_size
                or t_local % self.iir.block_size):
            raise ValueError(
                f"local shard length must be a multiple of fft_size="
                f"{self.fft_size} and block_size={self.iir.block_size}")
        m = self.design.nsections
        if state is None:
            state = iir_init(m, (c,), dtype=self.dtype)
        s0 = state.y_hist.reshape(c, -1)
        (sr, si), s_fin = self._build(c, t)(x.astype(self.dtype), s0)
        if sr.ndim == 4:   # fused path: free flatten to natural bin order
            sr = sr.reshape(c, -1, self.fft_size // 2)
            si = si.reshape(c, -1, self.fft_size // 2)
        return (sr, si), IIRState(s_fin.reshape(c, m + 1, 2))
