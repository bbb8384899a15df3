"""SDR receiver chain: DDC -> PFB channelizer -> FM demod -> audio decimate.

The full software-radio pipeline the north star requires (BASELINE.json:
"full SDR chain: channelize + resample + FM demod"; SURVEY.md §2b).  Every
stage is one of the framework's streaming ops composed functionally with an
explicit state pytree — serializable, resumable, and splittable at block
boundaries (the reference's streaming contract, test/testIIR.cpp:61-75,
extended to a whole receiver).

TPU-native representation: complex baseband is carried as (re, im) float32
planes end-to-end (TPUs have no complex datapath, and this environment's
TPU tunnel cannot DMA complex arrays host<->device).  The public call
accepts either a complex array or an (xr, xi) pair; outputs (audio) are
real, so host transfer is always float.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from simpledsp_tpu.design.fir import lowpass_taps
from simpledsp_tpu.ops.channelizer import ChanStateRI, PFBChannelizer
from simpledsp_tpu.ops.demod import DemodStateRI, am_demod_ri, fm_demod_ri
from simpledsp_tpu.ops.fir import FIRState, PolyphaseDecimator, fir_init

__all__ = ["SDRState", "FMReceiverBank", "AMReceiverBank"]


class SDRState(NamedTuple):
    """Carried state of the whole receiver (a serializable pytree)."""

    chan: ChanStateRI    # channelizer input history (RI planes)
    demod: DemodStateRI  # per-channel last IQ sample (RI planes)
    audio: FIRState      # per-channel decimator history (real)
    # AM remove_dc only: the previous call's per-channel env mean (B, M).
    # Block-mean DC removal is non-causal but LINEAR, so the fused kernel
    # decimates the RAW envelope and the model corrects exactly:
    # audio = audio_raw - mu*(S - Sc[n]) - mu_prev*Sc[n], Sc[n] = the tap
    # mass falling on the carried history for output n.  (The raw-domain
    # FIR history stored here therefore differs from the XLA path's
    # env-mu domain values; the produced AUDIO is identical.)
    dc: Optional[jnp.ndarray] = None


class FMReceiverBank:
    """Channelize a wideband stream into M carriers and FM-demodulate all of
    them at once — the "many radios in one TPU program" model.

    Args:
      num_channels: M channels, spacing fs/M.
      decim: audio decimation after demod (output rate fs / M / decim).
      deviation_hz / fs: sets the FM discriminator gain.

    Call with x: (B, T) complex baseband — or a pair (xr, xi) of float
    planes — with T % (M * decim) == 0; returns
    (audio (B, M, T // M // decim), state).
    """

    def __init__(self, num_channels: int, fs: float, decim: int = 4,
                 deviation_hz: float = 75e3, taps_per_channel: int = 16,
                 audio_taps: int = 64, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None,
                 design: str = "kaiser"):
        self.m = int(num_channels)
        self.fs = float(fs)
        self.decim = int(decim)
        self.dtype = dtype
        chan_rate = fs / num_channels
        self.fm_gain = float(chan_rate / (2.0 * np.pi * deviation_hz))
        # design="remez": equiripple prototypes for both the channelizer
        # and the audio decimator — 16-34 dB better adjacent-channel /
        # alias rejection at equal taps (design/optimal_fir.py).
        self.design = design
        self.chan = PFBChannelizer(num_channels,
                                   taps_per_channel=taps_per_channel,
                                   dtype=dtype, design=design)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        # Fused channelize+demod Pallas kernel (kernels/pfb.py): the XLA
        # masked-conv path burns (M-1)/M of its MACs on structural zeros.
        self.use_pallas = use_pallas
        self._interpret = False   # tests may set True to run fused on CPU
        if design == "remez":
            from simpledsp_tpu.design.optimal_fir import remez as _remez
            ataps = _remez(audio_taps, [0.0, 0.35 / decim, 0.5 / decim, 0.5],
                           [1.0, 0.0], weight=[1.0, 10.0])
            ataps = ataps / ataps.sum()
        else:
            ataps = lowpass_taps(audio_taps, 0.4 / decim, fs=1.0)
        self._ataps = ataps
        self.audio = PolyphaseDecimator(ataps, decim, dtype=dtype)
        self._jit = jax.jit(self._forward)
        # Zero-copy streaming entry (process_padded): the input buffers are
        # DONATED so the 255-sample history patch is an in-place DUS —
        # no full-stream prefix-concat copy (measured ~0.6-0.8 ms/call).
        self._jit_padded = jax.jit(self._forward_padded,
                                   donate_argnums=(0, 1))

    def init_state(self, batch: int) -> SDRState:
        z = jnp.zeros((batch, self.chan.hist_len), dtype=self.dtype)
        return SDRState(
            chan=ChanStateRI(z, z),
            demod=DemodStateRI(jnp.ones((batch, self.m), dtype=self.dtype),
                               jnp.zeros((batch, self.m), dtype=self.dtype)),
            audio=fir_init(self.audio.hist_len, (batch, self.m),
                           dtype=self.dtype),
        )

    def _prefix(self, xr, xi, state, pad: int = 0):
        """History-prefix the input planes; returns (xpr, xpi, new chan
        state) — shared by the XLA and fused paths.

        pad: trailing zero samples folded into the SAME concat (the fused
        kernel's 128-aligned frame halo) — padding after the transpose
        cost a second full-size XLA copy (measured ~5 ms/call)."""
        parts_r = [state.chan.hist_r, xr]
        parts_i = [state.chan.hist_i, xi]
        if pad:
            z = jnp.zeros(xr.shape[:-1] + (pad,), dtype=xr.dtype)
            parts_r.append(z)
            parts_i.append(z)
        xpr = jnp.concatenate(parts_r, axis=-1)
        xpi = jnp.concatenate(parts_i, axis=-1)
        h = self.chan.hist_len
        end = xpr.shape[-1] - pad
        return xpr, xpi, ChanStateRI(xpr[..., end - h: end],
                                     xpi[..., end - h: end])

    def _fused_g(self, t: int) -> "int | None":
        """Output frame count for the fused kernel, or None when this
        trace's shape cannot use the compiled kernel (Mosaic needs
        g % 128 == 0; kernels/pfb.py docstring) and must fall back to the
        XLA path."""
        if 128 % self.m:
            return None   # flat kernels re-lay 128-sample rows (M | 128)
        g = t // self.m
        if self._interpret or (t % self.m == 0 and g % 128 == 0 and g > 0):
            return g
        return None

    def _flat_prefix(self, xr, xi, state, g):
        """Prefix + halo pad for the FLAT fused kernels: ONE concat per
        plane, NO transpose anywhere (the kernel re-lays contiguous
        128-sample rows in registers — kernels/pfb.py flat docstrings;
        the XLA channel-major transpose measured 10.4 ms/call, more than
        the whole fused kernel)."""
        from simpledsp_tpu.kernels.pfb import flat_pad_to
        w = flat_pad_to(self.chan.kernel_ops, g, self._interpret)
        pad = max(0, w - self.chan.hist_len - xr.shape[-1])
        return self._prefix(xr, xi, state, pad=pad)

    def _fused_call(self, xpr, xpi, chan_state, state, g):
        """Fused-kernel body on history-prefixed planes (FM version)."""
        from simpledsp_tpu.kernels.pfb import pfb_fm_flat
        # Audio decimation fused in-kernel (MXU Toeplitz dot) — the
        # demodulated signal never round-trips HBM.
        audio, (ylr, yli), ahist = pfb_fm_flat(
            self.chan.kernel_ops, xpr, xpi,
            state.demod.prev_r[..., None],
            state.demod.prev_i[..., None], gain=self.fm_gain, g=g,
            dec_taps=self._ataps, decim=self.decim,
            ahist=state.audio.hist, interpret=self._interpret)
        demod_state = DemodStateRI(ylr[..., 0], yli[..., 0])
        return audio, SDRState(chan_state, demod_state, FIRState(ahist))

    def _xla_call(self, xr, xi, state):
        """Composable-ops fallback body (FM version)."""
        (ir, ii), chan_state = self.chan.process_ri_cm(xr, xi, state.chan)
        disc, demod_state = fm_demod_ri(ir, ii, state.demod,
                                        gain=self.fm_gain)
        audio, audio_state = self.audio(disc, state.audio)
        return audio, SDRState(chan_state, demod_state, audio_state)

    def _forward(self, xr: jnp.ndarray, xi: jnp.ndarray, state: SDRState):
        """Jittable RI pipeline body (channel-major channelizer path: the
        lane axis stays the long time axis end to end)."""
        g = self._fused_g(xr.shape[-1]) if self.use_pallas else None
        if g is None:
            return self._xla_call(xr, xi, state)
        xpr, xpi, chan_state = self._flat_prefix(xr, xi, state, g)
        return self._fused_call(xpr, xpi, chan_state, state, g)

    def _padded_g(self, w: int) -> int:
        """Output frame count for a pre-padded (B, W) buffer — the exact
        inverse of :func:`kernels.pfb.flat_pad_to`."""
        from simpledsp_tpu.kernels.pfb import flat_pad_to
        halo = flat_pad_to(self.chan.kernel_ops, 0, self._interpret)
        g = (w - halo) // self.m
        if (g <= 0 or self.m * g + halo != w or self._fused_g(self.m * g)
                != g):
            raise ValueError(
                f"padded width {w} is not flat_pad_to(ops, g) for a fused-"
                f"eligible g (M={self.m}, halo={halo})")
        return g

    def _forward_padded(self, xpr_buf: jnp.ndarray, xpi_buf: jnp.ndarray,
                        state: SDRState):
        """Jittable body for pre-padded DONATED buffers
        [hist slot (hist_len) | x (M g) | tail pad (never consumed)]:
        the history patch is an in-place dynamic_update_slice on the
        donated buffer — the full-stream prefix-concat copy disappears.
        Returns (audio, state, (xpr, xpi)) where the planes alias the
        donated inputs (callers may re-thread them as the next call's
        buffers after uploading fresh x content — or drop them)."""
        g = self._padded_g(xpr_buf.shape[-1])
        xpr = jax.lax.dynamic_update_slice(xpr_buf, state.chan.hist_r,
                                           (0, 0))
        xpi = jax.lax.dynamic_update_slice(xpi_buf, state.chan.hist_i,
                                           (0, 0))
        h = self.chan.hist_len
        end = h + self.m * g
        chan_state = ChanStateRI(xpr[..., end - h: end],
                                 xpi[..., end - h: end])
        audio, st = self._fused_call(xpr, xpi, chan_state, state, g)
        return audio, st, (xpr, xpi)

    def padded_spec(self, t: int) -> Tuple[int, int]:
        """(front, total) buffer layout for :meth:`process_padded`: a
        producer of T samples/stream uploads x at offset ``front`` of a
        (B, total) buffer (tail values are never read — no zeroing
        needed)."""
        from simpledsp_tpu.kernels.pfb import flat_pad_to
        g = self._fused_g(t)
        if g is None or not self.use_pallas:
            raise ValueError(
                f"T={t} is not eligible for the fused kernels "
                f"(need T % M == 0, (T // M) % 128 == 0, M | 128)")
        return self.chan.hist_len, flat_pad_to(
            self.chan.kernel_ops, g, self._interpret)

    def process_padded(self, x: Tuple[jnp.ndarray, jnp.ndarray],
                       state: Optional[SDRState] = None):
        """Zero-copy streaming entry: x = (xpr_buf, xpi_buf) pre-padded
        per :meth:`padded_spec`.  The buffers are DONATED (consumed);
        returns (audio, state, (xpr, xpi)) with the returned planes
        aliasing the donated storage."""
        xpr_buf, xpi_buf = x
        if state is None:
            state = self.init_state(xpr_buf.shape[0])
        return self._jit_padded(xpr_buf, xpi_buf, state)

    def __call__(self, x: Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]],
                 state: Optional[SDRState] = None
                 ) -> Tuple[jnp.ndarray, SDRState]:
        if isinstance(x, (tuple, list)):
            xr, xi = x
        elif jnp.iscomplexobj(x):
            # Split on HOST if it is a numpy array (complex device transfers
            # are unsupported on some TPU runtimes).
            if isinstance(x, np.ndarray):
                xr = jnp.asarray(x.real, dtype=self.dtype)
                xi = jnp.asarray(x.imag, dtype=self.dtype)
            else:
                xr = jnp.real(x).astype(self.dtype)
                xi = jnp.imag(x).astype(self.dtype)
        else:
            xr = jnp.asarray(x, dtype=self.dtype)
            xi = jnp.zeros_like(xr)
        b, t = xr.shape
        if t % (self.m * self.decim) != 0:
            raise ValueError(
                f"T={t} must be a multiple of M*decim={self.m * self.decim}")
        if state is None:
            state = self.init_state(b)
        return self._jit(xr, xi, state)


class AMReceiverBank(FMReceiverBank):
    """Channelize and AM-envelope-detect all M carriers at once.

    Same pipeline as :class:`FMReceiverBank` with the discriminator swapped
    for an envelope detector; per-channel DC (the carrier level) is removed
    by the audio decimator chain only if ``remove_dc``.
    """

    def __init__(self, num_channels: int, fs: float, decim: int = 4,
                 remove_dc: bool = True, taps_per_channel: int = 16,
                 audio_taps: int = 64, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None,
                 design: str = "kaiser"):
        super().__init__(num_channels, fs, decim=decim,
                         taps_per_channel=taps_per_channel,
                         audio_taps=audio_taps, dtype=dtype,
                         use_pallas=use_pallas, design=design)
        self.remove_dc = remove_dc

    def init_state(self, batch: int) -> SDRState:
        st = super().init_state(batch)
        if not self.remove_dc:
            return st
        # Previous-call env mean for the exact fused DC removal
        # (SDRState.dc): zero matches the XLA path's zero FIR history.
        return st._replace(dc=jnp.zeros((batch, self.m), dtype=self.dtype))

    def _carry_tap_sums(self, gd: int) -> jnp.ndarray:
        """Sc[n] = tap mass hitting the carried FIR history for output n
        (nonzero only for the first ceil((Kd-1)/decim) outputs)."""
        h = np.asarray(self._ataps, np.float64)
        kd = h.size
        sc = np.zeros(gd)
        j = np.arange(kd)
        for n in range(min(gd, -(-(kd - 1) // self.decim))):
            sc[n] = h[j > n * self.decim].sum()
        return jnp.asarray(sc, dtype=self.dtype)

    def _fused_call(self, xpr, xpi, chan_state, state, g):
        """Fused-kernel body on history-prefixed planes (AM version)."""
        from simpledsp_tpu.kernels.pfb import pfb_am_flat
        if not self.remove_dc:
            # No block-mean stage -> audio decimation fuses in-kernel.
            audio, ahist = pfb_am_flat(
                self.chan.kernel_ops, xpr, xpi, g=g,
                dec_taps=self._ataps, decim=self.decim,
                ahist=state.audio.hist, interpret=self._interpret)
            return audio, SDRState(chan_state, state.demod,
                                   FIRState(ahist))
        # remove_dc: block-mean removal is non-causal but LINEAR —
        # decimate the RAW envelope in-kernel, then correct exactly
        # with this call's mean and the carried previous mean
        # (SDRState.dc docstring).  The envelope never leaves VMEM.
        audio_raw, ahist, esum = pfb_am_flat(
            self.chan.kernel_ops, xpr, xpi, g=g,
            dec_taps=self._ataps, decim=self.decim,
            ahist=state.audio.hist, emit_sum=True,
            interpret=self._interpret)
        mu = esum / g
        s_all = float(np.sum(np.asarray(self._ataps, np.float64)))
        sc = self._carry_tap_sums(g // self.decim)
        audio = (audio_raw - mu[..., None] * (s_all - sc)
                 - state.dc[..., None] * sc)
        return audio, SDRState(chan_state, state.demod,
                               FIRState(ahist), mu)

    def _xla_call(self, xr, xi, state):
        """Composable-ops fallback body (AM version)."""
        (ir, ii), chan_state = self.chan.process_ri_cm(xr, xi, state.chan)
        env = am_demod_ri(ir, ii, remove_dc=self.remove_dc)
        audio, audio_state = self.audio(env, state.audio)
        return audio, SDRState(chan_state, state.demod, audio_state,
                               state.dc)
