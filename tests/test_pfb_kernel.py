"""Fused PFB Pallas kernel (kernels/pfb.py) vs the XLA channelizer path.

Interpret mode on the CPU mesh, float64 — the same oracle discipline as
the chain kernel tests (tests/test_kernels.py); the compiled TPU path is
exercised by tools/bench_banks.py on the real chip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simpledsp_tpu.kernels.pfb import (
    pfb_am_frames,
    pfb_channelize_frames,
    pfb_fm_frames,
)
from simpledsp_tpu.models.sdr import AMReceiverBank, FMReceiverBank
from simpledsp_tpu.ops.channelizer import PFBChannelizer
from simpledsp_tpu.ops.demod import DemodStateRI, am_demod_ri, fm_demod_ri


@pytest.fixture(scope="module")
def setup(rng):
    B, M, K, T = 3, 16, 16, 16 * 192
    chan = PFBChannelizer(M, taps_per_channel=K, dtype=jnp.float64)
    xr = jnp.asarray(rng.standard_normal((B, T)))
    xi = jnp.asarray(rng.standard_normal((B, T)))
    z = jnp.zeros((B, chan.hist_len), dtype=xr.dtype)
    ftr = chan.frames_t(jnp.concatenate([z, xr], axis=-1))
    fti = chan.frames_t(jnp.concatenate([z, xi], axis=-1))
    return chan, xr, xi, ftr, fti


class TestPFBKernel:
    def test_channelize_matches_xla_path(self, setup):
        chan, xr, xi, ftr, fti = setup
        (yr, yi), _ = chan.process_ri_cm(xr, xi)
        kr, ki = pfb_channelize_frames(chan.kernel_ops, ftr, fti,
                                       g_tile=64, interpret=True)
        np.testing.assert_allclose(np.asarray(kr), np.asarray(yr),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(ki), np.asarray(yi),
                                   atol=1e-12)

    def test_fm_fused_matches_composed(self, setup):
        chan, xr, xi, ftr, fti = setup
        B = xr.shape[0]
        (yr, yi), _ = chan.process_ri_cm(xr, xi)
        st0 = DemodStateRI(jnp.ones((B, chan.m), jnp.float64),
                           jnp.zeros((B, chan.m), jnp.float64))
        ref, st_ref = fm_demod_ri(yr, yi, st0, gain=2.5)
        disc, (ylr, yli) = pfb_fm_frames(
            chan.kernel_ops, ftr, fti, st0.prev_r[..., None],
            st0.prev_i[..., None], gain=2.5, g_tile=64, interpret=True)
        # The kernel's atan2 is a minimax polynomial
        # (kernels/pfb.py:_atan2): ~1.2e-12 rad, x2.5 gain.
        np.testing.assert_allclose(np.asarray(disc), np.asarray(ref),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(ylr[..., 0]),
                                   np.asarray(st_ref.prev_r), atol=1e-12)
        np.testing.assert_allclose(np.asarray(yli[..., 0]),
                                   np.asarray(st_ref.prev_i), atol=1e-12)

    def test_am_fused_matches_composed(self, setup):
        chan, xr, xi, ftr, fti = setup
        (yr, yi), _ = chan.process_ri_cm(xr, xi)
        ref = am_demod_ri(yr, yi)
        env = pfb_am_frames(chan.kernel_ops, ftr, fti, g_tile=64,
                            interpret=True)
        np.testing.assert_allclose(np.asarray(env), np.asarray(ref),
                                   atol=1e-12)

    def test_tile_seams_are_exact(self, setup):
        """The FM phase carry across grid tiles must be exact: one long
        tile == many short tiles."""
        chan, xr, xi, ftr, fti = setup
        B = xr.shape[0]
        pr = jnp.ones((B, chan.m, 1), jnp.float64)
        pi = jnp.zeros((B, chan.m, 1), jnp.float64)
        a, _ = pfb_fm_frames(chan.kernel_ops, ftr, fti, pr, pi,
                             g_tile=192, interpret=True)
        b, _ = pfb_fm_frames(chan.kernel_ops, ftr, fti, pr, pi,
                             g_tile=16, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def _bank_pair(cls, **kw):
    # _interpret is read at TRACE time, which happens on first call —
    # after this flag is set.
    fused = cls(16, fs=1.6e6, dtype=jnp.float64, use_pallas=True, **kw)
    fused._interpret = True
    plain = cls(16, fs=1.6e6, dtype=jnp.float64, use_pallas=False, **kw)
    return fused, plain


class TestBanksFusedPath:
    @pytest.mark.parametrize("cls", [FMReceiverBank, AMReceiverBank])
    def test_bank_fused_equals_xla(self, rng, cls):
        fused, plain = _bank_pair(cls)
        x = (rng.standard_normal((2, 16 * 256))
             + 1j * rng.standard_normal((2, 16 * 256)))
        a1, s1 = fused(x)
        a2, s2 = plain(x)
        # FM path floor: poly-atan2 ~1.2e-12 rad pre-gain (AM exact).
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(s1.chan.hist_r),
                                   np.asarray(s2.chan.hist_r), atol=0)

    def test_fm_bank_fused_streaming(self, rng):
        """Two fused streaming calls == one long call (state handoff
        through the kernel's carry outputs)."""
        fused, _ = _bank_pair(FMReceiverBank)
        x = (rng.standard_normal((2, 16 * 512))
             + 1j * rng.standard_normal((2, 16 * 512)))
        whole, _ = fused(x)
        h1, st = fused(x[:, : 16 * 256])
        h2, st = fused(x[:, 16 * 256:], st)
        got = np.concatenate([np.asarray(h1), np.asarray(h2)], axis=-1)
        np.testing.assert_allclose(got, np.asarray(whole), atol=1e-10)


class TestFlatKernels:
    """FLAT-input kernels (in-register re-layout, kernels/pfb.py
    _make_flat_body) vs the frames kernels — same oracle discipline."""

    @pytest.fixture(scope="class")
    def flat(self, rng):
        from simpledsp_tpu.kernels.pfb import flat_pad_to
        B, M, K, g = 3, 16, 16, 192
        chan = PFBChannelizer(M, taps_per_channel=K, dtype=jnp.float64)
        ops = chan.kernel_ops
        w = flat_pad_to(ops, g, interpret=True)
        T = M * g
        xr = rng.standard_normal((B, T))
        xi = rng.standard_normal((B, T))
        z = np.zeros((B, chan.hist_len))
        padr = np.zeros((B, w - chan.hist_len - T))
        xpr = jnp.asarray(np.concatenate([z, xr, padr], axis=-1))
        xpi = jnp.asarray(np.concatenate([z, xi, padr], axis=-1))
        ftr = chan.frames_t(jnp.asarray(np.concatenate([z, xr], -1)))
        fti = chan.frames_t(jnp.asarray(np.concatenate([z, xi], -1)))
        return chan, g, xpr, xpi, ftr, fti

    def test_fm_flat_matches_frames(self, flat):
        from simpledsp_tpu.kernels.pfb import pfb_fm_flat
        chan, g, xpr, xpi, ftr, fti = flat
        B = xpr.shape[0]
        pr = jnp.ones((B, chan.m, 1), jnp.float64)
        pi = jnp.zeros((B, chan.m, 1), jnp.float64)
        ref, (rr, ri) = pfb_fm_frames(chan.kernel_ops, ftr, fti, pr, pi,
                                      gain=2.5, g=g, g_tile=64,
                                      interpret=True)
        got, (gr, gi) = pfb_fm_flat(chan.kernel_ops, xpr, xpi, pr, pi,
                                    gain=2.5, g=g, row_tile=8,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(rr), atol=0)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(ri), atol=0)

    def test_fm_flat_fused_decim_streaming(self, flat, rng):
        """Fused in-kernel decimation == kernel + PolyphaseDecimator, and
        splitting the stream at a tile seam is exact."""
        from simpledsp_tpu.design.fir import lowpass_taps
        from simpledsp_tpu.kernels.pfb import flat_pad_to, pfb_fm_flat
        from simpledsp_tpu.ops.fir import PolyphaseDecimator, fir_init
        chan, g, xpr, xpi, ftr, fti = flat
        B = xpr.shape[0]
        pr = jnp.ones((B, chan.m, 1), jnp.float64)
        pi = jnp.zeros((B, chan.m, 1), jnp.float64)
        taps = lowpass_taps(24, 0.1, fs=1.0)
        deci = PolyphaseDecimator(taps, 4, dtype=jnp.float64)
        ah = fir_init(deci.hist_len, (B, chan.m), dtype=jnp.float64)
        disc, _ = pfb_fm_flat(chan.kernel_ops, xpr, xpi, pr, pi, gain=2.5,
                              g=g, row_tile=8, interpret=True)
        ref, _ = deci(disc, ah)
        audio, _, aho = pfb_fm_flat(chan.kernel_ops, xpr, xpi, pr, pi,
                                    gain=2.5, g=g, row_tile=8,
                                    dec_taps=taps, decim=4, ahist=ah.hist,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(audio), np.asarray(ref),
                                   atol=1e-12)
        # streaming split at a row boundary
        g1 = 96
        m = chan.m
        w1 = flat_pad_to(chan.kernel_ops, g1, interpret=True)
        hist_end = chan.hist_len + m * g1
        x1r = jnp.concatenate([xpr[:, :hist_end],
                               jnp.zeros((B, w1 - hist_end))], -1)
        x1i = jnp.concatenate([xpi[:, :hist_end],
                               jnp.zeros((B, w1 - hist_end))], -1)
        g2 = g - g1
        w2 = flat_pad_to(chan.kernel_ops, g2, interpret=True)
        s2 = hist_end - chan.hist_len
        e2 = hist_end + m * g2
        x2r = jnp.concatenate([xpr[:, s2:e2],
                               jnp.zeros((B, w2 - (e2 - s2)))], -1)
        x2i = jnp.concatenate([xpi[:, s2:e2],
                               jnp.zeros((B, w2 - (e2 - s2)))], -1)
        a1, (p1r, p1i), h1 = pfb_fm_flat(
            chan.kernel_ops, x1r, x1i, pr, pi, gain=2.5, g=g1, row_tile=8,
            dec_taps=taps, decim=4, ahist=ah.hist, interpret=True)
        a2, _, _ = pfb_fm_flat(
            chan.kernel_ops, x2r, x2i, p1r, p1i, gain=2.5, g=g2,
            row_tile=8, dec_taps=taps, decim=4, ahist=h1, interpret=True)
        got = np.concatenate([np.asarray(a1), np.asarray(a2)], -1)
        np.testing.assert_allclose(got, np.asarray(audio), atol=1e-12)

    def test_fir_variant_and_debug_stages(self, flat):
        """The measured-and-rejected shift-reuse FIR (v2) stays
        semantically identical to v1, and every _debug_stage prefix
        traces and emits the contract shapes (the phase probe's hooks
        must not rot)."""
        from simpledsp_tpu.design.fir import lowpass_taps
        from simpledsp_tpu.kernels.pfb import pfb_fm_flat
        from simpledsp_tpu.ops.fir import fir_init
        chan, g, xpr, xpi, ftr, fti = flat
        B = xpr.shape[0]
        pr = jnp.ones((B, chan.m, 1), jnp.float64)
        pi = jnp.zeros((B, chan.m, 1), jnp.float64)
        d1, _ = pfb_fm_flat(chan.kernel_ops, xpr, xpi, pr, pi, gain=2.5,
                            g=g, row_tile=8, interpret=True,
                            fir_variant="v1")
        d2, _ = pfb_fm_flat(chan.kernel_ops, xpr, xpi, pr, pi, gain=2.5,
                            g=g, row_tile=8, interpret=True,
                            fir_variant="v2")
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   atol=1e-12)
        for stage in ("dma", "untrans", "fir", "dft"):
            out, _ = pfb_fm_flat(chan.kernel_ops, xpr, xpi, pr, pi,
                                 gain=2.5, g=g, row_tile=8,
                                 interpret=True, _debug_stage=stage)
            assert out.shape == d1.shape
            assert np.isfinite(np.asarray(out)).all()
        # fm_dec-mode stages (audio-rate writes) incl. "disc"
        taps = lowpass_taps(24, 0.1, fs=1.0)
        ah = fir_init(23, (B, chan.m), dtype=jnp.float64)
        ref, _, _ = pfb_fm_flat(chan.kernel_ops, xpr, xpi, pr, pi,
                                gain=2.5, g=g, row_tile=8, dec_taps=taps,
                                decim=4, ahist=ah.hist, interpret=True)
        for stage in ("dma", "fir", "disc"):
            out, _, _ = pfb_fm_flat(
                chan.kernel_ops, xpr, xpi, pr, pi, gain=2.5, g=g,
                row_tile=8, dec_taps=taps, decim=4, ahist=ah.hist,
                interpret=True, _debug_stage=stage)
            assert out.shape == ref.shape
        with pytest.raises(ValueError):
            pfb_fm_flat(chan.kernel_ops, xpr, xpi, pr, pi, g=g,
                        interpret=True, _debug_stage="nope")

    def test_am_flat_matches_frames(self, flat):
        from simpledsp_tpu.kernels.pfb import pfb_am_flat
        chan, g, xpr, xpi, ftr, fti = flat
        ref = pfb_am_frames(chan.kernel_ops, ftr, fti, g=g, g_tile=64,
                            interpret=True)
        got = pfb_am_flat(chan.kernel_ops, xpr, xpi, g=g, row_tile=16,
                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-12)

    def test_am_bank_dc_streaming(self, rng):
        """AM remove_dc fused streaming: two calls == one long call (the
        exact two-pass mean correction carries mu_prev through
        SDRState.dc).  Means differ between the halves and the whole, so
        only the steady-state interior (past the decimator's carry span)
        is expected to match the XLA whole-call result; the fused path
        must equal the XLA path CALL FOR CALL."""
        fused, plain = _bank_pair(AMReceiverBank)
        x = (rng.standard_normal((2, 16 * 512))
             + 1j * rng.standard_normal((2, 16 * 512)))
        # call-for-call parity across a 2-call stream
        sf = fused.init_state(2)
        sp = plain.init_state(2)
        for lo, hi in ((0, 16 * 256), (16 * 256, 16 * 512)):
            af, sf = fused(x[:, lo:hi], sf)
            ap, sp = plain(x[:, lo:hi], sp)
            np.testing.assert_allclose(np.asarray(af), np.asarray(ap),
                                       atol=1e-10)

class TestPaddedEntry:
    """process_padded (zero-copy donated-buffer streaming entry) vs the
    plain __call__ path: the hist slot is PATCHED in place (garbage in the
    buffer's front must not matter) and the tail pad is never consumed
    (garbage there must not matter either)."""

    @staticmethod
    def _padded_bufs(bank, xr, xi, rng):
        front, total = bank.padded_spec(xr.shape[-1])
        t = xr.shape[-1]
        br = rng.standard_normal((xr.shape[0], total))  # garbage everywhere
        bi = rng.standard_normal((xr.shape[0], total))
        br[:, front:front + t] = np.asarray(xr)
        bi[:, front:front + t] = np.asarray(xi)
        return jnp.asarray(br), jnp.asarray(bi)

    @pytest.mark.parametrize("cls", [FMReceiverBank, AMReceiverBank])
    def test_padded_equals_plain_streaming(self, rng, cls):
        fused, _ = _bank_pair(cls)
        T = 16 * 256
        x = (rng.standard_normal((2, 2 * T))
             + 1j * rng.standard_normal((2, 2 * T)))
        xr = jnp.asarray(x.real)
        xi = jnp.asarray(x.imag)
        # reference: two plain fused calls
        s_ref = fused.init_state(2)
        ref = []
        for lo in (0, T):
            a, s_ref = fused((xr[:, lo:lo + T], xi[:, lo:lo + T]), s_ref)
            ref.append(np.asarray(a))
        # padded entry: same stream through donated buffers
        s = fused.init_state(2)
        got = []
        for lo in (0, T):
            bufs = self._padded_bufs(fused, xr[:, lo:lo + T],
                                     xi[:, lo:lo + T], rng)
            a, s, _planes = fused.process_padded(bufs, s)
            got.append(np.asarray(a))
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a, b, atol=1e-12)
        # carried channelizer state matches the plain path exactly
        np.testing.assert_allclose(np.asarray(s.chan.hist_r),
                                   np.asarray(s_ref.chan.hist_r), atol=0)

    def test_padded_spec_rejects_bad_width(self, rng):
        fused, _ = _bank_pair(FMReceiverBank)
        with pytest.raises(ValueError):
            fused._padded_g(12345)


class TestAtan2Poly:
    """The kernel's VPU atan2 (Mosaic has no lowering) — both dtype
    variants against numpy over all octants including axes and zeros."""

    @pytest.mark.parametrize("dt,tol", [(jnp.float64, 2e-12),
                                        (jnp.float32, 1e-6)])
    def test_matches_numpy(self, rng, dt, tol):
        from simpledsp_tpu.kernels.pfb import _atan2
        y = rng.standard_normal(4096).astype(np.float64)
        x = rng.standard_normal(4096).astype(np.float64)
        # exercise axes / zero / equal-magnitude (octant seams)
        y[:8] = [0, 0, 1, -1, 1, -1, 0.5, -0.5]
        x[:8] = [0, 1, 0, 0, 1, 1, 0.5, 0.5]
        got = np.asarray(_atan2(jnp.asarray(y, dt), jnp.asarray(x, dt)))
        ref = np.arctan2(y, x)
        np.testing.assert_allclose(got, ref, atol=tol)
