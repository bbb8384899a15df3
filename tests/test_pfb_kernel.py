"""Fused PFB Pallas kernel (kernels/pfb.py) vs the XLA channelizer path.

Interpret mode on the CPU mesh, float64 — the same oracle discipline as
the chain kernel tests (tests/test_kernels.py); the compiled TPU path is
exercised by tools/bench_banks.py on the real chip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simpledsp_tpu.kernels.pfb import (
    PFBOperators,
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
