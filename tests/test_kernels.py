"""Pallas kernel tests (interpreter mode on CPU; compiled path is exercised
on real TPU by bench.py / examples).  Methodology per SURVEY.md §4 category
1/2: analytic spectra + round trips vs numpy's FFT."""

import jax.numpy as jnp
import numpy as np
import pytest

from simpledsp_tpu.kernels.fft import (
    fft_frames_ri,
    pallas_fft_supported,
    rfft_frames,
)


@pytest.mark.parametrize("n", [64, 256, 1024, 4096])
def test_rfft_matches_numpy(n, rng):
    x = rng.standard_normal((2, 3, n))
    ref = np.fft.fft(x)
    yr, yi = rfft_frames(jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=n * 1e-13)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=n * 1e-13)


@pytest.mark.parametrize("n", [256, 4096])
def test_cfft_matches_numpy(n, rng):
    z = rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
    ref = np.fft.fft(z)
    yr, yi = fft_frames_ri(jnp.asarray(z.real), jnp.asarray(z.imag),
                           interpret=True)
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=n * 1e-13)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=n * 1e-13)


def test_ifft_round_trip(rng):
    n = 1024
    z = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    yr, yi = fft_frames_ri(jnp.asarray(z.real), jnp.asarray(z.imag),
                           interpret=True)
    br, bi = fft_frames_ri(yr, yi, inverse=True, interpret=True)
    np.testing.assert_allclose(np.asarray(br), z.real, atol=1e-12)
    np.testing.assert_allclose(np.asarray(bi), z.imag, atol=1e-12)


def test_matches_jnp_path(rng):
    """Kernel and composable jnp path must agree (same tables, same math)."""
    from simpledsp_tpu.ops import fft as F
    n = 4096
    x = rng.standard_normal((4, n))
    yr, yi = rfft_frames(jnp.asarray(x), interpret=True)
    jr, ji = F.fft_ri(jnp.asarray(x), jnp.zeros((4, n)))
    np.testing.assert_allclose(np.asarray(yr), np.asarray(jr), atol=1e-10)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ji), atol=1e-10)


def test_analytic_cosine_bin(rng):
    """Reference test category 1 (testFFT.cpp:17-38): cosine at bin 7."""
    n = 1024
    t = np.arange(n)
    x = np.cos(2 * np.pi * 7 * t / n)
    yr, yi = rfft_frames(jnp.asarray(x[None, :]), interpret=True)
    spec = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    expected = np.zeros(n, dtype=complex)
    expected[7] = expected[n - 7] = n / 2
    assert np.abs(spec - expected).max() < 4 * n * np.finfo(np.float64).eps


def test_supported_sizes():
    assert pallas_fft_supported(4096)
    assert pallas_fft_supported(16384)
    assert not pallas_fft_supported(32768)  # 181.02^2; no <=128 split
    with pytest.raises(ValueError):
        rfft_frames(jnp.zeros((2, 32768)), interpret=True)


def test_frame_tiling_degrades(rng):
    """Odd frame counts fall back to smaller tiles, same result."""
    n = 256
    x = rng.standard_normal((5, n))  # 5 frames: not divisible by 8
    ref = np.fft.fft(x)
    yr, yi = rfft_frames(jnp.asarray(x), frames_per_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=1e-11)


class TestFusedChain:
    """Fused IIR+FFT chain kernel vs the scipy oracle (interpret mode)."""

    def test_matches_scipy_oracle_f64(self, rng):
        import scipy.signal as sig
        from simpledsp_tpu.design.biquad import sos_matrix
        from simpledsp_tpu.kernels.chain import (
            FusedNorthStarOperators, fused_chain_frames)
        from simpledsp_tpu.models.northstar import default_design
        design = default_design()
        ops = FusedNorthStarOperators(design, 4096, dtype=jnp.float64)
        x = rng.standard_normal((2, 8192))
        s0 = jnp.zeros((2, ops.state_dim), jnp.float64)
        (sr, si), s_fin = fused_chain_frames(ops, jnp.asarray(x), s0,
                                             interpret=True)
        sr = sr.reshape(2, -1, 4096)   # free natural-bin-order flatten
        si = si.reshape(2, -1, 4096)
        y64 = sig.sosfilt(sos_matrix(design), x, axis=-1)
        ref = np.fft.fft(y64.reshape(2, -1, 4096))
        got = np.asarray(sr) + 1j * np.asarray(si)
        assert np.abs(got - ref).max() < 1e-11

    @pytest.mark.parametrize("n", [1024, 16384])
    def test_matches_scipy_oracle_other_shapes(self, rng, n):
        """The multi-shape evidence sizes (PERF.md r4 table: 1024 at
        n1 = 8, 16384 at n1 = 128 — the shape whose scoped-vmem estimate
        takes the adaptive vmem_limit branch), locked in interpret mode
        so shape-math regressions are caught off-chip."""
        import scipy.signal as sig
        from simpledsp_tpu.design.biquad import sos_matrix
        from simpledsp_tpu.kernels.chain import (
            FusedNorthStarOperators, fused_chain_frames)
        from simpledsp_tpu.models.northstar import default_design
        design = default_design()
        ops = FusedNorthStarOperators(design, n, dtype=jnp.float64)
        x = rng.standard_normal((2, 2 * n))
        s0 = jnp.zeros((2, ops.state_dim), jnp.float64)
        (sr, si), s_fin = fused_chain_frames(ops, jnp.asarray(x), s0,
                                             interpret=True)
        sr = sr.reshape(2, -1, n)
        si = si.reshape(2, -1, n)
        y64 = sig.sosfilt(sos_matrix(design), x, axis=-1)
        ref = np.fft.fft(y64.reshape(2, -1, n))
        got = np.asarray(sr) + 1j * np.asarray(si)
        assert np.abs(got - ref).max() < 3e-11

    def test_two_step_projection_matches_dense(self, rng):
        """The factored prepass (kb = K x, then the F-power block-Toeplitz
        combine) is algebraically identical to the dense x @ TKt dot — in
        f64 they must agree to rounding (on-chip f32 behavior is
        precision-gated, see the chain.py projection docstring)."""
        from simpledsp_tpu.kernels.chain import (
            FusedNorthStarOperators, fused_chain_frames)
        from simpledsp_tpu.models.northstar import default_design
        ops = FusedNorthStarOperators(default_design(), 1024,
                                      dtype=jnp.float64)
        x = rng.standard_normal((3, 8192))
        s0 = jnp.zeros((3, ops.state_dim), jnp.float64)
        (ar, ai), s_a = fused_chain_frames(ops, jnp.asarray(x), s0,
                                           interpret=True,
                                           projection="dense")
        (br, bi), s_b = fused_chain_frames(ops, jnp.asarray(x), s0,
                                           interpret=True,
                                           projection="two_step")
        scale = float(jnp.max(jnp.abs(ar)))
        np.testing.assert_allclose(np.asarray(br), np.asarray(ar),
                                   atol=1e-12 * scale)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(ai),
                                   atol=1e-12 * scale)
        np.testing.assert_allclose(np.asarray(s_b), np.asarray(s_a),
                                   atol=1e-13)

    def test_streaming_state_handoff(self, rng):
        from simpledsp_tpu.kernels.chain import (
            FusedNorthStarOperators, fused_chain_frames)
        from simpledsp_tpu.models.northstar import default_design
        ops = FusedNorthStarOperators(default_design(), 4096,
                                      dtype=jnp.float64)
        x = rng.standard_normal((1, 16384))
        s0 = jnp.zeros((1, ops.state_dim), jnp.float64)
        (ar, ai), s_all = fused_chain_frames(ops, jnp.asarray(x), s0,
                                             interpret=True)
        (br, bi), s_mid = fused_chain_frames(ops, jnp.asarray(x[:, :8192]),
                                             s0, interpret=True)
        (cr, ci), s_end = fused_chain_frames(ops, jnp.asarray(x[:, 8192:]),
                                             s_mid, interpret=True)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(br), np.asarray(cr)], axis=1),
            np.asarray(ar), atol=1e-12)  # shapes (C, F, n2, n1) throughout
        np.testing.assert_allclose(np.asarray(s_end), np.asarray(s_all),
                                   atol=1e-12)

    @pytest.mark.parametrize("layout", ["reg", "regw", "reg2", "reg4",
                                        "regp", "k1", "fmajor", "pair"])
    def test_half_spectrum_layouts_match_oracle(self, rng, layout):
        """Every half-spectrum kernel variant produces the identical packed
        one-sided spectrum (interpret mode; the layouts differ only in MXU
        scheduling and output relayout, never in semantics)."""
        import scipy.signal as sig
        from simpledsp_tpu.design.biquad import sos_matrix
        from simpledsp_tpu.kernels.chain import (
            FusedNorthStarOperators, fused_chain_frames)
        from simpledsp_tpu.models.northstar import default_design
        design = default_design()
        ops = FusedNorthStarOperators(design, 4096, dtype=jnp.float64)
        x = rng.standard_normal((2, 8 * 4096))
        s0 = jnp.zeros((2, ops.state_dim), jnp.float64)
        (sr, si), s_fin = fused_chain_frames(
            ops, jnp.asarray(x), s0, half_spectrum=True, layout=layout,
            interpret=True, frames_per_tile=4)
        got = (np.asarray(sr).reshape(2, -1, 2048)
               + 1j * np.asarray(si).reshape(2, -1, 2048))
        y64 = sig.sosfilt(sos_matrix(design), x, axis=-1)
        ref = np.fft.rfft(y64.reshape(2, -1, 4096))
        # Packed halfcomplex: bin 0's imag slot carries Nyquist.re.
        packed = ref[..., :2048].copy()
        packed[..., 0] += 1j * ref[..., 2048].real
        assert np.abs(got - packed).max() < 1e-11

    def test_auto_layout_small_n_flat_out(self, rng):
        """layout=None resolves per shape (round 5: k1 below n1=32, reg
        at n1>=32 — the 8-lane-minor store fix); the k1 flat_out branch
        must match the oracle with the same natural-bin flatten."""
        import scipy.signal as sig
        from simpledsp_tpu.design.biquad import sos_matrix
        from simpledsp_tpu.kernels.chain import (
            FusedNorthStarOperators, fused_chain_frames)
        from simpledsp_tpu.models.northstar import default_design
        design = default_design()
        ops = FusedNorthStarOperators(design, 1024, dtype=jnp.float64)
        assert ops.n1 == 8
        x = rng.standard_normal((2, 16 * 1024))
        s0 = jnp.zeros((2, ops.state_dim), jnp.float64)
        (sr, si), _ = fused_chain_frames(
            ops, jnp.asarray(x), s0, half_spectrum=True, flat_out=True,
            interpret=True)           # layout=None -> "k1" at n1 = 8
        assert sr.shape == (32, 64, 8)   # (C F, n2/2, n1) flat planes
        got = (np.asarray(sr).reshape(2, -1, 512)
               + 1j * np.asarray(si).reshape(2, -1, 512))
        y64 = sig.sosfilt(sos_matrix(design), x, axis=-1)
        ref = np.fft.rfft(y64.reshape(2, -1, 1024))
        packed = ref[..., :512].copy()
        packed[..., 0] += 1j * ref[..., 512].real
        assert np.abs(got - packed).max() < 1e-11

    def test_splitk_regs_layout_f32_snr(self, rng):
        """The split-K exact-bf16 step-1 layout ("regs") is an f32
        precision scheme: its packed one-sided spectrum must match the
        f64 scipy oracle at f32-grade SNR (>= 125 dB here; measured
        136.1 dB on v5e — and ~18% SLOWER than "reg" at equal tile size,
        so it is a documented measured-and-rejected variant)."""
        import scipy.signal as sig
        from simpledsp_tpu.design.biquad import sos_matrix
        from simpledsp_tpu.kernels.chain import (
            FusedNorthStarOperators, fused_chain_frames)
        from simpledsp_tpu.models.northstar import default_design
        design = default_design()
        ops = FusedNorthStarOperators(design, 4096, dtype=jnp.float32)
        x = rng.standard_normal((2, 8 * 4096))
        s0 = jnp.zeros((2, ops.state_dim), jnp.float32)
        (sr, si), _ = fused_chain_frames(
            ops, jnp.asarray(x, jnp.float32), s0, half_spectrum=True,
            layout="regs", interpret=True, frames_per_tile=4)
        got = (np.asarray(sr).astype(np.float64).reshape(2, -1, 2048)
               + 1j * np.asarray(si).astype(np.float64).reshape(2, -1,
                                                                2048))
        y64 = sig.sosfilt(sos_matrix(design), x, axis=-1)
        ref = np.fft.rfft(y64.reshape(2, -1, 4096))
        packed = ref[..., :2048].copy()
        packed[..., 0] += 1j * ref[..., 2048].real
        err = got - packed
        snr = 10 * np.log10((np.abs(packed) ** 2).sum()
                            / (np.abs(err) ** 2).sum())
        assert snr > 125.0
        # f64 is rejected: the 3 x bf16 split only carries 24 bits.
        with pytest.raises(ValueError, match="float32"):
            ops64 = FusedNorthStarOperators(design, 4096,
                                            dtype=jnp.float64)
            fused_chain_frames(
                ops64, jnp.asarray(x), jnp.zeros((2, ops64.state_dim)),
                half_spectrum=True, layout="regs", interpret=True,
                frames_per_tile=4)

    def test_rejects_unsupported_fft_size(self):
        from simpledsp_tpu.kernels.chain import FusedNorthStarOperators
        from simpledsp_tpu.models.northstar import default_design
        with pytest.raises(ValueError):
            FusedNorthStarOperators(default_design(), 32768)  # no <=128 split
        # non-power-of-two sizes with a <=128 split ARE supported (1000=8*125)
        ops = FusedNorthStarOperators(default_design(), 1000)
        assert (ops.n1, ops.n2) == (8, 125)
