"""Fused overlap-save convolution kernel (kernels/ols.py) vs oracles.

Interpret mode on CPU (the compiled path is exercised on-chip by
tools/bench_transforms.py and the perf gate); f64 so the gate is the
reference's 1e-12 standard (SURVEY.md §6)."""

import jax.numpy as jnp
import numpy as np
import pytest

from simpledsp_tpu.kernels.ols import conv_ols_frames, convolve_ols_fused


@pytest.mark.parametrize("t,m,nfft", [(65536, 301, 4096), (10000, 301, 4096),
                                      (8192, 129, 1024), (4096, 257, 2048)])
def test_full_convolution_matches_numpy(rng, t, m, nfft):
    x = rng.standard_normal((2, t))
    h = rng.standard_normal(m)
    y = np.asarray(convolve_ols_fused(jnp.asarray(x), h, nfft=nfft,
                                      interpret=True))
    ref = np.stack([np.convolve(r, h) for r in x])
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=1e-12 * np.abs(ref).max())


def test_single_tap_identity(rng):
    x = rng.standard_normal(5000)
    y = np.asarray(convolve_ols_fused(jnp.asarray(x), np.array([2.5]),
                                      nfft=512, interpret=True))
    np.testing.assert_allclose(y, 2.5 * x, atol=1e-12)


def test_leading_batch_axes(rng):
    x = rng.standard_normal((2, 3, 4096))
    h = rng.standard_normal(65)
    y = np.asarray(convolve_ols_fused(jnp.asarray(x), h, nfft=1024,
                                      interpret=True))
    assert y.shape == (2, 3, 4096 + 64)
    ref = np.convolve(x[1, 2], h)
    np.testing.assert_allclose(y[1, 2], ref, atol=1e-11)


def test_overlap_validation(rng):
    frames = jnp.asarray(rng.standard_normal((4, 1024)))
    with pytest.raises(ValueError, match="overlap"):
        conv_ols_frames(frames, np.ones(300), overlap_rows=1,
                        interpret=True)
    with pytest.raises(ValueError, match="too long"):
        convolve_ols_fused(jnp.asarray(rng.standard_normal(4096)),
                           np.ones(1100), nfft=1024, interpret=True)


def test_matches_ops_convolve_full(rng):
    """Same result as the public convolve (which cross-checks scipy)."""
    from simpledsp_tpu.ops.conv import convolve
    x = rng.standard_normal((1, 20000))
    h = rng.standard_normal(301)
    y = np.asarray(convolve_ols_fused(jnp.asarray(x), h, nfft=4096,
                                      interpret=True))
    ref = np.asarray(convolve(jnp.asarray(x), h, mode="full"))
    np.testing.assert_allclose(y, ref, atol=1e-11)
