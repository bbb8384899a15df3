"""Waveform generator parity vs scipy.signal (ops/waveforms.py)."""

import numpy as np
import pytest
import scipy.signal as sig

import jax.numpy as jnp

from simpledsp_tpu.ops.waveforms import (chirp, gausspulse, sawtooth,
                                         square, unit_impulse)


@pytest.fixture
def t():
    return np.linspace(0.0, 3.0, 4001)


@pytest.mark.parametrize("method", ["linear", "quadratic", "logarithmic",
                                    "hyperbolic"])
def test_chirp_matches_scipy(t, method):
    got = np.asarray(chirp(jnp.asarray(t), 5.0, 2.0, 40.0, method=method,
                           phi=30.0))
    want = sig.chirp(t, 5.0, 2.0, 40.0, method=method, phi=30.0)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_chirp_equal_freqs_and_errors(t):
    for method in ("logarithmic", "hyperbolic"):
        got = np.asarray(chirp(jnp.asarray(t), 7.0, 2.0, 7.0, method=method))
        want = sig.chirp(t, 7.0, 2.0, 7.0, method=method)
        np.testing.assert_allclose(got, want, atol=1e-9)
    with pytest.raises(ValueError):
        chirp(jnp.asarray(t), -5.0, 2.0, 40.0, method="logarithmic")
    with pytest.raises(ValueError):
        chirp(jnp.asarray(t), 0.0, 2.0, 40.0, method="hyperbolic")
    with pytest.raises(ValueError):
        chirp(jnp.asarray(t), 5.0, 2.0, 40.0, method="cubic")


@pytest.mark.parametrize("duty", [0.5, 0.25, 0.9])
def test_square_matches_scipy(t, duty):
    w = 2 * np.pi * 3.0 * t
    got = np.asarray(square(jnp.asarray(w), duty))
    want = sig.square(w, duty)
    # Avoid the exact switching instants (float-boundary sensitive).
    mask = np.abs(got - want) > 0
    assert mask.mean() < 0.002
    np.testing.assert_allclose(got[~mask], want[~mask])


@pytest.mark.parametrize("width", [1.0, 0.5, 0.0, 0.3])
def test_sawtooth_matches_scipy(t, width):
    w = 2 * np.pi * 3.0 * t
    got = np.asarray(sawtooth(jnp.asarray(w), width))
    want = sig.sawtooth(w, width)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_sawtooth_rejects_bad_width(t):
    with pytest.raises(ValueError):
        sawtooth(jnp.asarray(t), 1.5)


def test_gausspulse_matches_scipy():
    t = np.linspace(-0.01, 0.01, 2001)
    got = np.asarray(gausspulse(jnp.asarray(t), fc=1500.0, bw=0.6))
    want = sig.gausspulse(t, fc=1500.0, bw=0.6)
    np.testing.assert_allclose(got, want, atol=1e-9)
    gi, gq = gausspulse(jnp.asarray(t), fc=1500.0, bw=0.6, quadrature=True)
    wi, wq = sig.gausspulse(t, fc=1500.0, bw=0.6, retquad=True)
    np.testing.assert_allclose(np.asarray(gi), wi, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gq), wq, atol=1e-9)
    for kwargs in ({"fc": -1.0}, {"bw": 0.0}, {"bwr": 3.0}):
        with pytest.raises(ValueError):
            gausspulse(jnp.asarray(t), **kwargs)


def test_unit_impulse_matches_scipy():
    np.testing.assert_array_equal(np.asarray(unit_impulse(7)),
                                  sig.unit_impulse(7))
    np.testing.assert_array_equal(np.asarray(unit_impulse(7, "mid")),
                                  sig.unit_impulse(7, "mid"))
    np.testing.assert_array_equal(np.asarray(unit_impulse((3, 4), 2)),
                                  sig.unit_impulse((3, 4), 2))
    np.testing.assert_array_equal(
        np.asarray(unit_impulse((3, 4), (1, 3))),
        sig.unit_impulse((3, 4), (1, 3)))
