"""Channelizer + demod + SDR-model tests (methodology per SURVEY.md §4:
analytic known-answer cases + streaming-consistency, the reference's test
categories 1 and 4 applied to the net-new components)."""

import jax.numpy as jnp
import numpy as np
import pytest

from simpledsp_tpu.models.sdr import FMReceiverBank
from simpledsp_tpu.ops.channelizer import PFBChannelizer
from simpledsp_tpu.ops.demod import (
    am_demod,
    am_demod_ri,
    fm_demod,
    fm_demod_ri,
    nco_mix,
    nco_mix_ri,
)


class TestChannelizer:
    """Analysis PFB: channel c must downconvert the carrier at +c*fs/M."""

    @pytest.mark.parametrize("c0", [0, 1, 5, 11])
    def test_carrier_lands_in_its_channel(self, c0):
        m = 16
        ch = PFBChannelizer(m, taps_per_channel=8, dtype=jnp.float64)
        n = np.arange(8192)
        x = np.exp(2j * np.pi * c0 * n / m)
        y, _ = ch(jnp.asarray(x))
        power = np.mean(np.abs(np.asarray(y)[64:]) ** 2, axis=0)
        assert np.argmax(power) == c0
        # unit carrier -> unit channel power; others rejected by the
        # prototype's stopband (80 dB design, allow 60)
        assert abs(power[c0] - 1.0) < 1e-2
        others = np.delete(power, c0)
        assert others.max() < 1e-6

    def test_ri_path_matches_complex_path(self, rng):
        m = 8
        ch = PFBChannelizer(m, taps_per_channel=8, dtype=jnp.float64)
        x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048))
        y_c, _ = ch(jnp.asarray(x))
        (yr, yi), _ = ch.process_ri(jnp.asarray(x.real), jnp.asarray(x.imag))
        np.testing.assert_allclose(np.asarray(jnp.real(y_c)), np.asarray(yr),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(jnp.imag(y_c)), np.asarray(yi),
                                   atol=1e-12)

    def test_streaming_blockwise(self, rng):
        m = 8
        ch = PFBChannelizer(m, taps_per_channel=4, dtype=jnp.float64)
        x = rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
        y_whole, _ = ch(jnp.asarray(x))
        y1, s = ch(jnp.asarray(x[:512]))
        y2, _ = ch(jnp.asarray(x[512:]), s)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([y1, y2], axis=0)),
            np.asarray(y_whole), atol=1e-13)

    def test_frequency_response_matches_prototype(self):
        """Channel 0 of the PFB == plain decimate-by-M filtering with the
        prototype (polyphase identity)."""
        import scipy.signal as sig
        m = 8
        ch = PFBChannelizer(m, taps_per_channel=8, dtype=jnp.float64)
        taps = ch._branch.T.reshape(-1)  # reconstruct prototype
        rng = np.random.default_rng(1)
        x = rng.standard_normal(2048)
        y, _ = ch(jnp.asarray(x))
        y0 = np.asarray(jnp.real(y[..., 0]))
        full = sig.lfilter(taps, [1.0], x)
        # branch alignment: y0[g] = (h * x)[g*M]  (see _branch_filter offsets)
        np.testing.assert_allclose(y0, full[::m], atol=1e-12)


class TestDemod:
    def test_fm_tone_recovery_f64(self):
        fs = 64000.0
        ftone, dev = 1000.0, 5000.0
        t = np.arange(16384) / fs
        iq = np.exp(1j * (dev / ftone) * np.sin(2 * np.pi * ftone * t))
        gain = fs / (2 * np.pi * dev)
        y, _ = fm_demod(jnp.asarray(iq), gain=gain)
        expect = np.cos(2 * np.pi * ftone * (t - 0.5 / fs))  # half-sample lag
        err = np.asarray(y)[1:] - expect[1:]
        assert np.sqrt(np.mean(err ** 2)) < 1e-3

    def test_ri_matches_complex(self, rng):
        iq = (rng.standard_normal((3, 512))
              + 1j * rng.standard_normal((3, 512)))
        y_c, s_c = fm_demod(jnp.asarray(iq), gain=2.5)
        y_r, s_r = fm_demod_ri(jnp.asarray(iq.real), jnp.asarray(iq.imag),
                               gain=2.5)
        np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_r),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(jnp.real(s_c.prev)),
                                   np.asarray(s_r.prev_r), atol=0)

    def test_fm_streaming(self, rng):
        iq = np.exp(1j * np.cumsum(rng.standard_normal(1000) * 0.1))
        y_whole, _ = fm_demod(jnp.asarray(iq))
        y1, s = fm_demod(jnp.asarray(iq[:400]))
        y2, _ = fm_demod(jnp.asarray(iq[400:]), s)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([y1, y2])), np.asarray(y_whole),
            atol=1e-13)

    def test_am_envelope(self):
        t = np.arange(4096)
        env = 1.0 + 0.5 * np.cos(2 * np.pi * t / 256)
        iq = env * np.exp(2j * np.pi * t * 0.123)
        y = am_demod(jnp.asarray(iq))
        np.testing.assert_allclose(np.asarray(y), env, atol=1e-12)
        y_ri = am_demod_ri(jnp.asarray(iq.real), jnp.asarray(iq.imag))
        np.testing.assert_allclose(np.asarray(y_ri), env, atol=1e-12)

    def test_nco_mix_ri_matches_complex(self, rng):
        x = rng.standard_normal(512) + 1j * rng.standard_normal(512)
        y_c = nco_mix(jnp.asarray(x), 0.1, phase=0.3, sample_offset=7)
        yr, yi = nco_mix_ri(jnp.asarray(x.real), jnp.asarray(x.imag), 0.1,
                            phase=0.3, sample_offset=7)
        np.testing.assert_allclose(np.asarray(jnp.real(y_c)), np.asarray(yr),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(jnp.imag(y_c)), np.asarray(yi),
                                   atol=1e-12)


class TestFMReceiverBank:
    def test_two_stations(self):
        """End-to-end: two FM stations -> their channels -> their tones."""
        fs, m, decim = 1.024e6, 16, 4
        rx = FMReceiverBank(m, fs, decim=decim, deviation_hz=5e3,
                            dtype=jnp.float64)
        T = 1 << 15
        t = np.arange(T) / fs

        def fm(fc, ftone, dev):
            return np.exp(1j * (2 * np.pi * fc * t
                                + dev / ftone * np.sin(2 * np.pi * ftone * t)))

        x = (fm(3 * fs / m, 1000.0, 5e3)
             + fm(9 * fs / m, 2500.0, 5e3))[None, :]
        audio, state = rx(x)
        audio = np.asarray(audio)
        arate = fs / m / decim
        for ch_idx, expect in [(3, 1000.0), (9, 2500.0)]:
            a = audio[0, ch_idx][100:]
            spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
            peak = np.fft.rfftfreq(a.size, 1 / arate)[np.argmax(spec)]
            assert abs(peak - expect) < 3 * arate / a.size, (ch_idx, peak)
            rms = np.sqrt(np.mean(a ** 2))
            assert 0.6 < rms < 0.8, rms  # unit sine -> 0.707

    def test_streaming_matches_whole(self, rng):
        fs, m, decim = 256e3, 8, 2
        rx = FMReceiverBank(m, fs, decim=decim, dtype=jnp.float64)
        T = 4096
        x = (rng.standard_normal((2, T))
             + 1j * rng.standard_normal((2, T)))
        y_whole, _ = rx(x)
        y1, s = rx(x[:, :T // 2])
        y2, _ = rx(x[:, T // 2:], s)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([y1, y2], axis=-1)),
            np.asarray(y_whole), atol=1e-12)


class TestAMReceiverBank:
    def test_am_station_recovery(self):
        from simpledsp_tpu.models.sdr import AMReceiverBank
        fs, m, decim = 256e3, 8, 2
        rx = AMReceiverBank(m, fs, decim=decim, remove_dc=False,
                            dtype=jnp.float64)
        T = 1 << 14
        t = np.arange(T) / fs
        ftone = 500.0
        env = 1.0 + 0.5 * np.cos(2 * np.pi * ftone * t)
        x = (env * np.exp(2j * np.pi * (2 * fs / m) * t))[None, :]
        audio, _ = rx(x)
        a = np.asarray(audio)[0, 2][100:]
        arate = fs / m / decim
        spec = np.abs(np.fft.rfft((a - a.mean()) * np.hanning(a.size)))
        peak = np.fft.rfftfreq(a.size, 1 / arate)[np.argmax(spec)]
        assert abs(peak - ftone) < 3 * arate / a.size
        assert abs(a.mean() - 1.0) < 0.05   # carrier level preserved


class TestNCOPhaseContinuity:
    def test_large_sample_offset_exact(self):
        """Regression: phase reduction must stay exact for huge offsets
        (hours of streaming) — the naive f32 angle computation loses all
        phase past ~1e7 samples."""
        freq = 0.1234567
        for off in (0, 10**8, 2**31 + 5):
            yr, yi = nco_mix_ri(jnp.ones(64, jnp.float32),
                                jnp.zeros(64, jnp.float32),
                                freq, sample_offset=off)
            n = np.arange(64, dtype=np.int64) + off
            ref = np.exp(-2j * np.pi * ((freq * n) % 1.0))
            got = np.asarray(yr) + 1j * np.asarray(yi)
            assert np.abs(got - ref).max() < 1e-5, off

    def test_streaming_continuity(self, rng):
        """Two blocks with sample_offset == one long block."""
        x = rng.standard_normal(512).astype(np.float32)
        z = np.zeros(512, np.float32)
        yr, yi = nco_mix_ri(jnp.asarray(x), jnp.asarray(z), 0.01)
        ar, ai = nco_mix_ri(jnp.asarray(x[:256]), jnp.asarray(z[:256]), 0.01)
        br, bi = nco_mix_ri(jnp.asarray(x[256:]), jnp.asarray(z[256:]), 0.01,
                            sample_offset=256)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(ar), np.asarray(br)]),
            np.asarray(yr), atol=1e-6)


class TestRemezPrototype:
    """design="remez" switch: equiripple prototypes for the PFB and the
    audio decimators (VERDICT r3 item 6)."""

    def test_remez_prototype_stopband_beats_kaiser(self):
        from simpledsp_tpu.design.fir import pfb_prototype_taps
        m, k = 16, 16
        fc = 0.5 / m
        f_stop = 1.3 * fc  # the remez design's stopband edge
        nfft = 1 << 16
        f = np.arange(nfft // 2 + 1) / nfft

        def stop_db(h):
            resp = np.abs(np.fft.rfft(h, nfft))
            return 20 * np.log10(resp[f >= f_stop].max() / resp[0])

        hk = pfb_prototype_taps(m, k)                      # windowed sinc
        hr = pfb_prototype_taps(m, k, design="remez")
        assert hr.size == hk.size                          # equal taps
        # >= 10 dB more adjacent-channel rejection (measured ~25 dB).
        assert stop_db(hr) < stop_db(hk) - 10.0
        # ... at comparable passband flatness.
        ripple = np.abs(np.abs(np.fft.rfft(hr, nfft))[f <= 0.7 * fc] - 1.0)
        assert ripple.max() < 2e-3

    def test_remez_channelizer_carrier_recovery(self):
        m, c0 = 16, 5
        ch = PFBChannelizer(m, taps_per_channel=8, dtype=jnp.float64,
                            design="remez")
        n = np.arange(8192)
        x = np.exp(2j * np.pi * c0 * n / m)
        y, _ = ch(jnp.asarray(x))
        power = np.mean(np.abs(np.asarray(y)[64:]) ** 2, axis=0)
        assert np.argmax(power) == c0
        assert abs(power[c0] - 1.0) < 1e-2
        # Adjacent-channel interferer 0.7 spacings above c0: the victim
        # channel sees it at 1.4*fc — just past the remez stopband edge,
        # inside the windowed sinc's roll-off tail.  This is the
        # worst-case (guaranteed-rejection) scenario, where equiripple's
        # flat stopband pays off: measured 1680x (32 dB) quieter at equal
        # taps.  (Far-offset interferers favor the kaiser design's decaying
        # tail instead — the trade the design= switch exposes.)
        xi = np.exp(2j * np.pi * (c0 + 0.7) * n / m)
        leak = []
        for design in ("remez", "kaiser"):
            chx = PFBChannelizer(m, taps_per_channel=8, dtype=jnp.float64,
                                 design=design)
            yx, _ = chx(jnp.asarray(xi))
            p = np.mean(np.abs(np.asarray(yx)[128:]) ** 2, axis=0)
            leak.append(p[c0])
        assert leak[0] < leak[1] / 10.0  # >= 10 dB quieter (measured 32)

    def test_remez_fm_bank_tone_recovery(self):
        fs, m, decim = 1.024e6, 16, 4
        bank = FMReceiverBank(m, fs=fs, decim=decim, deviation_hz=5e3,
                              dtype=jnp.float64, use_pallas=False,
                              design="remez")
        T = 1 << 15
        t = np.arange(T) / fs
        tone = 1000.0
        x = np.exp(1j * (2 * np.pi * 3 * fs / m * t
                         + 5e3 / tone * np.sin(2 * np.pi * tone * t)))[None]
        audio, _ = bank((jnp.asarray(x.real), jnp.asarray(x.imag)))
        a = np.asarray(audio)[0, 3][100:]
        arate = fs / m / decim
        spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
        peak = np.fft.rfftfreq(a.size, 1 / arate)[np.argmax(spec)]
        assert abs(peak - tone) < 3 * arate / a.size
        rms = np.sqrt(np.mean(a ** 2))
        assert 0.6 < rms < 0.8  # unit sine -> 0.707
