"""Core numerics: bessel_i0 golden values, Kaiser/sinc filter spectral
properties, Freq/Rate conversions.

Golden values and property bounds are those of the reference's own unit
tests (``misc.rs:492-513``, ``filters.rs:244-366``,
``frequency.rs:325-392``) — they are implementation-independent specs.
"""

import numpy as np
import pytest

from noaa_apt_tpu.core import (
    Freq,
    Lowpass,
    LowpassDcRemoval,
    NoFilter,
    Rate,
    bessel_i0,
    kaiser,
)


BESSEL_GOLDEN = [
    (0.0, 1.00000000000000),
    (0.5, 1.06348337074132),
    (1.0, 1.26606587775201),
    (1.5, 1.64672318977289),
    (2.0, 2.27958530233607),
    (2.5, 3.28983914405012),
    (3.0, 4.88079258586502),
    (3.5, 7.37820343222548),
    (4.0, 11.3019219521363),
    (4.5, 17.4811718556093),
    (5.0, 27.2398718236044),
    (5.5, 42.6946451518478),
    (6.0, 67.2344069764780),
    (6.5, 106.292858243996),
    (7.0, 168.593908510290),
]


def test_bessel_i0():
    for x, expected in BESSEL_GOLDEN:
        assert abs(float(bessel_i0(np.float32(x))) - expected) / expected < 0.001


def test_kaiser_odd_length():
    for atten, dw in [(20.0, 1 / 10), (35.0, 1 / 30), (60.0, 1 / 20), (30.0, 0.0016)]:
        w = kaiser(atten, Freq.from_pi_rad(dw))
        assert w.size % 2 == 1
        assert np.all(w <= 1.0 + 1e-6)
        assert w[w.size // 2] == pytest.approx(1.0, abs=1e-6)


@pytest.mark.parametrize(
    "cutout,atten,delta_w",
    [(1 / 4, 20.0, 1 / 10), (1 / 3, 35.0, 1 / 30), (2 / 5, 60.0, 1 / 20)],
)
def test_lowpass_spectrum(cutout, atten, delta_w):
    coeff = Lowpass(Freq.from_pi_rad(cutout), atten, Freq.from_pi_rad(delta_w)).design()
    fft = np.abs(np.fft.fft(coeff.astype(np.float64)))
    ripple = 10 ** (-atten / 20)
    n = fft.size
    for i, v in enumerate(fft):
        w = 2.0 * i / n  # in pi rad
        if w < cutout - delta_w / 2:
            assert 1 - ripple < v < 1 + ripple, (i, v)
        elif cutout + delta_w / 2 < w < 1.0:
            assert v < ripple, (i, v)


@pytest.mark.parametrize(
    "cutout,atten,delta_w",
    [(1 / 4, 20.0, 1 / 10), (1 / 3, 35.0, 1 / 30), (2 / 5, 60.0, 1 / 20)],
)
def test_lowpass_dc_removal_spectrum(cutout, atten, delta_w):
    coeff = LowpassDcRemoval(
        Freq.from_pi_rad(cutout), atten, Freq.from_pi_rad(delta_w)
    ).design()
    fft = np.abs(np.fft.fft(coeff.astype(np.float64)))
    ripple = 10 ** (-atten / 20)
    n = fft.size
    assert fft[0] < 2 * ripple  # DC notch (filters.rs:332-343)
    for i, v in enumerate(fft):
        w = 2.0 * i / n
        if delta_w < w < cutout - delta_w / 2:
            assert 1 - ripple < v < 1 + ripple, (i, v)
        elif cutout + delta_w / 2 < w < 1.0:
            assert v < ripple, (i, v)


def test_no_filter():
    assert NoFilter().design().tolist() == [1.0]


def test_filter_resample_equivalence():
    # Designing at 1000 Hz then resampling to 3000 Hz == designing at
    # 3000 Hz directly (filters.rs:377-423).
    f = Lowpass(Freq.hz(123.0, Rate(1000)), 40.0, Freq.hz(12.0, Rate(1000)))
    f2 = f.resample(Rate(1000), Rate(3000))
    expected = Lowpass(Freq.hz(123.0, Rate(3000)), 40.0, Freq.hz(12.0, Rate(3000)))
    assert np.allclose(f2.design(), expected.design(), rtol=1e-6)

    g = LowpassDcRemoval(Freq.hz(123.0, Rate(1000)), 40.0, Freq.hz(12.0, Rate(1000)))
    g2 = g.resample(Rate(1000), Rate(3000))
    gexp = LowpassDcRemoval(Freq.hz(123.0, Rate(3000)), 40.0, Freq.hz(12.0, Rate(3000)))
    assert np.allclose(g2.design(), gexp.design(), rtol=1e-6)


def test_freq_conversions():
    # frequency.rs:325-392 equivalence table style checks.
    r = Rate(11025)
    f = Freq.hz(2400.0, r)
    assert float(f.get_hz(r)) == pytest.approx(2400.0, rel=1e-6)
    assert float(f.get_pi_rad()) == pytest.approx(2 * 2400.0 / 11025.0, rel=1e-6)
    assert float(f.get_rad()) == pytest.approx(np.pi * 2 * 2400.0 / 11025.0, rel=1e-6)
    assert float(Freq.rad(np.pi).get_pi_rad()) == pytest.approx(1.0, rel=1e-6)

    assert Rate(4160).checked_mul(2).get_hz() == 8320
    assert Rate(99371).checked_mul(2**20) is None


def test_rate_validation():
    with pytest.raises(OverflowError):
        Rate(2**33)
    with pytest.raises(TypeError):
        Rate(1.5)
