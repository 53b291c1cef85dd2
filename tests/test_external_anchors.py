"""Independent external anchors (VERDICT r4 "missing" item 1).

Most golden fixtures in this repo were minted by its own CPU path;
these tests check the DSP math against oracles that did NOT originate
here: scipy's Bessel/Kaiser implementations, an analytic band-limited
sine through the resampler, and a Hilbert-transform envelope for the
AM demodulator.  They complement the existing independent anchors
(the lab-crate Lab vector, the `predict` SGP4 table, the Octave
bessel values, and the reference's inline golden arrays).
"""

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")

from noaa_apt_tpu.core import filters as flt
from noaa_apt_tpu.core.frequency import Freq, Rate


def test_bessel_i0_vs_scipy():
    """bessel_i0 (misc.rs:20-57's 8-term Horner) vs scipy.special.i0
    over the argument range Kaiser windows use (beta <= ~10)."""
    from scipy.special import i0

    # The reference's 8-term polynomial is a truncated series: measured
    # ~2e-7 relative up to x=4, ~5e-5 at x=6, diverging beyond (we
    # inherit that).  Kaiser windows here use beta <= 0.1102*(60-8.7)
    # = 5.65, so [0, 6] is the operating range to anchor.
    xs = np.linspace(0.0, 6.0, 241)
    ours = np.array([flt.bessel_i0(float(x)) for x in xs])
    ref = i0(xs)
    rel = np.abs(ours - ref) / np.maximum(ref, 1e-12)
    assert rel.max() < 1e-4, rel.max()
    xs_lo = xs[xs <= 4.0]
    rel_lo = rel[: xs_lo.size]
    assert rel_lo.max() < 1e-6, rel_lo.max()


def test_kaiser_window_values_vs_scipy_i0():
    """The Kaiser windows equal the closed-form
    ``I0(beta*sqrt(1-(n/(m/2))^2)) / I0(beta)`` evaluated in f64 with
    SCIPY's Bessel I0 — an independent check of the whole window
    computation (our Bessel table + f32 op chain).

    Note the reference's shape convention divides by ``m/2`` with
    ``m = length`` (``filters.rs:169-178``), not scipy.signal's
    ``(m-1)/2`` — so scipy's *window* function is deliberately NOT the
    oracle here, only its Bessel function is."""
    from scipy.special import i0

    rate = Rate(11025)
    for atten, delta_hz in ((30.0, 1000.0), (42.0, 500.0), (60.0, 800.0)):
        win = flt.kaiser(atten, Freq.hz(delta_hz, rate))
        length = win.shape[0]
        assert length % 2 == 1
        a = np.float64(atten)
        if a > 50.0:
            beta = 0.1102 * (a - 8.7)
        elif a < 21.0:
            beta = 0.0
        else:
            beta = 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
        half = (length - 1) // 2
        n = np.arange(-half, half + 1, dtype=np.float64)
        ref = i0(beta * np.sqrt(np.maximum(1.0 - (n / (length / 2.0)) ** 2, 0.0)))
        ref = ref / i0(beta)
        np.testing.assert_allclose(win, ref, rtol=1e-4, atol=3e-6)


def test_resample_preserves_pure_tone():
    """A band-limited sine through the polyphase L/M resampler must
    come out as THE SAME analytic sine at the new rate (amplitude and
    phase), independent of any implementation detail — the textbook
    correctness anchor for a rate converter."""
    import jax

    from noaa_apt_tpu.core import Lowpass
    from noaa_apt_tpu.ops import resample as rs

    f0 = 1500.0
    in_rate, out_rate = 11025, 12480
    n = 60_000
    t_in = np.arange(n) / in_rate
    x = np.sin(2 * np.pi * f0 * t_in).astype(np.float32)

    import math

    g = math.gcd(in_rate, out_rate)
    l, m = out_rate // g, in_rate // g
    filt = Lowpass(
        cutout=Freq.hz(5000.0, Rate(in_rate)),
        atten=40.0,
        delta_w=Freq.hz(800.0, Rate(in_rate)),
    )
    coeff = filt.resample(Rate(in_rate), Rate(in_rate * l)).design()
    plan = rs.resample_plan(n, l, m, coeff)
    y = np.asarray(jax.jit(lambda v: rs.fast_resample(v, plan))(x))

    offset = (len(coeff) - 1) // 2
    k = np.arange(plan.out_len)
    # Output sample k sits at interpolated index offset + k*m, i.e.
    # input time (offset + k*m) / (in_rate * l).  Gain and absolute
    # phase follow the reference's filter normalization conventions
    # (contrast normalization absorbs them downstream), so fit a
    # single (amplitude, phase) pair over the whole pass and assert
    # the residual: the output must BE a pure f0 tone on exactly this
    # time grid — any rate/phase error would decohere the fit across
    # the 4+ seconds of signal.
    t_out = (offset + k * m) / (in_rate * l)
    sl = slice(2000, plan.out_len - 2000)
    basis = np.stack(
        [np.sin(2 * np.pi * f0 * t_out[sl]), np.cos(2 * np.pi * f0 * t_out[sl])],
        axis=1,
    )
    coef, *_ = np.linalg.lstsq(basis, y[sl].astype(np.float64), rcond=None)
    amp = float(np.hypot(*coef))
    resid = y[sl] - basis @ coef
    # Gain convention: the interpolation filter has unity DC gain over
    # the l-upsampled stream, so a unit tone comes out at ~1/l (the
    # reference never rescales; contrast normalization absorbs it).
    assert 0.9 < amp * l < 1.1, (amp, l)
    rel_rms = float(np.sqrt(np.mean(resid**2))) / amp
    assert rel_rms < 0.01, rel_rms  # 40 dB design: <1% off-tone energy


def test_am_demod_vs_hilbert_envelope():
    """The AM demodulator must track the true envelope of an AM signal
    — checked against the Hilbert-transform analytic envelope (scipy),
    which shares no code or method with the 2-sample formula.

    The reference's formula deliberately DOUBLES the per-sample phase
    step (dsp.rs:361 quirk, replicated for bit parity), so its raw
    output is the envelope times a constant plus carrier-rate ripple;
    the pipeline always lowpasses right after (decode.rs:95-102) and
    contrast normalization absorbs the gain.  The anchor therefore
    lowpasses BOTH signals identically (scipy FIR) and fits one gain:
    the residual must be ~1%."""
    import jax
    from scipy.signal import firwin, hilbert, lfilter

    from noaa_apt_tpu.ops import demod as dm

    fs, fc = 12480, 2400.0
    n = 40_000
    t = np.arange(n) / fs
    env_true = 0.6 + 0.35 * np.sin(2 * np.pi * 1.7 * t)  # 2-line/s-ish AM
    x = (env_true * np.cos(2 * np.pi * fc * t)).astype(np.float32)

    carrier = Freq.hz(fc, Rate(fs))
    ours = np.asarray(jax.jit(lambda v: dm.demodulate(v, carrier))(x))
    ref = np.abs(hilbert(x.astype(np.float64)))

    lp = firwin(301, 500.0, fs=fs)  # scipy's filter, shared by both
    ours_s = lfilter(lp, [1.0], ours.astype(np.float64))
    ref_s = lfilter(lp, [1.0], ref)
    sl = slice(1000, n - 1000)
    gain = float(np.dot(ours_s[sl], ref_s[sl]) / np.dot(ref_s[sl], ref_s[sl]))
    assert gain > 0.1
    resid = ours_s[sl] - gain * ref_s[sl]
    rel = np.sqrt(np.mean(resid**2)) / np.sqrt(np.mean((gain * ref_s[sl]) ** 2))
    assert rel < 0.01, rel
