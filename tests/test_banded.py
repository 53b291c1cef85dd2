"""Banded-MXU-matmul demod+FIR+corr chain (ops/banded_chain.py).

Must match the portable op-chain composition ``demodulate ->
causal_filter -> sync_correlate`` up to f32 accumulation order, and
produce identical greedy sync peaks on realistic correlations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from noaa_apt_tpu.core.frequency import Freq, Rate
from noaa_apt_tpu.ops import demod as dm
from noaa_apt_tpu.ops import resample as rs
from noaa_apt_tpu.ops import sync as sy
from noaa_apt_tpu.ops.banded_chain import make_demod_fir_corr_banded


def _chain_ref(y, carrier, dcoeff, template):
    d = dm.demodulate(jnp.asarray(y), carrier)
    f = rs.causal_filter(d, dcoeff)
    c = sy.sync_correlate(f, template)
    return np.asarray(f), np.asarray(c)


@pytest.mark.parametrize(
    "work_hz,k,n",
    [
        (12480, 61, 5000),     # standard-profile shapes (G=114, back=1, fwd=1)
        (16640, 61, 4000),     # fast (G=152 -> fwd=2)
        (20800, 200, 4096),    # slow template (G=190) + K>128 -> back=2
    ],
)
def test_banded_matches_op_chain(work_hz, k, n):
    rng = np.random.default_rng(work_hz + k)
    y = rng.standard_normal(n).astype(np.float32)
    carrier = Freq.hz(2400.0, Rate(work_hz))
    dcoeff = (rng.standard_normal(k) / k).astype(np.float32)
    template = sy.generate_sync_frame(Rate(work_hz))
    c2, sp = dm.demod_constants(carrier)

    fn = make_demod_fir_corr_banded(dcoeff, template, c2, sp, n)
    got_f, got_c = (np.asarray(a) for a in fn(jnp.asarray(y)))
    want_f, want_c = _chain_ref(y, carrier, dcoeff, template)

    assert got_f.shape == (n,)
    assert got_f[0] == 0.0  # dem[0] = 0 and the FIR's i > j guard
    np.testing.assert_allclose(got_f, want_f, rtol=2e-4, atol=2e-4)
    # sync_correlate returns n - G entries; banded computes the tail
    # against zero padding (masked by callers).
    g = len(template)
    scale = np.abs(want_c).max() + 1.0
    np.testing.assert_allclose(
        got_c[: n - g] / scale, want_c / scale, rtol=0, atol=2e-5
    )


def test_banded_peaks_identical_on_synthetic_pass():
    """Accumulation-order f32 differences must not move greedy peaks on
    a realistic (noisy APT) correlation."""
    from noaa_apt_tpu import synth
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder

    sig, _ = synth.synth_recording(n_rows=16, sample_rate=12480, noise_db=15.0)
    y = sig.astype(np.float32)
    n = len(y)
    dec = Decoder(STANDARD)
    carrier, dcoeff, template = dec._chain_params()
    c2, sp = dm.demod_constants(carrier)
    fn = make_demod_fir_corr_banded(dcoeff, template, c2, sp, n)
    _, corr_b = fn(jnp.asarray(y))
    _, corr_o = _chain_ref(y, carrier, dcoeff, template)
    g = len(template)
    wr = Rate(STANDARD.work_rate)
    peaks_b = sy.find_sync_peaks(np.asarray(corr_b)[: n - g], wr)
    peaks_o = sy.find_sync_peaks(corr_o[: n - g], wr)
    assert peaks_b == peaks_o
    assert len(peaks_b) >= 10
