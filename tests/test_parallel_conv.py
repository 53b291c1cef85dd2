"""Sharded decode coverage for the conv-mode resampler (48 kHz input,
l=26 packed-kernel path) and the l==1 decimation edge case."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.core.profiles import STANDARD
from noaa_apt_tpu.err import InternalError
from noaa_apt_tpu.graph.decode import Decoder
from noaa_apt_tpu.parallel import ShardedDecoder
from noaa_apt_tpu.synth import synth_recording


def test_sharded_conv_mode_equals_single_chip():
    signal, _ = synth_recording(n_rows=24, sample_rate=48000, noise_db=15.0)
    rate = Rate(48000)
    single = Decoder(STANDARD).decode(signal, rate)
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    sharded = ShardedDecoder(STANDARD, mesh).decode(signal, rate)
    assert sharded.sync_positions == single.sync_positions
    np.testing.assert_array_equal(single.image_np(), sharded.image_np())


def test_decode_l1_decimation_input_rate():
    # 24960 Hz input -> work 12480: l = 1, m = 2 (causal filter +
    # decimate path, dsp.rs:105-123).
    signal, _ = synth_recording(n_rows=16, sample_rate=24960)
    res = Decoder(STANDARD).decode(signal, Rate(24960))
    assert res.n_rows >= 14
    img = res.image_np()
    assert img.shape[1] == 2080
    # channel A gradient recovered
    xa = img[4:-4, 100:990].mean(axis=0)
    assert np.corrcoef(xa, np.arange(xa.size))[0, 1] > 0.95


def test_decode_equal_rates():
    # input == work rate: pure causal-filter path, no resample.
    signal, _ = synth_recording(n_rows=16, sample_rate=12480)
    res = Decoder(STANDARD).decode(signal, Rate(12480))
    assert res.n_rows >= 14


@pytest.mark.parametrize("rate_hz,n_dev", [(24960, 2), (24960, 4), (12480, 4)])
def test_sharded_l1_equals_single_chip(rate_hz, n_dev):
    """Decimation-only rates (l == 1: 24960 Hz -> m=2; 12480 Hz -> m=1
    identity) shard with a (K-1)-sample left FIR halo and must stay
    bit-exact vs the single-chip causal-filter + decimate path."""
    signal, _ = synth_recording(n_rows=20, sample_rate=rate_hz, noise_db=18.0)
    rate = Rate(rate_hz)
    single = Decoder(STANDARD).decode(signal, rate)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("seq",))
    sharded = ShardedDecoder(STANDARD, mesh).decode(signal, rate)
    assert sharded.sync_positions == single.sync_positions
    np.testing.assert_array_equal(single.image_np(), sharded.image_np())


def test_sharded_work_length_matches_single_chip_formula():
    """The sharded decoder's work-length function must agree with the
    single-chip plan for EVERY recording length, not just lucky ones:
    for l == 1 the lengths are n_true // m (causal filter + decimate),
    and a mismatch silently drops trailing rows/sync peaks only when a
    peak lands in the missing tail."""
    from noaa_apt_tpu.graph.decode import _plan_resample_with_filter
    from noaa_apt_tpu.core.filters import LowpassDcRemoval
    from noaa_apt_tpu.core.frequency import Freq

    for rate_hz in (24960, 12480, 11025, 48000):
        rate = Rate(rate_hz)
        p = STANDARD
        filt = LowpassDcRemoval(
            cutout=Freq.hz(p.resample_cutout, rate),
            atten=p.resample_atten,
            delta_w=Freq.hz(p.resample_delta_freq, rate),
        )
        _, out_len, _ = _plan_resample_with_filter(
            2_000_000, rate, Rate(p.work_rate), filt
        )
        mesh = Mesh(np.array(jax.devices()[:2]), ("seq",))
        sd = ShardedDecoder(STANDARD, mesh)
        _, work_len_fn, _, _, _ = sd._get_stage1_sharded(2_000_000, rate)
        for n_true in (199_680, 249_600, 249_601, 500_000, 1_999_999):
            assert work_len_fn(n_true) == out_len(n_true), (rate_hz, n_true)
