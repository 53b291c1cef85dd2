"""End-to-end decode of synthesized APT recordings (the reference's
integration-test analog, with actual assertions instead of eyeballing:
SURVEY.md section 4 implication (d))."""

import numpy as np
import pytest

from noaa_apt_tpu import PX_PER_ROW, FINAL_RATE
from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.core.profiles import FAST, SLOW, STANDARD
from noaa_apt_tpu.err import InternalError
from noaa_apt_tpu.graph.decode import Decoder
from noaa_apt_tpu.synth import synth_recording


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf


def _align_and_compare(img: np.ndarray, pattern: np.ndarray) -> float:
    """Decoded rows start at the sync-pulse position and are shifted by
    the (constant) post-demod filter group delay; find that single
    column shift, then PSNR over the overlapping region."""
    # Normalize decoded floats to 0..255 using robust percentiles.
    lo, hi = np.percentile(img, [1, 99])
    scaled = np.clip((img - lo) / (hi - lo) * 255.0, 0, 255)
    row_mean = scaled[2:-2].mean(axis=0)
    pat_mean = pattern[2:-2].mean(axis=0)
    # circular cross-correlation over column shift
    shifts = np.arange(-12, 13)
    scores = [np.corrcoef(np.roll(row_mean, -s), pat_mean)[0, 1] for s in shifts]
    s = int(shifts[int(np.argmax(scores))])
    rolled = np.roll(scaled, -s, axis=1)
    n = min(rolled.shape[0], pattern.shape[0]) - 4
    # Ignore the first/last columns affected by the roll wrap.
    return _psnr(rolled[2 : 2 + n, 16:-16], pattern[2 : 2 + n, 16:-16])


@pytest.mark.parametrize(
    "rate,profile", [(11025, STANDARD), (48000, FAST), (48000, SLOW)]
)
def test_decode_clean_signal(rate, profile):
    n_rows = 40
    signal, pattern = synth_recording(n_rows=n_rows, sample_rate=rate)
    dec = Decoder(profile)
    res = dec.decode(signal, Rate(rate), sync=True)

    assert res.n_rows >= n_rows - 2
    img = res.image_np()
    assert img.shape[1] == PX_PER_ROW

    # Clean signal: consecutive sync positions must be exactly one row
    # apart at the work rate.
    spr = dec.samples_per_work_row
    pos = np.array(res.sync_positions)
    diffs = np.diff(pos[1:-1])  # first interval may include start garbage
    assert np.all(np.abs(diffs - spr) <= 1), diffs

    psnr = _align_and_compare(img, pattern[: res.n_rows])
    assert psnr > 25.0, psnr


def test_decode_noisy_signal():
    signal, pattern = synth_recording(n_rows=32, sample_rate=11025, noise_db=10.0)
    dec = Decoder(STANDARD)
    res = dec.decode(signal, Rate(11025), sync=True)
    assert res.n_rows >= 28
    psnr = _align_and_compare(res.image_np(), pattern[: res.n_rows])
    assert psnr > 15.0, psnr


def test_decode_no_sync_path():
    signal, _ = synth_recording(n_rows=16, sample_rate=11025)
    dec = Decoder(STANDARD)
    res = dec.decode(signal, Rate(11025), sync=False)
    assert res.sync_positions is None
    assert res.n_rows >= 15
    assert res.image_np()[0, 0] == 0.0  # NoFilter causal-path quirk


def test_decode_too_short_errors():
    signal, _ = synth_recording(n_rows=4, sample_rate=11025)
    dec = Decoder(STANDARD)
    with pytest.raises(InternalError, match="less than 10 rows"):
        dec.decode(signal, Rate(11025), sync=True)


def test_decode_deterministic():
    signal, _ = synth_recording(n_rows=16, sample_rate=11025)
    dec = Decoder(STANDARD)
    a = dec.decode(signal, Rate(11025)).image_np()
    b = dec.decode(signal, Rate(11025)).image_np()
    np.testing.assert_array_equal(a, b)
