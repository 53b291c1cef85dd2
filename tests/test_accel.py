"""Acceleration-path equivalence: device peak finder == host scan,
device contrast/u8 render == host post path, int16 upload == f32."""

import numpy as np
import pytest

import jax.numpy as jnp

from noaa_apt_tpu import PX_PER_ROW
from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.core.profiles import STANDARD
from noaa_apt_tpu.graph.decode import Decoder
from noaa_apt_tpu.graph.process import process
from noaa_apt_tpu.ops.sync import (
    find_sync_peaks,
    find_sync_peaks_device,
    find_sync_peaks_reference,
)
from noaa_apt_tpu.post.contrast import map_signal_u8, percent
from noaa_apt_tpu.synth import synth_recording
from noaa_apt_tpu.types import Contrast, Rotate


@pytest.mark.parametrize("seed", range(6))
def test_device_peak_finder_matches_reference(seed):
    rng = np.random.default_rng(seed)
    wr = Rate(4160 * 2)
    spr = 2080 * 2
    n = spr * 7 + int(rng.integers(0, spr))
    corr = rng.standard_normal(n + 300).astype(np.float32)  # padded tail
    for r in range(1, 6):
        corr[r * spr + int(rng.integers(-20, 20))] += 50.0
    ref = find_sync_peaks_reference(corr[:n], wr)
    dev = find_sync_peaks_device(jnp.asarray(corr), n, wr)
    assert dev == ref


def test_device_peak_finder_dropouts():
    wr = Rate(4160 * 2)
    spr = 2080 * 2
    corr = np.full(spr * 10, -1.0, np.float32)
    corr[10] = 5.0
    ref = find_sync_peaks_reference(corr, wr)
    dev = find_sync_peaks_device(jnp.asarray(corr), len(corr), wr)
    assert dev == ref


def test_native_host_device_agree_on_signal():
    signal, _ = synth_recording(n_rows=24, sample_rate=11025, noise_db=10.0)
    rate = Rate(11025)
    d_dev = Decoder(STANDARD, peak_backend="device")
    d_host = Decoder(STANDARD, peak_backend="host")
    r1 = d_dev.decode(signal, rate)
    r2 = d_host.decode(signal, rate)
    assert r1.sync_positions == r2.sync_positions
    np.testing.assert_array_equal(r1.image_np(), r2.image_np())


def test_render_u8_matches_host_contrast():
    signal, _ = synth_recording(n_rows=24, sample_rate=11025, noise_db=10.0)
    rate = Rate(11025)
    dec = Decoder(STANDARD)
    res = dec.decode(signal, rate)
    flat = res.signal()

    for kind, args in [("percent", (0.98,)), ("percent", (0.5,)), ("minmax", ())]:
        dev = dec.render_u8(res, kind, *args)
        if kind == "percent":
            low, high = percent(flat, args[0])
        else:
            low, high = float(flat.min()), float(flat.max())
        host = map_signal_u8(flat, low, high).reshape(res.n_rows, PX_PER_ROW)
        np.testing.assert_array_equal(dev, host)


def test_process_device_path_matches_host_path():
    signal, _ = synth_recording(n_rows=24, sample_rate=11025, noise_db=10.0)
    rate = Rate(11025)
    dec = Decoder(STANDARD)
    res = dec.decode(signal, rate)
    img_dev = process(res, Contrast.from_percent(0.98), Rotate.NO, decoder=dec)
    img_host = process(res.signal(), Contrast.from_percent(0.98), Rotate.NO)
    np.testing.assert_array_equal(img_dev, img_host)

    img_dev = process(res, Contrast.minmax(), Rotate.YES, decoder=dec)
    img_host = process(res.signal(), Contrast.minmax(), Rotate.YES)
    np.testing.assert_array_equal(img_dev, img_host)


def test_process_telemetry_device_path_matches_host():
    signal, _ = synth_recording(n_rows=440, sample_rate=11025)
    rate = Rate(11025)
    dec = Decoder(STANDARD)
    res = dec.decode(signal, rate)
    img_dev = process(res, Contrast.telemetry(), Rotate.NO, decoder=dec)
    img_host = process(res.signal(), Contrast.telemetry(), Rotate.NO)
    np.testing.assert_array_equal(img_dev, img_host)


def test_native_resample_matches_naive():
    from noaa_apt_tpu.native import fast_resample_native
    import sys

    sys.path.insert(0, "tests")
    from test_ops import naive_fast_resampling

    rng = np.random.default_rng(3)
    x = rng.standard_normal(3000).astype(np.float32)
    coeff = (rng.standard_normal(301).astype(np.float32) / 301)
    for l, m in [(26, 100), (3, 2), (832, 735)]:
        expected = naive_fast_resampling(x, l, m, coeff)
        got = fast_resample_native(x, l, m, coeff, len(expected))
        if got is None:
            pytest.skip("native lib unavailable")
        # Same sequential accumulation order as the reference loop.
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)


def test_host_ingest_decode_matches_device():
    signal, _ = synth_recording(n_rows=24, sample_rate=11025, noise_db=12.0)
    rate = Rate(11025)
    dev = Decoder(STANDARD, ingest="device").decode(signal, rate)
    host = Decoder(STANDARD, ingest="host").decode(signal, rate)
    assert host.sync_positions == dev.sync_positions
    np.testing.assert_allclose(
        host.image_np(), dev.image_np(), atol=2e-4 * max(1.0, np.abs(dev.image_np()).max())
    )


def test_host_ingest_falls_back_for_decimation():
    # l == 1 (24960 -> 12480): host ingest declines, device path used.
    signal, _ = synth_recording(n_rows=16, sample_rate=24960)
    res = Decoder(STANDARD, ingest="host").decode(signal, Rate(24960))
    assert res.n_rows >= 14


def test_int16_input_bit_exact():
    signal, _ = synth_recording(n_rows=16, sample_rate=11025)
    s16 = np.clip(np.round(signal / np.abs(signal).max() * 32767), -32768, 32767).astype(np.int16)
    rate = Rate(11025)
    dec = Decoder(STANDARD)
    r_f32 = dec.decode(s16.astype(np.float32), rate)
    r_i16 = dec.decode(s16, rate)
    assert r_f32.sync_positions == r_i16.sync_positions
    np.testing.assert_array_equal(r_f32.image_np(), r_i16.image_np())
