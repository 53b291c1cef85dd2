"""host8 (lossy i8-upload) quality contract across signal regimes
(VERDICT r4 item 6).

The i8 work payload is only allowed to serve when its output is
visually identical to the exact pipeline (>= 40 dB PSNR, identical
sync positions and telemetry calibration).  These tests sweep input
SNR / contrast regimes to establish where that holds, and exercise the
automatic i16 fallback for recordings whose statistics predict a gate
failure (`Decoder.prepare_work`'s crest-factor estimate).
"""

import numpy as np
import pytest

from conftest import synth_i16

from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.core.profiles import STANDARD
from noaa_apt_tpu.graph.decode import Decoder, _i8_ingest_snr_estimate


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("noise_db", [40.0, 20.0, 12.0])
@pytest.mark.parametrize("contrast_kind", ["percent", "telemetry"])
def test_host8_matches_host16_across_snr(noise_db, contrast_kind):
    """Across clean -> noisy inputs, host8's output keeps >= 40 dB PSNR
    vs host16, identical sync positions, and (telemetry) identical
    wedge-calibrated rendering decisions."""
    n_rows = 208 if contrast_kind == "telemetry" else 64
    sig16, _ = synth_i16(n_rows, 11025, noise_db=noise_db, seed=7)
    rate = Rate(11025)

    dec16 = Decoder(STANDARD, ingest="host16")
    dec8 = Decoder(STANDARD, ingest="host8")
    w16 = dec16.prepare_work(sig16, rate)
    w8 = dec8.prepare_work(sig16, rate)
    assert w8.data.dtype == np.int8, "clean/noisy synth must not trip the fallback"
    assert dec8.host8_fallbacks == 0

    g16, s16 = dec16.decode_render(w16, contrast_kind)
    g8, s8 = dec8.decode_render(w8, contrast_kind)
    # Sync parity: bit-exact on clean signals; under real channel noise
    # a correlation near-tie can move +-1 work-sample when ~42 dB of
    # quantization noise lands on top (measured: 1 peak in ~400 at
    # 20 dB input SNR) — 1/3 of a pixel, invisible, and carried by the
    # PSNR gate below.  More than that, or >2% of peaks, is a failure.
    assert len(s8) == len(s16)
    deltas = [abs(a - b) for a, b in zip(s8, s16)]
    if noise_db >= 40.0:
        assert s8 == s16, "clean-signal sync positions must be identical"
    assert max(deltas) <= 1, f"sync shift beyond 1 sample at noise_db={noise_db}"
    n_moved = sum(d != 0 for d in deltas)
    assert n_moved <= max(1, len(deltas) // 50), (
        f"{n_moved}/{len(deltas)} peaks moved at noise_db={noise_db}"
    )
    p = _psnr(g8, g16)
    assert p >= 40.0, f"host8 PSNR {p:.1f} dB under gate at noise_db={noise_db}"


def test_host8_telemetry_wedge_classification_stable():
    """The 44-px band means feeding wedge matching are exactly where i8
    ingest noise could flip a best-row argmax — assert the channel
    classification and wedge levels agree with the exact pipeline."""
    from noaa_apt_tpu.post.telemetry import telemetry_from_stats

    sig16, _ = synth_i16(208, 11025, noise_db=14.0, seed=3)
    rate = Rate(11025)
    tels = {}
    for ingest in ("host16", "host8"):
        dec = Decoder(STANDARD, ingest=ingest)
        res = dec.decode(sig16, rate, sync=True)
        ma, mb, var = dec.telemetry_stats(res)
        tels[ingest] = telemetry_from_stats(ma, mb, var)
    a, b = tels["host16"], tels["host8"]
    for wedge in (8, 9, 16):
        va, vb = a.get_wedge_value(wedge, None), b.get_wedge_value(wedge, None)
        assert abs(va - vb) < 1.5, f"wedge {wedge}: {va} vs {vb}"
    assert a.get_channel_name("a") == b.get_channel_name("a")
    assert a.get_channel_name("b") == b.get_channel_name("b")


def test_snr_estimate_sine_crest():
    t = np.arange(100_000)
    x = (12000 * np.sin(2 * np.pi * 0.19 * t)).astype(np.int16)
    est = _i8_ingest_snr_estimate(x)
    # sine crest: 20*log10(0.707 * 127 * sqrt(12)) ~= 49.9 dB,
    # amplitude-independent.
    assert 48.5 < est < 51.0


def test_snr_estimate_spiky_collapses():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(100_000) * 300).astype(np.int16)
    x[::9973] = 32000  # rare full-scale spikes set the quantization step
    est = _i8_ingest_snr_estimate(x)
    assert est < 35.0


def test_host8_falls_back_to_i16_on_spiky_pass():
    """A pass whose crest factor predicts a gate failure silently ships
    an i16 payload; its output is then exactly the host16 output."""
    sig, _ = synth_i16(64, 11025, noise_db=30.0, seed=1)
    sig16 = (sig / 16.0).astype(np.int16)  # quiet signal...
    sig16[::40011] = 32600  # ...with rare full-scale interference spikes
    rate = Rate(11025)

    dec8 = Decoder(STANDARD, ingest="host8")
    w8 = dec8.prepare_work(sig16, rate)
    assert dec8.host8_fallbacks == 1
    assert w8.data.dtype == np.int16

    dec16 = Decoder(STANDARD, ingest="host16")
    w16 = dec16.prepare_work(sig16, rate)
    g8, s8 = dec8.decode_render(w8, "percent", 0.98)
    g16, s16 = dec16.decode_render(w16, "percent", 0.98)
    assert s8 == s16
    np.testing.assert_array_equal(g8, g16)


def test_fleet_isolates_mixed_dtype_groups(tmp_path):
    """A host8 fleet where one pass trips the fallback must not batch
    i16 and i8 payloads into one graph (dtype is part of the group
    key); every pass still decodes."""
    from noaa_apt_tpu.io import wav
    from noaa_apt_tpu.io.wav import WavSpec
    from noaa_apt_tpu.serve import decode_fleet

    paths = []
    for i in range(4):
        sig16, _ = synth_i16(40, 11025, noise_db=25.0, seed=i)
        if i == 2:  # make one pass spiky-quiet: triggers the fallback
            sig16 = (sig16 / 16.0).astype(np.int16)
            sig16[::30011] = 32600
        p = tmp_path / f"p{i}.wav"
        wav.write_wav(p, sig16, WavSpec(1, 11025, 16, "int"))
        paths.append(p)
    rep = decode_fleet(paths, tmp_path / "out", ingest="host8")
    assert not rep.failed, [r.error for r in rep.failed]
    assert len(rep.ok) == 4
