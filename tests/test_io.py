"""I/O layer: WAV round-trips, settings file lifecycle, filename
parser truth table (misc.rs:545-639), context step export order."""

import os
from datetime import timezone, timedelta
from pathlib import Path

import numpy as np
import pytest

from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.err import DeserializeError, WavOpenError
from noaa_apt_tpu.io import config as cfg
from noaa_apt_tpu.io import misc, wav
from noaa_apt_tpu.io.context import Context
from noaa_apt_tpu.types import SatName


UTC = timezone.utc


def test_wav_roundtrip_int16(tmp_path):
    sig = np.sin(np.linspace(0, 100, 5000)).astype(np.float32)
    p = tmp_path / "x.wav"
    wav.write_wav(p, sig, wav.WavSpec(1, 11025, 16, "int"))
    back, spec = wav.load_wav(p)
    assert spec.sample_rate == 11025
    assert spec.bits_per_sample == 16
    # write normalizes by max then scales to i16
    expected = np.trunc(sig / sig.max() * 32767)
    np.testing.assert_allclose(back, expected, atol=1.0)


def test_wav_roundtrip_float32(tmp_path):
    sig = np.sin(np.linspace(0, 30, 4096)).astype(np.float32)
    p = tmp_path / "f.wav"
    wav.write_wav(p, sig, wav.WavSpec(1, 48000, 32, "float"))
    back, spec = wav.load_wav(p)
    assert spec.sample_format == "float"
    np.testing.assert_allclose(back, sig / sig.max(), rtol=1e-6)


def test_wav_open_errors(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(WavOpenError):
        wav.load_wav(p)
    with pytest.raises(WavOpenError):
        wav.load_wav(tmp_path / "missing.wav")


def test_settings_default_parse():
    de = cfg._parse_toml(cfg.DEFAULT_SETTINGS_TOML)
    s = cfg.build_settings(de)
    assert s.work_rate == 12480
    assert s.resample_cutout == 4800.0
    s_fast = cfg.build_settings(de, "fast")
    assert s_fast.work_rate == 16640
    assert s_fast.demodulation_atten == 23.0
    s_slow = cfg.build_settings(de, "slow")
    assert s_slow.work_rate == 20800
    # Invalid profile falls back to standard (config.rs:488-496)
    assert cfg.build_settings(de, "bogus").work_rate == 12480


def test_settings_version_check():
    with pytest.raises(DeserializeError, match="version"):
        cfg._parse_toml("version = 3\n")


def test_settings_file_lifecycle(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    # First load creates the default file
    de = cfg.load_de_settings()
    f = tmp_path / "noaa-apt-tpu" / "settings.toml"
    assert f.exists()
    assert de["version"] == 4
    # Corrupt file is moved to .OLD and regenerated
    f.write_text("version = 1\ngarbage")
    de = cfg.load_de_settings()
    assert (tmp_path / "noaa-apt-tpu" / "settings.OLD").exists()
    assert de["version"] == 4


# -- filename parser truth table (misc.rs:545-639) ----------------------


def _check(result, y, mo, d, h, mi, s, sat):
    assert result is not None
    ref_time, got_sat = result
    t = ref_time.time
    assert (t.year, t.month, t.day, t.hour, t.minute, t.second) == (y, mo, d, h, mi, s)
    assert got_sat == sat


def test_parse_filename_truth_table():
    pf = misc.parse_filename
    _check(pf("gqrx_20181222_203941_137100000.wav", "gqrx_%Y%m%d_%H%M%S_%!.wav", UTC),
           2018, 12, 22, 20, 39, 41, SatName.NOAA_19)
    _check(pf("gqrx_20111001_111111_137600000.wav", "gqrx_%Y%m%d_%H%M%S_%!.wav",
              timezone(timedelta(hours=1))),
           2011, 10, 1, 10, 11, 11, SatName.NOAA_15)
    _check(pf("NOAA15-20200325-060601.wav", "NOAA%N-%Y%m%d-%H%M%S.wav", UTC),
           2020, 3, 25, 6, 6, 1, SatName.NOAA_15)
    _check(pf("N1520200327073417.wav", "N%N%Y%m%d%H%M%S.wav", UTC),
           2020, 3, 27, 7, 34, 17, SatName.NOAA_15)
    _check(pf("2020-02-09-05-24-16-NOAA_19.wav", "%Y-%m-%d-%H-%M-%S-NOAA_%N.wav", UTC),
           2020, 2, 9, 5, 24, 16, SatName.NOAA_19)
    _check(pf("20200320-213957NOAA19El64.wav", "%Y%m%d-%H%M%SNOAA%NEl%2.wav", UTC),
           2020, 3, 20, 21, 39, 57, SatName.NOAA_19)
    _check(pf("SDRSharp_20200325_204556Z_137102578Hz_AF.wav",
              "SDRSharp_%Y%m%d_%H%M%SZ_%!Hz_AF.wav", UTC),
           2020, 3, 25, 20, 45, 56, SatName.NOAA_19)
    # Default sat is NOAA 19
    _check(pf("20200325_204556Z.wav", "%Y%m%d_%H%M%SZ.wav", UTC),
           2020, 3, 25, 20, 45, 56, SatName.NOAA_19)

    # Invalid datetimes
    assert pf("2020-03-99_20-55-10.wav", "%Y-%m-%d_%H-%M-%S.wav", UTC) is None
    assert pf("2020-03-10_20-72-10.wav", "%Y-%m-%d_%H-%M-%S.wav", UTC) is None
    # Invalid satellite
    assert pf("2020-03-10_20-72-10_NOAA80.wav", "%Y-%m-%d_%H-%M-%S_NOAA%N.wav", UTC) is None
    assert pf("2020-03-10_20-72-10_NOAA8.wav", "%Y-%m-%d_%H-%M-%S_NOAA%N.wav", UTC) is None
    # Invalid format option
    assert pf("2020-03-10_20-72-10_NOAA80.wav", "%Y-%m-%d_%H-%M-%S_NOAA%Z.wav", UTC) is None


def test_timestamps_roundtrip(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("hi")
    misc.write_timestamp(1_500_000_000, p)
    assert misc.read_timestamp(p) == 1_500_000_000


def test_context_step_export(tmp_path):
    ctx = Context.decode(
        export_wav=True, work_rate=Rate(12480), final_rate=Rate(4160),
        output_dir=tmp_path,
    )
    sig = np.ones(100, np.float32)
    ctx.step_signal("input", sig, Rate(11025))
    ctx.step_filter("resample_filter", np.ones(5, np.float32))
    # Unknown id ignored, order preserved
    ctx.step_signal("bogus_step", sig, Rate(11025))
    # resample_filtered skipped (export_resample_filtered=False) but
    # consumes its metadata slot
    ctx.step_signal("resample_filtered", sig, Rate(11025))
    ctx.step_signal("resample_decimated", sig, Rate(12480))
    ctx.step_signal("demodulation_result", sig, None)  # rate from metadata

    names = sorted(f.name for f in tmp_path.glob("*.wav"))
    assert names == [
        "00_input.wav",
        "01_resample_filter.wav",
        "03_resample_decimated.wav",
        "04_demodulated_unfiltered.wav",
    ]
    # Rates written correctly
    _, spec = wav.load_wav(tmp_path / "04_demodulated_unfiltered.wav")
    assert spec.sample_rate == 12480


def test_context_empty_signal_ignored(tmp_path):
    ctx = Context.decode(export_wav=True, output_dir=tmp_path)
    for sid in ["input", "resample_filter", "resample_filtered",
                "resample_decimated", "demodulation_result", "filter_filter",
                "filter_result"]:
        variant = "filter" if "filter_f" in sid or sid == "resample_filter" else "signal"
        ctx.step(variant, sid, np.ones(4, np.float32), Rate(1000))
    ctx.step_signal("sync_correlation", np.zeros(0, np.float32), Rate(12480))
    assert not (tmp_path / "07_sync_correlation.wav").exists()


def test_parse_version_semver():
    """Reference compares versions with the semver crate (misc.rs:66-90):
    pre-release tags must parse and order below the release."""
    from noaa_apt_tpu.io.misc import parse_version

    assert parse_version("1.5.0") > parse_version("1.4.1")
    assert parse_version("1.5.0-beta") < parse_version("1.5.0")
    assert parse_version("1.5.0-alpha") < parse_version("1.5.0-beta")
    assert parse_version("1.5.0-alpha.1") < parse_version("1.5.0-alpha.2")
    assert parse_version("1.5.0-1") < parse_version("1.5.0-alpha")  # numeric < alpha
    assert parse_version("1.5.0-rc.1") < parse_version("1.5.0-rc.1.1")  # fewer ids first
    assert parse_version("1.5.0+build7") == parse_version("1.5.0")  # build ignored
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_version("1.5")


def test_fast_gray_png_roundtrip():
    """The raw-scanline gray PNG writer must decode to identical pixels
    (PNG is lossless; only the container differs from PIL's)."""
    from PIL import Image

    from noaa_apt_tpu.io.png import encode_gray_png

    import io as _io

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 211), dtype=np.uint8)
    data = encode_gray_png(img)
    back = np.asarray(Image.open(_io.BytesIO(data)))
    np.testing.assert_array_equal(back, img)

    with pytest.raises(ValueError, match="uint8"):
        encode_gray_png(img.astype(np.float32))


def test_wav_loader_never_leaks_raw_exceptions(tmp_path):
    """Every malformed WAV must surface as err.AptError (the CLI's one
    catch point), never struct.error/ValueError tracebacks: truncation
    at every interesting boundary plus corrupted chunk sizes."""
    from noaa_apt_tpu import err as apt_err
    from noaa_apt_tpu.io.wav import load_wav
    from noaa_apt_tpu.io import wav as wav_mod
    from noaa_apt_tpu.synth import synth_recording

    sig, _ = synth_recording(n_rows=12, sample_rate=11025)
    good = tmp_path / "good.wav"
    wav_mod.write_wav(good, sig, wav_mod.WavSpec(1, 11025, 16, "int"))
    raw = good.read_bytes()

    cases = []
    # truncations at/around every header boundary
    for cut in (0, 4, 11, 12, 16, 20, 21, 35, 36, 40, 43, 44, 45, 100):
        cases.append(raw[:cut])
    # fmt chunk claiming a short size
    broken = bytearray(raw)
    broken[16:20] = (8).to_bytes(4, "little")  # fmt size 8 < 16
    cases.append(bytes(broken))
    # absurd chunk size (beyond the file)
    broken = bytearray(raw)
    broken[16:20] = (2**31).to_bytes(4, "little")
    cases.append(bytes(broken))
    # wrong magic
    cases.append(b"FFIR" + raw[4:])
    cases.append(raw[:8] + b"EVAW" + raw[12:])

    p = tmp_path / "bad.wav"
    for i, data in enumerate(cases):
        p.write_bytes(data)
        try:
            out, _spec = load_wav(p)
            # loading is allowed to succeed (truncated-data tolerance),
            # but must return a sane array
            assert out.ndim == 1
        except apt_err.AptError:
            pass  # the documented failure mode
        # anything else propagates and fails the test with its traceback


def test_load_device_ready_mmap_matches(tmp_path):
    """The zero-copy mmap load (mono PCM16) returns the same samples
    and rate as the general loader, as a read-only memmap view."""
    from noaa_apt_tpu.io import wav as w
    from noaa_apt_tpu.synth import synth_recording

    sig, _ = synth_recording(n_rows=12, sample_rate=11025)
    p = tmp_path / "m.wav"
    w.write_wav(p, sig, w.WavSpec(1, 11025, 16, "int"))

    a, ra = w.load_device_ready(p, use_mmap=True)
    b, rb = w.load_device_ready(p, use_mmap=False)
    assert isinstance(a, np.memmap) and a.dtype == np.int16
    assert ra.get_hz() == rb.get_hz() == 11025
    np.testing.assert_array_equal(np.asarray(a), b)


def test_load_device_ready_mmap_truncated(tmp_path):
    """A data chunk size lying past EOF is clamped, like load_wav's
    hound tolerance (noaa_apt.rs:114-130)."""
    from noaa_apt_tpu.io import wav as w
    from noaa_apt_tpu.synth import synth_recording

    sig, _ = synth_recording(n_rows=12, sample_rate=11025)
    p = tmp_path / "t.wav"
    w.write_wav(p, sig, w.WavSpec(1, 11025, 16, "int"))
    data = bytearray(p.read_bytes())
    p.write_bytes(bytes(data[: len(data) - 1001]))  # chop the tail

    a, _ = w.load_device_ready(p, use_mmap=True)
    b, _ = w.load_device_ready(p, use_mmap=False)
    assert isinstance(a, np.memmap)
    np.testing.assert_array_equal(np.asarray(a), b)


def test_load_device_ready_mmap_fallback_stereo(tmp_path):
    """Multichannel files skip the mmap fast path but still load."""
    import struct

    from noaa_apt_tpu.io import wav as w

    rng = np.random.default_rng(0)
    frames = (rng.standard_normal((500, 2)) * 1000).astype("<i2")
    payload = frames.tobytes()
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16),
        b"data", struct.pack("<I", len(payload)),
    ])
    p = tmp_path / "st.wav"
    p.write_bytes(hdr + payload)

    a, ra = w.load_device_ready(p, use_mmap=True)
    assert not isinstance(a, np.memmap)
    assert ra.get_hz() == 8000
    np.testing.assert_array_equal(a, frames[:, 0])
