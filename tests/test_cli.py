"""CLI integration tests — the reference's ``test/test.sh`` command
set (decode at 11025 Hz, noisy 48 kHz decode, up/down/decimate
resamples, full map decode with pinned TLE) with actual assertions."""

import os
from pathlib import Path

import numpy as np
import pytest

from noaa_apt_tpu.cli import inner_main
from noaa_apt_tpu.io import wav
from noaa_apt_tpu.synth import synth_recording

from test_geo import TEST_TLE


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    monkeypatch.setenv("NOAA_APT_RES_DIR", str(tmp_path / "res"))
    monkeypatch.chdir(tmp_path)

    sig, _ = synth_recording(n_rows=20, sample_rate=11025, noise_db=20.0)
    wav.write_wav(tmp_path / "test_11025hz.wav", sig, wav.WavSpec(1, 11025, 16, "int"))
    noise = np.random.default_rng(0).standard_normal(48000 * 8).astype(np.float32)
    wav.write_wav(tmp_path / "noise_48000hz.wav", noise, wav.WavSpec(1, 48000, 16, "int"))
    (tmp_path / "test_tle.txt").write_text(TEST_TLE)
    return tmp_path


def test_version(env, capsys):
    assert inner_main(["-v"]) == 0
    assert "version" in capsys.readouterr().out


def test_decode_apt(env):
    assert inner_main(["-q", "test_11025hz.wav", "-o", "decoded_apt.png"]) == 0
    from PIL import Image

    img = Image.open("decoded_apt.png")
    assert img.width == 2080
    assert img.height >= 15


def test_decode_noise_fails_gracefully(env):
    # Pure noise at 48 kHz: sync peaks are forced, decode completes (the
    # reference's noise test also produces a garbage-but-valid image).
    rc = inner_main(["-q", "noise_48000hz.wav", "-o", "decoded_noise.png"])
    assert rc == 0
    assert Path("decoded_noise.png").exists()


@pytest.mark.parametrize(
    "src,rate,out",
    [
        ("test_11025hz.wav", 48000, "upsampled_apt.wav"),
        ("test_11025hz.wav", 6000, "downsampled_apt.wav"),
        ("test_11025hz.wav", 3675, "decimated_apt.wav"),
        ("noise_48000hz.wav", 80000, "upsampled_noise.wav"),
        ("noise_48000hz.wav", 11025, "downsampled_noise.wav"),
    ],
)
def test_resample_commands(env, src, rate, out):
    assert inner_main(["-q", src, "-r", str(rate), "-o", out]) == 0
    back, spec = wav.load_wav(out)
    assert spec.sample_rate == rate
    assert spec.bits_per_sample == 16
    src_n, src_spec = wav.load_wav(src)
    expected_len = len(src_n) * rate / src_spec.sample_rate
    assert abs(len(back) - expected_len) < rate * 0.01
    # mtime copied from source (resample.rs:29,67)
    assert int(os.stat(out).st_mtime) == int(os.stat(src).st_mtime)


def test_decode_with_map_and_rotate(env):
    from noaa_apt_tpu.geo import shapefile as shp

    # Unix 1580000000 = 2020-01-26T00:53:20Z; NOAA 19 is then near
    # (-16.4, 66.8) — draw lines crossing that swath.
    # Dense vertices: the reference's inclusion test is per-segment-
    # endpoint, so long sparse segments crossing the swath are skipped.
    t = np.linspace(0.0, 1.0, 200)
    (env / "res" / "shapefiles").mkdir(parents=True)
    shp.write_parts(
        env / "res" / "shapefiles" / "countries.shp",
        [np.stack([60 + 10 * t, -20 + 10 * t], axis=1),
         np.stack([64 + 4 * t, -25 + 20 * t], axis=1)],
        shp.SHAPE_POLYGON,
    )
    rc = inner_main(
        ["-q", "test_11025hz.wav", "--tle", "test_tle.txt", "-s", "noaa_19",
         "-R", "auto", "-m", "yes", "-t", "2020-01-26T00:53:20+00:00",
         "-o", "decoded_apt_map.png"]
    )
    assert rc == 0
    from PIL import Image

    img = np.asarray(Image.open("decoded_apt_map.png").convert("RGB")).astype(int)
    assert ((img[..., 0] - img[..., 2]) > 10).sum() > 20  # overlay ink present


def test_false_color_generates_palette(env):
    rc = inner_main(["-q", "test_11025hz.wav", "-F", "-o", "fc.png"])
    assert rc == 0
    assert (env / "res" / "palettes" / "noaa-apt-daylight.png").exists()


def test_false_color_vendored_palette_set(env):
    """The shipped res/palettes set (processing.rs:108-157 consumers):
    22 palettes, 256x256, and decoding with one actually colorizes."""
    import noaa_apt_tpu

    res = Path(noaa_apt_tpu.__file__).resolve().parent / "res" / "palettes"
    pngs = sorted(res.glob("*.png"))
    assert len(pngs) == 22
    from PIL import Image

    for p in (res / "noaa-apt-daylight.png", res / "WXtoImg-NO.png"):
        assert p in pngs and Image.open(p).size == (256, 256)

    rc = inner_main([
        "-q", "test_11025hz.wav", "-F",
        "-P", str(res / "noaa-apt-daylight.png"), "-o", "fcv.png",
    ])
    assert rc == 0
    img = np.asarray(Image.open("fcv.png").convert("RGB")).astype(int)
    assert (np.abs(img[..., 0] - img[..., 1]) > 8).sum() > 1000  # colorized


def test_profile_selection(env):
    assert inner_main(["-q", "test_11025hz.wav", "-p", "fast", "-o", "fast.png"]) == 0
    assert inner_main(["-q", "test_11025hz.wav", "-p", "slow", "-o", "slow.png"]) == 0


def test_no_sync_flag(env):
    assert inner_main(["-q", "test_11025hz.wav", "--no-sync", "-o", "nosync.png"]) == 0


def test_ingest_host_flag(env):
    assert inner_main(["-q", "test_11025hz.wav", "--ingest", "host", "-o", "ih.png"]) == 0
    from PIL import Image

    assert Image.open("ih.png").width == 2080


def test_ingest_host16c_flag(env):
    """CLI single-pass through the packed-codec ingest: byte-identical
    PNG to --ingest host16 (the codec's whole contract)."""
    assert inner_main(["-q", "test_11025hz.wav", "--ingest", "host16", "-o", "i16.png"]) == 0
    assert inner_main(["-q", "test_11025hz.wav", "--ingest", "host16c", "-o", "i16c.png"]) == 0
    a = Path("i16.png").read_bytes()
    b = Path("i16c.png").read_bytes()
    assert a == b


def test_invalid_args(env, capsys):
    assert inner_main(["-q", "test_11025hz.wav", "-c", "bogus"]) == 0
    assert "Invalid contrast" in capsys.readouterr().out
    assert inner_main(["-q", "test_11025hz.wav", "-R", "bogus"]) == 0
    assert "Invalid rotate" in capsys.readouterr().out
    assert inner_main(["-q", "test_11025hz.wav", "-m", "bogus"]) == 0
    assert "Invalid map" in capsys.readouterr().out
    assert inner_main(["-q", "test_11025hz.wav", "-s", "noaa_7"]) == 0
    assert "Invalid provided satellite" in capsys.readouterr().out


def test_gui_mode_unavailable(env):
    from noaa_apt_tpu.err import FeatureNotAvailableError

    with pytest.raises(FeatureNotAvailableError):
        inner_main([])


def test_raw_roundtrip_process_many(env):
    # Decode once with --raw-out, then re-process the .npy with a
    # different contrast without re-decoding (GUI workflow, headless).
    assert inner_main(["-q", "test_11025hz.wav", "--raw-out", "raw.npy", "-o", "a.png"]) == 0
    assert Path("raw.npy").exists()
    assert inner_main(["-q", "raw.npy", "-c", "histogram", "-o", "b.png"]) == 0
    from PIL import Image

    assert Image.open("b.png").width == 2080


def test_wav_formats_decode(env):
    # 32-bit float and 8-bit PCM WAVs decode too.
    sig, _ = synth_recording(n_rows=16, sample_rate=11025)
    wav.write_wav(env / "f32.wav", sig, wav.WavSpec(1, 11025, 32, "float"))
    assert inner_main(["-q", "f32.wav", "-o", "f32.png"]) == 0


def test_filename_inference_prefills_orbit(env, caplog):
    # A recognized filename infers time + satellite; decode must succeed
    # with -R auto without explicit -t/-s.
    sig, _ = synth_recording(n_rows=16, sample_rate=11025)
    wav.write_wav(env / "gqrx_20200126_013320_137100000.wav", sig, wav.WavSpec(1, 11025, 16, "int"))
    rc = inner_main(
        ["-q", "gqrx_20200126_013320_137100000.wav", "--tle", "test_tle.txt",
         "-R", "auto", "-o", "auto.png"]
    )
    assert rc == 0


def test_profile_trace_flag(env):
    """--profile-trace records an XPlane trace of the run."""
    assert inner_main(
        ["-q", "test_11025hz.wav", "-o", "t.png", "--profile-trace", "trace_out"]
    ) == 0
    assert Path("t.png").exists()
    traces = list(Path("trace_out").rglob("*.xplane.pb")) + list(
        Path("trace_out").rglob("*.trace.json*")
    )
    assert traces, "no profiler trace files written"


def test_cli_telemetry_contrast_fused(env):
    """-c telemetry goes through the fused path (decode + wedge
    calibration with the image device-resident) and matches the
    explicit decode()+process() result."""
    from PIL import Image

    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder
    from noaa_apt_tpu.graph.process import process
    from noaa_apt_tpu.types import Contrast, Rotate

    sig, _ = synth_recording(n_rows=208, sample_rate=11025, noise_db=20.0)
    wav.write_wav("tel.wav", sig, wav.WavSpec(1, 11025, 16, "int"))
    assert inner_main(["-q", "tel.wav", "-c", "telemetry", "-o", "tel.png"]) == 0

    signal, rate = wav.load_device_ready("tel.wav")
    dec = Decoder(STANDARD)
    res = dec.decode(signal, rate)
    want = process(res, Contrast.telemetry(), Rotate.NO, decoder=dec)
    got = np.asarray(Image.open("tel.png"))
    np.testing.assert_array_equal(got, want)


def test_fleet_png_flag(env):
    """--fleet-png rgba restores 4-channel fleet outputs."""
    from PIL import Image

    d = env / "passes"
    d.mkdir()
    sig, _ = synth_recording(n_rows=16, sample_rate=11025)
    wav.write_wav(d / "p0.wav", sig, wav.WavSpec(1, 11025, 16, "int"))
    assert inner_main(["-q", str(d), "--ingest", "device", "-o", "fo_auto"]) == 0
    assert inner_main(["-q", str(d), "--ingest", "device", "--fleet-png", "rgba", "-o", "fo_rgba"]) == 0
    a = np.asarray(Image.open(Path("fo_auto") / "p0.png"))
    r = np.asarray(Image.open(Path("fo_rgba") / "p0.png"))
    assert a.ndim == 2 and r.ndim == 3 and r.shape[2] == 4
    np.testing.assert_array_equal(a, r[..., 0])


class _ChunkedPipe:
    """A binary stream that returns at most ``chunk`` bytes per read —
    a pipe/SDR-like source that never hands over the whole recording."""

    def __init__(self, data: bytes, chunk: int = 777):
        self._data, self._i, self._chunk = data, 0, chunk

    def read(self, n: int) -> bytes:
        n = min(n, self._chunk)
        b = self._data[self._i : self._i + n]
        self._i += len(b)
        return b


def test_stream_wav_stdin_matches_offline(env, monkeypatch):
    """--stream with a WAV byte stream on stdin (delivered in 777-byte
    chunks) produces the byte-identical PNG and raw signal of the
    offline (non-fused) decode of the same file."""
    import sys
    from types import SimpleNamespace

    assert inner_main(
        ["-q", "test_11025hz.wav", "--raw-out", "off.npy", "-o", "offline.png"]
    ) == 0

    data = Path("test_11025hz.wav").read_bytes()
    monkeypatch.setattr(sys, "stdin", SimpleNamespace(buffer=_ChunkedPipe(data)))
    assert inner_main(
        ["-q", "-", "--stream", "--raw-out", "st.npy", "-o", "stream.png"]
    ) == 0

    np.testing.assert_array_equal(np.load("st.npy"), np.load("off.npy"))
    assert Path("stream.png").read_bytes() == Path("offline.png").read_bytes()


def test_stream_raw_pcm_file(env):
    """--stream over a headerless s16 raw PCM file (--stream-rate) gives
    the same image as the WAV stream of the same samples; --stream-update
    exercises the live preview rewrite without changing the final PNG."""
    samples, _spec = wav.load_wav("test_11025hz.wav", raw_int16=True)
    Path("raw.pcm").write_bytes(samples.astype("<i2").tobytes())

    assert inner_main(
        ["-q", "raw.pcm", "--stream", "--stream-rate", "11025", "-o", "s_raw.png"]
    ) == 0
    assert inner_main(
        ["-q", "raw.pcm", "--stream", "--stream-rate", "11025",
         "--stream-update", "4", "-o", "s_upd.png"]
    ) == 0
    assert inner_main(
        ["-q", "test_11025hz.wav", "--raw-out", "off2.npy", "-o", "offline2.png"]
    ) == 0

    assert Path("s_raw.png").read_bytes() == Path("offline2.png").read_bytes()
    assert Path("s_upd.png").read_bytes() == Path("offline2.png").read_bytes()


def test_stream_rejects_unsupported_flags(env, capsys):
    assert inner_main(["-q", "test_11025hz.wav", "--stream", "--wav-steps"]) == 1
    assert "--wav-steps" in capsys.readouterr().out
    assert inner_main(
        ["-q", "test_11025hz.wav", "--stream", "--distributed", "2"]
    ) == 1


def test_stream_raw_pcm_needs_rate(env):
    """A raw PCM stream without --stream-rate is an InvalidInput error
    (exit 1 through the single CLI exit point)."""
    import pytest as _pytest

    from noaa_apt_tpu import err

    Path("raw2.pcm").write_bytes(b"\x00\x01" * 100)
    with _pytest.raises(err.AptError):
        inner_main(["-q", "raw2.pcm", "--stream"])


def test_stream_wav_trailing_metadata_chunk(env, monkeypatch):
    """Trailing LIST/INFO metadata after the data chunk must not be
    decoded as audio: the stream honors the declared data size, so the
    PNG equals the offline decode (which also excludes it)."""
    import struct
    import sys
    from types import SimpleNamespace

    data = bytearray(Path("test_11025hz.wav").read_bytes())
    meta = b"LIST" + struct.pack("<I", 12) + b"INFOIART" + struct.pack("<I", 0)
    (sz,) = struct.unpack_from("<I", data, 4)
    struct.pack_into("<I", data, 4, sz + len(meta))
    tagged = bytes(data) + meta
    Path("tagged.wav").write_bytes(tagged)

    assert inner_main(
        ["-q", "tagged.wav", "--raw-out", "off_t.npy", "-o", "offline_t.png"]
    ) == 0
    monkeypatch.setattr(sys, "stdin", SimpleNamespace(buffer=_ChunkedPipe(tagged)))
    assert inner_main(
        ["-q", "-", "--stream", "--raw-out", "st_t.npy", "-o", "stream_t.png"]
    ) == 0
    np.testing.assert_array_equal(np.load("st_t.npy"), np.load("off_t.npy"))
    assert Path("stream_t.png").read_bytes() == Path("offline_t.png").read_bytes()


def test_stream_wav_placeholder_data_size(env, monkeypatch):
    """A live-source placeholder data size (0xFFFFFFFF) means read to
    end of stream — the pipe case where the writer can't know the
    final size."""
    import struct
    import sys
    from types import SimpleNamespace

    data = bytearray(Path("test_11025hz.wav").read_bytes())
    # write_wav puts the data header at offset 36.
    assert data[36:40] == b"data"
    struct.pack_into("<I", data, 40, 0xFFFFFFFF)
    monkeypatch.setattr(
        sys, "stdin", SimpleNamespace(buffer=_ChunkedPipe(bytes(data)))
    )
    assert inner_main(
        ["-q", "-", "--stream", "--raw-out", "st_p.npy", "-o", "stream_p.png"]
    ) == 0
    assert inner_main(
        ["-q", "test_11025hz.wav", "--raw-out", "off_p.npy", "-o", "offline_p.png"]
    ) == 0
    np.testing.assert_array_equal(np.load("st_p.npy"), np.load("off_p.npy"))


def test_distributed_fused_cli_matches_single(env):
    """--distributed N with the default device ingest now routes
    through the sequence-sharded fused render; the PNG must be
    byte-identical to the single-chip decode."""
    from PIL import Image

    assert inner_main(["-q", "test_11025hz.wav", "-o", "single.png"]) == 0
    assert inner_main(
        ["-q", "test_11025hz.wav", "--distributed", "4", "-o", "dist.png"]
    ) == 0
    a = np.asarray(Image.open("single.png"))
    b = np.asarray(Image.open("dist.png"))
    np.testing.assert_array_equal(a, b)


def test_distributed_unfused_paths_still_work(env):
    """--distributed combined with flags that bypass the fused path
    (raw-out, host ingest) still decodes via ShardedDecoder.decode."""
    assert inner_main(
        ["-q", "test_11025hz.wav", "--distributed", "2", "--raw-out", "d.npy",
         "-o", "dist2.png"]
    ) == 0
    assert Path("d.npy").exists()


def test_version_does_not_touch_the_accelerator(env):
    """--version must not warm the accelerator (a device claim
    through the tunnel backend can take minutes and can disturb
    another process's session); the backend warms only for
    decode/resample modes.  Asserted on our warmup module rather than
    jax itself: this machine's site config imports jax in every
    interpreter."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; from noaa_apt_tpu.cli import inner_main;"
         "rc = inner_main(['-v']);"
         "assert 'noaa_apt_tpu.io.jaxcache' not in sys.modules, "
         "'accelerator warmup ran for --version';"
         "sys.exit(rc)"],
        capture_output=True, text=True, timeout=120,
        env={
            **os.environ,
            "XDG_CONFIG_HOME": str(env / "cfg"),
            "PYTHONPATH": str(Path(__file__).resolve().parent.parent)
            + os.pathsep
            + os.environ.get("PYTHONPATH", ""),
        },
    )
    assert r.returncode == 0, r.stderr


def test_manpage_tracks_parser():
    """The shipped manpage (docs/noaa-apt-tpu.1, packaged to
    share/man/man1) is generated from build_parser; regenerating must
    reproduce the checked-in file (modulo the dated .TH header), and
    every CLI option must appear in it — the parser and the manpage
    cannot drift apart (reference deliverable: debian/ manpage)."""
    import importlib.util

    from noaa_apt_tpu.cli import build_parser

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "gen_manpage", root / "tools" / "gen_manpage.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    parser = build_parser()
    want = mod.generate(parser).splitlines()
    have = (root / "docs" / "noaa-apt-tpu.1").read_text().splitlines()
    assert want[1:] == have[1:], (
        "manpage drift: regenerate with `python tools/gen_manpage.py`"
    )
    text = "\n".join(have)
    for a in parser._actions:
        for opt in a.option_strings:
            assert opt.replace("-", "\\-") in text, f"option {opt} missing from manpage"


def test_bench_normalized_metric_math():
    """The 35 MB/s-normalized figure (the cross-round comparison number
    in the bench JSON) is well-behaved: wire time is swapped
    byte-for-byte, non-wire time never goes negative (a fully
    wire-overlapped run projects to its byte floor at the reference
    link), and degenerate link accounting returns None."""
    import importlib.util

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location("benchmod", root / "bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    # A run that moved 140 MB in a 20 MB/s window: wall 8 s of which
    # 7 s wire.  At 35 MB/s the same bytes take 4 s -> norm wall 5 s.
    lk = {"up_wall_s": 6.0, "down_wall_s": 1.0, "uploaded_MB": 120.0, "fetched_MB": 20.0}
    x = m.x_at_ref_link(4800.0, 8.0, lk)
    assert abs(x - 4800.0 / 5.0) < 1e-9

    # Collapsed link where concurrent up/down wire walls EXCEED the
    # wall: the overlap must not be credited (non-wire clamps to 0).
    lk2 = {"up_wall_s": 9.0, "down_wall_s": 4.0, "uploaded_MB": 120.0, "fetched_MB": 20.0}
    x2 = m.x_at_ref_link(4800.0, 11.5, lk2)
    assert abs(x2 - 4800.0 / 4.0) < 1e-9

    # Faster-than-reference window normalizes DOWN, not up.
    lk3 = {"up_wall_s": 1.0, "down_wall_s": 0.5, "uploaded_MB": 120.0, "fetched_MB": 20.0}
    x3 = m.x_at_ref_link(4800.0, 2.5, lk3)
    assert x3 < 4800.0 / 2.5

    # No bytes accounted -> no projection.
    assert m.x_at_ref_link(4800.0, 5.0, {}) is None
