"""Fleet serving pipeline: many WAVs -> PNGs with per-pass isolation."""

import numpy as np

from noaa_apt_tpu.io import wav
from noaa_apt_tpu.serve import decode_fleet
from noaa_apt_tpu.synth import synth_recording


def test_decode_fleet(tmp_path):
    paths = []
    for seed in range(3):
        sig, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=18.0, seed=seed)
        p = tmp_path / f"pass_{seed}.wav"
        wav.write_wav(p, sig, wav.WavSpec(1, 11025, 16, "int"))
        paths.append(p)
    # One broken input: decode must isolate the failure.
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFFxxxxWAVE")
    paths.append(bad)
    # One too-short input: AptError isolated per pass.
    short, _ = synth_recording(n_rows=4, sample_rate=11025)
    ps = tmp_path / "short.wav"
    wav.write_wav(ps, short, wav.WavSpec(1, 11025, 16, "int"))
    paths.append(ps)

    report = decode_fleet(paths, tmp_path / "out", ingest="device")
    _check_report(report)


def _check_report(report):
    assert len(report.ok) == 3
    assert len(report.failed) == 2
    for r in report.ok:
        assert r.output_path.exists()
        assert r.n_rows >= 14
        assert r.device_s > 0 and r.encode_s > 0  # stage timings recorded
    assert report.results[0].input_path.name == "pass_0.wav"
    assert report.realtime_factor > 0
    totals = report.stage_totals()
    assert totals["device"] > 0 and totals["encode"] > 0
    # Homogeneous fleet (one length bucket, one rate): the graph-variant
    # count must stay bounded, not grow per pass (stage1 + stage2 + a
    # couple of device contrast/u8 stages).
    assert 0 < report.compile_variants <= 6


def test_decode_fleet_mixed_rates(tmp_path):
    """A heterogeneous fleet (11025 Hz and 48 kHz in one directory)
    decodes every pass through the pipelined path; graph variants grow
    with the (bucket, rate) pairs, not with the pass count, and the
    count is reported for compile-cost observability."""
    paths = []
    for seed, rate in enumerate([11025, 48000, 11025, 48000]):
        sig, _ = synth_recording(n_rows=16, sample_rate=rate, noise_db=18.0, seed=seed)
        p = tmp_path / f"p{seed}_{rate}.wav"
        wav.write_wav(p, sig, wav.WavSpec(1, rate, 16, "int"))
        paths.append(p)
    report = decode_fleet(paths, tmp_path / "out", ingest="host16")
    assert len(report.ok) == 4 and not report.failed
    for r in report.ok:
        assert r.output_path.exists() and r.n_rows >= 14
    # host16 ingest absorbs the rate difference on host, so the device
    # graph is shared: variants stay bounded (often 1), never per-pass.
    assert 1 <= report.compile_variants <= 8

    # Device ingest compiles per (bucket, rate) instead — still bounded
    # by the distinct pairs, not the pass count.
    report_dev = decode_fleet(paths, tmp_path / "outdev", ingest="device")
    assert len(report_dev.ok) == 4 and not report_dev.failed
    assert 2 <= report_dev.compile_variants <= 8


def test_decode_fleet_host8_lossy_mode(tmp_path):
    """The i8-upload serving mode runs end-to-end through the fleet
    pipeline and its PNGs stay >= 40 dB PSNR vs the exact f32-upload
    outputs (the bench's headline-eligibility bar for host8)."""
    from PIL import Image

    paths = []
    for seed in range(2):
        sig, _ = synth_recording(n_rows=16, sample_rate=48000, noise_db=18.0, seed=seed)
        p = tmp_path / f"p{seed}.wav"
        wav.write_wav(p, sig, wav.WavSpec(1, 48000, 16, "int"))
        paths.append(p)
    rep_f32 = decode_fleet(paths, tmp_path / "out_f32", ingest="host")
    rep_i8 = decode_fleet(paths, tmp_path / "out_i8", ingest="host8")
    assert len(rep_i8.ok) == 2 and not rep_i8.failed
    for r32, r8 in zip(rep_f32.ok, rep_i8.ok):
        a = np.asarray(Image.open(r32.output_path)).astype(np.float64)
        b = np.asarray(Image.open(r8.output_path)).astype(np.float64)
        assert a.shape == b.shape
        mse = float(((a - b) ** 2).mean())
        psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf
        assert psnr > 40.0, f"fleet host8 PSNR {psnr:.1f} dB"


def test_cli_fleet_mode(tmp_path, monkeypatch):
    from noaa_apt_tpu.cli import inner_main

    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    d = tmp_path / "passes"
    d.mkdir()
    for seed in range(2):
        sig, _ = synth_recording(n_rows=16, sample_rate=11025, seed=seed)
        wav.write_wav(d / f"p{seed}.wav", sig, wav.WavSpec(1, 11025, 16, "int"))
    rc = inner_main(["-q", str(d), "--ingest", "device", "-o", str(tmp_path / "out")])
    assert rc == 0
    assert len(list((tmp_path / "out").glob("*.png"))) == 2

    # Empty directory: clear failure, not silent success.
    empty = tmp_path / "empty"
    empty.mkdir()
    assert inner_main(["-q", str(empty), "-o", str(tmp_path / "out2")]) == 1
    # Unsupported flags are rejected up front.
    assert inner_main(["-q", str(d), "--wav-steps", "-o", str(tmp_path / "out3")]) == 1


def test_fleet_per_file_orbit(tmp_path, monkeypatch):
    """Each pass gets its own OrbitSettings (per-file time inference)."""
    import sys

    sys.path.insert(0, "tests")
    from test_geo import TEST_TLE
    from noaa_apt_tpu.cli import inner_main

    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    d = tmp_path / "passes"
    d.mkdir()
    names = ["gqrx_20200126_013320_137100000.wav", "gqrx_20200126_023320_137100000.wav"]
    for i, name in enumerate(names):
        sig, _ = synth_recording(n_rows=16, sample_rate=11025, seed=i)
        wav.write_wav(d / name, sig, wav.WavSpec(1, 11025, 16, "int"))
    (tmp_path / "tle.txt").write_text(TEST_TLE)

    seen = []
    import noaa_apt_tpu.geo.orbit as orbit_mod

    orig = orbit_mod.south_to_north_pass

    def spy(o):
        seen.append(o.ref_time.time)
        return orig(o)

    monkeypatch.setattr(orbit_mod, "south_to_north_pass", spy)
    rc = inner_main(
        ["-q", str(d), "--ingest", "device", "-R", "auto",
         "--tle", str(tmp_path / "tle.txt"), "-o", str(tmp_path / "out")]
    )
    assert rc == 0
    assert len(set(seen)) == 2  # two distinct per-file reference times


import pytest


@pytest.mark.filterwarnings("ignore::RuntimeWarning")  # 0 Hz header on purpose
def test_fleet_isolates_unexpected_decode_errors(tmp_path):
    # A WAV with a 0 Hz sample-rate header triggers a non-AptError deep
    # in planning; the fleet must isolate it and keep going.
    sig, _ = synth_recording(n_rows=16, sample_rate=11025)
    good = tmp_path / "good.wav"
    wav.write_wav(good, sig, wav.WavSpec(1, 11025, 16, "int"))
    weird = tmp_path / "weird.wav"
    wav.write_wav(weird, sig, wav.WavSpec(1, 11025, 16, "int"))
    raw = bytearray(weird.read_bytes())
    import struct

    struct.pack_into("<I", raw, 24, 0)  # sample rate field -> 0
    weird.write_bytes(bytes(raw))

    report = decode_fleet([good, weird], tmp_path / "out", ingest="device")
    assert len(report.ok) == 1
    assert len(report.failed) == 1


def test_decode_fleet_telemetry_contrast(tmp_path):
    """Telemetry-calibrated contrast through the fused fleet path
    (image resident on device, wedge math on host): PNGs must equal the
    unfused decode()+process() telemetry result byte-exactly."""
    from PIL import Image

    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder
    from noaa_apt_tpu.graph.process import process
    from noaa_apt_tpu.types import Contrast, Rotate

    paths = []
    for seed in range(2):
        sig, _ = synth_recording(n_rows=208, sample_rate=11025, noise_db=20.0, seed=seed)
        p = tmp_path / f"pass_{seed}.wav"
        wav.write_wav(p, sig, wav.WavSpec(1, 11025, 16, "int"))
        paths.append(p)

    report = decode_fleet(
        paths, tmp_path / "out", contrast=Contrast.telemetry(), ingest="device"
    )
    assert not report.failed

    dec = Decoder(STANDARD)
    for r, p in zip(report.ok, paths):
        signal, rate = wav.load_device_ready(p)
        res = dec.decode(signal, rate)
        want = process(res, Contrast.telemetry(), Rotate.NO, decoder=dec)
        got = np.asarray(Image.open(r.output_path))
        # gray_png="auto" writes a single-channel PNG; pixels must equal
        # the RGBA path's (replicated) channels exactly.
        assert got.ndim == 2
        np.testing.assert_array_equal(got, want[..., 0])


def test_decode_fleet_gray_png_modes(tmp_path):
    """gray_png="never" keeps RGBA files identical to the CLI's output;
    "auto" (default) writes mode-L PNGs with the same pixel values —
    on the unfused path (sync=False) too, so the output format depends
    only on the documented conditions; invalid values are rejected."""
    import pytest
    from PIL import Image

    from noaa_apt_tpu.err import InvalidInputError

    sig, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=18.0)
    p = tmp_path / "pass.wav"
    wav.write_wav(p, sig, wav.WavSpec(1, 11025, 16, "int"))

    rep_gray = decode_fleet([p], tmp_path / "out_gray", ingest="device")
    rep_rgba = decode_fleet([p], tmp_path / "out_rgba", ingest="device", gray_png="never")
    assert not rep_gray.failed and not rep_rgba.failed
    g = np.asarray(Image.open(rep_gray.ok[0].output_path))
    r = np.asarray(Image.open(rep_rgba.ok[0].output_path))
    assert g.ndim == 2 and r.ndim == 3 and r.shape[2] == 4
    for c in range(3):
        np.testing.assert_array_equal(g, r[..., c])
    assert (r[..., 3] == 255).all()

    # sync=False routes through the unfused process() path; the same
    # colorless settings must still produce a mode-L file.
    rep_ns = decode_fleet([p], tmp_path / "out_ns", ingest="device", sync=False)
    assert not rep_ns.failed
    assert np.asarray(Image.open(rep_ns.ok[0].output_path)).ndim == 2

    with pytest.raises(InvalidInputError, match="gray_png"):
        decode_fleet([p], tmp_path / "out_bad", gray_png="always")


def test_decode_fleet_fused_host16_matches_device_path(tmp_path):
    """The fused single-round-trip serving path (host16 ingest +
    decode_render) must produce PNGs pixel-close to the regular decode
    path (i16 work quantization is ~90 dB SNR; u8 output differs by at
    most 1 LSB in a handful of pixels)."""
    from PIL import Image

    paths = []
    for seed in range(2):
        sig, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=18.0, seed=seed)
        p = tmp_path / f"pass_{seed}.wav"
        wav.write_wav(p, sig, wav.WavSpec(1, 11025, 16, "int"))
        paths.append(p)

    rep_fused = decode_fleet(paths, tmp_path / "out16", ingest="host16")
    rep_plain = decode_fleet(paths, tmp_path / "outdev", ingest="device")
    assert not rep_fused.failed and not rep_plain.failed
    for a, b in zip(rep_fused.ok, rep_plain.ok):
        ia = np.asarray(Image.open(a.output_path)).astype(np.int16)
        ib = np.asarray(Image.open(b.output_path)).astype(np.int16)
        assert ia.shape == ib.shape
        assert np.abs(ia - ib).max() <= 1
        assert (ia != ib).mean() < 0.01


def test_cli_fleet_report_json(tmp_path, monkeypatch):
    """CLI fleet mode writes a machine-readable fleet_report.json."""
    import json

    from noaa_apt_tpu.cli import inner_main

    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    d = tmp_path / "passes"
    d.mkdir()
    sig, _ = synth_recording(n_rows=16, sample_rate=11025)
    wav.write_wav(d / "p0.wav", sig, wav.WavSpec(1, 11025, 16, "int"))
    rc = inner_main(["-q", str(d), "--ingest", "device", "-o", str(tmp_path / "out")])
    assert rc == 0
    rep = json.loads((tmp_path / "out" / "fleet_report.json").read_text())
    assert rep["ok"] == 1 and rep["failed"] == []
    assert rep["rows"] >= 14 and rep["wall_seconds"] > 0
    assert rep["passes"][0]["output"].endswith("p0.png")
    assert set(rep["stage_seconds"]) == {"load", "ingest", "device", "fetch", "encode"}


def test_decode_fleet_duplicate_stems(tmp_path):
    """Inputs with equal stems from different directories must not
    clobber each other's PNGs."""
    sig, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=18.0, seed=1)
    paths = []
    for d in ("recA", "recB"):
        (tmp_path / d).mkdir()
        p = tmp_path / d / "pass.wav"
        wav.write_wav(p, sig, wav.WavSpec(1, 11025, 16, "int"))
        paths.append(p)
    report = decode_fleet(paths, tmp_path / "out", ingest="device")
    assert len(report.ok) == 2
    outs = {r.output_path for r in report.ok}
    assert len(outs) == 2 and all(p.exists() for p in outs)
    assert {p.name for p in outs} == {"pass.png", "pass_1.png"}


def test_decode_fleet_zero_loaders_does_not_deadlock(tmp_path):
    sig, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=18.0, seed=2)
    p = tmp_path / "one.wav"
    wav.write_wav(p, sig, wav.WavSpec(1, 11025, 16, "int"))
    report = decode_fleet([p], tmp_path / "out", ingest="device", loaders=0)
    assert len(report.ok) == 1


def test_decode_fleet_grouped_dispatch_matches_per_pass(tmp_path):
    """Grouped dispatch (fleet_batch > 1: one batched device graph +
    one grouped fetch) must produce byte-identical PNGs to per-pass
    dispatches, across mixed length buckets, a too-short member, and
    telemetry contrast."""
    from noaa_apt_tpu.types import Contrast

    paths = []
    for seed, rows in [(0, 16), (1, 16), (2, 16), (3, 24), (4, 24), (5, 4)]:
        sig, _ = synth_recording(
            n_rows=rows, sample_rate=11025, noise_db=18.0, seed=seed
        )
        p = tmp_path / f"g{seed}.wav"
        wav.write_wav(p, sig, wav.WavSpec(1, 11025, 16, "int"))
        paths.append(p)

    rep_b = decode_fleet(paths, tmp_path / "out_b", ingest="host16", fleet_batch=4)
    rep_1 = decode_fleet(paths, tmp_path / "out_1", ingest="host16", fleet_batch=1)
    assert len(rep_b.ok) == len(rep_1.ok) == 5
    assert len(rep_b.failed) == len(rep_1.failed) == 1  # the 4-row member
    for rb, r1 in zip(rep_b.ok, rep_1.ok):
        assert rb.input_path == r1.input_path
        assert rb.n_rows == r1.n_rows
        assert rb.output_path.read_bytes() == r1.output_path.read_bytes()

    rep_t = decode_fleet(
        paths[:3], tmp_path / "out_t", ingest="host16",
        contrast=Contrast.telemetry(), fleet_batch=4,
    )
    rep_t1 = decode_fleet(
        paths[:3], tmp_path / "out_t1", ingest="host16",
        contrast=Contrast.telemetry(), fleet_batch=1,
    )
    assert len(rep_t.ok) == len(rep_t1.ok)
    for rb, r1 in zip(rep_t.ok, rep_t1.ok):
        assert rb.output_path.read_bytes() == r1.output_path.read_bytes()


def test_decode_render_batch_guards():
    """decode_render_batch: bucket/quantization uniformity enforced;
    short members come back as error entries, not exceptions."""
    import jax.numpy as jnp
    import pytest as _pytest

    from noaa_apt_tpu import err
    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder

    sig, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=18.0)
    dec = Decoder(STANDARD, ingest="host")
    pl_a = dec.prepare_work(sig, Rate(11025), to_device=False)
    short = dec.prepare_work(sig[: len(sig) // 8], Rate(11025), to_device=False)

    res = dec.decode_render_batch([pl_a, short])
    assert isinstance(res[1], err.AptError)
    gray, sync_pos = res[0]
    want_gray, want_sync = dec.decode_render(pl_a)
    assert sync_pos == want_sync
    np.testing.assert_array_equal(gray, want_gray)

    import dataclasses

    sig2, _ = synth_recording(n_rows=64, sample_rate=11025, seed=1)
    pl_big = dec.prepare_work(sig2, Rate(11025), to_device=False)
    with _pytest.raises(err.AptError):
        dec.decode_render_batch([pl_a, pl_big])  # different buckets
    q = dataclasses.replace(pl_a, inv_scale=1.0)
    with _pytest.raises(err.AptError):
        dec.decode_render_batch([pl_a, q])  # mixed quantization


def test_decode_render_batch_host_payloads_pad(tmp_path):
    """Host (to_device=False) payloads of different work_true in the
    same bucket must pad to the bucket before stacking — and match the
    per-payload decode_render exactly."""
    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder

    import dataclasses

    from noaa_apt_tpu.graph.decode import pad_bucket

    sig_a, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=18.0, seed=0)
    dec = Decoder(STANDARD, ingest="host")
    pl_a = dec.prepare_work(sig_a, Rate(11025), to_device=False)
    # A shorter payload in the SAME bucket (pick the largest trim that
    # does not cross a bucket edge).
    trim = next(
        t for t in (2000, 500, 100, 1)
        if pad_bucket(pl_a.work_true - t) == pad_bucket(pl_a.work_true)
    )
    pl_b = dataclasses.replace(
        pl_a, data=pl_a.data[: pl_a.work_true - trim],
        work_true=pl_a.work_true - trim,
    )
    assert pl_a.work_true != pl_b.work_true
    assert pad_bucket(pl_a.work_true) == pad_bucket(pl_b.work_true)

    res = dec.decode_render_batch([pl_a, pl_b], pad_to=4)
    for r, pl in zip(res, [pl_a, pl_b]):
        gray, sync_pos = r
        want_gray, want_sync = dec.decode_render(pl)
        assert sync_pos == want_sync
        np.testing.assert_array_equal(gray, want_gray)
