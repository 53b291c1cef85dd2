"""Lossless work-signal codec: roundtrip bit-exactness on host and on
the device graph, across signal regimes and width/escape edge cases
(VERDICT r4 item 1: "codec round-trip bit-exactness tested")."""

import numpy as np
import pytest

from noaa_apt_tpu.ops import pack as pk


CASES = {
    "zeros": np.zeros(1000, np.int16),
    "constant": np.full(777, -1234, np.int16),
    "carrier": (
        12000 * np.sin(2 * np.pi * 2400 / 12480 * np.arange(5000))
    ).astype(np.int16),
    "am_carrier": (
        (8000 + 7000 * np.sin(2 * np.pi * 0.001 * np.arange(5000)))
        * np.sin(2 * np.pi * 2400 / 12480 * np.arange(5000))
    ).astype(np.int16),
    "noise_full_scale": np.random.default_rng(0).integers(
        -32768, 32768, 4096
    ).astype(np.int16),
    "alternating_extremes": np.tile(
        np.array([32767, -32768], np.int16), 500
    ),
    "single_sample": np.array([123], np.int16),
    "two_samples": np.array([-32768, 32767], np.int16),
    "block_boundary": np.arange(pk.BLOCK * 3, dtype=np.int16),
    "ragged_tail": np.arange(pk.BLOCK * 2 + 17, dtype=np.int16),
    "mixed_quiet_spikes": np.concatenate([
        (300 * np.sin(2 * np.pi * 2400 / 12480 * np.arange(3000))).astype(np.int16),
        np.random.default_rng(7).integers(-32768, 32768, 256).astype(np.int16),
        np.zeros(500, np.int16),
    ]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_roundtrip_host(name):
    x = CASES[name]
    p = pk.pack_work_i16(x, 12480)
    got = pk.unpack_work_np(p)
    np.testing.assert_array_equal(got, x)
    assert pk.W_MIN <= p.w_lo <= pk.W_MAX


@pytest.mark.parametrize("name", ["am_carrier", "noise_full_scale", "ragged_tail",
                                  "mixed_quiet_spikes"])
def test_roundtrip_device_graph(name):
    """The jit decoder (sealed buffer in) reproduces the encoder input
    bit-for-bit, escapes included."""
    import jax
    import jax.numpy as jnp

    x = CASES[name]
    p = pk.pack_work_i16(x, 12480)
    n_esc_pad = max(4, len(p.esc_idx) + 3)  # exercise escape padding
    sealed = pk.seal_packed(p, n_esc_pad)
    assert sealed.shape[0] == pk.sealed_len(p.nb, p.w_lo, n_esc_pad)
    nb = p.nb

    fn = jax.jit(
        lambda b: pk.unpack_sealed_device(b, nb, p.w_lo, n_esc_pad, p.coeff)
    )
    out = np.asarray(fn(jnp.asarray(sealed)))
    np.testing.assert_array_equal(out[: p.n_samples], x)
    # Host reference decoder agrees too (oracle cross-check).
    np.testing.assert_array_equal(pk.unpack_work_np(p), x)


def test_unit_geometry_exact():
    """Every width's unit tiles whole words exactly (g*w == u*32)."""
    for w in range(pk.W_MIN, pk.W_MAX + 1):
        g, u, n_units, bw = pk.unit_geometry(w)
        assert g * w == u * 32
        assert n_units * g >= pk.RES_PER_BLOCK
        assert bw == n_units * u


def test_escape_blocks_ship_raw():
    """A quiet signal with one wild block: the wild block escapes, the
    rest pack narrow, and the roundtrip is exact."""
    x = (200 * np.sin(2 * np.pi * 2400 / 12480 * np.arange(pk.BLOCK * 64))).astype(np.int16)
    x[pk.BLOCK * 10 : pk.BLOCK * 11] = np.random.default_rng(1).integers(
        -32768, 32768, pk.BLOCK
    ).astype(np.int16)
    p = pk.pack_work_i16(x, 12480)
    assert p.w_lo <= 8, f"quiet signal should pack narrow, got w_lo={p.w_lo}"
    assert 10 in p.esc_idx.tolist()
    np.testing.assert_array_equal(pk.unpack_work_np(p), x)


def test_compresses_real_work_signal():
    """On an APT-shaped signal the packed form must be smaller than raw
    i16 (the whole point); on full-scale white noise it stays bounded
    (w_lo=16 with no escapes ~ break-even)."""
    t = np.arange(200_000)
    env = 9000 + 8000 * np.sin(2 * np.pi * 4.0 * t / len(t))
    noise = np.random.default_rng(1).normal(0, 700, len(t))
    x = np.clip(
        env * np.sin(2 * np.pi * 2400 / 12480 * t) + noise, -32768, 32767
    ).astype(np.int16)
    p = pk.pack_work_i16(x, 12480)
    assert p.nbytes < 0.90 * x.nbytes, (p.nbytes, x.nbytes)

    # Full-scale white noise is adversarial: residuals exceed i16 (the
    # predictor can overshoot), so most blocks escape at ANY width and
    # the raw pack EXPANDS (~1.3x) — still lossless; the serving layer
    # declines such passes (>0.97x guard / native -2 sentinel) instead
    # of shipping them.
    xn = np.random.default_rng(2).integers(-32768, 32768, 100_000).astype(np.int16)
    pn = pk.pack_work_i16(xn, 12480)
    assert pn.nbytes < 1.35 * xn.nbytes
    np.testing.assert_array_equal(pk.unpack_work_np(pn), xn)


def test_predictor_coeff_profiles():
    # C = round(2*cos(2*pi*2400/work_rate) * 2^14) per profile rate.
    assert pk.predictor_coeff(12480) == 11620
    for rate in (12480, 16640, 20800):
        c = pk.predictor_coeff(rate)
        assert abs(c / (1 << 14) - 2 * np.cos(2 * np.pi * 2400 / rate)) < 1e-4


def test_corrupt_stream_no_crash():
    """Garbage buffers produce garbage samples, never a crash — the
    same contract as feeding a corrupt WAV."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    nb, w_lo, n_esc_pad = 8, 13, 4
    buf = rng.integers(
        0, 2**32, pk.sealed_len(nb, w_lo, n_esc_pad), dtype=np.uint32
    )
    out = np.asarray(
        jax.jit(lambda b: pk.unpack_sealed_device(b, nb, w_lo, n_esc_pad, 11620))(
            jnp.asarray(buf)
        )
    )
    assert out.shape == (nb * pk.BLOCK,)


def test_native_encoder_matches_numpy():
    """The C++ encoder is bit-identical to the numpy reference across
    regimes (same w_lo choice, base bits, anchors, escapes)."""
    from noaa_apt_tpu.native import pack_work_i16_native

    for name in ("am_carrier", "mixed_quiet_spikes", "ragged_tail", "zeros"):
        x = CASES[name]
        pn = pack_work_i16_native(x, 12480)
        if pn is None:
            pytest.skip("native library unavailable")
        p = pk.pack_work_i16(x, 12480)
        assert pn != "incompressible"
        assert pn.w_lo == p.w_lo, name
        np.testing.assert_array_equal(pn.base, p.base, err_msg=name)
        np.testing.assert_array_equal(pn.anchors, p.anchors, err_msg=name)
        np.testing.assert_array_equal(pn.esc_idx, p.esc_idx, err_msg=name)
        np.testing.assert_array_equal(pn.esc_rows, p.esc_rows, err_msg=name)
        np.testing.assert_array_equal(pk.unpack_work_np(pn), x, err_msg=name)


def test_native_encoder_incompressible_signal():
    """Full-scale white noise makes >1/4 of blocks escape at any
    narrow width only when w_lo=16 is not chosen; the encoder either
    returns a valid w_lo=16 pack (0 escapes by construction) or the
    incompressible sentinel — never a corrupt stream."""
    from noaa_apt_tpu.native import pack_work_i16_native

    xn = np.random.default_rng(5).integers(-32768, 32768, 50_000).astype(np.int16)
    pn = pack_work_i16_native(xn, 12480)
    if pn is None:
        pytest.skip("native library unavailable")
    if pn != "incompressible":
        np.testing.assert_array_equal(pk.unpack_work_np(pn), xn)


def _wav_fleet(tmp_path, n=3, n_rows=40, noise_db=18.0):
    from conftest import synth_i16

    from noaa_apt_tpu.io import wav
    from noaa_apt_tpu.io.wav import WavSpec

    paths = []
    for i in range(n):
        sig16, _ = synth_i16(n_rows, 11025, noise_db=noise_db, seed=i)
        p = tmp_path / f"p{i}.wav"
        wav.write_wav(p, sig16, WavSpec(1, 11025, 16, "int"))
        paths.append(p)
    return paths


def test_host16c_render_byte_equals_host16(tmp_path):
    """The packed-codec serving mode's u8 output is byte-identical to
    host16's (the in-graph decoder reconstructs the exact i16 work
    signal), single-pass fused path."""
    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from conftest import synth_i16

    from noaa_apt_tpu.graph.decode import Decoder, PackedWorkPayload

    # noise_db=30: a good real-world capture; the codec packs at
    # w_lo ~12.  (At 15-16 dB the sealed ratio sits at the 0.97
    # decline threshold and prepare_work correctly ships plain i16.)
    sig16, _ = synth_i16(48, 11025, noise_db=30.0, seed=5)
    rate = Rate(11025)
    dec16 = Decoder(STANDARD, ingest="host16")
    decc = Decoder(STANDARD, ingest="host16c")
    w16 = dec16.prepare_work(sig16, rate, to_device=True)
    wc = decc.prepare_work(sig16, rate, to_device=True)
    assert isinstance(wc, PackedWorkPayload), "codec should engage on APT signals"
    assert wc.inv_scale == w16.inv_scale
    upload_ratio = wc.buf.nbytes / np.asarray(w16.data).nbytes
    assert upload_ratio < 0.92, f"no byte win: {upload_ratio:.3f}"
    for kind in ("percent", "minmax"):
        g16, s16 = dec16.decode_render(w16, kind, 0.98)
        gc, sc = decc.decode_render(wc, kind, 0.98)
        assert sc == s16
        np.testing.assert_array_equal(gc, g16)


def test_host16c_fleet_byte_equals_host16(tmp_path):
    """Fleet e2e: host16c PNGs byte-identical to host16 PNGs (grouped
    batched dispatch path included)."""
    from noaa_apt_tpu.serve import decode_fleet

    paths = _wav_fleet(tmp_path, n=4, noise_db=30.0)
    rep16 = decode_fleet(paths, tmp_path / "o16", ingest="host16")
    repc = decode_fleet(paths, tmp_path / "oc", ingest="host16c")
    assert not rep16.failed and not repc.failed
    for f in sorted((tmp_path / "o16").glob("*.png")):
        a = f.read_bytes()
        b = (tmp_path / "oc" / f.name).read_bytes()
        assert a == b, f"{f.name} differs between host16 and host16c"
    # And the codec actually cut the upload bytes.
    assert repc.link["uploaded_MB"] < 0.95 * rep16.link["uploaded_MB"]


def test_host16c_incompressible_falls_back():
    """An incompressible work signal (full-scale white noise fed to the
    packer directly — any WAV input is band-limited by the ingest FIR
    and thus partially predictable, so this can only be hit by the
    encoder stage itself) makes _pack_payload decline; the pass then
    ships as plain host16."""
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder

    rng = np.random.default_rng(0)
    noise = rng.integers(-32768, 32768, pk.BLOCK * 512).astype(np.int16)
    decc = Decoder(STANDARD, ingest="host16c")
    assert decc._pack_payload(noise, len(noise), 1.0) is None

    # Misaligned bucket (not a BLOCK multiple) also declines.
    decc2 = Decoder(STANDARD, ingest="host16c")
    assert decc2._pack_payload(np.zeros(pk.BLOCK + 1, np.int16), 10, 1.0) is None


def test_host16c_telemetry_render_byte_equals_host16():
    """Telemetry-contrast fused path (wedge math on host between two
    fetches) through the packed payload: byte-equal to host16."""
    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from conftest import synth_i16

    from noaa_apt_tpu.graph.decode import Decoder, PackedWorkPayload

    sig16, _ = synth_i16(208, 11025, noise_db=30.0, seed=2)
    rate = Rate(11025)
    dec16 = Decoder(STANDARD, ingest="host16")
    decc = Decoder(STANDARD, ingest="host16c")
    w16 = dec16.prepare_work(sig16, rate, to_device=True)
    wc = decc.prepare_work(sig16, rate, to_device=True)
    assert isinstance(wc, PackedWorkPayload)
    g16, s16 = dec16.decode_render(w16, "telemetry")
    gc, sc = decc.decode_render(wc, "telemetry")
    assert sc == s16
    np.testing.assert_array_equal(gc, g16)


def test_host16c_fleet_telemetry_grouped(tmp_path):
    """Grouped batched dispatch with telemetry contrast over packed
    payloads (PendingRenderTelemetryBatch path) — byte-equal PNGs."""
    from noaa_apt_tpu.serve import decode_fleet
    from noaa_apt_tpu.types import Contrast

    paths = _wav_fleet(tmp_path, n=3, n_rows=208, noise_db=30.0)
    tel = Contrast.telemetry()
    rep16 = decode_fleet(paths, tmp_path / "t16", ingest="host16", contrast=tel)
    repc = decode_fleet(paths, tmp_path / "tc", ingest="host16c", contrast=tel)
    assert not rep16.failed and not repc.failed
    for f in sorted((tmp_path / "t16").glob("*.png")):
        assert f.read_bytes() == (tmp_path / "tc" / f.name).read_bytes(), f.name
