"""Lossless work-signal codec: roundtrip bit-exactness on host and on
the device graph, across signal regimes and width edge cases
(VERDICT r4 item 1: "codec round-trip bit-exactness tested")."""

import numpy as np
import pytest

from noaa_apt_tpu.ops import pack as pk


def _roundtrip_np(x: np.ndarray, rate: int = 12480) -> np.ndarray:
    p = pk.pack_work_i16(x, rate)
    return pk.unpack_work_np(p), p


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
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_roundtrip_host(name):
    x = CASES[name]
    got, p = _roundtrip_np(x)
    np.testing.assert_array_equal(got, x)
    assert p.widths.max() <= pk.MAX_WIDTH


@pytest.mark.parametrize("name", ["am_carrier", "noise_full_scale", "ragged_tail"])
def test_roundtrip_device_graph(name):
    """The jit decoder reproduces the encoder input bit-for-bit."""
    import jax
    import jax.numpy as jnp

    x = CASES[name]
    p = pk.pack_work_i16(x, 12480)
    nb = p.widths.shape[0]

    fn = jax.jit(
        lambda wo, wi, an: pk.unpack_work_device(wo, wi, an, p.coeff, nb)
    )
    out = np.asarray(fn(jnp.asarray(p.words), jnp.asarray(p.widths), jnp.asarray(p.anchors)))
    np.testing.assert_array_equal(out[: p.n_samples], x)
    # Host reference decoder agrees too (oracle cross-check).
    np.testing.assert_array_equal(pk.unpack_work_np(p), x)


def test_compresses_real_work_signal():
    """On an APT-shaped signal the packed form must be smaller than raw
    i16 (the whole point); on full-scale white noise it may expand
    slightly (widths ~17) but stays bounded."""
    t = np.arange(200_000)
    env = 9000 + 8000 * np.sin(2 * np.pi * 4.0 * t / len(t))
    noise = np.random.default_rng(1).normal(0, 700, len(t))
    x = np.clip(
        env * np.sin(2 * np.pi * 2400 / 12480 * t) + noise, -32768, 32767
    ).astype(np.int16)
    p = pk.pack_work_i16(x, 12480)
    assert p.nbytes < 0.86 * x.nbytes, (p.nbytes, x.nbytes)

    xn = np.random.default_rng(2).integers(-32768, 32768, 100_000).astype(np.int16)
    pn = pk.pack_work_i16(xn, 12480)
    assert pn.nbytes < 1.25 * xn.nbytes


def test_predictor_coeff_profiles():
    # C = round(2*cos(2*pi*2400/work_rate) * 2^14) per profile rate.
    assert pk.predictor_coeff(12480) == 11620
    for rate in (12480, 16640, 20800):
        c = pk.predictor_coeff(rate)
        assert abs(c / (1 << 14) - 2 * np.cos(2 * np.pi * 2400 / rate)) < 1e-4


def test_corrupt_stream_no_crash():
    """Garbage words/widths produce garbage samples, never a crash —
    the same contract as feeding a corrupt WAV."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    nb = 8
    words = rng.integers(0, 2**32, 64, dtype=np.uint32)
    widths = rng.integers(0, 25, nb).astype(np.uint8)  # some beyond MAX_WIDTH
    anchors = rng.integers(-32768, 32768, (nb, 2)).astype(np.int16)
    out = np.asarray(
        jax.jit(lambda a, b, c: pk.unpack_work_device(a, b, c, 11620, nb))(
            jnp.asarray(words), jnp.asarray(widths), jnp.asarray(anchors)
        )
    )
    assert out.shape == (nb * pk.BLOCK,)


@pytest.mark.parametrize("name", ["am_carrier", "ragged_tail"])
def test_seal_open_roundtrip(name):
    """The sealed single-buffer form (widths+anchors+words coalesced
    into one u32 upload) opens on device to the identical streams."""
    import jax
    import jax.numpy as jnp

    x = CASES[name]
    p = pk.pack_work_i16(x, 12480)
    nb_true = p.widths.shape[0]
    nb = nb_true + 3  # exercise block padding
    nw_pad = len(p.words) + 17
    sealed = pk.seal_packed(p, nb, nw_pad)

    @jax.jit
    def opener(buf):
        return pk.open_packed_device(buf, nb)

    words, widths, anchors = jax.device_get(opener(jnp.asarray(sealed)))
    np.testing.assert_array_equal(words[: len(p.words)], p.words)
    np.testing.assert_array_equal(widths[:nb_true], p.widths)
    np.testing.assert_array_equal(anchors[:nb_true], p.anchors)
    assert (widths[nb_true:] == 0).all() and (anchors[nb_true:] == 0).all()

    # And the full decode from the sealed form is bit-exact.
    @jax.jit
    def decode(buf):
        wo, wi, an = pk.open_packed_device(buf, nb)
        return pk.unpack_work_device(wo, wi, an, p.coeff, nb)

    out = np.asarray(decode(jnp.asarray(sealed)))
    np.testing.assert_array_equal(out[: p.n_samples], x)


def _wav_fleet(tmp_path, n=3, n_rows=40, noise_db=18.0):
    from noaa_apt_tpu.io import wav
    from noaa_apt_tpu.io.wav import WavSpec
    from noaa_apt_tpu.synth import synth_recording

    paths = []
    for i in range(n):
        sig, _ = synth_recording(
            n_rows=n_rows, sample_rate=11025, noise_db=noise_db, seed=i
        )
        sig16 = np.clip(
            np.round(sig / np.abs(sig).max() * 32767), -32768, 32767
        ).astype(np.int16)
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
    from noaa_apt_tpu.graph.decode import Decoder, PackedWorkPayload
    from noaa_apt_tpu.synth import synth_recording

    sig, _ = synth_recording(n_rows=48, sample_rate=11025, noise_db=16.0, seed=5)
    sig16 = np.clip(
        np.round(sig / np.abs(sig).max() * 32767), -32768, 32767
    ).astype(np.int16)
    rate = Rate(11025)
    dec16 = Decoder(STANDARD, ingest="host16")
    decc = Decoder(STANDARD, ingest="host16c")
    w16 = dec16.prepare_work(sig16, rate, to_device=True)
    wc = decc.prepare_work(sig16, rate, to_device=True)
    assert isinstance(wc, PackedWorkPayload), "codec should engage on APT signals"
    assert wc.inv_scale == w16.inv_scale
    upload_ratio = wc.buf.nbytes / np.asarray(w16.data).nbytes
    assert upload_ratio < 0.95, f"no byte win: {upload_ratio:.3f}"
    for kind in ("percent", "minmax"):
        g16, s16 = dec16.decode_render(w16, kind, 0.98)
        gc, sc = decc.decode_render(wc, kind, 0.98)
        assert sc == s16
        np.testing.assert_array_equal(gc, g16)


def test_host16c_fleet_byte_equals_host16(tmp_path):
    """Fleet e2e: host16c PNGs byte-identical to host16 PNGs (grouped
    batched dispatch path included)."""
    from noaa_apt_tpu.serve import decode_fleet

    paths = _wav_fleet(tmp_path, n=4)
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
    encoder stage itself) makes _pack_payload decline (the >0.97x
    guard); the pass then ships as plain host16."""
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder

    rng = np.random.default_rng(0)
    noise = rng.integers(-32768, 32768, pk.BLOCK * 512).astype(np.int16)
    decc = Decoder(STANDARD, ingest="host16c")
    assert decc._pack_payload(noise, len(noise), 1.0) is None

    # Misaligned bucket (not a BLOCK multiple) also declines.
    decc2 = Decoder(STANDARD, ingest="host16c")
    assert decc2._pack_payload(np.zeros(pk.BLOCK + 1, np.int16), 10, 1.0) is None
