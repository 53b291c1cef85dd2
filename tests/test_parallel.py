"""Multi-chip decode tests: the sharded pipeline must reproduce the
single-chip pipeline exactly (SURVEY.md section 4 implication (e) —
replaces the reference's nonexistent distributed tests)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.core.profiles import STANDARD
from noaa_apt_tpu.graph.decode import Decoder
from noaa_apt_tpu.parallel import ShardedDecoder, batch_decode
from noaa_apt_tpu.synth import synth_recording


def _mesh(n, axis="seq"):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_equals_single_chip(n_dev):
    signal, _ = synth_recording(n_rows=48, sample_rate=11025, noise_db=15.0)
    rate = Rate(11025)

    single = Decoder(STANDARD).decode(signal, rate)
    sharded = ShardedDecoder(STANDARD, _mesh(n_dev)).decode(signal, rate)

    # Bit-exact sync positions (the BASELINE north-star requirement).
    assert sharded.sync_positions == single.sync_positions
    assert sharded.n_rows == single.n_rows
    a, b = single.image_np(), sharded.image_np()
    np.testing.assert_array_equal(a, b)


def test_sharded_no_sync():
    signal, _ = synth_recording(n_rows=24, sample_rate=11025)
    rate = Rate(11025)
    single = Decoder(STANDARD).decode(signal, rate, sync=False)
    sharded = ShardedDecoder(STANDARD, _mesh(4)).decode(signal, rate, sync=False)
    np.testing.assert_array_equal(single.image_np(), sharded.image_np())


def test_batch_decode_matches_loop():
    rate = Rate(11025)
    sigs = []
    for seed in range(4):
        s, _ = synth_recording(n_rows=24, sample_rate=11025, noise_db=12.0, seed=seed)
        sigs.append(s)
    batch = np.stack(sigs)

    dec = Decoder(STANDARD)
    singles = [dec.decode(s, rate) for s in sigs]
    mesh = _mesh(4, axis="data")
    results = batch_decode(dec, batch, rate, mesh)

    for s, r in zip(singles, results):
        assert s.sync_positions == r.sync_positions
        np.testing.assert_array_equal(s.image_np(), r.image_np())


def test_sharded_2d_mesh_data_and_seq():
    """DP x SP: two recordings, each time-sharded over 4 devices."""
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "seq"))
    rate = Rate(11025)
    s0, _ = synth_recording(n_rows=24, sample_rate=11025, seed=1)
    s1, _ = synth_recording(n_rows=24, sample_rate=11025, seed=2)

    dec = Decoder(STANDARD)
    expected = [dec.decode(s, rate) for s in (s0, s1)]

    # Sequence-shard each recording on its row of the mesh by reusing
    # the seq axis of the 2-D mesh.
    sdec = ShardedDecoder(STANDARD, mesh, axis="seq")
    # Decode both (the data axis is exercised by batch_decode; here we
    # check seq sharding composes with a 2-D mesh).
    for s, exp in zip((s0, s1), expected):
        got = sdec.decode(s, rate)
        assert got.sync_positions == exp.sync_positions
        np.testing.assert_array_equal(got.image_np(), exp.image_np())


def test_sharded_decode_reports_progress_and_rejects_host_work():
    """VERDICT r1: ShardedDecoder silently dropped context/host_work."""
    from noaa_apt_tpu.err import InternalError
    from noaa_apt_tpu.io.context import Context

    signal, _ = synth_recording(n_rows=16, sample_rate=11025)
    mesh = Mesh(np.array(jax.devices()[:2]), ("seq",))
    dec = ShardedDecoder(STANDARD, mesh)

    seen = []
    ctx = Context.decode(ui_callback=lambda p, d: seen.append((p, d)))
    dec.decode(signal, Rate(11025), context=ctx)
    assert any("Resampling to 12480" in d for _, d in seen)
    assert any(d == "Syncing" for _, d in seen)
    assert any(d == "Resampling to 4160" for _, d in seen)

    with pytest.raises(InternalError, match="host_work"):
        dec.decode(signal, Rate(11025), host_work=np.zeros(200000, np.float32))


def test_sharded_result_device_render_matches_single():
    """The device contrast/u8 render paths (process with decoder=...)
    must accept a sharded DecodeResult and match the single-chip device
    path byte-for-byte."""
    from noaa_apt_tpu.graph.process import process
    from noaa_apt_tpu.types import Contrast, Rotate

    signal, _ = synth_recording(n_rows=24, sample_rate=11025, noise_db=15.0)
    rate = Rate(11025)
    dec = Decoder(STANDARD)
    sdec = ShardedDecoder(STANDARD, _mesh(4))
    single = dec.decode(signal, rate)
    sharded = sdec.decode(signal, rate)

    for contrast in (Contrast.from_percent(0.98), Contrast.minmax()):
        img_s = process(sharded, contrast, Rotate.NO, decoder=sdec)
        img_1 = process(single, contrast, Rotate.NO, decoder=dec)
        np.testing.assert_array_equal(img_s, img_1)


@pytest.mark.parametrize("kind", ["percent", "minmax", "telemetry"])
def test_sharded_fused_render_matches_single_chip(kind):
    """VERDICT r3 item 4: the sequence-sharded decoder gets the fused
    one-dispatch/one-fetch serving tail; its u8 rows and sync positions
    must be byte-equal to the single-chip fused render."""
    n_rows = 240 if kind == "telemetry" else 32  # telemetry needs >= 200 decoded rows
    signal, _ = synth_recording(n_rows=n_rows, sample_rate=11025, noise_db=15.0)
    rate = Rate(11025)

    dec = Decoder(STANDARD)
    u8_1, sync_1 = dec.decode_render_input(
        signal.astype(np.float32), len(signal), rate, kind
    )
    sdec = ShardedDecoder(STANDARD, _mesh(4))
    u8_s, sync_s = sdec.decode_render_input(signal, len(signal), rate, kind)

    assert sync_s == sync_1
    np.testing.assert_array_equal(u8_s, u8_1)


def test_sharded_fused_render_deferred_and_48k():
    """fetch=False returns a PendingRender; 48 kHz exercises the l>1
    packed-matmul alignment path under the mesh."""
    from noaa_apt_tpu.graph.decode import PendingRender

    signal, _ = synth_recording(n_rows=24, sample_rate=48000, noise_db=15.0)
    rate = Rate(48000)
    dec = Decoder(STANDARD)
    u8_1, sync_1 = dec.decode_render_input(
        signal.astype(np.float32), len(signal), rate, "percent"
    )
    sdec = ShardedDecoder(STANDARD, _mesh(8))
    pending = sdec.decode_render_input(signal, len(signal), rate, "percent", fetch=False)
    assert isinstance(pending, PendingRender)
    u8_s, sync_s = pending.get()
    assert sync_s == sync_1
    np.testing.assert_array_equal(u8_s, u8_1)
