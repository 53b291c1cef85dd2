"""Streaming decode: pushing a recording through StreamingDecoder in
arbitrary chunk sizes must reproduce the offline decoder bit-for-bit
(rows and sync positions)."""

import numpy as np
import pytest

from noaa_apt_tpu.core.frequency import Rate
from noaa_apt_tpu.core.profiles import FAST, STANDARD
from noaa_apt_tpu.graph.decode import Decoder
from noaa_apt_tpu.stream import StreamingDecoder
from noaa_apt_tpu.synth import synth_recording


def _push_in_chunks(sd, signal, rng):
    rows = []
    i = 0
    while i < len(signal):
        n = int(rng.integers(1, 40000))
        out = sd.push(signal[i : i + n])
        if out.size:
            rows.append(out)
        i += n
    tail = sd.finish()
    if tail.size:
        rows.append(tail)
    return np.concatenate(rows) if rows else np.zeros((0, 2080), np.float32)


@pytest.mark.parametrize(
    "rate_hz,profile",
    [(11025, STANDARD), (24960, STANDARD), (48000, FAST)],
)
def test_streaming_matches_offline(rate_hz, profile):
    signal, _ = synth_recording(n_rows=24, sample_rate=rate_hz, noise_db=16.0)
    rate = Rate(rate_hz)
    offline = Decoder(profile).decode(signal, rate, sync=True)

    sd = StreamingDecoder(profile, rate, sync=True)
    rows = _push_in_chunks(sd, signal, np.random.default_rng(rate_hz))

    assert sd.sync_positions == offline.sync_positions
    np.testing.assert_array_equal(rows, offline.image_np())


def test_streaming_no_sync_matches_offline():
    signal, _ = synth_recording(n_rows=16, sample_rate=11025)
    rate = Rate(11025)
    offline = Decoder(STANDARD).decode(signal, rate, sync=False)

    sd = StreamingDecoder(STANDARD, rate, sync=False)
    rows = _push_in_chunks(sd, signal, np.random.default_rng(0))

    np.testing.assert_array_equal(rows, offline.image_np())
    assert rows[0, 0] == 0.0  # NoFilter causal-path quirk


def test_streaming_one_sample_at_a_time_prefix():
    """Degenerate chunking (sample-by-sample for a prefix) stays exact;
    rows arrive incrementally, not only at finish."""
    signal, _ = synth_recording(n_rows=14, sample_rate=11025, noise_db=18.0)
    rate = Rate(11025)
    offline = Decoder(STANDARD).decode(signal, rate)

    sd = StreamingDecoder(STANDARD, rate, chunk_rows=4)
    rows = []
    for i in range(0, 3000):
        out = sd.push(signal[i : i + 1])
        if out.size:
            rows.append(out)
    out = sd.push(signal[3000:])
    if out.size:
        rows.append(out)
    mid_rows = sum(r.shape[0] for r in rows)
    tail = sd.finish()
    if tail.size:
        rows.append(tail)
    got = np.concatenate(rows)

    assert mid_rows > 0, "no rows emitted before finish()"
    assert sd.sync_positions == offline.sync_positions
    np.testing.assert_array_equal(got, offline.image_np())


def test_streaming_guards():
    from noaa_apt_tpu import err

    sd = StreamingDecoder(STANDARD, Rate(11025))
    sd.push(np.zeros(100, np.float32))
    sd.finish()
    with pytest.raises(err.AptError):
        sd.push(np.zeros(10, np.float32))
    assert sd.finish().shape[0] == 0  # idempotent
