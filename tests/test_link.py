"""Transfer-gate tests: chunked-upload bit-exactness, fetch priority,
and the link-collapse degradation contract (VERDICT r4 item 7).

The reference has no host<->device link; these test the serving
pipeline's behavior under the bandwidth regimes the tunnel exhibits.
"""

import threading
import time

import numpy as np
import pytest

from noaa_apt_tpu.io import link as link_io


@pytest.fixture(autouse=True)
def _reset_gate(monkeypatch):
    link_io.begin_epoch()
    monkeypatch.setattr(link_io, "_chunk_hook", None)
    yield
    link_io.begin_epoch()


@pytest.mark.parametrize("dtype", [np.int16, np.int8, np.float32])
@pytest.mark.parametrize("n", [7, 4096, 100_001])
def test_chunked_upload_bit_exact(monkeypatch, dtype, n):
    """A chunked upload reassembles to exactly the bytes of a plain
    device_put, for any length/chunk alignment."""
    import jax

    monkeypatch.setenv("NOAA_APT_LINK_CHUNK_MB", "0.01")  # 10 kB chunks
    rng = np.random.default_rng(n)
    if np.issubdtype(dtype, np.integer):
        buf = rng.integers(
            np.iinfo(dtype).min, np.iinfo(dtype).max, n, dtype=dtype
        )
    else:
        buf = rng.standard_normal(n).astype(dtype)
    dev = link_io.upload(buf)
    np.testing.assert_array_equal(np.asarray(dev), buf)
    assert np.asarray(dev).dtype == buf.dtype
    # And through a jit consumer (the decode graphs see this array).
    got = np.asarray(jax.jit(lambda x: x.astype(np.float32) * 2)(dev))
    np.testing.assert_array_equal(got, buf.astype(np.float32) * 2)


def test_upload_records_throughput(monkeypatch):
    monkeypatch.setenv("NOAA_APT_LINK_CHUNK_MB", "0.01")
    link_io.begin_epoch()
    link_io.upload(np.zeros(200_000, np.int16))
    st = link_io.link_stats()
    assert st["uploaded_MB"] == pytest.approx(0.4, abs=0.05)
    assert st["opening_up_MBps"] is not None and st["opening_up_MBps"] > 0


def test_degraded_factor_tracks_collapse(monkeypatch):
    """degraded_factor rises when chunk throughput falls below the
    epoch's opening rate."""
    monkeypatch.setenv("NOAA_APT_LINK_CHUNK_MB", "0.01")
    link_io.begin_epoch()
    delay = {"s": 0.0}
    monkeypatch.setattr(link_io, "_chunk_hook", lambda nb: time.sleep(delay["s"]))
    link_io.upload(np.zeros(100_000, np.int16))  # fast opening chunks
    base = link_io.degraded_factor()
    assert base is not None and base < 2.0
    delay["s"] = 0.05  # collapse: ~20 kB per 50 ms
    link_io.upload(np.zeros(400_000, np.int16))
    assert link_io.degraded_factor() > 2.0


def test_fetch_priority_pauses_uploads(monkeypatch):
    """While a fetch is pending, no NEW upload chunk starts."""
    import jax

    monkeypatch.setenv("NOAA_APT_LINK_CHUNK_MB", "0.01")
    chunk_times = []
    monkeypatch.setattr(
        link_io, "_chunk_hook", lambda nb: (chunk_times.append(time.time()), time.sleep(0.02))
    )
    dev = jax.device_put(np.arange(1000, dtype=np.float32))
    fetch_window = {}

    def fetcher():
        # Hold fetch priority for a visible window by fetching many
        # times back to back.
        t0 = time.time()
        for _ in range(5):
            with link_io._cond:
                link_io._fetch_waiting += 1
            time.sleep(0.03)
            with link_io._cond:
                link_io._fetch_waiting -= 1
                link_io._cond.notify_all()
        fetch_window["t"] = (t0, time.time())

    th = threading.Thread(target=fetcher)
    th.start()
    time.sleep(0.01)
    link_io.upload(np.zeros(500_000, np.int16))  # ~50 chunks
    th.join()
    t0, t1 = fetch_window["t"]
    # Chunks issued strictly inside the fetch-priority window: none
    # (the window has micro-gaps between iterations, so allow the
    # chunks that race the 1 ms boundaries).
    inside = [t for t in chunk_times if t0 + 0.005 < t < t1 - 0.005]
    # Gaps between fetcher iterations are ~1 ms; a chunk can start in a
    # gap but then the next must wait, so at most ~5 land inside.
    assert len(inside) <= 6, f"{len(inside)} upload chunks ran during fetch priority"
    # Sanity: the upload did finish and was chunked.
    assert len(chunk_times) >= 40


@pytest.mark.parametrize("ingest", ["host16"])
def test_fleet_degrades_proportionally_under_throttle(tmp_path, monkeypatch, ingest):
    """Fleet wall under a simulated link collapse grows ~proportionally
    to the bandwidth drop, not super-linearly (round 4's failure mode:
    a 2-3x bandwidth drop swung walls >2x beyond the byte math).

    The throttle injects sleep(nbytes / BW) per upload chunk — an ideal
    BW-limited link — and compares a fast link against one 3x slower.
    """
    from conftest import synth_i16

    from noaa_apt_tpu.io import wav
    from noaa_apt_tpu.io.wav import WavSpec
    from noaa_apt_tpu.serve import decode_fleet

    monkeypatch.setenv("NOAA_APT_LINK_CHUNK_MB", "0.05")
    paths = []
    for i in range(4):
        sig16, _ = synth_i16(40, 11025, noise_db=18.0, seed=i)
        p = tmp_path / f"p{i}.wav"
        wav.write_wav(p, sig16, WavSpec(1, 11025, 16, "int"))
        paths.append(p)

    bw = {"Bps": 4e6}

    def throttle(nbytes):
        time.sleep(nbytes / bw["Bps"])

    monkeypatch.setattr(link_io, "_chunk_hook", throttle)

    def run(tag):
        t0 = time.time()
        rep = decode_fleet(paths, tmp_path / tag, ingest=ingest)
        assert not rep.failed, [r.error for r in rep.failed]
        return time.time() - t0, rep

    run("warm")  # compile + caches outside the measurement
    wall_fast, rep_fast = run("fast")
    bw["Bps"] = 4e6 / 3.0
    wall_slow, rep_slow = run("slow")

    up_bytes = rep_fast.link.get("uploaded_MB", 0.0) * 1e6
    assert up_bytes > 0
    # Ideal walls: everything else pipelined behind the link.
    added = up_bytes / (4e6 / 3.0) - up_bytes / 4e6
    # The slow run may exceed the fast one by the extra serialized link
    # time plus generous slack (suite-wide CPU contention makes tight
    # wall bounds flaky) — what it must NOT do is blow up super-
    # linearly (round 4's failure mode was seconds beyond byte math).
    assert wall_slow <= wall_fast + added * 1.7 + 1.5, (
        f"super-linear degradation: fast {wall_fast:.2f}s, slow {wall_slow:.2f}s, "
        f"ideal added {added:.2f}s"
    )
    # And outputs stay identical regardless of link speed.
    for f in sorted((tmp_path / "fast").glob("*.png")):
        a = (tmp_path / "fast" / f.name).read_bytes()
        b = (tmp_path / "slow" / f.name).read_bytes()
        assert a == b, f"output {f.name} differs across link speeds"


def test_concurrent_uploads_do_not_interleave(monkeypatch):
    """The gate owns the wire for a WHOLE upload: chunks of different
    concurrent uploads must never interleave (device_put issues
    asynchronously, so releasing between chunks would put 2N chunks of
    N threads in flight and void the serialized-upload invariant the
    round-5 review caught)."""
    monkeypatch.setenv("NOAA_APT_LINK_CHUNK_MB", "0.02")
    order = []
    lock = threading.Lock()

    def hook(nbytes):
        with lock:
            order.append(threading.current_thread().name)
        time.sleep(0.002)

    monkeypatch.setattr(link_io, "_chunk_hook", hook)

    def worker(name):
        buf = np.zeros(200_000, np.int16)  # ~20 chunks at 20 kB
        link_io.upload(buf)

    threads = [
        threading.Thread(target=worker, args=(f"up{i}",), name=f"up{i}")
        for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(order) >= 30
    # Each thread's chunks must form one contiguous run in the issue
    # order (i.e. at most 3 "segments" for 3 uploads).
    segments = 1 + sum(1 for a, b in zip(order, order[1:]) if a != b)
    assert segments == 3, f"uploads interleaved: {segments} segments in {order}"
