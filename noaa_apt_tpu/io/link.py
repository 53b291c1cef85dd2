"""Host<->device transfer gate: serialized, chunked, fetch-priority.

The reference is a single-process desktop app with no device link; this
module exists because the serving pipeline's host<->accelerator link is
a shared, bandwidth-limited resource (on the bench host, a tunnel whose
throughput swings minute to minute).  Round-4 stage attribution showed
the failure mode: `jax.device_put` returns before the bytes move, so N
loader threads enqueue N full-recording uploads at once and every
result fetch then queues behind tens of MB of in-flight upload traffic
(`BENCH_r04.json`: 29 s summed fetch stalls for the raw-ingest fleet
vs 3.3 s for the byte-light mode over the same outputs).

Design (all transfers for the serving path route through here):

- **Serialized uploads**: one upload chunk on the wire at a time.  The
  link does not aggregate parallel streams, so serialization costs no
  bandwidth and makes per-pass completion times near-deterministic —
  the pipeline degrades linearly with bandwidth instead of
  super-linearly (VERDICT r4 item 7).
- **Chunked + preemptible**: buffers above the chunk size upload as
  consecutive chunks reassembled on device by a tiny jitted
  concatenate (bit-exact: chunks are raw bytes of the same array).
  A waiting fetch pauses uploaders at the next chunk boundary, so a
  ~2.5 MB image fetch waits ~one chunk (~0.2 s at tunnel rates), not
  an entire raw recording upload.
- **Blocking**: the gate blocks until each chunk is device-resident.
  Callers (loader threads) therefore report honest upload walls, and
  downstream stages observe passes in completion order.
- **Throughput accounting**: per-upload rates (pause-corrected) feed
  `link_stats()` — the bench's per-mode link attribution and
  normalized metric, and a diagnostic `degraded_factor()`.  The
  serving pipeline's own adaptation is structural (age-bounded
  dispatch groups in serve.py), not rate-triggered.

The gate is process-global: every Decoder/serve path shares one link.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from collections import deque

import numpy as np

log = logging.getLogger(__name__)

_cond = threading.Condition()
_fetch_waiting = 0
_upload_busy = False

# Chunk size: large enough that per-chunk dispatch overhead (~25 ms RPC
# on the tunnel) stays small next to the transfer time, small enough
# that a pending fetch waits a fraction of a second.  8 MB at ~35 MB/s
# is ~230 ms transfer per chunk.  Overridable for tests / other links.
_DEFAULT_CHUNK_MB = 8.0


def _chunk_bytes() -> int:
    mb = os.environ.get("NOAA_APT_LINK_CHUNK_MB")
    try:
        v = float(mb) if mb else _DEFAULT_CHUNK_MB
    except ValueError:
        v = _DEFAULT_CHUNK_MB
    return max(1, int(v * 1e6))


class _Stats:
    """Sliding-window link accounting (thread-safe via the gate lock)."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.reset()

    def reset(self) -> None:
        with self.lock:
            self.events: deque = deque(maxlen=256)  # (t_end, bytes, dt, kind)
            self.opening: list = []  # first few upload chunk rates of the epoch
            self.up_bytes = 0
            self.down_bytes = 0
            # Cumulative wire-busy walls (not windowed): the epoch's
            # effective bandwidth = bytes / wall, used by the bench to
            # normalize results to a reference link speed.
            self.up_wall = 0.0
            self.down_wall = 0.0

    def record(self, nbytes: int, dt: float, kind: str) -> None:
        with self.lock:
            self.events.append((time.time(), nbytes, dt, kind))
            if kind == "up":
                self.up_bytes += nbytes
                self.up_wall += dt
                if len(self.opening) < 4 and dt > 1e-4:
                    self.opening.append(nbytes / dt)
            else:
                self.down_bytes += nbytes
                self.down_wall += dt

    def rate_mbps(self, kind: str = "up", window_s: float = 10.0) -> float | None:
        """Recent link rate (MB/s) over the trailing window, or None."""
        now = time.time()
        with self.lock:
            tot_b = tot_t = 0.0
            for t_end, nb, dt, k in self.events:
                if k == kind and now - t_end <= window_s:
                    tot_b += nb
                    tot_t += dt
        return (tot_b / tot_t / 1e6) if tot_t > 1e-4 else None

    def opening_mbps(self) -> float | None:
        with self.lock:
            ops = sorted(self.opening)
        return ops[len(ops) // 2] / 1e6 if ops else None


_stats = _Stats()

# Test hook: a callable(nbytes) invoked once per uploaded chunk while
# the gate lock is NOT held — the throttle-injection point for the
# link-collapse degradation test (VERDICT r4 item 7).
_chunk_hook = None


def begin_epoch() -> None:
    """Reset link accounting (serving calls this per fleet run so the
    opening rate reflects this run's link state)."""
    _stats.reset()


def link_stats() -> dict:
    """Snapshot of the gate's link accounting."""
    return {
        "recent_up_MBps": _stats.rate_mbps("up"),
        "recent_down_MBps": _stats.rate_mbps("down"),
        "opening_up_MBps": _stats.opening_mbps(),
        "uploaded_MB": round(_stats.up_bytes / 1e6, 1),
        "fetched_MB": round(_stats.down_bytes / 1e6, 1),
        # Epoch-effective rates (bytes / wire-busy wall): what the link
        # actually delivered over the whole run, not a recent window.
        "eff_up_MBps": (
            round(_stats.up_bytes / _stats.up_wall / 1e6, 1)
            if _stats.up_wall > 1e-3 else None
        ),
        "eff_down_MBps": (
            round(_stats.down_bytes / _stats.down_wall / 1e6, 1)
            if _stats.down_wall > 1e-3 else None
        ),
        "up_wall_s": round(_stats.up_wall, 3),
        "down_wall_s": round(_stats.down_wall, 3),
    }


def degraded_factor() -> float | None:
    """How far the link has fallen below this epoch's opening rate
    (>=1.0; None until both rates exist).  Diagnostic/observability —
    the serving pipeline adapts structurally (age-bounded groups in
    serve.py) rather than reading this, because per-upload rates also
    absorb scheduling noise a rate trigger would misread."""
    op = _stats.opening_mbps()
    cur = _stats.rate_mbps("up")
    if not op or not cur or cur <= 0:
        return None
    return max(1.0, op / cur)


_concat_cache: dict = {}


def _concat(devs: list):
    """Reassemble chunk uploads into the original 1-D array on device.

    Concatenation of raw chunks is byte-exact by construction; the jit
    is cached per (n_chunks, chunk_len, tail_len, dtype) so a fleet of
    same-bucket passes reuses one tiny graph."""
    import jax
    import jax.numpy as jnp

    key = (len(devs), devs[0].shape[0], devs[-1].shape[0], str(devs[0].dtype))
    fn = _concat_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda *cs: jnp.concatenate(cs))
        _concat_cache[key] = fn
    return fn(*devs)


def upload(buf: np.ndarray, chunked: bool = True):
    """Upload ``buf`` (1-D, host) to the default device through the
    gate; returns the device array (bit-identical to a plain
    ``jax.device_put(buf)``).  Blocks until resident.

    The gate (``_upload_busy``) is held for the WHOLE upload — one
    recording's transfer owns the wire at a time (device_put issues
    asynchronously, so releasing between chunks would let N loader
    threads interleave 2N chunks on the wire and void the serialized-
    upload invariant).  Within the call, chunks pipeline at depth 2 so
    the wire never idles on the issue/complete round trip; a pending
    fetch pauses issuance at the next chunk boundary (fetchers do not
    take the upload gate).  Throughput accounting: gate-acquire to
    final drain, MINUS time spent paused for fetches — the recorded
    wire wall approximates actual wire occupancy, which the bench's
    normalized metric relies on."""
    import jax

    global _upload_busy
    nbytes = buf.nbytes
    cb = _chunk_bytes()
    with _cond:
        while _fetch_waiting > 0 or _upload_busy:
            _cond.wait()
        _upload_busy = True
    t_start = time.time()
    paused = 0.0
    try:
        if not chunked or buf.ndim != 1 or nbytes <= cb:
            if _chunk_hook is not None:
                _chunk_hook(nbytes)
            d = jax.device_put(buf)
            d.block_until_ready()
            _stats.record(nbytes, time.time() - t_start, "up")
            return d

        elems = max(1, cb // max(1, buf.itemsize))
        devs: list = []
        inflight: deque = deque()  # device arrays issued, not yet drained
        for start in range(0, buf.shape[0], elems):
            chunk = buf[start : start + elems]
            # Fetch priority: pause issuance (still owning the upload
            # gate — fetchers never wait on it) until fetches clear.
            with _cond:
                if _fetch_waiting > 0:
                    tp = time.time()
                    while _fetch_waiting > 0:
                        _cond.wait()
                    paused += time.time() - tp
            if _chunk_hook is not None:
                _chunk_hook(chunk.nbytes)
            d = jax.device_put(chunk)  # async issue; the wire pipelines
            inflight.append(d)
            devs.append(d)
            if len(inflight) >= 2:
                inflight.popleft().block_until_ready()
        while inflight:
            inflight.popleft().block_until_ready()
        _stats.record(nbytes, max(1e-6, time.time() - t_start - paused), "up")
        return _concat(devs)
    finally:
        with _cond:
            _upload_busy = False
            _cond.notify_all()


def fetch(tree):
    """``jax.device_get`` with fetch priority: uploaders pause at their
    next chunk boundary while any fetch is pending.  Waits for device
    COMPUTE outside the gate (compute needs no link), so only the wire
    transfer holds priority."""
    import jax

    global _fetch_waiting
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            leaf.block_until_ready()
    with _cond:
        _fetch_waiting += 1
    t0 = time.time()
    try:
        out = jax.device_get(tree)
    finally:
        with _cond:
            _fetch_waiting -= 1
            _cond.notify_all()
    nbytes = sum(
        getattr(leaf, "nbytes", 0) for leaf in jax.tree_util.tree_leaves(out)
    )
    _stats.record(nbytes, time.time() - t0, "down")
    return out
