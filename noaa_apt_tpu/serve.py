"""Production fleet decoding: pipelined many-pass throughput.

The reference decodes one WAV per process invocation.  This module is
the serving path for fleets of recordings (BASELINE config 5): a
3-stage pipeline where the host data loader (WAV parse + optional
native C++ ingest resample), the accelerator graphs, and the host
post/encode stage run concurrently on different passes, so the
host<->device link and the host CPU stay busy while the TPU computes.

The device stages reuse one :class:`~noaa_apt_tpu.graph.decode.Decoder`
(compiled graphs are shared across same-bucket recordings), and results
are written as PNGs mirroring the CLI's output.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterable, Optional

import numpy as np

from . import err
from .io import link as link_io
from .io.png import write_gray_png
from .core.profiles import DecodeProfile, STANDARD
from .graph.decode import (
    Decoder,
    PackedWorkPayload,
    PendingRender,
    PendingRenderTelemetry,
    pad_bucket,
)
from .graph.process import finish_image, process
from .io import wav
from .types import Contrast, ContrastKind, Rotate

log = logging.getLogger(__name__)


@dataclass
class PassResult:
    input_path: Path
    output_path: Optional[Path]
    n_rows: int = 0
    seconds: float = 0.0
    error: Optional[str] = None
    # Per-stage wall seconds (stages overlap across passes, so their
    # sum exceeds fleet wall time on purpose).
    load_s: float = 0.0
    ingest_s: float = 0.0
    device_s: float = 0.0
    fetch_s: float = 0.0  # blocked in .get() waiting for device result
    encode_s: float = 0.0


@dataclass
class FleetReport:
    results: list[PassResult] = field(default_factory=list)
    wall_seconds: float = 0.0
    # jit graph variants built during the run: a heterogeneous fleet
    # triggering one compile per (length-bucket, rate) shows up here.
    compile_variants: int = 0
    # Link-gate accounting for this run (measured chunk rates + bytes
    # moved) — the bench reads this for per-mode link attribution.
    link: dict = field(default_factory=dict)

    @property
    def ok(self) -> list[PassResult]:
        return [r for r in self.results if r.error is None]

    @property
    def failed(self) -> list[PassResult]:
        return [r for r in self.results if r.error is not None]

    @property
    def decoded_seconds(self) -> float:
        # APT is 2 lines per second.
        return sum(r.n_rows for r in self.ok) / 2.0

    @property
    def realtime_factor(self) -> float:
        return self.decoded_seconds / self.wall_seconds if self.wall_seconds else 0.0

    def stage_totals(self) -> dict:
        """Summed per-stage seconds across passes (pipeline stages run
        concurrently, so totals can exceed wall time; the max stage is
        the pipeline's bottleneck)."""
        out = {"load": 0.0, "ingest": 0.0, "device": 0.0, "fetch": 0.0, "encode": 0.0}
        for r in self.results:
            out["load"] += r.load_s
            out["ingest"] += r.ingest_s
            out["device"] += r.device_s
            out["fetch"] += r.fetch_s
            out["encode"] += r.encode_s
        return {k: round(v, 3) for k, v in out.items()}


def decode_fleet(
    inputs: Iterable,
    out_dir,
    profile: DecodeProfile = STANDARD,
    contrast: Contrast = None,
    rotate: Rotate = Rotate.NO,
    color=None,
    orbit=None,
    orbit_for=None,
    sync: bool = True,
    ingest: str = "host",
    loaders: int | None = None,
    encoders: int | None = None,
    png_compress_level: int = 1,
    gray_png: str = "auto",
    fleet_batch: int = 8,
) -> FleetReport:
    """Decode many WAVs to PNGs with a load/compute/encode pipeline.

    ``loaders`` host threads parse WAVs, run the native C++ ingest
    resample (``ingest="host"``; ``"host16"`` additionally quantizes the
    work signal to i16+scale, halving upload bytes at ~90 dB SNR;
    ``"host8"`` quantizes to i8+scale — a quarter of the f32 bytes at
    ~42 dB SNR, the lossy mode for upload-bandwidth-starved links, see
    ``Decoder.prepare_work``) and
    pre-upload the padded buffer to the device, all overlapped with the
    device stage working on earlier passes; ``encoders`` threads run
    post-processing (contrast fetch, overlay drawing, PNG encode) so a
    map-overlay fleet doesn't serialize behind one encoder.  Thread
    counts default to the host's core count (serving hosts can be
    small; oversubscription was measured slower than serial).  Device
    work stays on one thread (a single Decoder's jit cache), so graphs
    compile once per length bucket.  Failures are isolated per pass.

    ``png_compress_level``: zlib level for output PNGs (1 = fast; the
    default 6 of PIL costs ~5x the encode CPU for ~25% smaller files).

    ``gray_png``: "auto" writes single-channel (mode L) PNGs when the
    output carries no color information anyway — no false color, no
    map overlay, no rotation, non-histogram contrast.  Pixel values
    are identical to the RGBA encoding's R=G=B channels at a quarter
    of the encode CPU and file size (encode is a top-2 host cost on
    small serving hosts).  "never" keeps RGBA files byte-compatible
    with the single-pass CLI output.

    ``orbit_for``: optional callable ``Path -> OrbitSettings | None``
    evaluated per recording (each pass has its own reference time and
    satellite); overrides the static ``orbit``.

    ``fleet_batch``: group up to this many consecutive same-bucket
    work payloads into one batched device dispatch + one grouped fetch
    (``Decoder.decode_render_batch``, batched Pallas sync selector).
    1 disables grouping (per-pass dispatches).
    """
    import os

    from PIL import Image  # fail fast, not inside the encoder thread

    from .io.jaxcache import enable_persistent_compile_cache, warm_link_async

    enable_persistent_compile_cache()
    warm_link_async()

    if gray_png not in ("auto", "never"):
        raise err.InvalidInputError(f"gray_png must be 'auto' or 'never', got {gray_png!r}")
    ncores = os.cpu_count() or 2
    if loaders is None:
        # Loaders spend roughly half their time blocked on the
        # host->device upload (network, GIL released), so the right
        # count EXCEEDS the core count: while one loader waits on the
        # link, another runs the native ingest.  One loader on a
        # 2-core serving host was measured as the whole fleet's
        # bottleneck stage (~0.9 s/pass serialized); cores+1 loaders
        # with 2 encoders measured best there (3.7 s vs 4.35 s for an
        # 8x10-minute fleet).
        loaders = max(2, min(4, ncores + 1))
    loaders = max(1, loaders)  # 0 loader threads would deadlock loaded.get()
    if encoders is None:
        encoders = max(1, min(2, ncores))
    contrast = contrast or Contrast.from_percent(0.98)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = [Path(p) for p in inputs]
    # Output names: the input stem, disambiguated when two inputs from
    # different directories share one (else the later encode silently
    # clobbers the earlier PNG and both passes report ok).
    seen: dict[str, int] = {}
    out_names: list[str] = []
    for p in paths:
        k = seen.get(p.stem, 0)
        seen[p.stem] = k + 1
        out_names.append(p.stem if k == 0 else f"{p.stem}_{k}")
    # Fused low-round-trip render (Decoder.decode_render) applies to
    # every contrast mode; levels follow process()'s rules
    # (noaa_apt.rs:144-176).  Telemetry keeps the image resident while
    # the wedge math runs on host between two small fetches
    # (PendingRenderTelemetry).
    fused_levels = None
    if sync and contrast.kind == ContrastKind.PERCENT:
        fused_levels = ("percent", contrast.percent)
    elif sync and contrast.kind == ContrastKind.MINMAX:
        fused_levels = ("minmax", 0.98)
    elif sync and contrast.kind == ContrastKind.HISTOGRAM:
        fused_levels = ("percent", 0.98) if color is not None else ("minmax", 0.98)
    elif sync and contrast.kind == ContrastKind.TELEMETRY:
        fused_levels = ("telemetry", 0.98)

    if ingest == "host16c" and fused_levels is None:
        # The packed codec only has fused-graph decode paths; the
        # unfused pipeline (sync=False etc.) takes the byte-identical
        # plain host16 route.
        ingest = "host16"
    dec = Decoder(profile, ingest=ingest)

    # Mode-L output applies whenever the image carries no color
    # information, fused path or not (per-pass orbit checked at encode).
    gray_ok = (
        gray_png == "auto"
        and color is None
        and rotate == Rotate.NO
        and contrast.kind != ContrastKind.HISTOGRAM
    )

    loaded: "queue.Queue" = queue.Queue(maxsize=max(2, loaders))
    to_encode: "queue.Queue" = queue.Queue(maxsize=4)
    report = FleetReport()
    link_io.begin_epoch()  # per-run link accounting (opening rate)
    t_start = time.time()

    path_iter = iter(enumerate(paths))
    iter_lock = threading.Lock()

    def loader():
        while True:
            with iter_lock:
                try:
                    i, p = next(path_iter)
                except StopIteration:
                    return
            try:
                t0 = time.time()
                signal, rate = wav.load_device_ready(p)
                t1 = time.time()
                # Ingest + device upload run here, overlapped with the
                # device stage working on earlier passes.
                if ingest in ("host", "host16", "host8", "host16c"):
                    work = dec.prepare_work(signal, rate, to_device=True)
                elif fused_levels is not None:
                    # Device ingest: pre-upload the raw recording; the
                    # whole pipeline (input resample included) runs in
                    # the fused device graph.  The gated upload
                    # serializes + chunks the transfer so result
                    # fetches never queue behind a whole recording
                    # (round 4's 29 s fetch stalls, VERDICT item 3).
                    n_pad = pad_bucket(len(signal))
                    buf = np.zeros(n_pad, dtype=signal.dtype)
                    buf[: len(signal)] = signal
                    work = ("raw", link_io.upload(buf), len(signal))
                else:
                    work = None
                t2 = time.time()
                loaded.put((i, p, signal, rate, work, None, t1 - t0, t2 - t1))
            except Exception as e:  # noqa: BLE001 - per-pass isolation
                loaded.put((i, p, None, None, None, str(e), 0.0, 0.0))

    def write_img(res_item, img, out_name, t0):
        """Write a pass's final image + record encode bookkeeping
        (shared by every encoder path)."""
        out = out_dir / (out_name + ".png")
        if img.ndim == 2:
            # Mode-L: the raw-scanline writer skips PIL's
            # per-row filter heuristics — ~2x less encode CPU
            # for ~20% larger files, the right trade on a
            # serving host where encode is a top-2 stage.
            write_gray_png(out, img, level=png_compress_level)
        else:
            Image.fromarray(img).save(out, compress_level=png_compress_level)
        res_item.output_path = out
        res_item.encode_s = time.time() - t0
        res_item.seconds += res_item.fetch_s + res_item.encode_s

    def encode_gray(res_item, p, out_name, gray):
        """Post-fetch encode of one pass's u8 rows (shared by the
        per-pass and grouped-dispatch paths)."""
        t0 = time.time()
        orb = orbit_for(p) if orbit_for is not None else orbit
        res_item.n_rows = gray.shape[0]
        if gray_ok and orb is None:
            img = gray  # mode-L PNG: same pixels, 1/4 the bytes
        else:
            img = finish_image(gray, contrast.kind, rotate, color, orb)
        write_img(res_item, img, out_name, t0)

    def encoder():
        while True:
            item = to_encode.get()
            if item is None:
                return
            if item[0] == "group":
                # Grouped dispatch: ONE fetch serves the whole batch;
                # per-element guard failures are error entries.
                _, metas, pending_batch = item
                t0 = time.time()
                try:
                    results = pending_batch.get()
                except Exception as e:  # noqa: BLE001 — whole-group failure
                    for res_item, _p, _n in metas:
                        res_item.error = str(e)
                    continue
                fetch_each = (time.time() - t0) / max(1, len(metas))
                for (res_item, p, out_name), r in zip(metas, results):
                    res_item.fetch_s = fetch_each
                    try:
                        if isinstance(r, Exception):
                            res_item.error = str(r)
                            continue
                        gray, _sync_pos = r
                        encode_gray(res_item, p, out_name, gray)
                    except Exception as e:  # noqa: BLE001
                        res_item.error = str(e)
                continue
            res_item, p, out_name, raw = item
            t0 = time.time()
            try:
                if isinstance(raw, (PendingRender, PendingRenderTelemetry)):
                    # Fused path: the device thread only dispatched;
                    # fetch here so its round trip overlaps the device
                    # thread's next dispatch.
                    gray, _sync_pos = raw.get()
                    res_item.fetch_s = time.time() - t0
                    encode_gray(res_item, p, out_name, gray)
                else:
                    orb = orbit_for(p) if orbit_for is not None else orbit
                    img = process(raw, contrast, rotate, color, orb, decoder=dec)
                    if gray_ok and orb is None and img.ndim == 3:
                        # Same mode-L rule on the unfused path (e.g.
                        # sync=False): channels are replicated gray.
                        img = np.ascontiguousarray(img[..., 0])
                    write_img(res_item, img, out_name, t0)
            except Exception as e:  # noqa: BLE001
                res_item.error = str(e)

    loader_threads = [threading.Thread(target=loader, daemon=True) for _ in range(loaders)]
    for t in loader_threads:
        t.start()
    enc_threads = [threading.Thread(target=encoder, daemon=True) for _ in range(max(1, encoders))]
    for t in enc_threads:
        t.start()

    results_by_idx: dict[int, PassResult] = {}
    # Grouped dispatch: consecutive same-(bucket, quantization) work
    # payloads batch into ONE device dispatch (batched Pallas sync
    # selector, 23 ms/pass at B=8) and ONE grouped fetch — per-pass
    # dispatches each paid ~0.2 s of tunnel RPC on the dev link.
    # Raw device-ingest recordings are NOT grouped (see the key check
    # below): the input-domain vmapped polyphase shifts ulps with the
    # batch size, which would break byte-equality with the single-pass
    # CLI output.
    group: list = []  # [(res_item, path, out_name, WorkPayload)]
    group_key = None
    group_t0 = 0.0  # arrival time of the group's oldest member
    # Age bound on holding a partial group: a grouped dispatch saves
    # ~0.2 s of contended RPC per pass, so holding a pass longer than
    # ~1 s hoping for batchmates is always a net loss.  Under link
    # collapse arrivals spread out and this bound is what shrinks the
    # effective group size (VERDICT r4 item 7) — degradation stays
    # proportional to bandwidth instead of compounding.
    GROUP_MAX_AGE_S = 1.0

    def flush_group():
        nonlocal group, group_key
        if not group:
            return
        t0 = time.time()
        try:
            # Even a 1-element group goes through the padded BATCHED
            # graph: with flush-on-idle the group sizes vary run to
            # run, and a lone pass hitting the (otherwise-uncompiled)
            # unbatched variant mid-fleet costs a multi-second remote
            # compile; padding to fleet_batch keeps exactly one jit
            # variant per (bucket, contrast) at ~23 ms/slot of waste.
            pend_b = dec.decode_render_batch(
                [g[3] for g in group], *fused_levels, fetch=False,
                pad_to=fleet_batch,
            )
            each = (time.time() - t0) / len(group)
            for g in group:
                g[0].device_s = each
                g[0].seconds = each
            to_encode.put(("group", [(g[0], g[1], g[2]) for g in group], pend_b))
        except Exception as e:  # noqa: BLE001 - group-level isolation
            for g in group:
                g[0].error = str(e)
            log.warning("grouped decode dispatch failed: %s", e)
        group, group_key = [], None

    try:
        pending = len(paths)
        while pending:
            # Flush-on-idle: with at least half a batch in hand and no
            # freshly loaded pass, dispatch instead of waiting for a
            # full group — the batched graph is padded to
            # ``fleet_batch`` either way (no recompile), batched
            # compute costs ~23 ms/pass, and dispatching early lets
            # device compute and result fetches overlap the remaining
            # uploads.  Waiting for a full batch serialized the fleet
            # into upload-everything -> one dispatch -> one fetch; but
            # flushing every straggler is wrong too — on a tunnel link
            # each dispatch's round trip queues behind in-flight upload
            # bytes (~0.5-1 s when saturated), so tiny groups pay more
            # in contended RPCs than they gain in overlap.
            if group:
                try:
                    item = loaded.get(timeout=0.05)
                except queue.Empty:
                    if (
                        len(group) * 2 >= fleet_batch
                        or time.time() - group_t0 > GROUP_MAX_AGE_S
                    ):
                        flush_group()
                    continue
            else:
                item = loaded.get()
            i, p, signal, rate, work, load_err, load_s, ingest_s = item
            pending -= 1
            res_item = PassResult(input_path=p, output_path=None)
            res_item.load_s = load_s
            res_item.ingest_s = ingest_s
            results_by_idx[i] = res_item
            if load_err is not None:
                res_item.error = load_err
                continue
            # Grouping applies to WORK payloads only: the work-domain
            # batched graph is byte-equal to the unbatched one at any
            # padded size, but the input-domain graph's vmapped
            # polyphase (conv/gather modes included) shifts ulps with
            # the batch size, so raw device-ingest passes keep per-pass
            # dispatches (upload-bound anyway).
            if (
                fused_levels is not None
                and work is not None
                and not isinstance(work, tuple)
                and fleet_batch > 1
            ):
                # dtype in the key: host8's quality gate can hand back
                # i16 payloads mid-fleet; they must not share a batched
                # graph with i8 batchmates.  Packed (host16c) payloads
                # group by their own (block, word) buckets.
                if isinstance(work, PackedWorkPayload):
                    key = ("packed", work.nb, work.w_lo, work.n_esc_pad)
                else:
                    key = (
                        pad_bucket(work.work_true),
                        work.inv_scale is not None,
                        str(work.data.dtype),
                    )
                if group and key != group_key:
                    flush_group()
                if not group:
                    group_t0 = time.time()
                group.append((res_item, p, out_names[i], work))
                group_key = key
                if len(group) >= fleet_batch or pending == 0:
                    flush_group()
                continue
            flush_group()
            t0 = time.time()
            try:
                if work is not None and fused_levels is not None:
                    # Dispatch only (fetch=False): XLA runs async, so
                    # the device thread moves straight to the next pass
                    # while an encoder thread fetches this one.
                    if isinstance(work, tuple):
                        deferred = dec.decode_render_input(
                            work[1], work[2], rate, *fused_levels, fetch=False
                        )
                    else:
                        deferred = dec.decode_render(work, *fused_levels, fetch=False)
                    res_item.device_s = time.time() - t0  # dispatch time
                    res_item.seconds = res_item.device_s
                    to_encode.put((res_item, p, out_names[i], deferred))
                else:
                    res = dec.decode(signal, rate, sync=sync, host_work=work)
                    res_item.n_rows = res.n_rows
                    res_item.device_s = time.time() - t0
                    res_item.seconds = res_item.device_s
                    to_encode.put((res_item, p, out_names[i], res))
            except Exception as e:  # noqa: BLE001 - per-pass isolation
                res_item.error = str(e)
                log.warning("decode failed for %s: %s", p, e)
    finally:
        flush_group()
        for _ in enc_threads:
            to_encode.put(None)
        for t in enc_threads:
            t.join()
        # If the device loop died early, blocked loaders must be
        # drained or their join deadlocks on the full queue.
        while any(t.is_alive() for t in loader_threads):
            try:
                loaded.get_nowait()
            except queue.Empty:
                time.sleep(0.01)
        for t in loader_threads:
            t.join()

    # An encoder death (should not happen: failures are caught per item)
    # must not report passes as ok with no output.
    for r in results_by_idx.values():
        if r.error is None and r.output_path is None:
            r.error = "encoder did not produce output"

    report.results = [results_by_idx[i] for i in sorted(results_by_idx)]
    report.wall_seconds = time.time() - t_start
    report.compile_variants = len(dec.compile_log)
    report.link = link_io.link_stats()
    log.info(
        "fleet: %d ok, %d failed, %.1f s wall, %.0fx realtime, %d graph variants",
        len(report.ok), len(report.failed), report.wall_seconds,
        report.realtime_factor, report.compile_variants,
    )
    return report
