"""Benchmark: single-pass and fleet APT decode on real hardware.

Prints ONE JSON line whose required keys are
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
with supplementary keys quantifying where the time goes:

- ``value``: aggregate realtime factor decoding a FLEET of eight
  10-minute 48 kHz passes through the pipelined serving path
  (serve.decode_fleet), best serving mode of: ``device`` (raw i16
  upload, zero host DSP), ``host``/``host16`` (native C++ ingest,
  f32 / i16-quantized upload — host16 is the production mode, ~90 dB
  SNR), ``host16c`` (host16 plus the lossless residual codec,
  ops/pack.py — byte-identical output at fewer bytes; only
  headline-eligible when its PNGs hash-match host16's in the same
  run, ``fleet_host16c_bit_exact``), and ``host8`` (i8 upload,
  ~42 dB SNR — lossy; only headline-eligible when its measured
  output PSNR vs the exact pipeline is >= 40 dB, reported as
  ``fleet_host8_psnr_db``) — BASELINE config 5's throughput scaling.
  Per-mode medians are in ``fleet_by_mode``; the cross-round
  comparison figure is ``fleet_x_at_35MBps_link`` (see
  :func:`x_at_ref_link`), and ``conformance`` gates the metric name.
- ``single_pass_host_ingest_x`` / ``single_pass_device_ingest_x``:
  end-to-end single-pass realtime factors with the input polyphase on
  the host C++ path vs fully on-device (VERDICT r1 item 4: both
  recorded).
- ``compute_only_x`` / ``lines_per_sec_per_chip``: the FULL fused
  decode graph (device polyphase ingest included) with the raw i16
  recording already resident and only a scalar checksum fetched —
  the decode engine with the host link out of the picture.  Still
  floored by one tunnel round trip (~25 ms); ``compute_pipelined_x``
  dispatches 8 back-to-back with one sync.  Both are bounded by the
  tunnel's ~25 ms per-dispatch RPC; ``compute_scan_x`` /
  ``compute_scan_ms_per_pass`` decode 8 distinct resident recordings
  inside ONE jit (lax.scan) and is the pure device time per pass —
  the per-chip engine rate on co-located hosts where dispatch costs
  microseconds.
- ``link``: measured tunnel bandwidth and the predicted minimum wall
  from bytes moved — when ``predicted_min_wall_s`` ~= the measured
  fleet wall, the host<->device link, not the engine, is the ceiling.

Baseline anchor (BASELINE.md): the reference decodes a full pass at
~13x realtime on a Raspberry Pi (fast profile); APT realtime is
2 lines/s.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
N_ROWS = 1200  # 10-minute pass at 2 lines/s
SAMPLE_RATE = 48000
FLEET_N = 8


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _bench_input() -> np.ndarray:
    cache = HERE / ".bench_input.npy"
    if cache.exists():
        log("loaded cached bench input")
        return np.load(cache)
    log(f"synthesizing {N_ROWS}-row pass at {SAMPLE_RATE} Hz...")
    from noaa_apt_tpu.synth import synth_recording

    signal, _ = synth_recording(n_rows=N_ROWS, sample_rate=SAMPLE_RATE, noise_db=15.0)
    # Quantize like a real 16-bit WAV capture; the pipeline ships i16
    # to the device and converts there (exact, half the bytes).
    signal = np.clip(
        np.round(signal / np.abs(signal).max() * 32767), -32768, 32767
    ).astype(np.int16)
    try:
        np.save(cache, signal)
    except OSError:
        pass
    return signal


def _fleet_inputs() -> list[Path]:
    """Eight 10-minute WAVs (distinct noise seeds, same length bucket)."""
    from noaa_apt_tpu.io import wav
    from noaa_apt_tpu.io.wav import WavSpec
    from noaa_apt_tpu.synth import synth_recording

    fdir = HERE / ".bench_fleet"
    fdir.mkdir(exist_ok=True)
    paths = []
    for i in range(FLEET_N):
        p = fdir / f"pass{i:02d}.wav"
        if not p.exists():
            log(f"synthesizing fleet input {i + 1}/{FLEET_N}...")
            sig, _ = synth_recording(
                n_rows=N_ROWS, sample_rate=SAMPLE_RATE, noise_db=15.0, seed=i
            )
            sig = np.clip(
                np.round(sig / np.abs(sig).max() * 32767), -32768, 32767
            ).astype(np.int16)
            wav.write_wav(p, sig, WavSpec(1, SAMPLE_RATE, 16, "int"))
        paths.append(p)
    return paths


def _median(xs) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _time_runs(fn, n_warm: int, n_run: int, label: str) -> float:
    """Median wall time over n_run trials (after n_warm warmups).

    Median, not min: the tunnel to the device varies run to run, and
    the reported figure must be one the next bench invocation
    reproduces, not the best window ever observed."""
    for w in range(n_warm):
        t0 = time.time()
        fn()
        log(f"{label} warmup {w}: {time.time() - t0:.1f}s")
    times = []
    for i in range(n_run):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
        log(f"{label} run {i}: {times[-1] * 1e3:.0f} ms")
    return _median(times)


REF_LINK_MBPS = 35.0


def x_at_ref_link(
    decoded_s: float, wall_s: float, link: dict, ref_mbps: float = REF_LINK_MBPS
) -> float | None:
    """Tunnel-mood-independent realtime factor: replace the MEASURED
    wire-busy time of a run (the transfer gate accounts every chunk)
    with the time the same bytes would take on a fixed reference link.

    Non-wire time is clamped at zero (concurrent up/down transfers
    both accrue wire wall, so (wall - wire) can go negative).  When a
    run is fully wire-overlapped (wire >= wall), the figure therefore
    equals the pure byte floor at the reference link — an idealization
    that may overstate by whatever non-wire work was hidden under the
    slow wire and would bind at the faster one.  Empirically that
    error is small here: the round-4 real ~35-40 MB/s window measured
    host16 fleet walls within ~10% of its byte floor, and the
    per-mode stage attributions (fleet_stages_by_mode) expose the
    non-wire components for the skeptical reader."""
    wire_s = (link.get("up_wall_s") or 0.0) + (link.get("down_wall_s") or 0.0)
    moved_mb = (link.get("uploaded_MB") or 0.0) + (link.get("fetched_MB") or 0.0)
    if moved_mb <= 0:
        return None
    non_wire = max(0.0, wall_s - wire_s)
    norm_wall = non_wire + moved_mb / ref_mbps
    return decoded_s / norm_wall if norm_wall > 0 else None


def _link_probe(n_bytes: int) -> tuple[float, float]:
    """Measured host->device and device->host bandwidth (MB/s) through
    the same API path the decoder uses."""
    import jax
    import jax.numpy as jnp

    buf = np.random.default_rng(0).random(n_bytes // 4, np.float32)
    up_times, down_times = [], []
    dev = None
    for _ in range(3):
        t0 = time.time()
        dev = jax.device_put(buf)
        dev.block_until_ready()
        up_times.append(time.time() - t0)
        t0 = time.time()
        _ = np.asarray(dev)
        down_times.append(time.time() - t0)
    mb = n_bytes / 1e6
    return mb / _median(up_times), mb / _median(down_times)


# Total-wall budget: in a collapsed tunnel window the full protocol
# (5-mode median-of-5 fleets + engine + conformance) measured ~50 min;
# a driver-side kill would lose the ENTIRE capture (the JSON prints
# last).  Sections therefore self-trim when the budget runs down:
# fleet trials drop 5 -> 3 past 50% budget, and the conformance sweep
# drops to one combo past 75%.  Override: NOAA_APT_BENCH_BUDGET_S.
_T_BENCH_START = time.time()


def _budget_s() -> float:
    import os

    try:
        return float(os.environ.get("NOAA_APT_BENCH_BUDGET_S", "2400"))
    except ValueError:
        return 2400.0


def _budget_frac() -> float:
    return (time.time() - _T_BENCH_START) / _budget_s()


def _run_conformance() -> dict:
    """VERDICT r4 item 2: the FMA/1-ulp bit-stability canaries run in
    the SAME process/backend as the headline measurement, so a numerics
    regression (e.g. a new XLA re-fusing the level arithmetic) can
    never ship a headline silently.  Runs the two bench-relevant
    (profile, rate) combos; any mismatch marks the headline ineligible
    (the metric name gains an _UNVERIFIED suffix)."""
    import importlib.util

    import jax

    t0 = time.time()
    spec = importlib.util.spec_from_file_location(
        "tpu_conformance", HERE / "tools" / "tpu_conformance.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # The sweep's progress lines must not pollute this script's
    # stdout (ONE JSON line contract) — route them to stderr.
    mod.log = lambda msg: log(f"[conformance] {msg}")

    from noaa_apt_tpu.core.profiles import STANDARD

    combos = [(STANDARD, 11025, 208), (STANDARD, 48000, 208)]
    if _budget_frac() > 0.75:
        log(f"conformance: budget {_budget_frac():.0%} spent, one combo only")
        combos = combos[:1]
    result = {
        "pass": True,
        "n_combos": len(combos),
        "backend": jax.default_backend(),
        "error": None,
    }
    try:
        for profile, rate_hz, n_rows in combos:
            mod.check_combo(profile, rate_hz, n_rows)
    except Exception as e:  # noqa: BLE001 — a tripped canary must not hide
        result["pass"] = False
        result["error"] = f"{type(e).__name__}: {e}"
        log(f"CONFORMANCE FAILED: {result['error']}")
    result["seconds"] = round(time.time() - t0, 1)
    log(f"conformance: pass={result['pass']} ({result['seconds']}s)")
    return result


def main():
    t_setup = time.time()
    # Persistent compilation cache: the remote TPU compile of the full
    # graph set can take minutes; cache it across bench invocations.
    import jax

    from noaa_apt_tpu.io.jaxcache import enable_persistent_compile_cache, warm_link_async

    if not enable_persistent_compile_cache(HERE / ".jax_cache"):
        log("compilation cache unavailable")
    warm_link_async()

    import jax.numpy as jnp

    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder, pad_bucket
    from noaa_apt_tpu.graph.process import process
    from noaa_apt_tpu.serve import decode_fleet
    from noaa_apt_tpu.types import Contrast, Rotate

    signal = _bench_input()
    fleet_paths = _fleet_inputs()
    duration_s = N_ROWS / 2.0
    rate = Rate(SAMPLE_RATE)
    contrast = Contrast.from_percent(0.98)
    log(f"setup {time.time() - t_setup:.1f}s")

    # -- 1. single pass, host C++ ingest (fewest bytes over the link) --
    dec = Decoder(STANDARD, ingest="host")

    def run_host():
        res = dec.decode(signal, rate, sync=True)
        return process(res, contrast, Rotate.NO, decoder=dec)

    single_host = duration_s / _time_runs(run_host, 2, 3, "single/host-ingest")

    work_len = len(signal) * STANDARD.work_rate // SAMPLE_RATE

    # -- 2. link bandwidth probe (30 MB, the host-ingest upload size).
    # BEFORE the fleet section on purpose: the headline modes run
    # first, and predicted_min_wall_s must reflect the link state THEY
    # saw — probing after the heavy-upload sections was measured to
    # understate the link 2-3x and misattribute the fleet as
    # link-bound.
    up_mbps, down_mbps = _link_probe(work_len * 4)
    log(f"link: upload {up_mbps:.1f} MB/s, fetch {down_mbps:.1f} MB/s")

    # -- 3. fleet throughput through the serving pipeline --------------
    # Four ingest modes: "device" uploads the raw i16 recording and
    # runs the whole pipeline (polyphase included) in one fused device
    # graph — zero host DSP; "host16"/"host" pre-resample on the host
    # C++ path (8x/4x fewer upload bytes than device, but cost host
    # CPU, which the active TPU tunnel throttles heavily on this
    # machine); "host8" additionally quantizes the work upload to i8
    # (~42 dB SNR) — LOSSY, so it is only headline-eligible when its
    # measured output PSNR vs the exact pipeline is >= 40 dB.
    out_dir = HERE / ".bench_fleet_out"
    report = None

    def run_fleet(mode):
        nonlocal report
        report = decode_fleet(
            fleet_paths, out_dir, profile=STANDARD, contrast=contrast,
            sync=True, ingest=mode,
        )
        if report.failed:
            raise RuntimeError(f"fleet failures: {report.failed}")

    up_bytes_by_mode = {
        "device": FLEET_N * len(signal) * 2,
        "host16": FLEET_N * work_len * 2,
        # host16c: content-dependent (lossless codec); actual bytes come
        # from the transfer gate's accounting after the run.
        "host16c": None,
        "host": FLEET_N * work_len * 4,
        "host8": FLEET_N * work_len,
    }
    fleet_by_mode, stages_by_mode, wall_by_mode, trials_by_mode = {}, {}, {}, {}
    links_by_mode, rows_by_mode = {}, {}
    total_rows = 0
    ref_imgs: dict = {}
    fleet_psnr_db = None
    # Median-of-5 (after a warmup): fleet walls vary run to run on this
    # host (tunnel state swings the same mode's wall by 2-3x minute to
    # minute); the reported figure must be one the next invocation
    # reproduces, not the best window ever caught.  Stage totals are
    # taken from the median run so the per-stage attribution stays
    # internally consistent.
    # Mode order: byte-faithful light modes first.  The tunnel's
    # throughput degrades under sustained load and recovers slowly;
    # running the 460 MB-per-trial "device" mode first was measured to
    # depress the following modes' walls by 2-3x.  "host16c" (the
    # lossless-codec mode, ~20% fewer bytes than host16) leads so the
    # byte-faithful headline candidate gets the freshest window;
    # "host" must still run before "host8" (it produces the PSNR
    # reference).
    png_hashes: dict = {}
    host16c_bit_exact = None
    for mode in ("host16c", "host16", "host", "host8", "device"):
        run_fleet(mode)  # warmup (compiles, page cache)
        walls, stages_runs, links_runs = [], [], []
        n_trials = 5 if mode != "device" else 3
        if _budget_frac() > 0.5:
            n_trials = 3  # collapsed window: keep the capture alive
            log(f"fleet/{mode}: budget {_budget_frac():.0%} spent, 3 trials")
        for i in range(n_trials):
            t0 = time.time()
            run_fleet(mode)
            walls.append(time.time() - t0)
            stages_runs.append(report.stage_totals())
            links_runs.append(dict(report.link))
            log(f"fleet/{mode} run {i}: {walls[-1] * 1e3:.0f} ms")
        med = _median(walls)
        stages_by_mode[mode] = stages_runs[walls.index(med)]
        links_by_mode[mode] = links_runs[walls.index(med)]
        fleet_by_mode[mode] = report.decoded_seconds / med
        wall_by_mode[mode] = med
        trials_by_mode[mode] = [round(w, 2) for w in walls]
        rows_by_mode[mode] = sum(r.n_rows for r in report.ok)
        # A mode with per-pass failures (e.g. a tunnel hiccup on the
        # device mode's 460 MB trials) must not deflate every mode's
        # decoded-seconds numerator below.
        total_rows = max(total_rows, rows_by_mode[mode])
        from PIL import Image

        if mode in ("host16c", "host16"):
            # The codec mode's headline eligibility is BYTE-EXACT
            # equality with host16's outputs (the in-graph codec
            # reconstructs the identical i16 work signal).
            import hashlib

            png_hashes[mode] = {
                f.name: hashlib.sha256(f.read_bytes()).hexdigest()
                for f in sorted(out_dir.glob("*.png"))
            }
            if mode == "host16" and "host16c" in png_hashes:
                host16c_bit_exact = (
                    bool(png_hashes["host16c"])
                    and png_hashes["host16c"] == png_hashes["host16"]
                )
                log(f"host16c bit-exact vs host16: {host16c_bit_exact}")
        if mode == "host":
            # Exact f32-upload outputs: the fidelity reference for the
            # lossy i8 mode below.
            ref_imgs = {
                f.name: np.asarray(Image.open(f)).astype(np.float64)
                for f in sorted(out_dir.glob("*.png"))
            }
        elif mode == "host8":
            # host8 is LOSSY (i8 work upload, ~42 dB SNR); measure its
            # output PSNR against the exact pipeline and only let it
            # claim the headline when the images are visually identical
            # (>= 40 dB, i.e. sub-LSB at u8 for most pixels).
            sq_err, n_px = 0.0, 0
            for f in sorted(out_dir.glob("*.png")):
                a = np.asarray(Image.open(f)).astype(np.float64)
                b = ref_imgs.get(f.name)
                if b is None or a.shape != b.shape:
                    continue
                sq_err += float(((a - b) ** 2).sum())
                n_px += a.size
            if n_px == 0:
                # No pixels compared (empty glob / shape mismatch /
                # missing reference run) is NOT "bit-identical": leave
                # PSNR unknown so host8 stays headline-ineligible.
                fleet_psnr_db = None
                log("fleet/host8 PSNR: no pixels compared (gate stays closed)")
            else:
                mse = sq_err / n_px
                fleet_psnr_db = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
                log(f"fleet/host8 PSNR vs exact f32 outputs: {fleet_psnr_db:.1f} dB")

    headline = {
        k: v
        for k, v in fleet_by_mode.items()
        if (k != "host8" or (fleet_psnr_db is not None and fleet_psnr_db >= 40.0))
        and (k != "host16c" or host16c_bit_exact is True)
    }
    best_mode = max(headline, key=headline.get)
    fleet_x = fleet_by_mode[best_mode]
    fleet_wall = wall_by_mode[best_mode]
    stages = stages_by_mode[best_mode]
    down_bytes = total_rows * 2080

    # Tunnel-mood-independent comparison figure (VERDICT r4 item 4):
    # see x_at_ref_link.  Rounds are comparable even when the tunnel
    # swings 10-50 MB/s.  Each mode's numerator is ITS OWN decoded
    # seconds (a mode with per-pass failures must not claim the full
    # fleet's).
    fleet_x_ref_link = {
        k: (
            round(v, 1)
            if (
                v := x_at_ref_link(
                    rows_by_mode.get(k, 0) / 2.0,
                    wall_by_mode[k],
                    links_by_mode.get(k) or {},
                )
            )
            is not None
            else None
        )
        for k in fleet_by_mode
    }

    # -- 4. single pass, fully device-resident ingest (raw i16 upload).
    # Runs AFTER the fleet section on purpose: its 57 MB-per-run
    # uploads are part of the sustained-load pattern that degrades the
    # tunnel for minutes (see the fleet mode ordering above).
    dec_dev = Decoder(STANDARD, ingest="device")

    def run_device():
        res = dec_dev.decode(signal, rate, sync=True)
        return process(res, contrast, Rotate.NO, decoder=dec_dev)

    single_device = duration_s / _time_runs(run_device, 2, 3, "single/device-ingest")

    # Upload bytes of the best mode: the gate's measured accounting when
    # available (exact for the content-dependent host16c codec),
    # otherwise the static byte model; host16c's static fallback is
    # host16's (the codec never ships more — the 0.97x guard).
    up_bytes = up_bytes_by_mode[best_mode]
    gate_mb = (links_by_mode.get(best_mode) or {}).get("uploaded_MB")
    if gate_mb:
        up_bytes = int(gate_mb * 1e6)
    if up_bytes is None:
        up_bytes = up_bytes_by_mode["host16"]
    predicted_wall = up_bytes / 1e6 / up_mbps + down_bytes / 1e6 / down_mbps

    # -- 5. compute-only: raw i16 resident on chip, scalar checksum out.
    # The FULL fused decode graph (polyphase ingest -> demod/FIR/corr ->
    # on-device greedy sync -> row gather -> percent levels -> u8), the
    # same one jit the serving path dispatches; only two scalars come
    # back over the link.
    n_pad_in = pad_bucket(len(signal))
    xin = np.zeros(n_pad_in, np.int16)
    xin[: len(signal)] = signal
    xin_dev = jax.device_put(jnp.asarray(xin))
    step_full, work_len_fn = dec_dev._get_fused_render_input(
        n_pad_in, rate, "percent", 0.98, np.int16
    )
    work_true_in = np.int32(work_len_fn(len(signal)))

    @jax.jit
    def csum(x, wt):
        u8, n_rows, peaks, k = step_full(x, wt)
        return jnp.sum(u8.astype(jnp.int32)), n_rows

    def run_resident():
        s, n = csum(xin_dev, work_true_in)
        return float(s), int(n)

    resident_wall = _time_runs(lambda: run_resident(), 2, 5, "compute-only")
    _, resident_rows = run_resident()
    compute_x = duration_s / resident_wall
    lines_per_sec = resident_rows / resident_wall

    # Same graph dispatched 8x back-to-back with one sync at the end:
    # XLA queues async, so the per-pass figure sheds the per-call
    # host<->device round trip that floors run_resident() (measured
    # ~25 ms RTT through the tunnel) and is the honest engine
    # throughput for a pipelined server.
    def run_resident_pipelined(k=8):
        outs = [csum(xin_dev, work_true_in) for _ in range(k)]
        for s, n in outs:
            float(s)
        return k

    k_pipe = 8
    pipe_wall = _time_runs(lambda: run_resident_pipelined(k_pipe), 1, 3, "compute-pipelined")
    compute_pipe_x = duration_s * k_pipe / pipe_wall
    lines_per_sec_pipe = resident_rows * k_pipe / pipe_wall

    # Pure device time: 8 DISTINCT resident recordings decoded by ONE
    # jit (lax.scan), one scalar fetched.  No per-dispatch overhead at
    # all — on this tunnel each dispatch costs ~25 ms of host RPC, which
    # floors the pipelined figure above once the engine drops below it.
    # Distinct inputs (cyclic shifts: same length/rows, shifted sync
    # positions) keep XLA from hoisting work out of the scan.
    k_scan = 8
    xs_dev = jax.device_put(
        jnp.stack([jnp.roll(jnp.asarray(xin), i * 1009) for i in range(k_scan)])
    )
    wts_dev = jnp.full((k_scan,), work_true_in, jnp.int32)

    @jax.jit
    def csum_scan(xs, wts):
        def body(c, xw):
            x, wt = xw
            u8, n_rows, peaks, k = step_full(x, wt)
            return c + jnp.sum(u8.astype(jnp.int32)) + k, None

        tot, _ = jax.lax.scan(body, jnp.int32(0), (xs, wts))
        return tot

    def run_scan():
        return float(csum_scan(xs_dev, wts_dev))

    scan_wall = _time_runs(run_scan, 1, 3, "compute-scan")
    # One host round trip rides on the whole scan; subtract nothing —
    # report the conservative figure (it amortizes to <5% at k=8).
    compute_scan_ms = scan_wall / k_scan * 1e3
    compute_scan_x = duration_s / (scan_wall / k_scan)

    # Memory-bandwidth roofline for the FIR/demod decode loop
    # (BASELINE.md's stated deliverable).  Bytes-touched model for one
    # pass of the fused graph, counting every HBM-materialized array
    # once per producer/consumer (fused elementwise stages are free):
    #   read raw i16 input                      n_pad * 2
    #   write + read work signal (f32)          2 * w * 4
    #   write filtered + write corr             2 * w * 4
    #   read corr (selector) + read f (gather)  2 * w * 4
    #   image rows: write f32 + ~3 contrast
    #   reads + u8 write                        rows * 2080 * (4*4 + 1)
    # The v5e HBM peak is 819 GB/s; roofline_frac ~ 1.0 would mean the
    # engine is memory-bound at speed-of-light, lower means dispatch/
    # latency-bound stages (the greedy selector's sequential jumps)
    # still dominate.
    w_pad_engine = pad_bucket(int(work_true_in))
    bytes_per_pass = (
        n_pad_in * 2
        + 6 * w_pad_engine * 4
        + resident_rows * 2080 * (4 * 4 + 1)
    )
    hbm_bw_achieved = bytes_per_pass / (scan_wall / k_scan)  # B/s
    V5E_HBM_PEAK = 819e9
    roofline_frac = hbm_bw_achieved / V5E_HBM_PEAK

    # -- 6. on-device input resample evidence (VERDICT r1 item 4): the
    # full device-ingest stage 1 (48 kHz polyphase matmul -> demod ->
    # FIR -> corr) with the raw i16 input already resident.
    stage1_dev, _, _ = dec_dev._get_stage1(n_pad_in, rate, True, np.int16)

    def run_stage1_resident():
        f, corr = stage1_dev(xin_dev)
        return float(jnp.sum(corr))

    stage1_ms = _time_runs(run_stage1_resident, 2, 5, "device-ingest-stage1") * 1e3

    # -- 7. numeric-parity canaries on THIS backend (headline gate) ----
    # LAST on purpose: gating the printed metric needs no temporal
    # priority, and running the ~4-minute sweep first was measured to
    # spend the freshest tunnel window on canary traffic instead of
    # the headline fleet modes (the tunnel degrades under sustained
    # load and recovers slowly).
    conformance = _run_conformance()

    baseline = 13.0  # reference: ~13x realtime (Raspberry Pi, fast profile)
    metric_name = "fleet_aggregate_realtime_factor"
    if not conformance["pass"]:
        # A tripped numeric-parity canary makes every throughput claim
        # unverified: rename the metric so no round records a headline
        # whose outputs may not match the decode contract.
        metric_name += "_UNVERIFIED"
    print(
        json.dumps(
            {
                "metric": metric_name,
                "value": round(fleet_x, 1),
                "unit": f"x_realtime_{FLEET_N}x10min_48k_fleet",
                "vs_baseline": round(fleet_x / baseline, 1),
                "conformance": conformance,
                # The headline ("value") is the LINK-BOUND end-to-end
                # serving figure: median-of-3 walls through the real
                # host->tunnel->device pipeline.  "engine" below is the
                # LINK-FREE device rate (inputs resident, lax.scan over
                # 8 recordings, one scalar out) — the number that
                # scales with chips on co-located hosts.
                "fleet_best_ingest": best_mode,
                "fleet_by_mode": {k: round(v, 1) for k, v in fleet_by_mode.items()},
                # Same walls with the gate-measured wire time replaced
                # by a fixed 35 MB/s reference link: the cross-round
                # comparison figure (the raw fleet_by_mode tracks
                # whatever the tunnel gave during capture).
                "fleet_x_at_35MBps_link": fleet_x_ref_link,
                # PSNR of the lossy i8-upload mode's PNGs vs the exact
                # f32 pipeline's; host8 is only headline-eligible when
                # this is >= 40 dB.
                "fleet_host8_psnr_db": (
                    round(float(fleet_psnr_db), 1) if fleet_psnr_db is not None else None
                ),
                # host16c (lossless codec) must produce byte-identical
                # PNGs to host16 to be headline-eligible.
                "fleet_host16c_bit_exact": host16c_bit_exact,
                "fleet_trials_s": trials_by_mode,
                "single_pass_host_ingest_x": round(single_host, 1),
                "single_pass_device_ingest_x": round(single_device, 1),
                "engine": {
                    "compute_scan_x": round(compute_scan_x, 1),
                    "compute_scan_ms_per_pass": round(compute_scan_ms, 1),
                    "compute_only_x": round(compute_x, 1),
                    "compute_pipelined_x": round(compute_pipe_x, 1),
                    "device_ingest_stage1_ms": round(stage1_ms, 1),
                    "lines_per_sec_per_chip": round(lines_per_sec, 0),
                    "lines_per_sec_per_chip_pipelined": round(lines_per_sec_pipe, 0),
                    # Achieved HBM bandwidth of the compute-scan path vs
                    # the v5e 819 GB/s peak (bytes-touched model above).
                    "hbm_bw_achieved_GBps": round(hbm_bw_achieved / 1e9, 1),
                    "roofline_frac": round(roofline_frac, 3),
                },
                "fleet_rows": total_rows,
                "stages_s": stages,
                # Same per-stage split for every mode's median run (the
                # top-level stages_s is the best mode's) — makes the
                # bottleneck visible for the byte-faithful modes even
                # when a lossy mode takes the headline.
                "fleet_stages_by_mode": stages_by_mode,
                # Transfer-gate accounting of each mode's median run:
                # bytes moved + effective wire rates actually achieved.
                "fleet_link_by_mode": links_by_mode,
                "link": {
                    "upload_MBps": round(up_mbps, 1),
                    "fetch_MBps": round(down_mbps, 1),
                    "upload_MB": round(up_bytes / 1e6, 1),
                    "fetch_MB": round(down_bytes / 1e6, 1),
                    "predicted_min_wall_s": round(predicted_wall, 2),
                    "measured_fleet_wall_s": round(fleet_wall, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
