"""Command-line interface.

Behavioral contract: reference ``src/main.rs`` + ``src/config.rs``
(flag set, defaults, mode dispatch, exit codes).  No input file opens
the GUI (``main.rs:64-71``); on a headless host that raises
``FeatureNotAvailable`` like the reference's no-gui builds.
"""

from __future__ import annotations

import argparse
import logging
import sys
from datetime import datetime
from pathlib import Path

from . import FINAL_RATE, __version__, err
from .core.frequency import Rate
from .io import config as cfg
from .io import misc, wav
from .io.context import Context
from .types import (
    SAT_IDS,
    ColorSettings,
    Contrast,
    MapSettings,
    OrbitSettings,
    RefTime,
    Rotate,
)

log = logging.getLogger("noaa_apt_tpu")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="noaa-apt-tpu",
        description="Decode NOAA APT images from WAV files (TPU-native engine).",
    )
    p.add_argument("input_filename", nargs="?", help="Input WAV file.")
    p.add_argument("-o", "--output", metavar="FILENAME", help=(
        "Set output path. When decoding images the default is './output.png', "
        "when resampling the default is './output.wav'. When the input is a "
        "directory (fleet mode) this is the output directory, './fleet_out' "
        "by default."))
    p.add_argument("-v", "--version", action="store_true", help="Show version and quit.")
    p.add_argument("-d", "--debug", action="store_true", help="Print debugging messages.")
    p.add_argument("-q", "--quiet", action="store_true", help="Don't print info messages.")
    p.add_argument("-r", "--resample", metavar="SAMPLE_RATE", type=int, help=(
        "Resample WAV file to a given sample rate, no APT image will be decoded."))
    p.add_argument("--no-sync", dest="sync", action="store_false", help=(
        "Disable syncing, useful when the sync frames are noisy."))
    p.add_argument("-c", "--contrast", metavar="METHOD", help=(
        'Contrast adjustment method: "98_percent" (default), "telemetry", '
        '"histogram" or "disable".'))
    p.add_argument("-s", "--sat", metavar="SATELLITE", help=(
        'Satellite name: "noaa_15", "noaa_18" or "noaa_19". Default: guessed '
        "from the filename, else NOAA 19."))
    p.add_argument("-m", "--map", metavar="MAP_MODE", help='Enable map overlay: "yes" or "no".')
    p.add_argument("--map-yaw", metavar="YAW", type=float, help="Map yaw correction in degrees. Default: 0.")
    p.add_argument("--map-hscale", metavar="HSCALE", type=float, help="Horizontal map scale correction. Default: 1.")
    p.add_argument("--map-vscale", metavar="VSCALE", type=float, help="Vertical map scale correction. Default: 1.")
    p.add_argument("-R", "--rotate", metavar="METHOD", help=(
        'Rotate image: "auto", "yes", "no" (default). "auto" uses orbit calculations.'))
    p.add_argument("-F", "--false-color", action="store_true", help=(
        "Attempt to produce a colored image."))
    p.add_argument("-P", "--palette", metavar="PALETTE", help=(
        "256x256 palette PNG for false color."))
    p.add_argument("-t", "--start-time", metavar="TIME", help=(
        "Recording start time, RFC 3339 format."))
    p.add_argument("-T", "--tle", metavar="FILE", help="Load TLE from path.")
    p.add_argument("-p", "--profile", metavar="PROFILE", help=(
        'DSP profile: "standard", "fast" or "slow".'))
    p.add_argument("--wav-steps", action="store_true", help=(
        "Export a WAV for every decoding step (debug)."))
    p.add_argument("--export-resample-filtered", action="store_true", help=(
        "Export the expanded+filtered resampling step (very expensive)."))
    p.add_argument("--rotate-image", action="store_true", help="Deprecated. Use --rotate instead.")
    p.add_argument("--distributed", metavar="N_CHIPS", type=int, default=0, help=(
        "TPU extension: sequence-shard the decode over N chips."))
    p.add_argument("--ingest", metavar="WHERE", choices=["device", "host", "host16", "host16c", "host8"], default="device", help=(
        "TPU extension: where the first resample runs. 'host' uses the "
        "native C++ polyphase before upload (fewer bytes over the "
        "host-accelerator link); 'host16' additionally quantizes the work "
        "signal to 16-bit (half the bytes again, ~90 dB SNR); 'host16c' "
        "adds a lossless residual codec on top (~20% fewer bytes again, "
        "decoded in-graph — output byte-identical to host16); 'host8' "
        "quantizes to 8-bit (a quarter of the f32 bytes, ~42 dB SNR — "
        "lossy but below real APT channel noise; for bandwidth-starved "
        "links); 'device' (default) keeps it in the XLA graph."))
    p.add_argument("--raw-out", metavar="FILE.npy", help=(
        "Also save the raw decoded signal (one float per pixel at 4160 Hz) "
        "as .npy; feed it back as the input to re-process without decoding "
        "(the GUI's decode-once/process-many workflow, headless)."))
    p.add_argument("--multihost", action="store_true", help=(
        "Fleet (directory) mode across hosts: initialize the multi-process "
        "JAX runtime (jax.distributed) and decode only this process's share "
        "of the recordings; launch one process per host with the standard "
        "JAX coordinator environment."))
    p.add_argument("--fleet-png", choices=["auto", "rgba"], default="auto", help=(
        "Fleet (directory) mode output format: 'auto' (default) writes "
        "single-channel grayscale PNGs when the image carries no color "
        "information (same pixels, 1/4 the encode cost and file size); "
        "'rgba' keeps 4-channel files byte-compatible with single-file "
        "mode."))
    p.add_argument("--stream", action="store_true", help=(
        "TPU extension: live decode. Read the input as a stream — a WAV "
        "byte stream or headerless raw PCM — from stdin (input '-'), a "
        "pipe, or a file, emitting image rows as they finalize and the "
        "PNG at end of stream. Rows are bit-identical to the offline "
        "decode of the same samples."))
    p.add_argument("--stream-rate", metavar="HZ", type=int, help=(
        "Sample rate of a headerless raw PCM stream (ignored for WAV "
        "streams, whose header carries it)."))
    p.add_argument("--stream-format", choices=["s16", "f32"], default="s16", help=(
        "Sample format of a headerless raw PCM stream: s16 (little-"
        "endian int16, the common SDR pipe format) or f32. Default: s16."))
    p.add_argument("--stream-update", metavar="N_ROWS", type=int, default=0, help=(
        "Rewrite the output PNG every N newly finalized rows during the "
        "stream (a live-updating preview with 98%%-percent contrast); "
        "0 writes only the final image. Default: 0."))
    p.add_argument("--profile-trace", metavar="DIR", help=(
        "TPU extension: record a JAX/XLA profiler trace of the whole run "
        "(compiles, device kernels, host gaps) into DIR, viewable in "
        "TensorBoard's profile plugin or Perfetto."))
    return p


def inner_main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    level = logging.DEBUG if args.debug else (logging.WARNING if args.quiet else logging.INFO)
    logging.basicConfig(level=level, format="%(levelname)s %(name)s: %(message)s")

    if args.profile_trace:
        # XPlane trace of the entire run — the TPU-native observability
        # analog of the reference's step-export debugging (A1): where
        # the reference dumps intermediate WAVs, an accelerator engine's
        # questions are compile counts, kernel times, and host gaps.
        import jax

        with jax.profiler.trace(str(args.profile_trace)):
            return _run(args)
    return _run(args)


def _run(args) -> int:
    de = cfg.load_de_settings()

    if args.version:
        print(f"noaa-apt-tpu image decoder version {__version__}")
        if de.get("check_updates", False):
            result = misc.check_updates(__version__)
            if result is None:
                print("Could not retrieve latest version available")
            elif result[0]:
                print(f'Version "{result[1]}" available for download!')
            else:
                print("You have the latest version available")
        return 0

    settings = cfg.build_settings(
        de, args.profile, args.wav_steps, args.export_resample_filtered
    )

    if args.input_filename is None:
        # GUI mode (main.rs:64-71): no input file opens the window.
        from . import gui

        gui.main(bool(de.get("check_updates", False)), settings)
        return 0

    # First-run UX, for the modes that actually touch the accelerator
    # (decode/resample — NOT --version or the GUI launcher, which must
    # not claim a device session they may never use; the GUI warms
    # itself in a background thread): the persistent cache makes every
    # later invocation of the same (length-bucket, rate) graph variant
    # load in seconds, and the link handshake overlaps load/compile.
    from .io.jaxcache import enable_persistent_compile_cache, warm_link_async

    enable_persistent_compile_cache()
    warm_link_async()

    if args.resample is not None:
        from .graph import resample_tool

        context = Context.resample(
            lambda p_, d_: log.info("%s", d_),
            settings.export_wav,
            settings.export_resample_filtered,
        )
        resample_tool.resample(
            context, settings, args.input_filename,
            args.output or "./output.wav", args.resample,
        )
        return 0

    # ---- decode mode -------------------------------------------------
    print(f"noaa-apt-tpu image decoder version {__version__}")

    contrast = {
        None: Contrast.from_percent(0.98),
        "98_percent": Contrast.from_percent(0.98),
        "telemetry": Contrast.telemetry(),
        "disable": Contrast.minmax(),
        "histogram": Contrast.histogram(),
    }.get(args.contrast, "invalid")
    if contrast == "invalid":
        print("Invalid contrast adjustment argument")
        return 0

    if args.rotate_image:
        rotate = Rotate.YES
    else:
        rotate = {None: Rotate.NO, "auto": Rotate.ORBIT, "yes": Rotate.YES, "no": Rotate.NO}.get(
            args.rotate, "invalid"
        )
        if rotate == "invalid":
            print("Invalid rotate argument")
            return 0

    color_settings = None
    if args.false_color:
        pf = Path(args.palette) if args.palette else Path(settings.default_palette_filename)
        if args.palette is None and not pf.exists():
            from .post.palette import ensure_default_palette

            pf = ensure_default_palette(pf)
        color_settings = ColorSettings(palette_filename=pf)

    sat_name = None
    ref_time = None
    try:
        ref_time, sat_name = misc.infer_time_sat(settings, args.input_filename)
    except err.AptError as e:
        print(f"Unable to determine satellite name and recording time from filename: {e}")

    if args.sat is not None:
        try:
            sat_name = SAT_IDS[args.sat]
        except KeyError:
            print("Invalid provided satellite name")
            return 0

    custom_tle = None
    if args.tle is not None:
        try:
            custom_tle = Path(args.tle).read_text()
        except OSError as e:
            print(f"Could not open custom TLE file: {e}")
            return 0

    if args.start_time is not None:
        try:
            t = datetime.fromisoformat(args.start_time)
            if t.tzinfo is None:
                # RFC 3339 requires an offset; the reference's
                # parse_from_rfc3339 rejects naive datetimes too.
                raise ValueError("missing UTC offset (use e.g. 2020-01-26T01:33:20+00:00)")
            ref_time = RefTime.start(t)
        except ValueError as e:
            print(f"Could not parse date and time given: {e}")
            return 0

    draw_map = None
    if args.map == "yes":
        draw_map = MapSettings(
            # `or` would silently replace an explicit 0 with the default
            yaw=args.map_yaw if args.map_yaw is not None else 0.0,
            hscale=args.map_hscale if args.map_hscale is not None else 1.0,
            vscale=args.map_vscale if args.map_vscale is not None else 1.0,
            countries_color=settings.default_countries_color,
            states_color=settings.default_states_color,
            lakes_color=settings.default_lakes_color,
        )
    elif args.map not in (None, "no"):
        print("Invalid map argument")
        return 0
    if draw_map is not None:
        # One-time states.shp acquisition overlaps the decode instead
        # of stalling it at overlay time (geo/states.py).
        from .geo.states import prefetch_states_async

        prefetch_states_async()

    orbit_settings = None
    if sat_name is not None and ref_time is not None:
        orbit_settings = OrbitSettings(
            sat_name=sat_name, custom_tle=custom_tle,
            ref_time=ref_time, draw_map=draw_map,
        )
    if sat_name is None or ref_time is None:
        if rotate == Rotate.ORBIT:
            print("Can't rotate automatically if no satellite and time is provided")
            return 0
        if draw_map is not None:
            print("Can't draw map if no satellite and time is provided")
            return 0

    if not args.sync and contrast.kind.value in ("telemetry", "histogram"):
        log.warning("Adjusting contrast without syncing, expect horrible results!")

    context = Context.decode(
        lambda p_, d_: log.info("%s", d_),
        Rate(settings.work_rate),
        Rate(FINAL_RATE),
        settings.export_wav,
        settings.export_resample_filtered,
    )

    profile = settings.profile()
    decoder_obj = None

    if args.stream:
        for flag, name in [
            (settings.export_wav, "--wav-steps"),
            (settings.export_resample_filtered, "--export-resample-filtered"),
            (args.distributed, "--distributed"),
        ]:
            if flag:
                print(f"{name} is not supported in stream mode")
                return 1
        return _stream_decode(
            args, profile, contrast, rotate, color_settings, orbit_settings, context
        )

    if Path(args.input_filename).is_dir():
        # Fleet mode: decode every WAV in the directory (serving path).
        from .serve import decode_fleet

        for flag, name in [
            (settings.export_wav, "--wav-steps"),
            (args.distributed, "--distributed"),
            (args.raw_out, "--raw-out"),
        ]:
            if flag:
                print(f"{name} is not supported in fleet (directory) mode")
                return 1
        wavs = sorted(
            p for p in Path(args.input_filename).iterdir()
            if p.suffix.lower() == ".wav"
        )
        if not wavs:
            print(f"No WAV files found in {args.input_filename}")
            return 1

        if args.multihost:
            # DCN story: recordings are independent, so hosts never
            # exchange signal data — each decodes its deterministic
            # share on its local chips (parallel/dist.py).
            import jax

            from .parallel import fleet_shard, init_distributed

            init_distributed()
            wavs = fleet_shard(wavs)
            log.info(
                "multihost fleet: process %d/%d decoding %d of the recordings",
                jax.process_index(), jax.process_count(), len(wavs),
            )
            if not wavs:
                print("No recordings assigned to this process")
                return 0

        orbit_for = None
        if draw_map is not None or rotate == Rotate.ORBIT:
            def orbit_for(p):
                # Per-recording time/satellite inference; explicit -s/-t
                # flags override, as in single-file mode.
                s_name, r_time = None, None
                try:
                    r_time, s_name = misc.infer_time_sat(settings, p)
                except err.AptError as e:
                    log.warning("No time/satellite for %s: %s", p, e)
                if args.sat is not None:
                    s_name = sat_name
                if args.start_time is not None:
                    r_time = ref_time
                if s_name is None or r_time is None:
                    return None
                return OrbitSettings(
                    sat_name=s_name, custom_tle=custom_tle,
                    ref_time=r_time, draw_map=draw_map,
                )

        report = decode_fleet(
            wavs,
            args.output or "./fleet_out",
            profile=profile,
            contrast=contrast,
            rotate=rotate,
            color=color_settings,
            orbit_for=orbit_for,
            sync=args.sync,
            ingest=args.ingest,
            gray_png="auto" if args.fleet_png == "auto" else "never",
        )
        print(
            f"fleet: {len(report.ok)} decoded, {len(report.failed)} failed, "
            f"{report.wall_seconds:.1f}s wall ({report.realtime_factor:.0f}x realtime)"
        )
        # Machine-readable run report next to the outputs (metrics/
        # observability for fleet consumers; the human line above stays).
        import json

        report_path = Path(args.output or "./fleet_out") / "fleet_report.json"
        try:
            report_path.write_text(json.dumps({
                "ok": len(report.ok),
                "failed": [
                    {"input": str(r.input_path), "error": r.error}
                    for r in report.failed
                ],
                "wall_seconds": round(report.wall_seconds, 3),
                "realtime_factor": round(report.realtime_factor, 1),
                "rows": sum(r.n_rows for r in report.ok),
                "stage_seconds": report.stage_totals(),
                "compile_variants": report.compile_variants,
                "passes": [
                    {
                        "input": str(r.input_path),
                        "output": str(r.output_path),
                        "rows": r.n_rows,
                        "load_s": round(r.load_s, 3),
                        "ingest_s": round(r.ingest_s, 3),
                        "device_s": round(r.device_s, 3),
                        "fetch_s": round(r.fetch_s, 3),
                        "encode_s": round(r.encode_s, 3),
                    }
                    for r in report.ok
                ],
            }, indent=1))
        except OSError as e:
            log.warning("could not write %s: %s", report_path, e)
        return 0 if not report.failed else 1

    if str(args.input_filename).endswith(".npy"):
        # Re-process a previously decoded raw signal (see --raw-out).
        import numpy as np

        raw = np.load(args.input_filename).astype(np.float32)
        from .graph.process import process
        from PIL import Image

        img = process(raw, contrast, rotate, color_settings, orbit_settings, context)
        out = args.output or "./output.png"
        Image.fromarray(img).save(out)
        log.info("Saved %s", out)
        return 0

    signal, rate = wav.load_device_ready(args.input_filename)

    from .types import ContrastKind

    distributed = bool(args.distributed and args.distributed > 1)
    if (
        args.sync
        and not settings.export_wav
        and not args.raw_out
        and not (distributed and args.ingest != "device")
        and contrast.kind in (
            ContrastKind.PERCENT,
            ContrastKind.MINMAX,
            ContrastKind.HISTOGRAM,
            ContrastKind.TELEMETRY,
        )
    ):
        # Fused low-round-trip path (decode through u8 levels in one
        # device graph; telemetry keeps the image resident while the
        # wedge math runs on host); colorize/overlay/rotate finish on
        # the gray rows.  With --distributed N the same fused graph
        # runs sequence-sharded over an N-chip mesh
        # (parallel/shard.py:decode_render_input, byte-equal).
        from .graph.decode import Decoder
        from .graph.process import finish_image
        from PIL import Image

        if distributed:
            import jax
            import numpy as np
            from jax.sharding import Mesh

            from .parallel import ShardedDecoder

            mesh = Mesh(np.array(jax.devices()[: args.distributed]), ("seq",))
            decoder_obj = ShardedDecoder(profile, mesh)
        else:
            decoder_obj = Decoder(profile, ingest=args.ingest)
        if contrast.kind == ContrastKind.PERCENT:
            levels = ("percent", contrast.percent)
        elif contrast.kind == ContrastKind.HISTOGRAM and color_settings is not None:
            levels = ("percent", 0.98)
        elif contrast.kind == ContrastKind.TELEMETRY:
            levels = ("telemetry", 0.98)
        else:
            levels = ("minmax", 0.98)
        context.status(0.1, f"Decoding (fused, {args.ingest} ingest)")
        if args.ingest in ("host", "host16", "host16c", "host8"):
            # host16c needs the device-resident packed form (the codec
            # decodes in-graph); the other host modes defer the upload
            # to the fused dispatch.
            payload = decoder_obj.prepare_work(
                signal, rate, to_device=(args.ingest == "host16c"),
                context=context,
            )
        else:
            payload = None
        if payload is not None:
            gray, _sync = decoder_obj.decode_render(payload, *levels)
        else:
            gray, _sync = decoder_obj.decode_render_input(signal, len(signal), rate, *levels)
        context.status(0.5, "Generating image")
        img = finish_image(
            gray, contrast.kind, rotate, color_settings, orbit_settings, context
        )
        out = args.output or "./output.png"
        Image.fromarray(img).save(out)
        log.info("Saved %s", out)
        return 0

    if settings.export_wav or settings.export_resample_filtered:
        # Step-export path runs the eager stage-by-stage pipeline.
        # export_resample_filtered alone must also route here: in the
        # reference it flips fast_resampling into its export branch,
        # which CHANGES the decimation grid (dsp.rs:265-276) even when
        # no step WAVs are written.
        from .graph.debug import decode_with_steps

        raw = decode_with_steps(context, profile, signal, rate, args.sync)
    elif args.distributed and args.distributed > 1:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        from .parallel import ShardedDecoder

        mesh = Mesh(np.array(jax.devices()[: args.distributed]), ("seq",))
        decoder_obj = ShardedDecoder(profile, mesh)
        raw = decoder_obj.decode(signal, rate, args.sync, context)
    else:
        from .graph.decode import Decoder

        decoder_obj = Decoder(profile, ingest=args.ingest)
        raw = decoder_obj.decode(signal, rate, args.sync, context)

    if args.raw_out:
        import numpy as np

        flat = raw if isinstance(raw, np.ndarray) else raw.signal()
        np.save(args.raw_out, flat)
        log.info("Saved raw decoded signal to %s", args.raw_out)

    from .graph.process import process

    img = process(
        raw, contrast, rotate, color_settings, orbit_settings, context,
        decoder=decoder_obj,
    )

    from PIL import Image

    out = args.output or "./output.png"
    Image.fromarray(img).save(out)
    log.info("Saved %s", out)
    return 0


def _stream_decode(
    args, profile, contrast, rotate, color_settings, orbit_settings, context
) -> int:
    """Live decode (``--stream``): pull PCM from stdin/pipe/file through
    :class:`~noaa_apt_tpu.stream.StreamingDecoder`, emitting rows as
    they finalize and the full-pipeline PNG at end of stream.

    The finalized rows are bit-identical to the offline decode of the
    same samples (tests/test_stream.py), so the final image equals the
    offline (non-fused) CLI path byte-for-byte.  No reference
    counterpart — decode.rs:43-162 needs the whole recording in RAM.
    """
    import time

    import numpy as np
    from PIL import Image

    from .graph.process import process
    from .io.wav import PcmStreamReader
    from .stream import StreamingDecoder

    out = args.output or "./output.png"
    if args.input_filename == "-":
        f, close = sys.stdin.buffer, False
    else:
        try:
            f, close = open(args.input_filename, "rb"), True
        except OSError as e:
            print(f"Could not open stream input: {e}")
            return 1

    rows: list = []
    t0 = time.monotonic()
    first_row_s = None
    since_update = 0
    try:
        reader = PcmStreamReader(
            f, rate=args.stream_rate, fmt="auto", raw_fmt=args.stream_format
        )
        log.info(
            "stream: %d Hz, %s samples", reader.sample_rate, reader.spec.sample_format
        )
        sd = StreamingDecoder(profile, Rate(reader.sample_rate), sync=args.sync)
        while True:
            chunk = reader.read(reader.sample_rate)  # ~1 s of audio per pull
            done = chunk is None
            new = sd.finish() if done else sd.push(chunk)
            if new.shape[0]:
                if first_row_s is None:
                    first_row_s = time.monotonic() - t0
                    log.info("stream: first row after %.2f s", first_row_s)
                rows.append(new)
                since_update += new.shape[0]
                context.status(
                    0.1, f"Streaming: {sd.n_rows} rows ({sd.n_rows / 2:.0f} s of pass)"
                )
            if args.stream_update and since_update >= args.stream_update and rows:
                _write_stream_preview(rows, out)
                since_update = 0
            if done:
                break
    finally:
        if close:
            f.close()

    if not rows:
        print("Stream ended before any image rows were decoded")
        return 1
    raw = np.concatenate(rows).reshape(-1)
    if args.raw_out:
        np.save(args.raw_out, raw)
        log.info("Saved raw decoded signal to %s", args.raw_out)
    img = process(raw, contrast, rotate, color_settings, orbit_settings, context)
    Image.fromarray(img).save(out)
    n_rows = raw.size // (img.shape[1])
    log.info(
        "Saved %s (%d rows; first row at %.2f s, stream done in %.2f s)",
        out, n_rows, first_row_s or 0.0, time.monotonic() - t0,
    )
    return 0


def _write_stream_preview(rows, out) -> None:
    """Rewrite ``out`` with a 98%-stretch grayscale of the rows so far
    (``--stream-update``): a cheap live preview; the final write goes
    through the full :func:`process` pipeline."""
    import numpy as np
    from PIL import Image

    from .post import contrast as ct

    flat = np.concatenate(rows).reshape(-1)
    low, high = ct.percent(flat, 0.98)
    u8 = ct.map_signal_u8(flat, low, high).reshape(len(flat) // rows[0].shape[1], -1)
    Image.fromarray(u8).save(out)


def main() -> None:
    try:
        code = inner_main()
    except err.AptError as e:
        log.error("%s", e)
        code = 1
    sys.exit(code)


if __name__ == "__main__":
    main()
