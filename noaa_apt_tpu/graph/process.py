"""High-level post-processing orchestration (contrast -> image ->
false color -> equalize -> map overlay -> rotate).

Behavioral contract: reference ``src/noaa_apt.rs:132-243``
(``process()``).
"""

from __future__ import annotations

import logging

import numpy as np

from .. import PX_PER_ROW, err
from ..post import contrast as ct
from ..post import processing
from ..post.telemetry import read_telemetry
from ..types import Contrast, ContrastKind, OrbitSettings, Rotate

log = logging.getLogger(__name__)


def process(
    signal,
    contrast_adjustment: Contrast,
    rotate: Rotate,
    color=None,
    orbit: OrbitSettings | None = None,
    context=None,
    decoder=None,
) -> np.ndarray:
    """Decoded signal -> RGBA uint8 image [H, 2080, 4].

    ``signal`` may be a flat float array (reference API) or a
    :class:`~noaa_apt_tpu.graph.decode.DecodeResult`; with a
    ``decoder`` and a percent/minmax contrast, levels and the u8
    mapping run on device and only the uint8 image crosses the
    interconnect.
    """
    from .decode import DecodeResult

    result = signal if isinstance(signal, DecodeResult) else None
    kind = contrast_adjustment.kind
    gray = None

    if result is not None and decoder is not None and kind in (
        ContrastKind.PERCENT,
        ContrastKind.MINMAX,
        ContrastKind.HISTOGRAM,
    ):
        if context is not None:
            context.status(0.1, "Adjusting contrast (on device)")
            context.status(0.3, "Generating image")
        if kind == ContrastKind.HISTOGRAM:
            # Histogram equalization happens on the u8 image below; the
            # levels here are min/max, or the reference's 98% pre-stretch
            # for colorized runs (noaa_apt.rs:167-176).
            if color is not None:
                gray = decoder.render_u8(result, "percent", 0.98)
            else:
                gray = decoder.render_u8(result, "minmax")
        else:
            gray = decoder.render_u8(
                result,
                "percent" if kind == ContrastKind.PERCENT else "minmax",
                contrast_adjustment.percent,
            )
    elif result is not None and decoder is not None and kind == ContrastKind.TELEMETRY:
        if context is not None:
            context.status(0.1, "Adjusting contrast from telemetry")
        from ..post.telemetry import telemetry_from_stats

        ma, mb, var = decoder.telemetry_stats(result)
        telemetry = telemetry_from_stats(ma, mb, var, context)
        low = telemetry.get_wedge_value(9, None)
        high = telemetry.get_wedge_value(8, None)
        if context is not None:
            context.status(0.3, "Generating image")
        gray = decoder.render_u8_levels(result, low, high)

    if gray is None:
        signal = result.signal() if result is not None else np.asarray(signal, np.float32).reshape(-1)
        if kind == ContrastKind.TELEMETRY:
            if context is not None:
                context.status(0.1, "Adjusting contrast from telemetry")
            telemetry = read_telemetry(signal, context)
            low = telemetry.get_wedge_value(9, None)
            high = telemetry.get_wedge_value(8, None)
        elif kind == ContrastKind.PERCENT:
            if context is not None:
                context.status(
                    0.1, f"Adjusting contrast using {contrast_adjustment.percent * 100} percent"
                )
            low, high = ct.percent(signal, contrast_adjustment.percent)
        elif color is not None and kind == ContrastKind.HISTOGRAM:
            # For colorization with histogram equalization, do a 98%
            # contrast stretch first (noaa_apt.rs:167-176) — the minmax
            # scan below would be discarded.
            if context is not None:
                context.status(0.1, "Mapping values")
            low, high = ct.percent(signal, 0.98)
        else:  # MINMAX or grayscale HISTOGRAM
            if context is not None:
                context.status(0.1, "Mapping values")
            low, high = ct.min_max(signal)

        if context is not None:
            context.status(0.3, "Generating image")

        height = signal.shape[0] // PX_PER_ROW
        if height * PX_PER_ROW != signal.shape[0]:
            raise err.InternalError("Could not create image, wrong buffer length")

        gray = ct.map_signal_u8(signal, low, high).reshape(height, PX_PER_ROW)
    return finish_image(gray, kind, rotate, color, orbit, context)


def finish_image(
    gray: np.ndarray,
    kind: ContrastKind,
    rotate: Rotate,
    color=None,
    orbit: OrbitSettings | None = None,
    context=None,
) -> np.ndarray:
    """Contrast-mapped u8 rows -> final RGBA image: colorize, equalize,
    overlay, rotate (the tail of reference ``process()``,
    noaa_apt.rs:186-243).  Shared by :func:`process` and the fused
    serving path (``Decoder.decode_render`` produces ``gray``)."""
    height = gray.shape[0]
    img = np.empty((height, PX_PER_ROW, 4), dtype=np.uint8)
    img[..., 0] = gray
    img[..., 1] = gray
    img[..., 2] = gray
    img[..., 3] = 255

    if color is not None:
        processing.false_color(img, color)

    if kind == ContrastKind.HISTOGRAM:
        processing.histogram_equalization(img, color is not None)

    if orbit is not None and orbit.draw_map is not None:
        if context is not None:
            context.status(0.5, "Drawing map")
        from ..geo import tle as tle_mod
        from ..geo.map_overlay import draw_map

        tle = orbit.custom_tle if orbit.custom_tle is not None else tle_mod.get_current_tle()
        draw_map(img, orbit.ref_time, orbit.draw_map, orbit.sat_name, tle)

    if rotate == Rotate.YES:
        if context is not None:
            context.status(0.90, "Rotating output image")
        processing.rotate(img)
    elif rotate == Rotate.ORBIT:
        if orbit is not None:
            from ..geo.orbit import south_to_north_pass

            if south_to_north_pass(orbit):
                if context is not None:
                    context.status(0.90, "Rotating output image")
                processing.rotate(img)
        else:
            log.warning("Can't rotate automatically if no orbit information is provided")

    return img
