"""Map overlay: project shapefile vectors into APT image coordinates
and rasterize with anti-aliased lines.

Behavioral contract: reference ``src/map.rs`` — per-line SGP4 ground
track (500 ms/line), Napier right-spherical-triangle projection with a
+-pi/3 distance clamp and yaw shear, per-line X-offset correction, and
Xiaolin-Wu anti-aliased lines alpha-blended into BOTH channels at
x+539 and x+1579, clipped to +-456 px.

Divergence (documented): missing shapefiles are skipped with a warning
instead of aborting the decode — the reference errors out
(``map.rs:136-137``), but its own checkout ships without ``states.shp``.
Set ``strict=True`` for reference behavior.
"""

from __future__ import annotations

import logging
import math

import numpy as np

from .. import err
from ..io.config import res_path
from ..types import MapSettings, RefTime, SatName
from . import sgp4 as sg
from .geometry import azimuth, distance
from .orbit import ground_track
from .shapefile import read_parts

log = logging.getLogger(__name__)

PI = math.pi


def _rust_round(v: float) -> int:
    """f64::round — half away from zero (Python's round is banker's)."""
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def xiaolin_wu(p1: tuple[float, float], p2: tuple[float, float]):
    """Anti-aliased line: yields ((x, y), coverage in 0..1).

    Matches the ``line_drawing`` crate's ``XiaolinWu`` iterator the
    reference uses (map.rs:119): x steps from round(x1) to round(x2)
    inclusive, emitting (x, floor(y)) with weight 1-fpart and — when
    fpart > 0 — (x, floor(y)+1) with weight fpart; y starts at the raw
    endpoint (no endpoint-gap weighting, unlike the textbook version).
    """
    x1, y1 = p1
    x2, y2 = p2
    steep = abs(y2 - y1) > abs(x2 - x1)
    if steep:
        x1, y1, x2, y2 = y1, x1, y2, x2
    if x1 > x2:
        x1, x2 = x2, x1
        y1, y2 = y2, y1
    dx = x2 - x1
    gradient = (y2 - y1) / dx if dx != 0.0 else 1.0

    out = []
    x = _rust_round(x1)
    end_x = _rust_round(x2)
    y = y1
    while x <= end_x:
        fl = math.floor(y)
        fpart = y - fl
        fl = int(fl)
        pt = (fl, x) if steep else (x, fl)
        out.append((pt, 1.0 - fpart))
        if fpart > 0.0:
            pt2 = (fl + 1, x) if steep else (x, fl + 1)
            out.append((pt2, fpart))
        x += 1
        y += gradient
    return out


def _blend_pixel(img: np.ndarray, x: int, y: int, rgba: tuple[int, int, int, int]) -> None:
    """Alpha-composite one RGBA pixel (the image crate's ``Rgba::blend``
    semantics: float compositing, truncating cast back to u8)."""
    sr, sg_, sb, sa = rgba
    if sa == 0:
        return
    dr, dg, db, da = (int(v) for v in img[y, x])
    asf = sa / 255.0
    adf = da / 255.0
    ao = asf + adf * (1.0 - asf)
    if ao == 0.0:
        return
    img[y, x, 0] = int((sr * asf + dr * adf * (1 - asf)) / ao)
    img[y, x, 1] = int((sg_ * asf + dg * adf * (1 - asf)) / ao)
    img[y, x, 2] = int((sb * asf + db * adf * (1 - asf)) / ao)
    img[y, x, 3] = int(ao * 255.0)


def draw_map(
    img: np.ndarray,
    ref_time: RefTime,
    settings: MapSettings,
    sat_name: SatName,
    tle: str,
    strict: bool = False,
) -> None:
    """Draw country/state/lake vectors over the image, in place."""
    log.info("Drawing map overlay")
    height = img.shape[0]

    sat = sg.find_satellite(sg.parse_tle(tle), sat_name.to_string())
    sat_positions = ground_track(sat, ref_time, height)
    start_latlon = sat_positions[0]
    end_latlon = sat_positions[-1]

    y_res = distance(start_latlon, end_latlon) / height / settings.vscale
    x_res = 0.0005 / settings.hscale
    ref_az = azimuth(start_latlon, end_latlon)

    def latlon_to_rel_px(latlon):
        az = azimuth(start_latlon, latlon)
        b = az - ref_az
        c = min(PI / 3.0, max(-PI / 3.0, distance(latlon, start_latlon)))
        a = math.atan(math.cos(b) * math.tan(c))
        bb = math.asin(math.sin(b) * math.sin(c))
        x = -bb / x_res
        y = a / y_res + settings.yaw * x
        return (x, y)

    # Precompute the per-line X-offset corrections once per row.
    row_offsets = [latlon_to_rel_px(p)[0] for p in sat_positions]

    h = height

    def draw_line(latlon1, latlon2, color):
        x1, y1 = latlon_to_rel_px(latlon1)
        x2, y2 = latlon_to_rel_px(latlon2)
        est_y1 = min(int(max(y1, 0.0)), h - 1)
        est_y2 = min(int(max(y2, 0.0)), h - 1)
        x1 -= row_offsets[est_y1]
        x2 -= row_offsets[est_y2]
        if (-456.0 < x1 < 456.0 and 0.0 < y1 < h) or (
            -600.0 < x1 < 600.0 and 0.0 < y1 < h
        ):
            r, g, b, a = color
            for (x, y), value in xiaolin_wu((x1, y1), (x2, y2)):
                if -456 < x < 456 and 0 < y < h:
                    rgba = (r, g, b, int(value * a))
                    _blend_pixel(img, x + 539, y, rgba)
                    _blend_pixel(img, x + 1579, y, rgba)

    def draw_shapefile(name, color):
        path = res_path("shapefiles", name)
        try:
            parts = read_parts(path)
        except err.InternalError:
            if strict:
                raise
            log.warning("Shapefile %s not found, skipping its overlay layer", path)
            return
        for pts in parts:
            prev = pts[0]
            for pt in pts:
                draw_line(
                    (pt[1] / 180.0 * PI, pt[0] / 180.0 * PI),
                    (prev[1] / 180.0 * PI, prev[0] / 180.0 * PI),
                    color,
                )
                prev = pt

    draw_shapefile("states.shp", settings.states_color)
    draw_shapefile("countries.shp", settings.countries_color)
    draw_shapefile("lakes.shp", settings.lakes_color)
