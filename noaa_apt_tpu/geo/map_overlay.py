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


def xiaolin_wu(p1: tuple[float, float], p2: tuple[float, float]):
    """Anti-aliased line: yields ((x, y), coverage in 0..1).

    Same algorithm as the ``line_drawing`` crate the reference uses.
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

    def emit(x, y, v):
        return ((int(y), int(x)) if steep else (int(x), int(y)), v)

    out = []
    # first endpoint
    xend = round(x1)
    yend = y1 + gradient * (xend - x1)
    xgap = 1.0 - (x1 + 0.5 - math.floor(x1 + 0.5))
    xpxl1 = int(xend)
    ypxl1 = math.floor(yend)
    out.append(emit(xpxl1, ypxl1, (1 - (yend - math.floor(yend))) * xgap))
    out.append(emit(xpxl1, ypxl1 + 1, (yend - math.floor(yend)) * xgap))
    intery = yend + gradient

    # second endpoint
    xend = round(x2)
    yend = y2 + gradient * (xend - x2)
    xgap = x2 + 0.5 - math.floor(x2 + 0.5)
    xpxl2 = int(xend)
    ypxl2 = math.floor(yend)

    for x in range(xpxl1 + 1, xpxl2):
        f = intery - math.floor(intery)
        out.append(emit(x, math.floor(intery), 1 - f))
        out.append(emit(x, math.floor(intery) + 1, f))
        intery += gradient

    out.append(emit(xpxl2, ypxl2, (1 - (yend - math.floor(yend))) * xgap))
    out.append(emit(xpxl2, ypxl2 + 1, (yend - math.floor(yend)) * xgap))
    return out


def _blend_pixel(img: np.ndarray, x: int, y: int, rgba: tuple[int, int, int, int]) -> None:
    """Alpha-composite one RGBA pixel (the image crate's blend)."""
    sr, sg_, sb, sa = rgba
    if sa == 0:
        return
    dr, dg, db, da = (int(v) for v in img[y, x])
    asf = sa / 255.0
    adf = da / 255.0
    ao = asf + adf * (1.0 - asf)
    if ao == 0.0:
        return
    img[y, x, 0] = round((sr * asf + dr * adf * (1 - asf)) / ao)
    img[y, x, 1] = round((sg_ * asf + dg * adf * (1 - asf)) / ao)
    img[y, x, 2] = round((sb * asf + db * adf * (1 - asf)) / ao)
    img[y, x, 3] = round(ao * 255.0)


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
