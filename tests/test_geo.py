"""Geo: spherical trig analytic cases (geo.rs:110-167) and the SGP4
regression against `predict` outputs with the pinned Jan-2020 TLE and
per-case tolerances (geo.rs:198-251)."""

import math
from datetime import datetime, timezone

import pytest

from noaa_apt_tpu.geo import azimuth, distance, reckon
from noaa_apt_tpu.geo import sgp4 as sg

PI = math.pi


def test_distance():
    tol = PI / 1000
    cases = [
        ((0, 0), (0, PI / 6), PI / 6),
        ((0, 0), (PI / 6, 0), PI / 6),
        ((0, 0), (-PI / 6, 0), PI / 6),
        ((PI / 6, 0), (0, 0), PI / 6),
        ((-PI / 6, 0), (0, 0), PI / 6),
        ((0, PI / 6), (0, 0), PI / 6),
        ((0, 0), (PI, 0), PI),
        ((0, 0), (0, PI), PI),
        ((0, 0), (0, -PI), PI),
        ((PI / 4, 0), (PI / 4, PI), PI / 2),
        ((0, PI / 4), (-PI / 6, PI / 4), PI / 6),
    ]
    for a, b, expected in cases:
        assert abs(distance(a, b) - expected) < tol

    tol = 0.000628
    assert abs(distance((0, 0), (0, 0.001)) - 0.001) < tol
    assert abs(distance((PI / 4, PI / 4), (PI / 4, PI / 4))) < tol
    assert abs(distance((0, 0), (0, 2 * PI))) < tol


def test_azimuth():
    tol = PI / 1000
    cases = [
        ((0, 0), (0, PI / 6), PI / 2),
        ((0, 0), (PI / 6, 0), 0.0),
        ((0, 0), (-PI / 6, 0), PI),
        ((PI / 6, 0), (0, 0), PI),
        ((-PI / 6, 0), (0, 0), 0.0),
        ((0, PI / 6), (0, 0), -PI / 2),
    ]
    for a, b, expected in cases:
        assert abs(azimuth(a, b) - expected) < tol


def test_reckon_roundtrip():
    tol = PI / 1000
    cases = [
        ((0.0, 0.0), PI / 6, 0.0),
        ((PI / 2, PI / 2), PI / 6, PI / 8),
        ((PI, PI / 4), PI / 3, PI / 4),
        ((PI / 8, PI / 4), PI, PI / 4),
    ]
    for latlon1, dist, az in cases:
        latlon2 = reckon(latlon1, dist, az)
        assert abs(distance(latlon1, latlon2) - dist) < tol


# Pinned Jan-2020 TLE (geo.rs:206-214).
TEST_TLE = """NOAA 15
1 25338U 98030A   20028.53684332  .00000010  00000-0  22730-4 0  9996
2 25338  98.7308  54.2052 0009655 316.5487  43.4931 14.25949056128892
NOAA 18
1 28654U 05018A   20028.55430359  .00000064  00000-0  59410-4 0  9998
2 28654  99.0657  83.5290 0013366 267.3059  92.6583 14.12484618757024
NOAA 19
1 33591U 09005A   20028.54874297  .00000001  00000-0  25623-4 0  9996
2 33591  99.1936  30.2411 0014855 109.6767 250.6008 14.12393428565240"""


def test_tle_parse():
    sats = sg.parse_tle(TEST_TLE)
    assert [s.name for s in sats] == ["NOAA 15", "NOAA 18", "NOAA 19"]
    n15 = sats[0]
    assert n15.satnum == "25338"
    assert n15.ecco == pytest.approx(0.0009655)
    assert n15.bstar == pytest.approx(0.22730e-4)
    assert n15.inclo == pytest.approx(98.7308 * PI / 180)


def test_sgp4_against_predict():
    """Reference values from `predict` with stated per-case tolerances
    (geo.rs:225-233)."""
    sats = sg.parse_tle(TEST_TLE)
    cases = [
        ("NOAA 15", 1577836800, -22.135, 103.093, 0.005),
        ("NOAA 18", 1580257671, -23.131, 125.410, 0.005),
        ("NOAA 19", 1580000000, -16.414, 66.815, 0.005),
        ("NOAA 15", 1590000000, -53.152, 19.884, 0.036),
        ("NOAA 18", 1565395200, 68.577, 287.984, 0.05),
        ("NOAA 15", 1672531200, -79.203, 64.941, 1.0),
        ("NOAA 19", 1514764800, -36.389, 46.125, 1.0),
    ]
    for name, ts, exp_lat, exp_lon, tol in cases:
        sat = sg.find_satellite(sats, name)
        t = datetime.fromtimestamp(ts, tz=timezone.utc)
        lat, lon = sg.satellite_latlon(sat, t)
        lat_deg = lat * 180 / PI
        lon_deg = (lon * 180 / PI + 360.0) % 360.0
        assert abs(lat_deg - exp_lat) < tol, (name, ts, lat_deg, exp_lat)
        assert abs(lon_deg - exp_lon) < tol, (name, ts, lon_deg, exp_lon)


def test_find_satellite_missing():
    from noaa_apt_tpu.err import InternalError

    with pytest.raises(InternalError, match="not found"):
        sg.find_satellite(sg.parse_tle(TEST_TLE), "NOAA 99")


# A geostationary TLE (GOES 16, period ~1436 min): deep-space, which
# near-earth SGP4 cannot model — parsing must refuse, not silently
# return wrong positions (the reference's satellite-rs ships SDP4).
GEO_TLE = """GOES 16
1 41866U 16071A   20028.50000000  .00000100  00000-0  00000+0 0  9993
2 41866   0.0500 270.0000 0001000  90.0000 180.0000  1.00271000 11001"""


def test_sgp4_deep_space_tle_rejected():
    from noaa_apt_tpu.err import FeatureNotAvailableError

    with pytest.raises(FeatureNotAvailableError, match="deep-space"):
        sg.parse_tle(GEO_TLE)


def test_sgp4_near_earth_boundary_accepted():
    """A 200-min-period orbit is still near-earth: below the 225-min
    SDP4 switch (Vallado sgp4init), so it must parse and propagate."""
    mins = 200.0
    revs_per_day = 1440.0 / mins
    l2 = f"2 25338  98.7308  54.2052 0009655 316.5487  43.4931 {revs_per_day:11.8f}128892"
    sats = sg.parse_tle("\n".join(["NEAR", TEST_TLE.splitlines()[1], l2]))
    assert sats[0].name == "NEAR"
