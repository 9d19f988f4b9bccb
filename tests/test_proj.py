"""Native projection engine (geom/proj.py): Krüger-series transverse
Mercator (UTM), Lambert Conformal Conic 2SP, Albers Equal-Area.
Correctness anchors: round-trip identity, exact on-axis invariants, an
independent meridian-arc series (Snyder 3-21), a publicly known UTM
coordinate, and geodesic scale at the standard parallels."""

import math

import numpy as np
import pytest

from duckdb_spatial_spark.geom.proj import (
    WGS84,
    native_transform,
)


def test_utm_roundtrip_grid():
    fwd = native_transform("EPSG:4326", "EPSG:32618")
    inv = native_transform("EPSG:32618", "EPSG:4326")
    lons = np.linspace(-78, -72, 13)
    lats = np.linspace(-80, 84, 13)
    g = np.array([[lo, la] for lo in lons for la in lats])
    rt = inv(fwd(g.copy()))
    assert np.abs(rt - g).max() < 1e-9


def test_utm_central_meridian_invariants():
    fwd = native_transform("EPSG:4326", "EPSG:32618")  # lon0 = -75
    out = fwd(np.array([[-75.0, 0.0], [-75.0, 45.0]]))
    assert out[0] == pytest.approx((500000.0, 0.0))
    assert out[1, 0] == pytest.approx(500000.0)
    # independent check: northing(45°N) = k0 · meridian arc (Snyder 3-21)
    a, f = WGS84
    e2 = f * (2 - f)
    e4, e6 = e2 * e2, e2 ** 3
    phi = math.radians(45.0)
    M = a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi)
    )
    assert out[1, 1] == pytest.approx(0.9996 * M, abs=0.001)


def test_utm_known_coordinate():
    # CN Tower, commonly published UTM 17N reference: ~630084 E, 4833439 N
    out = native_transform("EPSG:4326", "EPSG:32617")(
        np.array([[-79.387139, 43.642567]])
    )
    assert out[0, 0] == pytest.approx(630084.3, abs=1.0)
    assert out[0, 1] == pytest.approx(4833438.6, abs=1.0)


def test_utm_south_and_etrs89():
    s = native_transform("EPSG:4326", "EPSG:32723")(  # UTM 23S (Rio)
        np.array([[-43.2, -22.9]])
    )
    assert s[0, 1] > 7e6  # southern false northing applied
    e = native_transform("EPSG:4326", "EPSG:25832")(np.array([[9.0, 52.0]]))
    assert e[0, 0] == pytest.approx(500000.0)  # 9°E is zone 32's CM


def test_lambert93_origin_and_roundtrip():
    fwd = native_transform("EPSG:4326", "EPSG:2154")
    inv = native_transform("EPSG:2154", "EPSG:4326")
    assert fwd(np.array([[3.0, 46.5]]))[0] == pytest.approx((700000.0, 6600000.0))
    g = np.array([[2.3522, 48.8566], [5.37, 43.29], [-1.55, 47.22]])
    assert np.abs(inv(fwd(g.copy())) - g).max() < 1e-9


def test_lcc_scale_at_standard_parallel():
    # conformal: scale ≈ 1 along lat1=49 — projected distance of a small
    # east-west step matches the ellipsoidal parallel arc within 1e-6
    fwd = native_transform("EPSG:4326", "EPSG:2154")
    a, f = 6378137.0, 1 / 298.257222101
    e2 = f * (2 - f)
    lat = math.radians(49.0)
    nu = a / math.sqrt(1 - e2 * math.sin(lat) ** 2)
    dlon = 1e-3
    ground = nu * math.cos(lat) * math.radians(dlon)
    p = fwd(np.array([[3.0, 49.0], [3.0 + dlon, 49.0]]))
    proj_d = math.hypot(*(p[1] - p[0]))
    assert proj_d / ground == pytest.approx(1.0, abs=1e-6)


def test_albers_preserves_area():
    # equal-area: a 1°×1° quad at mid-latitudes keeps its area (vs the
    # ellipsoidal surface-area formula) to a relative 1e-6
    fwd = native_transform("EPSG:4326", "EPSG:5070")
    lon0, lat0 = -100.0, 40.0
    quad = np.array([
        [lon0, lat0], [lon0 + 1, lat0], [lon0 + 1, lat0 + 1], [lon0, lat0 + 1]
    ])
    p = fwd(quad.copy())
    x, y = p[:, 0], p[:, 1]
    proj_area = 0.5 * abs(
        np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
    )
    # ellipsoidal zone area between two parallels / 360 (authalic formula)
    a, f = 6378137.0, 1 / 298.257222101
    e = math.sqrt(f * (2 - f))
    b2 = (a * (1 - f)) ** 2

    def zone(phi):
        s = math.sin(phi)
        return math.pi * b2 * (
            s / (1 - e * e * s * s) + math.atanh(e * s) / e
        )

    ground = (zone(math.radians(lat0 + 1)) - zone(math.radians(lat0))) / 360.0
    assert proj_area / ground == pytest.approx(1.0, rel=2e-4)


def test_unknown_crs_returns_none():
    assert native_transform("EPSG:27700", "EPSG:4326") is None  # OSGB36 datum shift
    assert native_transform("ESRI:102008", "EPSG:4326") is None
