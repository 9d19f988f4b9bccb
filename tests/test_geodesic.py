"""Exact WGS84 geodesics (geom/geodesic.py) — Karney-style inverse with
quadrature-evaluated integrals. Authorities: closed forms (equator arc,
meridian arc via the independent Bessel n-series), Vincenty agreement at
Vincenty's own accuracy, and internal consistency."""

import math

import numpy as np
import pytest

from duckdb_spatial_spark.geom import geodesic as G


A, F = G.WGS84_A, G.WGS84_F
N3 = F / (2 - F)


def m_arc(phi):
    """Independent meridian-arc series (Bessel, third flattening)."""
    return (A / (1 + N3)) * (
        (1 + N3 * N3 / 4 + N3 ** 4 / 64) * phi
        - (3 * N3 / 2 - 3 * N3 ** 3 / 16) * math.sin(2 * phi)
        + (15 * N3 * N3 / 16 - 15 * N3 ** 4 / 64) * math.sin(4 * phi)
        - (35 * N3 ** 3 / 48) * math.sin(6 * phi)
        + (315 * N3 ** 4 / 512) * math.sin(8 * phi)
    )


def test_quarter_meridian():
    # canonical WGS84 value, published to 0.1 mm
    assert G.inverse(0, 0, 90, 0) == pytest.approx(10001965.7293, abs=1e-3)


def test_equatorial_arc_exact():
    assert G.inverse(0, 0, 0, 90) == pytest.approx(A * math.pi / 2, rel=1e-12)
    assert G.inverse(0, 10, 0, 100) == pytest.approx(A * math.pi / 2, rel=1e-12)


def test_antipodal_equatorial_over_pole():
    assert G.inverse(0, 0, 0, 180) == pytest.approx(2 * 10001965.7293, abs=2e-3)


def test_meridian_arcs_vs_series():
    for la1, la2 in [(0, 45), (-70, 13), (10, 10.5), (-89, 89), (33, 34)]:
        want = abs(m_arc(math.radians(la2)) - m_arc(math.radians(la1)))
        assert G.inverse(la1, 7, la2, 7) == pytest.approx(want, abs=1e-6)


def test_vs_vincenty_random():
    from duckdb_spatial_spark.functions.scalar import _geodesic_inverse_m

    rng = np.random.default_rng(11)
    for _ in range(100):
        la1, lo1 = rng.uniform(-80, 80), rng.uniform(-180, 180)
        la2, lo2 = rng.uniform(-80, 80), rng.uniform(-180, 180)
        g = G.inverse(la1, lo1, la2, lo2)
        if g > 19_500_000:
            continue  # Vincenty's non-convergence zone
        assert _geodesic_inverse_m(lo1, la1, lo2, la2) == pytest.approx(
            g, abs=2e-4
        )


def test_symmetry_and_continuity_near_antipode():
    assert G.inverse(10, 20, 50, 121) == G.inverse(50, 121, 10, 20)
    prev = None
    for dl in (179.0, 179.5, 179.9, 179.99, 180.0):
        d = G.inverse(0.5, 0, -0.3, dl)
        if prev is not None:
            assert d > prev  # monotone approach to the antipode
        prev = d


def test_batch_nan_and_zero():
    d = G.inverse_batch(
        np.array([1.0, np.nan, 5.0]), np.array([2.0, 3.0, 6.0]),
        np.array([1.0, 4.0, 5.5]), np.array([2.0, 5.0, 6.0]),
    )
    assert d[0] == 0.0
    assert np.isnan(d[1])
    assert d[2] > 0


def test_ring_area_small_square_vs_band_formula():
    # tiny lat/lon square: geodesic edges ≈ graticule edges to O(size³);
    # band formula A = Δλ·(a²/2)·(q(φ2)−q(φ1)) is exact for graticule cells
    lo, hi = 10.0, 10.01
    ring = np.array(
        [[0, lo], [0.01, lo], [0.01, hi], [0, hi], [0, lo]], dtype=float
    )
    got = G.ring_area(ring)
    q = G._authalic_q
    want = (
        math.radians(0.01) * (A * A / 2)
        * float(q(np.array([math.sin(math.radians(hi))]))[0]
                - q(np.array([math.sin(math.radians(lo))]))[0])
    )
    assert got == pytest.approx(want, rel=1e-7)


def test_ring_area_polar_cap_winding():
    lons = np.linspace(0, 360, 73)
    cap = np.stack([lons, np.full(73, 80.0)], axis=1)
    got = G.ring_area(cap)
    q = G._authalic_q
    band = (A * A / 2) * 2 * math.pi * float(
        q(np.array([1.0]))[0] - q(np.array([math.sin(math.radians(80))]))[0]
    )
    # the 72-gon of geodesic edges is slightly inside the parallel cap;
    # the deficit is the 72 lenses (~1.2e-3 rel), not an error
    assert got == pytest.approx(band, rel=3e-3)
    assert got < band


def test_spark_distance_spheroid(spark):
    from pyspark.sql import functions as F2

    import duckdb_spatial_spark.functions as ST

    df = spark.createDataFrame(
        [(0.0, 0.0, 90.0, 0.0), (0.0, 0.0, 0.0, 90.0)], ["la1", "lo1", "la2", "lo2"]
    )
    got = df.select(
        ST.st_distance_spheroid("la1", "lo1", "la2", "lo2").alias("d")
    ).collect()
    assert got[0]["d"] == pytest.approx(10001965.7293, abs=1e-3)
    assert got[1]["d"] == pytest.approx(A * math.pi / 2, rel=1e-12)
