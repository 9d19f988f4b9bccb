"""Property-based kernel tests (hypothesis): codec roundtrips, predicate
algebra invariants, vectorized-vs-scalar parity, geodesic metric axioms.
These are the randomized counterpart of the golden corpus — they pin the
engine's internal consistency rather than specific expected values."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from duckdb_spatial_spark.geom import kernels as K
from duckdb_spatial_spark.geom import vec as V
from duckdb_spatial_spark.geom.wkb import from_wkb, to_wkb
from duckdb_spatial_spark.geom.wkt import from_wkt, to_wkt

coord = st.floats(min_value=-1000, max_value=1000, allow_nan=False,
                  allow_infinity=False, allow_subnormal=False, width=32)


def rect_wkt(x0, y0, w, h):
    x1, y1 = x0 + w, y0 + h
    return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
            f"{x0} {y1}, {x0} {y0}))")


rects = st.builds(
    rect_wkt, coord, coord,
    st.floats(min_value=0.25, max_value=200, allow_nan=False,
              allow_subnormal=False, width=32),
    st.floats(min_value=0.25, max_value=200, allow_nan=False,
              allow_subnormal=False, width=32),
)
points_wkt = st.builds(lambda x, y: f"POINT ({x} {y})", coord, coord)


@settings(max_examples=120, deadline=None)
@given(st.one_of(rects, points_wkt))
def test_wkt_wkb_roundtrip(wkt):
    g = from_wkt(wkt)
    g2 = from_wkb(to_wkb(g))
    assert to_wkt(g2) == to_wkt(g)
    assert abs(K.area(g2) - K.area(g)) == 0.0


@settings(max_examples=120, deadline=None)
@given(rects, rects)
def test_predicate_algebra_rect_pairs(wa, wb):
    a, b = from_wkt(wa), from_wkt(wb)
    inter = K.intersects(a, b)
    assert K.intersects(b, a) == inter
    assert K.disjoint(a, b) == (not inter)
    assert K.contains(a, b) == K.within(b, a)
    assert K.covers(a, b) == K.covered_by(b, a)
    if K.contains(a, b):
        assert K.covers(a, b)
    if K.touches(a, b):
        assert inter and not K.overlaps(a, b)
    if K.equals(a, b):
        assert K.covers(a, b) and K.covers(b, a)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(rects, st.one_of(rects, points_wkt)),
                min_size=1, max_size=12))
def test_pred_pairs_matches_kernels(pairs):
    """The join hot path's shape-grouped vector kernels must agree with the
    scalar kernels row for row."""
    from duckdb_spatial_spark.operators.join import _KERNELS, pred_pairs

    avals = np.array([to_wkb(from_wkt(a)) for a, _ in pairs], dtype=object)
    bvals = np.array([to_wkb(from_wkt(b)) for _, b in pairs], dtype=object)
    for pred in ("intersects", "within", "contains", "touches",
                 "covers", "equals", "overlaps"):
        got = pred_pairs(pred, avals, bvals)
        kern = _KERNELS[pred]
        want = [bool(kern(from_wkb(a), from_wkb(b)))
                for a, b in zip(avals, bvals)]
        assert got.tolist() == want, pred


@settings(max_examples=80, deadline=None)
@given(rects, rects)
def test_overlay_measures_consistent(wa, wb):
    a, b = from_wkt(wa), from_wkt(wb)
    ia = K.area(K.intersection(a, b))
    ua = K.area(K.union(a, b))
    da = K.area(K.difference(a, b))
    assert ia >= -1e-9 and ua >= max(K.area(a), K.area(b)) - 1e-6
    # inclusion-exclusion on areas
    assert abs(ua - (K.area(a) + K.area(b) - ia)) < 1e-6
    assert abs(da - (K.area(a) - ia)) < 1e-6


@settings(max_examples=40, deadline=None)
@given(coord, coord,
       st.floats(min_value=0.125, max_value=50, allow_nan=False,
                 allow_subnormal=False, width=32))
def test_buffer_grows_and_bounds(x, y, r):
    p = from_wkt(f"POINT ({x} {y})")
    small = K.area(K.buffer(p, r, 8, "round", "round", 1.0))
    big = K.area(K.buffer(p, r * 2, 8, "round", "round", 1.0))
    assert small < big
    # 32-gon area is below the disk, above the inscribed 8-gon
    assert small < math.pi * r * r + 1e-6
    assert small > 0.5 * 8 * r * r * math.sin(2 * math.pi / 8) - 1e-6


lat = st.floats(min_value=-85, max_value=85, allow_nan=False,
                allow_subnormal=False, width=32)
lon = st.floats(min_value=-180, max_value=180, allow_nan=False,
                allow_subnormal=False, width=32)


@settings(max_examples=40, deadline=None)
@given(lat, lon, lat, lon, lat, lon)
def test_geodesic_metric_axioms(la1, lo1, la2, lo2, la3, lo3):
    from duckdb_spatial_spark.geom import geodesic as G

    d12 = G.inverse(la1, lo1, la2, lo2)
    d21 = G.inverse(la2, lo2, la1, lo1)
    # canonicalization may swap endpoints → identical to float round-off
    assert d21 == (d12 if d12 == d21 else d21) and abs(d12 - d21) <= 1e-8 * max(1.0, d12)
    assert d12 >= 0
    d13 = G.inverse(la1, lo1, la3, lo3)
    d23 = G.inverse(la2, lo2, la3, lo3)
    # triangle inequality with a RELATIVE term: branch noise (equatorial
    # closed form vs general quadrature at cosα1≈0) is ~1e-11 of the
    # distance, so a pure absolute 1e-6 bound fails on ~100 km legs
    assert d13 <= d12 + d23 + 1e-6 + 1e-9 * (d12 + d23)
    assert G.inverse(la1, lo1, la1, lo1) == 0.0


def test_geodesic_triangle_near_equator_regression():
    """Pinned hypothesis counterexample (round-2 verdict): point 3 at
    latitude 5.96e-8° sits just above the equatorial-shortcut threshold, so
    leg 1-3 takes the general path while leg 1-2 takes the closed form; the
    branches disagree by ~2.7 µm over 111 km (2.4e-11 relative)."""
    from duckdb_spatial_spark.geom import geodesic as G

    la3 = 5.960464477539063e-08
    d12 = G.inverse(0.0, 0.0, 0.0, 0.5)
    d23 = G.inverse(0.0, 0.5, la3, 1.0)
    d13 = G.inverse(0.0, 0.0, la3, 1.0)
    assert d13 <= d12 + d23 + 1e-6 + 1e-9 * (d12 + d23)
    # and the branches agree to well below a millimetre in absolute terms
    assert abs(d13 - (d12 + d23)) < 1e-3


# ---------------------------------------------- round-3 codec properties

linestring_wkt = st.builds(
    lambda pts: "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")",
    st.lists(st.tuples(coord, coord), min_size=2, max_size=8),
)


@settings(max_examples=100, deadline=None)
@given(st.one_of(rects, points_wkt, linestring_wkt), st.integers(0, 999999))
def test_spatialite_blob_roundtrip_property(wkt, srid):
    """WKB → SpatiaLite blob → WKB is exact for any geometry/srid (the
    blob stores raw float64 words, so not even rounding is allowed)."""
    from duckdb_spatial_spark.sources.spatialite import (
        spatialite_blob_to_wkb, wkb_to_spatialite_blob)

    wkb = to_wkb(from_wkt(wkt))
    back = spatialite_blob_to_wkb(wkb_to_spatialite_blob(wkb, srid=srid))
    assert to_wkt(from_wkb(back)) == to_wkt(from_wkb(wkb))


@settings(max_examples=40, deadline=None)
@given(
    st.floats(-4.9, 4.9, allow_nan=False, allow_subnormal=False),
    st.floats(-4.9, 4.9, allow_nan=False, allow_subnormal=False),
    st.floats(-30, 30, allow_nan=False, allow_subnormal=False),
    st.floats(-30, 30, allow_nan=False, allow_subnormal=False),
)
def test_ntv2_shift_inverse_property(lon, lat, dphi, dlam):
    """For any constant-shift grid, shift_inverse(shift(p)) == p to 1e-9°
    and the shift equals the grid value exactly (constant field ⇒ bilinear
    is exact everywhere inside)."""
    import numpy as np

    from duckdb_spatial_spark.geom.ntv2 import Ntv2Grid, Ntv2SubGrid

    sg = Ntv2SubGrid(
        name="T", parent="NONE",
        s_lat=-18000.0, n_lat=18000.0, e_long=-18000.0, w_long=18000.0,
        lat_inc=9000.0, long_inc=9000.0,
        lat_shift=np.full((5, 5), dphi), lon_shift=np.full((5, 5), dlam))
    g = Ntv2Grid("A", "B", 6378137.0, 6356752.3, 6378137.0, 6356752.3, (sg,))
    p = np.array([[lon, lat]])
    out = g.shift(p)
    assert abs(out[0, 1] - (lat + dphi / 3600.0)) < 1e-9
    assert abs(out[0, 0] - (lon - dlam / 3600.0)) < 1e-9
    rt = g.shift_inverse(out)
    assert abs(rt[0, 0] - lon) < 1e-9 and abs(rt[0, 1] - lat) < 1e-9
