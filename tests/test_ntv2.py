"""NTv2 grid-shift codec + ST_Transform +nadgrids integration.

The reference applies NTv2 grids through embedded PROJ
(spatial/src/spatial/proj/functions.cpp:487-513); here the .gsb format is
implemented natively (geom/ntv2.py). Grids are synthesized by our own
writer — bilinear-exact shift fields give closed-form expected outputs.
"""
import os

import numpy as np
import pytest

from duckdb_spatial_spark.geom.ntv2 import read_gsb, write_gsb, grid_for_path


def _linear_field(s_lat, n_lat, e_long, w_long, lat_inc, long_inc,
                  a=2.0, b=0.01, c=0.005):
    """lat_shift = a + b*row + c*col (bilinear ⇒ interpolated exactly);
    lon_shift = 2*lat_shift."""
    nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
    ncols = int(round((w_long - e_long) / long_inc)) + 1
    r, ccol = np.mgrid[0:nrows, 0:ncols]
    lat = a + b * r + c * ccol
    return lat, 2.0 * lat


def _write_demo(path, big_endian=False):
    # coarse grid over lat 0..2°, lon −3..−1° (west 3600..10800 arcsec)
    s_lat, n_lat = 0.0, 7200.0
    e_long, w_long = 3600.0, 10800.0
    inc = 1800.0  # 0.5°
    lat_s, lon_s = _linear_field(s_lat, n_lat, e_long, w_long, inc, inc)
    # finer child over lat 0.5..1°, lon −2..−1.5°
    cs_lat, cn_lat = 1800.0, 3600.0
    ce_long, cw_long = 5400.0, 7200.0
    cinc = 450.0  # 0.125°
    clat_s, clon_s = _linear_field(cs_lat, cn_lat, ce_long, cw_long, cinc,
                                   cinc, a=10.0, b=0.0, c=0.0)
    write_gsb(path, [
        dict(name="COARSE", s_lat=s_lat, n_lat=n_lat, e_long=e_long,
             w_long=w_long, lat_inc=inc, long_inc=inc,
             lat_shift=lat_s, lon_shift=lon_s),
        dict(name="FINE", parent="COARSE", s_lat=cs_lat, n_lat=cn_lat,
             e_long=ce_long, w_long=cw_long, lat_inc=cinc, long_inc=cinc,
             lat_shift=clat_s, lon_shift=clon_s),
    ], big_endian=big_endian)


@pytest.mark.parametrize("big_endian", [False, True])
def test_gsb_roundtrip(tmp_path, big_endian):
    p = str(tmp_path / "demo.gsb")
    _write_demo(p, big_endian=big_endian)
    g = read_gsb(p)
    assert g.system_f == "LOCAL" and g.system_t == "WGS84"
    assert len(g.subgrids) == 2
    coarse = g.subgrids[0]
    assert coarse.name == "COARSE"
    assert coarse.nrows == 5 and coarse.ncols == 5
    # node (row 2, col 3): 2 + 0.01*2 + 0.005*3 arcsec
    assert coarse.lat_shift[2, 3] == pytest.approx(2.035, abs=1e-6)
    assert g.subgrids[1].parent == "COARSE"


def test_shift_bilinear_exact_and_subgrid_priority(tmp_path):
    p = str(tmp_path / "demo.gsb")
    _write_demo(p)
    g = read_gsb(p)
    # point inside the coarse grid only: lat 1.6°, lon −2.6°
    # (row = 1.6*3600/1800 = 3.2, col = (2.6*3600−3600)/1800 = 3.2)
    pts = np.array([[-2.6, 1.6]])
    out = g.shift(pts)
    exp_shift = 2.0 + 0.01 * 3.2 + 0.005 * 3.2  # bilinear on a linear field
    assert out[0, 1] == pytest.approx(1.6 + exp_shift / 3600.0, abs=1e-9)
    assert out[0, 0] == pytest.approx(-2.6 - 2 * exp_shift / 3600.0, abs=1e-9)
    # point inside the FINE child: constant 10" up, 20" west
    pts2 = np.array([[-1.8, 0.75]])
    out2 = g.shift(pts2)
    assert out2[0, 1] == pytest.approx(0.75 + 10.0 / 3600.0, abs=1e-9)
    assert out2[0, 0] == pytest.approx(-1.8 - 20.0 / 3600.0, abs=1e-9)
    # outside every sub-grid → pass-through
    out3 = g.shift(np.array([[5.0, 5.0]]))
    assert np.allclose(out3, [[5.0, 5.0]])


def test_shift_inverse_fixed_point(tmp_path):
    p = str(tmp_path / "demo.gsb")
    _write_demo(p)
    g = read_gsb(p)
    pts = np.array([[-2.6, 1.6], [-1.8, 0.75], [-1.2, 1.9]])
    rt = g.shift_inverse(g.shift(pts))
    assert np.allclose(rt, pts, atol=1e-10)


def test_grid_for_path_missing_and_cache(tmp_path):
    assert grid_for_path(str(tmp_path / "nope.gsb")) is None
    p = str(tmp_path / "demo.gsb")
    _write_demo(p)
    g1 = grid_for_path(p)
    g2 = grid_for_path(p)
    assert g1 is g2  # same mtime → cached object
    # not-an-ntv2 file → None, not an exception
    bad = str(tmp_path / "bad.gsb")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 64)
    assert grid_for_path(bad) is None


def test_nadgrids_proj_string_native(tmp_path):
    """crs_from_proj_string consumes +nadgrids natively: longlat+grid →
    pure datum shift; unknown grid file → None (fallback, never silently
    unshifted)."""
    from duckdb_spatial_spark.geom.proj import native_transform

    p = str(tmp_path / "demo.gsb")
    _write_demo(p)
    fn = native_transform(f"+proj=longlat +ellps=WGS84 +nadgrids={p}",
                          "EPSG:4326")
    assert fn is not None
    out = fn(np.array([[-1.8, 0.75]]))
    assert out[0, 1] == pytest.approx(0.75 + 10.0 / 3600.0, abs=1e-9)
    assert out[0, 0] == pytest.approx(-1.8 - 20.0 / 3600.0, abs=1e-9)
    # reverse direction applies the inverse shift
    fn_inv = native_transform(
        "EPSG:4326", f"+proj=longlat +ellps=WGS84 +nadgrids={p}")
    rt = fn_inv(out)
    assert np.allclose(rt, [[-1.8, 0.75]], atol=1e-10)
    assert native_transform(
        "+proj=longlat +nadgrids=/does/not/exist.gsb", "EPSG:4326") is None
    # @null grid → no shift machinery needed, plain longlat
    fn_null = native_transform("+proj=longlat +ellps=WGS84 +nadgrids=@null",
                               "EPSG:4326")
    assert fn_null is not None and np.allclose(
        fn_null(np.array([[1.0, 2.0]])), [[1.0, 2.0]])


def test_nadgrids_projected_and_st_transform(tmp_path, spark):
    """A projected CRS on a grid-shifted datum: +proj=utm +nadgrids=…
    equals shift-then-project; end-to-end through the ST_Transform column
    function on a DataFrame."""
    from pyspark.sql import functions as F

    from duckdb_spatial_spark import functions as ST
    from duckdb_spatial_spark.geom.proj import native_transform
    from duckdb_spatial_spark.geom.wkb import from_wkb

    p = str(tmp_path / "demo.gsb")
    _write_demo(p)
    crs = f"+proj=utm +zone=30 +ellps=WGS84 +nadgrids={p}"
    fn = native_transform("EPSG:4326", crs)
    plain = native_transform("EPSG:4326", "+proj=utm +zone=30 +ellps=WGS84")
    src = np.array([[-2.6, 1.6]])
    # wgs84 → local datum (inverse shift) → project
    from duckdb_spatial_spark.geom.ntv2 import read_gsb as _r
    local = _r(p).shift_inverse(src)
    assert np.allclose(fn(src), plain(local), atol=1e-9)

    df = spark.createDataFrame([(-1.8, 0.75)], "x double, y double") \
        .withColumn("g", ST.st_point("x", "y")) \
        .withColumn("t", ST.st_transform(
            "g", f"+proj=longlat +ellps=WGS84 +nadgrids={p}", "EPSG:4326"))
    row = df.select(ST.st_x("t").alias("tx"), ST.st_y("t").alias("ty")) \
        .collect()[0]
    assert row["ty"] == pytest.approx(0.75 + 10.0 / 3600.0, abs=1e-9)
    assert row["tx"] == pytest.approx(-1.8 - 20.0 / 3600.0, abs=1e-9)
