"""Mapbox Vector Tile native codec: roundtrip, spec geometry semantics,
georeferencing, gzip transparency, dispatch."""

import gzip
import math

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.geom.wkb import from_wkb, to_wkb
from duckdb_spatial_spark.geom.wkt import from_wkt, to_wkt
from duckdb_spatial_spark.sources.mvt import (decode_mvt, encode_mvt_tile,
                                              st_read_mvt, st_write_mvt)
from duckdb_spatial_spark.sources.read import st_read, st_write


def _wkb(wkt):
    return bytes(to_wkb(from_wkt(wkt)))


def test_decode_roundtrip_all_types(tmp_path):
    feats = [
        (1, _wkb("POINT (10 20)"), {"name": "a", "n": 7}),
        (2, _wkb("MULTIPOINT ((1 1), (5 9))"), {"f": 2.5}),
        (3, _wkb("LINESTRING (0 0, 10 0, 10 10)"), {"b": True}),
        (4, _wkb("MULTILINESTRING ((0 0, 4 0), (6 0, 9 3))"), {}),
        # exterior CW-on-screen (y-down positive area) + a hole
        (5, _wkb("POLYGON ((0 0, 0 40, 40 40, 40 0, 0 0),"
                 " (10 10, 30 10, 30 30, 10 30, 10 10))"), {"k": "pg"}),
        (6, _wkb("MULTIPOLYGON (((50 50, 50 60, 60 60, 60 50, 50 50)),"
                 " ((70 70, 70 80, 80 80, 80 70, 70 70)))"), {}),
    ]
    data = encode_mvt_tile({"roads": feats}, extent=256)
    rows = decode_mvt(data)
    assert len(rows) == 6
    by_id = {r[1]: r for r in rows}
    assert all(r[0] == "roads" and r[4] == 256 for r in rows)
    assert to_wkt(from_wkb(by_id[1][2])) == "POINT (10 20)"
    assert by_id[1][3] == {"name": "a", "n": "7"}
    assert to_wkt(from_wkb(by_id[2][2])) == "MULTIPOINT (1 1, 5 9)"
    assert by_id[2][3] == {"f": "2.5"}
    assert to_wkt(from_wkb(by_id[3][2])) == "LINESTRING (0 0, 10 0, 10 10)"
    assert by_id[3][3] == {"b": "True"}
    assert from_wkb(by_id[4][2]).type_name == "MULTILINESTRING"
    pg = from_wkb(by_id[5][2])
    assert pg.type_name == "POLYGON" and len(pg.rings) == 2
    from duckdb_spatial_spark.geom.kernels import area
    assert area(pg) == 1600.0 - 400.0
    mp = from_wkb(by_id[6][2])
    assert mp.type_name == "MULTIPOLYGON" and len(mp.parts) == 2
    assert area(mp) == 200.0


def test_negative_int_property_roundtrip():
    # int_value (field 4) is signed int64: the encoder two's-complements
    # negatives, and the decoder must reinterpret, not return huge uint64s.
    feats = [(1, _wkb("POINT (1 2)"),
              {"neg": -1, "big_neg": -(2 ** 40), "pos": 42, "zero": 0})]
    rows = decode_mvt(encode_mvt_tile({"t": feats}, extent=256))
    props = rows[0][3]
    assert props == {"neg": "-1", "big_neg": str(-(2 ** 40)),
                     "pos": "42", "zero": "0"}


def test_spark_read_write_and_dispatch(spark, tmp_path):
    src = spark.range(20).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("w"), F.col("id")).alias("nm"),
        ST.st_point((F.col("id") % 5 * 100).cast("double"),
                    (F.col("id") / 5).cast("int").cast("double") * 100
                    ).alias("geom"),
    )
    p = str(tmp_path / "tile.mvt")
    st_write(src, p, fmt="mvt")  # extension dispatch on the sink
    back = st_read(spark, p)  # extension dispatch on the reader
    assert back.count() == 20
    assert set(back.columns) >= {"layer", "fid", "geom", "properties"}
    got = {(r["properties"]["k"],
            to_wkt(from_wkb(bytes(r["geom"])))) for r in back.collect()}
    want = {(str(r["k"]), to_wkt(from_wkb(bytes(r["geom"]))))
            for r in src.collect()}
    assert got == want
    # spatial_filter parity through the generic st_read path
    tri = _wkb("POLYGON ((0 0, 400 0, 0 400, 0 0))")
    full = st_read(spark, p)
    from duckdb_spatial_spark.functions import scalar as S
    want_n = full.filter(
        S.st_intersects(F.col("geom"), F.lit(tri))).count()
    assert st_read(spark, p, spatial_filter=tri).count() == want_n
    assert 0 < want_n < 20


def test_gzip_and_layer_filter(spark, tmp_path):
    t = encode_mvt_tile({
        "a": [(1, _wkb("POINT (1 1)"), {})],
        "b": [(2, _wkb("POINT (2 2)"), {}),
              (3, _wkb("POINT (3 3)"), {})],
    })
    p = tmp_path / "z.mvt"
    p.write_bytes(gzip.compress(t))
    df = st_read_mvt(spark, str(p))
    assert df.count() == 3
    assert st_read_mvt(spark, str(p), layer="b").count() == 2
    assert {r["layer"] for r in df.collect()} == {"a", "b"}


def test_georeference_tile():
    # tile (z=1, x=1, y=0): covers lon [0,180], lat [0, ~85]
    ext = 4096
    t = encode_mvt_tile(
        {"p": [(1, _wkb("POINT (0 4096)"), {}),
               (2, _wkb("POINT (2048 2048)"), {})]}, extent=ext)
    rows = decode_mvt(t, tile=(1, 1, 0))
    by_id = {r[1]: from_wkb(r[2]) for r in rows}
    # corner (0, ext) of this tile = (lon 0, lat 0)
    assert by_id[1].coords[0] == pytest.approx(0.0, abs=1e-9)
    assert by_id[1].coords[1] == pytest.approx(0.0, abs=1e-9)
    # center of the tile (lon span [0,180]) = lon 90
    assert by_id[2].coords[0] == pytest.approx(90.0, abs=1e-9)
    want_lat = math.degrees(math.atan(math.sinh(math.pi * 0.5)))
    assert by_id[2].coords[1] == pytest.approx(want_lat, abs=1e-9)


def test_pyramid_directory_scan(spark, tmp_path):
    root = tmp_path / "tiles"
    for z, x, y, n in ((0, 0, 0, 2), (1, 0, 0, 3)):
        d = root / str(z) / str(x)
        d.mkdir(parents=True)
        feats = [(i, _wkb(f"POINT ({i} {i})"), {}) for i in range(n)]
        (d / f"{y}.mvt").write_bytes(encode_mvt_tile({"lyr": feats}))
    df = st_read_mvt(spark, str(root))
    assert df.count() == 5
    assert {r["source_file"].rsplit("/", 3)[-3] for r in df.collect()} \
        == {"0", "1"}


def test_drivers_lists_mvt(spark):
    from duckdb_spatial_spark.sources.read import st_drivers

    row = [r for r in st_drivers(spark).collect()
           if r["short_name"] == "mvt"]
    assert row and row[0]["can_open"] and row[0]["can_create"]


def test_mvt_geometry_roundtrip_fuzz():
    """Random integer-coordinate geometries of every supported type must
    survive encode→decode byte-exactly (WKT equality)."""
    import random

    rng = random.Random(42)

    def rpt():
        return (rng.randint(0, 4000), rng.randint(0, 4000))

    def ring(cx, cy, r, n, cw=True):
        # star-convex integer ring — valid, deterministic winding
        import math as m
        pts = []
        for i in range(n):
            a = 2 * m.pi * i / n
            pts.append((int(cx + r * m.cos(a)), int(cy + r * m.sin(a))))
        if cw:
            pts = pts[::-1]
        return pts + [pts[0]]

    feats = []
    fid = 1
    for _ in range(20):
        kind = rng.choice(["pt", "mpt", "ls", "mls", "pg"])
        if kind == "pt":
            x, y = rpt()
            wkt = f"POINT ({x} {y})"
        elif kind == "mpt":
            pts = {rpt() for _ in range(rng.randint(2, 5))}
            wkt = "MULTIPOINT (" + ", ".join(
                f"{x} {y}" for x, y in sorted(pts)) + ")"
        elif kind == "ls":
            pts = [rpt() for _ in range(rng.randint(2, 6))]
            wkt = "LINESTRING (" + ", ".join(
                f"{x} {y}" for x, y in pts) + ")"
        elif kind == "mls":
            parts = []
            for _ in range(rng.randint(2, 3)):
                pts = [rpt() for _ in range(rng.randint(2, 4))]
                parts.append("(" + ", ".join(
                    f"{x} {y}" for x, y in pts) + ")")
            wkt = "MULTILINESTRING (" + ", ".join(parts) + ")"
        else:
            cx, cy = rng.randint(500, 3500), rng.randint(500, 3500)
            shell = ring(cx, cy, rng.randint(200, 400), 8)
            hole = ring(cx, cy, 50, 6, cw=False)
            wkt = ("POLYGON ((" + ", ".join(
                f"{x} {y}" for x, y in shell) + "), ("
                + ", ".join(f"{x} {y}" for x, y in hole) + "))")
        feats.append((fid, _wkb(wkt), {"w": wkt}))
        fid += 1
    data = encode_mvt_tile({"z": feats})
    back = {r[1]: r for r in decode_mvt(data)}
    assert len(back) == len(feats)
    for fid2, wkb, props in feats:
        got = to_wkt(from_wkb(back[fid2][2]))
        want_wkt = props["w"]
        # polygons may roundtrip with rotated/reversed-but-equivalent
        # rings; compare via area+type there, exact WKT elsewhere
        if want_wkt.startswith("POLYGON"):
            from duckdb_spatial_spark.geom.kernels import area
            assert got.startswith("POLYGON")
            assert abs(area(from_wkb(back[fid2][2]))
                       - area(from_wkt(want_wkt))) < 1e-9
        else:
            assert got == want_wkt, (want_wkt, got)
