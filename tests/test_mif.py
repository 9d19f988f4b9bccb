"""MapInfo Interchange Format (MIF/MID) native source/sink."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.geom.wkb import from_wkb
from duckdb_spatial_spark.geom.wkt import from_wkt, to_wkt
from duckdb_spatial_spark.sources import read, st_write
from duckdb_spatial_spark.sources.mif import (read_mif_pair, st_read_mif,
                                              st_write_mif)

MIF = """VERSION 300
Charset "Neutral"
DELIMITER ","
COLUMNS 3
  name Char(20)
  kind Integer
  score Float
DATA
POINT 1 2
SYMBOL (34,0,12)
PLINE 3
0 0
10 0
10 10
PEN (1,2,0)
REGION 2
5
0 0
4 0
4 4
0 4
0 0
4
1 1
1 2
2 2
2 1
BRUSH (2,16777215,16777215)
NONE
PLINE MULTIPLE 2
2
0 0
1 1
3
5 5
6 7
8 8
"""

MID = """"alpha",7,1.5
"beta",8,2.5
"gamma, inc",9,-3.25
"delta",,
"eps",11,0
"""


def _fixture(tmp_path):
    (tmp_path / "z.mif").write_text(MIF)
    (tmp_path / "z.mid").write_text(MID)
    return str(tmp_path / "z.mif")


def test_local_parse(tmp_path):
    schema, rows = read_mif_pair(_fixture(tmp_path))
    assert [f.name for f in schema.fields] == ["name", "kind", "score", "geom"]
    assert len(rows) == 5
    assert rows[0][:3] == ("alpha", 7, 1.5)
    assert to_wkt(from_wkb(rows[0][3])) == "POINT (1 2)"
    assert to_wkt(from_wkb(rows[1][3])) == "LINESTRING (0 0, 10 0, 10 10)"
    g = from_wkb(rows[2][3])
    assert g.type_name == "POLYGON" and len(g.rings) == 2
    # quoted delimiter inside a Char value survives the quote-aware split
    assert rows[2][:3] == ("gamma, inc", 9, -3.25)
    assert rows[3][:3] == ("delta", None, None)
    assert rows[3][3] is None          # NONE geometry
    assert rows[4][3] is not None
    assert from_wkb(rows[4][3]).type_name == "MULTILINESTRING"


def test_spark_read_and_replacement_scan(spark, tmp_path):
    p = _fixture(tmp_path)
    df = read(spark, p)
    assert df.count() == 5
    got = {r["name"] for r in df.collect()}
    assert "alpha" in got and "beta" in got


def test_roundtrip_write_read(spark, tmp_path):
    from duckdb_spatial_spark.functions import scalar as S

    df = spark.createDataFrame(
        [(1, "a", 1.5, "POINT (3 4)"),
         (2, "b", -2.0, "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"),
         (3, "c", 0.25, "LINESTRING (0 0, 1 1, 2 0)")],
        "k int, nm string, v double, wkt string",
    ).select("k", "nm", "v", S.st_geomfromtext("wkt").alias("geom"))
    out = str(tmp_path / "out.mif")
    st_write(df, out, fmt="mif")
    back = read(spark, out).orderBy("k").collect()
    assert len(back) == 3
    assert back[0]["nm"] == "a"
    assert to_wkt(from_wkb(bytes(back[0]["geom"]))) == "POINT (3 4)"
    g = from_wkb(bytes(back[1]["geom"]))
    assert g.type_name == "POLYGON"
    assert abs(
        __import__("duckdb_spatial_spark.geom.kernels", fromlist=["area"]
                   ).area(g) - 25.0) < 1e-9


def test_mif_udtf_sql(spark, tmp_path):
    from duckdb_spatial_spark.functions import register_sql_functions

    register_sql_functions(spark)
    p = _fixture(tmp_path)
    r = spark.sql(
        f"SELECT count(*) AS n, sum(kind) AS sk FROM ST_Read('{p}')"
    ).collect()[0]
    assert r["n"] == 5 and r["sk"] == 7 + 8 + 9 + 11


def test_mif_gdb_sink_guard_precedes_collect(spark, tmp_path):
    """The single-writer byte guard must run BEFORE any driver-side
    collect: a poison UDF column would throw if the sink ever
    materialized rows, but the guard's one-column aggregate prunes it
    away, so the over-budget frame raises ValueError — not the poison."""
    import pytest
    from pyspark.sql import functions as F

    from duckdb_spatial_spark.sources.gdb import st_write_gdb
    from duckdb_spatial_spark.sources.mif import st_write_mif

    def _boom():
        raise RuntimeError("rows were materialized on the driver")

    poison = F.udf(lambda: _boom(), "string")
    # 3000 rows x ~600 KB of WKB-sized payload ≈ 1.7 GiB estimate — over
    # the 1 GiB guard; the payload is generated executor-side, never
    # collected.
    df = spark.range(3000).select(
        F.col("id").cast("int").alias("k"),
        poison().alias("p"),
        F.encode(F.repeat(F.lit("a"), 600_000), "utf-8").alias("geom"),
    )
    with pytest.raises(ValueError, match="single-writer"):
        st_write_mif(df, str(tmp_path / "big.mif"))
    with pytest.raises(ValueError, match="single-writer"):
        st_write_gdb(df, str(tmp_path / "big.gdb"))
