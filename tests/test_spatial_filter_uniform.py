"""spatial_filter (WKB) parity across every native format reader.

The reference applies its spatial_filter option inside ST_Read for every
OGR driver uniformly (st_read.cpp:188-207: bbox prefilter from the
filter's bounds + exact intersection). Our st_read applies it at the
dispatch level — bbox-bounded recursion + exact st_intersects
post-filter — so the guarantee must hold for EVERY format: reading with
spatial_filter returns exactly the rows of a full read post-filtered
with the exact predicate.

The filter geometry is a non-rectangular triangle so the exact predicate
does real work beyond the bbox prefilter (points inside the bbox but
outside the triangle must be dropped).
"""

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.functions import scalar as S
from duckdb_spatial_spark.geom.wkt import from_wkt
from duckdb_spatial_spark.geom.wkb import to_wkb
from duckdb_spatial_spark.sources.read import st_read, st_write

# triangle covering the lower-left half of the [0,8]x[0,8] square:
# bbox = the full square, so bbox-only filtering would keep everything
TRI = "POLYGON ((0 0, 8 0, 0 8, 0 0))"
TRI_WKB = bytes(to_wkb(from_wkt(TRI)))

FORMATS = [
    "parquet", "geoparquet", "csv", "geojson", "shp", "gpkg", "fgb",
    "kml", "mif", "tab", "gdb", "arrow", "spatialite", "gpx", "mvt",
]


def _src(spark):
    # 9x9 grid of points over [0,8]^2: 45 on/under the anti-diagonal
    # (triangle keeps boundary contact), 36 outside the triangle but
    # inside its bbox
    return spark.range(81).select(
        F.col("id").cast("long").alias("k"),
        ST.st_point((F.col("id") % 9).cast("double"),
                    F.floor(F.col("id") / 9).cast("double")).alias("geom"),
    )


def _xy_set(df, geom_col="geom"):
    return {
        (round(r["x"], 6), round(r["y"], 6))
        for r in df.select(
            S.st_x(geom_col).alias("x"), S.st_y(geom_col).alias("y")
        ).collect()
    }


@pytest.mark.parametrize("fmt", FORMATS)
def test_spatial_filter_rows_parity(spark, tmp_path, fmt):
    src = _src(spark)
    ext = {"parquet": "parquet", "geoparquet": "gpq",
           "spatialite": "sqlite"}.get(fmt, fmt)
    path = str(tmp_path / f"ds_{fmt}.{ext}")
    if fmt == "geoparquet":
        from duckdb_spatial_spark.sources.geoparquet import \
            st_write_geoparquet

        st_write_geoparquet(src, path, geom_col="geom", covering=True)
    elif fmt == "gpx":
        from duckdb_spatial_spark.sources.gpx import st_write_gpx

        st_write_gpx(src, path, geom_col="geom")
    else:
        st_write(src, path, fmt=fmt, geom_col="geom")

    full = st_read(spark, path)
    geom_col = "geom" if "geom" in full.columns else full.columns[-1]
    want = _xy_set(
        full.filter(S.st_intersects(F.col(geom_col), F.lit(TRI_WKB))),
        geom_col)
    got = _xy_set(st_read(spark, path, spatial_filter=TRI_WKB), geom_col)
    assert got == want, (fmt, len(got), len(want))
    # the exact predicate did real work: the bbox kept all 81 points
    assert len(_xy_set(full, geom_col)) == 81
    assert len(want) == 45
