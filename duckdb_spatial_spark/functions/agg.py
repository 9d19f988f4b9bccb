"""Spatial aggregates (SURVEY §2.I).

* ``st_extent_agg`` — pure built-in min/max over bbox fields → envelope
  GEOMETRY. Decomposable (partial+final come free from Spark's hash agg),
  streaming/watermark-safe. Mirrors st_extent_agg.cpp:26-95 where Combine
  min/maxes two states.
* ``st_union_agg`` / ``st_intersection_agg`` — two-level applyInPandas:
  per-partition partial reduce, then final reduce — the same partial/final
  shape as geos/functions/aggregate.cpp:107-176. v1 kernels support the
  disjoint/contained union tier (full cascaded overlay is round-2).
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..geom import kernels as K
from ..geom.wkb import from_wkb, to_wkb
from .scalar import ColumnOrName, _col, st_extent, st_makeenvelope


def st_extent_agg(geom: ColumnOrName) -> Column:
    """Aggregate bbox union → GEOMETRY envelope. All-JVM until the final
    4-double → WKB projection."""
    box = st_extent(geom)
    return st_makeenvelope(
        F.min(box["xmin"]), F.min(box["ymin"]), F.max(box["xmax"]), F.max(box["ymax"])
    )


def st_extent_agg_box(box: ColumnOrName) -> Column:
    """Same, over a pre-materialized BOX_2D column — zero Python in the agg."""
    b = _col(box)
    return F.struct(
        F.min(b["xmin"]).alias("xmin"),
        F.min(b["ymin"]).alias("ymin"),
        F.max(b["xmax"]).alias("xmax"),
        F.max(b["ymax"]).alias("ymax"),
    )


st_envelope_agg = st_extent_agg


def _reduce_wkbs(wkbs: List[Optional[bytes]], op) -> Optional[bytes]:
    geoms = [from_wkb(b) for b in wkbs if b is not None]
    if not geoms:
        return None
    return to_wkb(reduce(op, geoms))


def _two_level_agg(df: DataFrame, geom_col: str, group_cols: List[str], op, out_col: str) -> DataFrame:
    """Partial reduce per shuffle partition, final reduce per group — the
    Spark shape of DuckDB's Operation/Combine/Finalize aggregate protocol."""
    spark_cols = group_cols + [geom_col]
    src = df.select(*spark_cols)

    partial_schema = T.StructType(
        [src.schema[c] for c in group_cols] + [T.StructField(out_col, T.BinaryType())]
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        agg = pdf.groupby(group_cols, dropna=False)[geom_col].agg(
            lambda s: _reduce_wkbs(list(s), op)
        )
        return agg.reset_index().rename(columns={geom_col: out_col})

    if group_cols:
        # partial on the NATURAL partitioning (map-side combine: ≤1 row per
        # group per input partition crosses the wire), then ONE shuffle to
        # the final per-group reduce — the Operation/Combine/Finalize shape
        # with the minimum shuffle count. (A pre-repartition by key here
        # would shuffle the full geometry payload a second time.)
        part = src.mapInPandas(
            lambda it: (partial(pdf) for pdf in it if len(pdf)), schema=partial_schema
        )
        final_schema = partial_schema

        def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
            merged = _reduce_wkbs(list(pdf[out_col]), op)
            row = {c: [pdf[c].iloc[0]] for c in group_cols}
            row[out_col] = [merged]
            return pd.DataFrame(row)

        return part.groupBy(*group_cols).applyInPandas(final, schema=final_schema)
    # global aggregate
    part = src.mapInPandas(
        lambda it: (
            pd.DataFrame({out_col: [_reduce_wkbs(list(pdf[geom_col]), op)]})
            for pdf in it
            if len(pdf)
        ),
        schema=T.StructType([T.StructField(out_col, T.BinaryType())]),
    )

    def final_global(it):
        rows = []
        for pdf in it:
            rows.extend(list(pdf[out_col]))
        yield pd.DataFrame({out_col: [_reduce_wkbs(rows, op)]})

    # repartition(1), not coalesce(1): coalescing python-stage output makes
    # the single final task pay one serial python round-trip per parent
    # partition; a tiny single-slice shuffle is far cheaper.
    return part.repartition(1).mapInPandas(
        final_global, schema=T.StructType([T.StructField(out_col, T.BinaryType())])
    )


def st_union_agg(df: DataFrame, geom_col: str, group_cols: Optional[List[str]] = None,
                 out_col: str = "union_geom") -> DataFrame:
    """n-ary geometric union per group (geos/functions/aggregate.cpp:214-221)."""
    return _two_level_agg(df, geom_col, group_cols or [], K.union, out_col)


def st_intersection_agg(df: DataFrame, geom_col: str, group_cols: Optional[List[str]] = None,
                        out_col: str = "intersection_geom") -> DataFrame:
    """n-ary intersection per group (geos/functions/aggregate.cpp:205-212)."""
    return _two_level_agg(df, geom_col, group_cols or [], K.intersection, out_col)


@pandas_udf(T.BinaryType())
def _st_collect_agg_udf(s: pd.Series) -> bytes:
    from ..geom.core import collect as collect_k

    geoms = [from_wkb(b) for b in s if b is not None]
    return to_wkb(collect_k(geoms))


def st_collect_agg(geom: ColumnOrName) -> Column:
    """Aggregate form of ST_Collect: group's geometries → one MULTI*/
    GEOMETRYCOLLECTION. (Grouped pandas UDF — entire group must fit in one
    Arrow batch; use for small groups.)"""
    return _st_collect_agg_udf(_col(geom))


def st_centroid_agg(geom: ColumnOrName) -> Column:
    """Fused ST_Centroid(ST_Collect_Agg(points)): a MultiPoint centroid is
    the arithmetic mean of its members (geos st_centroid semantics,
    geos/functions/scalar.cpp), so for POINT inputs the aggregate
    decomposes into two plain double averages — the 100-TB plan: map-side
    partial avgs, no geometry payload through the shuffle, and when the
    input is a fused ``st_point(x, y)`` the whole aggregate is pure
    whole-stage-codegen (zero Python). Returns struct{x, y}. Non-point
    inputs need the general ``st_collect_agg`` → ``st_centroid`` path
    (measure-weighted centroids don't decompose into coordinate means)."""
    from . import scalar as S

    return F.struct(F.avg(S.st_x(geom)).alias("x"),
                    F.avg(S.st_y(geom)).alias("y"))
