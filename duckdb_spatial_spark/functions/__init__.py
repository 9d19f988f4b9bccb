"""ST_* function surface.

DataFrame API: ``from duckdb_spatial_spark.functions import st_area, ...``
SQL API: ``register_sql_functions(spark)`` registers the UDF-backed names so
``spark.sql("SELECT ST_Area(geom) ...")`` resolves — the Spark analog of the
reference's catalog registration (core/module.cpp:18-35).

Column-expression fast paths (st_distance_sphere, st_hilbert_xy, bbox
predicates) are the blessed 100-TB path in the DataFrame API; their SQL
registrations fall back to the UDF tier where a pure-Column registration
isn't possible from PySpark.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .agg import (  # noqa: F401
    st_collect_agg,
    st_envelope_agg,
    st_extent_agg,
    st_extent_agg_box,
    st_intersection_agg,
    st_union_agg,
)
from .scalar import *  # noqa: F401,F403
from . import scalar as _scalar
from .casts import (  # noqa: F401
    box2d_to_geom,
    geom_to_linestring2d,
    geom_to_point2d,
    geom_to_polygon2d,
    linestring2d_to_geom,
    point2d_to_geom,
    point3d_to_point2d,
    point4d_to_point2d,
    polygon2d_to_geom,
    st_linestring2dfromwkb,
    st_point2dfromwkb,
    st_polygon2dfromwkb,
)


def register_sql_functions(spark: SparkSession) -> None:
    """Register ST_* for spark.sql. Idempotent."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf
    import pandas as pd
    import math

    S = _scalar
    reg = spark.udf.register
    # UDF-backed (names match the reference's catalog, SURVEY §2)
    reg("ST_Point", S._st_point_udf)
    reg("ST_GeomFromText", S._st_geomfromtext_udf)
    reg("ST_AsText", S._st_astext_udf)
    reg("ST_GeomFromGeoJSON", S._st_geomfromgeojson_udf)
    reg("ST_AsGeoJSON", S._st_asgeojson_udf)
    reg("ST_Area", S._st_area_udf)
    reg("ST_Length", S._st_length_udf)
    reg("ST_Perimeter", S._st_perimeter_udf)
    reg("ST_Centroid", S._st_centroid_udf)
    reg("ST_Distance", S._st_distance_geom_udf)
    reg("ST_Extent", S._st_extent_udf)
    reg("ST_X", S._st_x_udf)
    reg("ST_Y", S._st_y_udf)
    reg("ST_Z", S._st_z_udf)
    reg("ST_M", S._st_m_udf)
    reg("ST_NPoints", S._st_npoints_udf)
    reg("ST_NGeometries", S._st_ngeometries_udf)
    reg("ST_NInteriorRings", S._st_ninteriorrings_udf)
    reg("ST_GeometryType", S._st_geometrytype_udf)
    reg("ST_Dimension", S._st_dimension_udf)
    reg("ST_IsEmpty", S._st_isempty_udf)
    reg("ST_IsClosed", S._st_isclosed_udf)
    reg("ST_HasZ", S._st_haz_udf)
    reg("ST_HasM", S._st_ham_udf)
    reg("ST_ZMFlag", S._st_zmflag_udf)
    reg("ST_ExteriorRing", S._st_exteriorring_udf)
    @pandas_udf(T.BinaryType())
    def _startpoint1(g: pd.Series) -> pd.Series:
        from ..geom.wkb import from_wkb

        return pd.Series(
            [None if b is None else S._pointn_k(from_wkb(b), 1) for b in g],
            dtype=object,
        )

    @pandas_udf(T.BinaryType())
    def _endpoint1(g: pd.Series) -> pd.Series:
        from ..geom.wkb import from_wkb

        return pd.Series(
            [None if b is None else S._pointn_k(from_wkb(b), -1) for b in g],
            dtype=object,
        )

    reg("ST_StartPoint", _startpoint1)
    reg("ST_EndPoint", _endpoint1)

    @pandas_udf(T.BinaryType())
    def _buffer3(g: pd.Series, dist: pd.Series, segs: pd.Series) -> pd.Series:
        from ..geom import kernels as _K
        from ..geom.wkb import from_wkb, to_wkb

        out = []
        for b, d, n in zip(g, dist, segs):
            if b is None or d is None:
                out.append(None)
            else:
                out.append(to_wkb(_K.buffer(from_wkb(b), float(d),
                                            segments=8 if n is None else int(n))))
        return pd.Series(out, dtype=object)

    reg("ST_Buffer", _buffer3)

    @pandas_udf(T.BinaryType())
    def _buffer6(g: pd.Series, dist: pd.Series, segs: pd.Series,
                 join_style: pd.Series, cap_style: pd.Series,
                 mitre_limit: pd.Series) -> pd.Series:
        # the reference's full overload: (geom, distance, num_triangles,
        # join_style, cap_style, mitre_limit) — st_buffer.cpp:134
        from ..geom import kernels as _K
        from ..geom.wkb import from_wkb, to_wkb

        out = []
        for b, d, n, js, cs, ml in zip(g, dist, segs, join_style, cap_style,
                                       mitre_limit):
            if b is None or d is None:
                out.append(None)
                continue
            cap = ("round" if cs is None else str(cs)).lower().replace("cap_", "")
            join = ("round" if js is None else str(js)).lower()
            join = join.replace("join_", "").replace("miter", "mitre")
            out.append(to_wkb(_K.buffer(
                from_wkb(b), float(d), 8 if n is None else int(n), cap, join,
                1.0 if ml is None else float(ml))))
        return pd.Series(out, dtype=object)

    reg("ST_Buffer_Style", _buffer6)

    @pandas_udf(T.BinaryType())
    def _reduceprecision2(g: pd.Series, grid: pd.Series) -> pd.Series:
        from ..geom import kernels as _K
        from ..geom.wkb import from_wkb, to_wkb

        out = []
        for b, gr in zip(g, grid):
            if b is None or gr is None:
                out.append(None)
            else:
                out.append(to_wkb(_K.reduce_precision(from_wkb(b), float(gr))))
        return pd.Series(out, dtype=object)

    reg("ST_ReducePrecision", _reduceprecision2)

    @pandas_udf(T.BinaryType())
    def _linemerge2(g: pd.Series, directed: pd.Series) -> pd.Series:
        from ..geom import kernels as _K
        from ..geom.wkb import from_wkb, to_wkb

        out = []
        for b, d in zip(g, directed):
            if b is None:
                out.append(None)
            else:
                out.append(to_wkb(_K.line_merge(from_wkb(b), directed=bool(d))))
        return pd.Series(out, dtype=object)

    reg("ST_LineMerge2", _linemerge2)
    reg("ST_MakePolygon2", S._st_makepolygon_holes_udf)
    reg("ST_Points", S._st_points_udf)
    reg("ST_Dump", S._st_dump_udf)
    reg("ST_PointN", S._st_pointn_udf)
    reg("ST_Intersects", S._st_intersects_udf)
    reg("ST_Disjoint", S._st_disjoint_udf)
    reg("ST_Contains", S._st_contains_udf)
    reg("ST_ContainsProperly", S._st_containsproperly_udf)
    reg("ST_Within", S._st_within_udf)
    reg("ST_Covers", S._st_covers_udf)
    reg("ST_CoveredBy", S._st_coveredby_udf)
    reg("ST_Crosses", S._st_crosses_udf)
    reg("ST_Touches", S._st_touches_udf)
    reg("ST_Overlaps", S._st_overlaps_udf)
    reg("ST_Equals", S._st_equals_udf)
    reg("ST_DWithin", S._st_dwithin_udf)
    reg("ST_IsValid", S._st_isvalid_udf)
    reg("ST_IsSimple", S._st_issimple_udf)
    reg("ST_IsRing", S._st_isring_udf)
    reg("ST_ConvexHull", S._st_convexhull_udf)
    reg("ST_Boundary", S._st_boundary_udf)
    reg("ST_Envelope", S._st_envelope_udf)
    reg("ST_PointOnSurface", S._st_pointonsurface_udf)
    reg("ST_MakeValid", S._st_makevalid_udf)
    reg("ST_Normalize", S._st_normalize_udf)
    reg("ST_Reverse", S._st_reverse_udf)
    reg("ST_FlipCoordinates", S._st_flipcoordinates_udf)
    reg("ST_LineMerge", S._st_linemerge_udf)
    reg("ST_Force2D", S._st_force2d_udf)
    reg("ST_ShortestLine", S._st_shortestline_udf)
    reg("ST_Intersection", S._st_intersection_udf)
    reg("ST_Union", S._st_union_udf)
    reg("ST_Difference", S._st_difference_udf)
    reg("ST_MakeLine", S._st_makeline_list_udf)
    reg("ST_MakePolygon", S._st_makepolygon_udf)
    reg("ST_Collect", S._st_collect_udf)
    reg("ST_Multi", S._st_multi_udf)
    reg("ST_Distance_Spheroid", S._st_distance_spheroid_udf)
    reg("ST_ZMin", S._st_zmin_udf)
    reg("ST_ZMax", S._st_zmax_udf)
    reg("ST_MMin", S._st_mmin_udf)
    reg("ST_MMax", S._st_mmax_udf)
    @pandas_udf(T.StringType())
    def _assvg3(g: pd.Series, rel: pd.Series, digits: pd.Series) -> pd.Series:
        from ..geom.wkb import from_wkb

        out = []
        for b, r, d in zip(g, rel, digits):
            if b is None:
                out.append(None)
            else:
                out.append(S._assvg_kernel(from_wkb(b), bool(r), int(d)))
        return pd.Series(out, dtype=object)

    reg("ST_AsSVG", _assvg3)

    @pandas_udf(T.StringType())
    def _ashexwkb(g: pd.Series) -> pd.Series:
        return pd.Series(
            [None if b is None else bytes(b).hex().upper() for b in g],
            dtype=object,
        )

    reg("ST_AsHEXWKB", _ashexwkb)

    @pandas_udf(T.BinaryType())
    def _fromhexwkb(s: pd.Series) -> pd.Series:
        # EWKB flag bits (Z/M/SRID) are handled inside the WKB codec
        return pd.Series(
            [None if h is None else bytes.fromhex(h) for h in s], dtype=object
        )

    reg("ST_GeomFromHEXWKB", _fromhexwkb)
    reg("ST_GeomFromHEXEWKB", _fromhexwkb)

    @pandas_udf(T.BinaryType())
    def _wkb_identity(g: pd.Series) -> pd.Series:
        return g

    reg("ST_AsWKB", _wkb_identity)
    reg("ST_GeomFromWKB", _wkb_identity)

    # SQL variants of the col-expr fast paths (UDF fallback for spark.sql)
    @pandas_udf(T.DoubleType())
    def _sphere_xy(x1: pd.Series, y1: pd.Series, x2: pd.Series, y2: pd.Series) -> pd.Series:
        from ..geom.kernels import haversine

        out = []
        for a, b, c, d in zip(x1, y1, x2, y2):
            out.append(None if any(v is None for v in (a, b, c, d)) else haversine(a, b, c, d))
        return pd.Series(out)

    # extension name: raw-coordinate haversine (no geometry construction)
    reg("ST_Haversine_XY", _sphere_xy)

    @pandas_udf(T.DoubleType())
    def _sphere_geom(a: pd.Series, b: pd.Series) -> pd.Series:
        # reference signature: (GEOMETRY point, GEOMETRY point) — the
        # coordinates are treated as lon/lat (st_distance_sphere.cpp:100-103)
        from ..geom.kernels import haversine
        from ..geom.wkb import from_wkb

        out = []
        for ga, gb in zip(a, b):
            if ga is None or gb is None:
                out.append(None)
                continue
            p, q = from_wkb(ga), from_wkb(gb)
            if p.type_id != 1 or q.type_id != 1 or p.is_empty() or q.is_empty():
                out.append(None)
                continue
            out.append(haversine(float(p.coords[0]), float(p.coords[1]),
                                 float(q.coords[0]), float(q.coords[1])))
        return pd.Series(out)

    reg("ST_Distance_Sphere", _sphere_geom)
    reg("ST_Haversine", _sphere_geom)

    @pandas_udf(T.BinaryType())
    def _collectionextract2(g: pd.Series, dim: pd.Series) -> pd.Series:
        from ..geom import kernels as _K
        from ..geom.wkb import from_wkb, to_wkb

        out = []
        for b, d in zip(g, dim):
            if b is None:
                out.append(None)
            else:
                out.append(to_wkb(_K.collection_extract(
                    from_wkb(b), None if d is None or int(d) == 0 else int(d))))
        return pd.Series(out, dtype=object)

    # SQL calling convention: dim 0/NULL = highest dimension present (the
    # reference's 1-arg overload; Spark SQL UDFs cannot overload by arity)
    reg("ST_CollectionExtract", _collectionextract2)

    @pandas_udf(T.BinaryType())
    def _envelope4(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        from ..geom.core import Geometry
        from ..geom.wkb import to_wkb

        out = []
        for vals in zip(a, b, c, d):
            if any(v is None for v in vals):
                out.append(None)
            else:
                out.append(to_wkb(Geometry.box_polygon(*[float(v) for v in vals])))
        return pd.Series(out, dtype=object)

    reg("ST_MakeEnvelope", _envelope4)

    @pandas_udf(T.LongType())
    def _hilbert(x: pd.Series, y: pd.Series) -> pd.Series:
        import numpy as np

        from .scalar import hilbert_xy_py

        out = []
        for a, b in zip(x, y):
            if a is None or b is None:
                out.append(None)
            else:
                out.append(hilbert_xy_py(16, int(a), int(b)))
        return pd.Series(out)

    reg("ST_HilbertInt", _hilbert)
