"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` — one entry per implemented operator family from SURVEY.md §2
(+ the training-data pipeline mandate); each callable (spark, sf_dir) →
DataFrame. ``oracle_sql()`` — equivalent ANSI SQL for vanilla DuckDB (the
spatial extension is not loadable offline, so every spatial query derives
its geometry from the numeric testdata columns and the oracle reproduces
the semantics arithmetically — exact same rounding, same aliases).

Column-name convention: every computed column is aliased identically in the
Spark plan and the oracle SQL (driver sorts columns by name before value-
hashing).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.operators import (
    ann_bruteforce_topk,
    exact_dedup,
    minhash_signature,
    minhash_table,
    ngram_jaccard_join,
    simhash,
    st_join,
    st_join_points,
    textops,
)
from duckdb_spatial_spark.operators.similarity import cosine_similarity
from duckdb_spatial_spark.sources import st_generatepoints
from duckdb_spatial_spark.sources.tables import load_table, read_layout


# --------------------------------------------------------------- helpers


def _probe_pairs(df: DataFrame, key: str, col: str) -> list:
    """Bounded model-probe collect, sorted DRIVER-side (trap 15 applied
    to probes — an ``orderBy`` before a tiny collect plans a global sort
    whose range-bounds SAMPLING job re-runs the probe subtree). Returns
    ``(key, col)`` pairs in ``key`` order so one probe job can feed both
    a driver-side model (centroids/codebooks) and an inlined
    LocalRelation of the query rows."""
    rows = df.select(key, col).collect()
    rows.sort(key=lambda r: r[0])
    return [(r[0], r[1]) for r in rows]


def _probe_sorted(df: DataFrame, key: str, col: str) -> list:
    """Bounded model-probe collect (centroids/codebook rows), sorted
    DRIVER-side: an ``orderBy`` before a tiny collect plans a global
    sort whose range-bounds SAMPLING job re-runs the probe subtree —
    2 jobs for <=32 rows (trap 15 applied to probes). Returns the
    ``col`` values in ``key`` order."""
    return [v for _, v in _probe_pairs(df, key, col)]


def _local_queries(spark: SparkSession, emb: DataFrame, pairs: list,
                   n: int) -> DataFrame:
    """Inline the bounded ANN query set (ids < ``n`` from an already-
    collected probe) as a TRUE LocalRelation with the corpus frame's
    EXACT types (query_id keeps vec_id's type; query_vec keeps
    array<float>, so the float32 roundtrip is bit-exact and every
    downstream cosine sees identical inputs). Each ANN branch previously
    broadcast the query subtree separately, and each derived-frame
    broadcast build is its own job that re-scans the corpus (trap 13);
    ``createDataFrame`` would instead parallelize into a 32-partition
    RDD scan whose broadcast build is a 32-task Python job — a
    LocalRelation build side collects with no job and no scan."""
    from pyspark.sql import types as T

    from duckdb_spatial_spark.sources.tables import local_relation

    return local_relation(
        spark,
        [(k, v) for k, v in pairs if k < n],
        T.StructType([
            T.StructField("query_id", emb.schema["vec_id"].dataType),
            T.StructField("query_vec", emb.schema["embedding"].dataType),
        ]))


def _ssort(df: DataFrame, *cols) -> DataFrame:
    """Presentation sort for a SMALL (bounded-by-construction) result:
    one-partition exchange + in-partition sort. A trailing global
    orderBy plans a RangePartitioning whose bounds-SAMPLING job
    re-executes everything after the last exchange (measured 2.0x on
    q122, whose whole 600k-row window sat between the exchange and the
    sort); for results bounded to tens/hundreds of rows the
    single-partition sort is strictly cheaper and scale-safe."""
    return df.repartition(1).sortWithinPartitions(*cols)


import contextlib as _contextlib


@_contextlib.contextmanager
def _stream_single_pass(spark: SparkSession):
    """Disable NO-DATA micro-batches for one availableNow streaming
    drain. The engine fires an empty trailing batch to advance the
    watermark — needed only when the SINK contents depend on it
    (append-mode aggregations flush windows then; event-time timeouts
    fire then). For an inner stream-stream join (output emitted in the
    data batch; the watermark only EVICTS state a terminating query
    discards anyway) and for update-mode monotone-state operators (the
    last DATA update per key already carries the final values), the
    empty batch is pure fixed cost: one extra round of planning + a
    state-store commit per store instance (measured 1.27 s of trigger
    time for q91's empty batch, 0.72 s for q81's). Scoped set-and-
    restore; the conf is read live per batch, so it must stay set until
    the query terminates — call inside the ``with``, drain inside the
    ``with``. NEVER use for append-mode aggregations."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


@_contextlib.contextmanager
def _stream_state_partitions(spark: SparkSession, batch_df: DataFrame):
    """Scoped shuffle-partition count for a streaming query, derived
    from the INPUT-size estimate (the `_adaptive_partitions` yardstick
    applied to state layout; guide §2.2 "fewer, larger partitions").
    Each state partition instantiates one state-store provider per
    stateful operator and pays a per-batch commit; a stream whose
    batches are KBs spreads that fixed cost over near-empty stores
    (measured: q75 0.94 s of state commit across 8 stores holding 150
    rows total). Clamped to [1, defaultParallelism]: a 100-TB stream
    still fans out to every core — scale-adaptive, not a local tune.
    The count is pinned into the query's offset log at batch 0, so the
    conf can be restored after ``start()`` returns a running query —
    but keeping the scope until termination is the simple, safe shape.

    Use ONLY where the per-batch stateful work is bounded by operator
    parameters or map-side partials (windowed min/max partials, a
    pool-bounded re-rank): a row-bound Python state stage (per-user
    funnel merges) needs the ambient data-parallel fan-out even when
    the byte estimate is small (measured 2.4x slower at 1 partition on
    q153)."""
    from duckdb_spatial_spark.operators.invindex import _adaptive_partitions

    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(_adaptive_partitions(batch_df)))
    try:
        yield
    finally:
        spark.conf.set(key, old)

def _events_pts(spark: SparkSession, sf: str, fan_out: bool = True) -> DataFrame:
    """Point substrate from events: x = value ∈ (0, ~490), y = user_id.
    ``fan_out=False`` for pure col-expr consumers (no Python stage)."""
    return (
        load_table(spark, sf, "events", fan_out=fan_out)
        .select(
            "event_id",
            "event_type",
            F.col("value").alias("x"),
            F.col("user_id").cast("double").alias("y"),
        )
    )


_EVENTS_PTS_SQL = (
    "SELECT event_id, event_type, value AS x, CAST(user_id AS DOUBLE) AS y FROM events"
)

ENV = (100.0, 30.0, 300.0, 90.0)  # query envelope for envelope workloads


def _zone_rows():
    """5×3 tiling of (0,500)×(0,150) in 100×50 cells (taxi-zones analog)."""
    rows = []
    for i in range(5):
        for j in range(3):
            x0, y0 = i * 100.0, j * 50.0
            wkt = (
                f"POLYGON (({x0} {y0}, {x0+100} {y0}, {x0+100} {y0+50}, "
                f"{x0} {y0+50}, {x0} {y0}))"
            )
            rows.append((i * 3 + j, wkt))
    return rows


# --------------------------------------------------------------- queries

def q01_point_in_envelope(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Within(point, constant envelope) — the rtree benchmark workload
    shape (BASELINE #1/#2), via the bbox col-expr fast path."""
    pts = _events_pts(spark, sf, fan_out=False)
    xmin, ymin, xmax, ymax = ENV
    inside = ST.st_point_in_box("x", "y", xmin, ymin, xmax, ymax, strict=True)
    return pts.filter(inside).agg(F.count("*").alias("n"))


def q02_zone_pip_join(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-polygon spatial join (docs/example.md:92-100 workload) via
    the grid-partitioned equi-join; per-zone counts."""
    pts = _events_pts(spark, sf)
    # 15-row LITERAL dim table: parse the WKT driver-side and hand Spark a
    # LocalRelation of ready WKB — the broadcast build side of the join is
    # collected on the driver anyway, so an executor round-trip (parallelize
    # + repartition + pandas-UDF parse = 3 jobs/run) would be pure overhead.
    import pandas as _pd

    from duckdb_spatial_spark.geom.wkb import to_wkb as _to_wkb
    from duckdb_spatial_spark.geom.wkt import from_wkt as _from_wkt

    zones = spark.createDataFrame(
        _pd.DataFrame(
            [(zid, _to_wkb(_from_wkt(w))) for zid, w in _zone_rows()],
            columns=["zone_id", "zone"],
        ),
        "zone_id long, zone binary",
    )
    # POINT_2D-tier probe: no WKB built on the 100k-row side, one python
    # stage (st_join_points), build side broadcast
    j = st_join_points(pts, zones, "within", "x", "y", "zone")
    return (
        j.groupBy("zone_id").agg(F.count("*").alias("n")).transform(_ssort, "zone_id")
    )


def q03_distance_sphere(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Distance_Sphere (haversine col-expr) over lineitem-derived
    lon/lat pairs, avg per returnflag."""
    li = load_table(spark, sf, "lineitem", fan_out=False)
    d = ST.st_distance_sphere(
        F.col("l_discount") * 100, F.col("l_tax") * 100,
        F.col("l_quantity") * 3, F.col("l_linenumber") * 10,
    )
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.avg(d), 3).alias("avg_dist_m"), F.count("*").alias("n"))
        .transform(_ssort, "l_returnflag")
    )


def q04_extent_agg(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Extent_Agg decomposable min/max bbox per event_type."""
    pts = _events_pts(spark, sf, fan_out=False)
    return (
        pts.groupBy("event_type")
        .agg(
            F.min("x").alias("xmin"),
            F.min("y").alias("ymin"),
            F.max("x").alias("xmax"),
            F.max("y").alias("ymax"),
            F.count("*").alias("n"),
        )
        .transform(_ssort, "event_type")
    )


def q05_centroid_collect(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Collect_Agg + ST_Centroid per nation over customer points."""
    cust = load_table(spark, sf, "customer").select(
        "c_nationkey",
        F.col("c_acctbal").alias("x"),
        (F.col("c_custkey") % 1000).cast("double").alias("y"),
    )
    # fused decomposable centroid: st_centroid_agg over a fused st_point is
    # two plain double averages — pure codegen, no geometry in the shuffle
    # (st_collect_agg → st_centroid stays the general-geometry path; its
    # applyInPandas family is exercised by q28/q63)
    cent = cust.groupBy("c_nationkey").agg(
        ST.st_centroid_agg(ST.st_point("x", "y")).alias("c"))
    return (
        cent.select(
            "c_nationkey",
            F.round(F.col("c.x"), 6).alias("cx"),
            F.round(F.col("c.y"), 6).alias("cy"),
        )
        .transform(_ssort, "c_nationkey")
    )


def q06_convexhull_area(spark: SparkSession, sf: str) -> DataFrame:
    """Convex hull area of customer points per market segment. Oracle: a
    pair (a,b) is a CCW hull edge iff no point lies strictly right of the
    directed line a->b (and no collinear point lies strictly between, so
    collinear boundary chains telescope); shoelace over directed hull edges
    needs no ordering: sum(ax*by - bx*ay)/2. Bounded to c_custkey < 240 to
    keep the O(n^3) SQL oracle cheap."""
    cust = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") < 240)
        .select(
            "c_mktsegment",
            F.col("c_acctbal").alias("x"),
            (F.col("c_custkey") % 1000).cast("double").alias("y"),
        )
    )
    import pandas as pd

    def hull_area(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        from duckdb_spatial_spark.geom import kernels as K

        P = np.column_stack(
            [pdf["x"].to_numpy(np.float64), pdf["y"].to_numpy(np.float64)]
        )
        a = K.area(K.convex_hull_xy(P))
        return pd.DataFrame(
            {"c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
             "hull_area": [round(a, 4)]}
        )

    # monotone chain per segment in ONE applyInPandas stage — no collect_agg
    # single-blob row (per-group skew at scale) and no scalar-UDF second stage
    return (
        cust.groupBy("c_mktsegment")
        .applyInPandas(hull_area, "c_mktsegment string, hull_area double")
        .transform(_ssort, "c_mktsegment")
    )


def q07_wkt_area(spark: SparkSession, sf: str) -> DataFrame:
    """WKT parse → ST_Area over part-derived square polygons."""
    part = load_table(spark, sf, "part")
    wkt = F.concat(
        F.lit("POLYGON ((0 0, "), F.col("p_size").cast("string"), F.lit(" 0, "),
        F.col("p_size").cast("string"), F.lit(" "), F.col("p_size").cast("string"),
        F.lit(", 0 "), F.col("p_size").cast("string"), F.lit(", 0 0))"),
    )
    g = ST.st_geomfromtext(wkt)
    return (
        part.groupBy("p_brand")
        .agg(F.round(F.sum(ST.st_area(g)), 2).alias("area_sum"), F.count("*").alias("n"))
        .transform(_ssort, "p_brand")
    )


def q08_buffer_area(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Buffer(point, 5, 8 quad segments) → 32-gon; avg area per type
    (analytic oracle: 0.5·32·r²·sin(2π/32))."""
    pts = _events_pts(spark, sf).withColumn("pt", ST.st_point("x", "y"))
    area = ST.st_area(ST.st_buffer("pt", 5.0, segments=8))
    return (
        pts.groupBy("event_type")
        .agg(F.round(F.avg(area), 6).alias("avg_buf_area"), F.count("*").alias("n"))
        .transform(_ssort, "event_type")
    )


def q09_hilbert_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Hilbert col-expr: bucket events points by hilbert>>shift, count
    buckets (layout cornerstone). Oracle: with order=16, hilbert>>24 keeps
    the top 8 bits = the curve position at level 4, which bijects to the
    16x16 grid cell (xi>>12, yi>>12) — so bucket-count invariants
    (n_buckets / total / max_bucket) are SQL-expressible without
    implementing the curve in SQL."""
    pts = _events_pts(spark, sf, fan_out=False)
    h = ST.st_hilbert_xy("x", "y", 0.0, 0.0, 500.0, 150.0, order=16)
    b = F.shiftright(h, 24).alias("bucket")
    return (
        pts.select(b)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n").alias("total"),
            F.max("n").alias("max_bucket"),
        )
    )


def q10_quadkey(spark: SparkSession, sf: str) -> DataFrame:
    """ST_QuadKey col-expr at level 3 over events-derived lon/lat."""
    pts = _events_pts(spark, sf, fan_out=False)
    lon = F.col("x") * 0.7 - 170.0
    lat = F.col("y") * 0.8 - 59.6
    qk = ST.st_quadkey_xy(lon, lat, 3)
    return (
        pts.select(qk.alias("quadkey"))
        .groupBy("quadkey")
        .agg(F.count("*").alias("n"))
        .transform(_ssort, "quadkey")
    )


def q11_geometrytype(spark: SparkSession, sf: str) -> DataFrame:
    """Mixed WKT construction + ST_GeometryType dispatch."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    wkt = (
        F.when(F.col("p_partkey") % 3 == 0, F.concat(F.lit("POINT ("), s, F.lit(" "), s, F.lit(")")))
        .when(F.col("p_partkey") % 3 == 1, F.concat(F.lit("LINESTRING (0 0, "), s, F.lit(" "), s, F.lit(")")))
        .otherwise(F.concat(
            F.lit("POLYGON ((0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s, F.lit(", 0 0))")
        ))
    )
    t = ST.st_geometrytype(ST.st_geomfromtext(wkt))
    return part.select(t.alias("gtype")).groupBy("gtype").agg(
        F.count("*").alias("n")
    ).transform(_ssort, "gtype")


def q12_npoints(spark: SparkSession, sf: str) -> DataFrame:
    """ST_NPoints over the same mixed geometries."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    wkt = (
        F.when(F.col("p_partkey") % 3 == 0, F.concat(F.lit("POINT ("), s, F.lit(" "), s, F.lit(")")))
        .when(F.col("p_partkey") % 3 == 1, F.concat(F.lit("LINESTRING (0 0, "), s, F.lit(" "), s, F.lit(")")))
        .otherwise(F.concat(
            F.lit("POLYGON ((0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s, F.lit(", 0 0))")
        ))
    )
    n = ST.st_npoints(ST.st_geomfromtext(wkt))
    return part.agg(F.sum(n).alias("npoints_sum"), F.count("*").alias("n"))


def q13_length(spark: SparkSession, sf: str) -> DataFrame:
    """ST_MakeLine + ST_Length over lineitem-derived segments."""
    li = load_table(spark, sf, "lineitem", fan_out=False)
    a = ST.st_point(F.col("l_discount") * 100, F.col("l_tax") * 100)
    b = ST.st_point(F.col("l_quantity"), F.col("l_linenumber").cast("double"))
    ln = ST.st_length(ST.st_makeline(a, b))
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.sum(ln), 2).alias("len_sum"))
        .transform(_ssort, "l_returnflag")
    )


def q14_envelope_area(spark: SparkSession, sf: str) -> DataFrame:
    """ST_MakeEnvelope + ST_Area/ST_Perimeter over orders-derived boxes."""
    o = load_table(spark, sf, "orders", fan_out=False)
    w = (F.col("o_orderkey") % 50).cast("double") + 1.0
    h = (F.col("o_custkey") % 30).cast("double") + 1.0
    env = ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), w, h)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(ST.st_area(env)), 2).alias("area_sum"),
            F.round(F.sum(ST.st_perimeter(env)), 2).alias("perim_sum"),
        )
        .transform(_ssort, "o_orderstatus")
    )


def q15_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the relational substrate (SURVEY §2.J)."""
    li = load_table(spark, sf, "lineitem", fan_out=False)
    f = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    return (
        f.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .transform(_ssort, "l_returnflag", "l_linestatus")
    )


def q16_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """3-way join + agg (orders ⋈ customer ⋈ nation), broadcast dims."""
    o = load_table(spark, sf, "orders", fan_out=False)
    c = load_table(spark, sf, "customer", fan_out=False)
    n = load_table(spark, sf, "nation", fan_out=False)
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    )
    return (
        j.groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
        .limit(10)
    )


def q17_window_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Window top-k: top-3 orders per customer, then global stats."""
    o = load_table(spark, sf, "orders", fan_out=False)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    top = o.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    return top.agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("top3_sum"),
    )


def q18_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup on documents.text (keep min doc_id), counts per lang."""
    d = load_table(spark, sf, "documents", fan_out=False)
    kept = exact_dedup(d, ["text"], "doc_id")
    return kept.groupBy("lang").agg(F.count("*").alias("n")).transform(_ssort, "lang")


def q19_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash signature (seed-0 and seed-1 of the md5 family over 4-gram
    shingles) for doc_id < 50 — byte-for-byte reproducible in SQL."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 50)
    sig = minhash_table(d, "doc_id", "text", num_hashes=2, k=4, hash_fn="md5")
    return sig.select("doc_id", "mh0", "mh1").transform(_ssort, "doc_id")


def q20_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash (16-bit md5-parity) fingerprints: distribution stats.
    The per-token decode is ONE md5+translate+conv (integer bit ops after) —
    the round-2 form expanded 16 ascii(substring(...)) branches per token
    and its codegen drifted 1.3→7.9 s across attempts under JVM
    code-cache pressure; the small tree is stable at ~0.7 s."""
    d = load_table(spark, sf, "documents")
    s = simhash(F.col("text"), bits=16)
    return d.select(s.alias("sh")).agg(
        F.count("*").alias("n"),
        F.countDistinct("sh").alias("n_distinct"),
        F.sum("sh").alias("sh_sum"),
    )


def q21_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Token count / punct ratio / stopword ratio per lang (col-expr)."""
    d = load_table(spark, sf, "documents", fan_out=False)
    return (
        d.groupBy("lang")
        .agg(
            F.sum(textops.token_count(F.col("text"))).alias("tokens"),
            F.round(F.avg(textops.punct_ratio(F.col("text"))), 6).alias("avg_punct"),
            F.round(F.avg(textops.stopword_ratio(F.col("text"))), 6).alias("avg_stop"),
            F.count("*").alias("n"),
        )
        .transform(_ssort, "lang")
    )


def q22_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Normalized-text md5 fingerprints: distinct count (dedup key check)."""
    d = load_table(spark, sf, "documents", fan_out=False)
    return d.agg(
        F.countDistinct(textops.fingerprint_md5(F.col("text"))).alias("n_fp"),
        F.count("*").alias("n"),
    )


def q23_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language-ID guess counts (marker stopword argmax)."""
    d = load_table(spark, sf, "documents", fan_out=True)
    return (
        d.select(textops.language_id(F.col("text")).alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count("*").alias("n"))
        .transform(_ssort, "lang_guess")
    )


def q24_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 3 vectors (ANN baseline)."""
    emb = load_table(spark, sf, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    out = ann_bruteforce_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id",
        (F.round("cosine", 4) + F.lit(0.0)).alias("cos4"), "rank"
    ).transform(_ssort, "query_id", "rank")


def q25_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pair count at cosine ≥ 0.55 among vec_id < 200
    (exact tier; LSH tier is the scale path)."""
    emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    j = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        j.select(sim.alias("c"))
        .filter(F.col("c") >= 0.55)
        .agg(F.count("*").alias("n_pairs"), F.round(F.avg("c"), 4).alias("avg_cos"))
    )


def q26_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """4-gram Jaccard similarity pairs (doc_id < 60) via inverted-index
    equi-join — exact, no cross product."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 60)
    pairs = ngram_jaccard_join(d, "doc_id", "text", k=4, threshold=0.12)
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg("jaccard"), 6).alias("avg_jac"),
    )


def q27_generatepoints(spark: SparkSession, sf: str) -> DataFrame:
    """ST_GeneratePoints: 10k seeded points — all inside the box (bounds
    contract; sequence parity with the reference's RNG not required)."""
    pts = st_generatepoints(spark, 0, 0, 1000, 1000, 10000, seed=42)
    inside = ST.st_point_in_box("x", "y", 0, 0, 1000, 1000, strict=False)
    return pts.filter(inside).agg(F.count("*").alias("n"))


def q28_union_agg(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Union_Agg over guaranteed-disjoint per-customer boxes per nation
    (two-level applyInPandas partial/final union), verified by area sum."""
    cust = load_table(spark, sf, "customer").filter(F.col("c_custkey") < 500)
    w = (F.col("c_custkey") % 7).cast("double") + 1.0
    df = cust.select(
        "c_nationkey",
        (F.col("c_custkey") * 20).cast("double").alias("x0"),
        w.alias("w"),
    ).withColumn(
        "box",
        ST.st_makeenvelope(F.col("x0"), F.lit(0.0), F.col("x0") + F.col("w"), F.col("w")),
    )
    from duckdb_spatial_spark.functions import st_union_agg

    u = st_union_agg(df, "box", ["c_nationkey"], out_col="u")
    return (
        u.select(
            "c_nationkey", F.round(ST.st_area("u"), 4).alias("union_area")
        ).transform(_ssort, "c_nationkey")
    )


def q29_accessors(spark: SparkSession, sf: str) -> DataFrame:
    """ST_StartPoint/ST_EndPoint + ST_X/ST_Y over lineitem segments, on the
    native POINT_2D/LINESTRING_2D struct tier (types.cpp:11-15,51-55) —
    pure col-expr, zero python stages (the reference's columnar fast path)."""
    li = load_table(spark, sf, "lineitem", fan_out=False)
    a = ST.st_point2d(F.col("l_discount") * 100, F.col("l_tax") * 100)
    b = ST.st_point2d(F.col("l_quantity"), F.col("l_linenumber").cast("double"))
    ln = ST.st_makeline2d(a, b)
    return li.agg(
        F.round(F.sum(ST.st_x2d(ST.st_startpoint2d(ln))), 2).alias("sx"),
        F.round(F.sum(ST.st_y2d(ST.st_endpoint2d(ln))), 2).alias("ey"),
        F.count("*").alias("n"),
    )


def q30_pointn_ring(spark: SparkSession, sf: str) -> DataFrame:
    """ST_ExteriorRing + ST_PointN (1-based and negative) over part squares."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    wkt = F.concat(
        F.lit("POLYGON ((0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s,
        F.lit(", 0 "), s, F.lit(", 0 0))"),
    )
    ring = ST.st_exteriorring(ST.st_geomfromtext(wkt))
    p3 = ST.st_pointn(ring, 3)
    p_last = ST.st_pointn(ring, -1)
    return part.agg(
        F.round(F.sum(ST.st_x(p3) + ST.st_y(p3)), 2).alias("v3_sum"),
        F.round(F.sum(ST.st_x(p_last) + ST.st_y(p_last)), 2).alias("vlast_sum"),
        F.count("*").alias("n"),
    )


def _rects(spark: SparkSession, sf: str):
    o = load_table(spark, sf, "orders")
    wa = (F.col("o_orderkey") % 20).cast("double") + 1.0
    ha = (F.col("o_custkey") % 15).cast("double") + 1.0
    xb = (F.col("o_orderkey") % 25).cast("double")
    hb = (F.col("o_custkey") % 10).cast("double") + 1.0
    return o.select(
        wa.alias("wa"), ha.alias("ha"), xb.alias("xb"), hb.alias("hb"),
    ).withColumn("ga", ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), F.col("wa"), F.col("ha"))) \
     .withColumn("gb", ST.st_makeenvelope(F.col("xb"), F.lit(0.0), F.col("xb") + 5.0, F.col("hb")))


_RECTS_SQL = """
    SELECT CAST(o_orderkey % 20 AS DOUBLE) + 1.0 AS wa,
           CAST(o_custkey % 15 AS DOUBLE) + 1.0 AS ha,
           CAST(o_orderkey % 25 AS DOUBLE) AS xb,
           CAST(o_custkey % 10 AS DOUBLE) + 1.0 AS hb
    FROM orders
"""


def _rects2d(spark: SparkSession, sf: str):
    """Same rectangle pairs as ``_rects`` but on the native BOX_2D struct
    tier (types.cpp:33-40) — axis-aligned envelopes never need WKB."""
    o = load_table(spark, sf, "orders", fan_out=False)
    wa = (F.col("o_orderkey") % 20).cast("double") + 1.0
    ha = (F.col("o_custkey") % 15).cast("double") + 1.0
    xb = (F.col("o_orderkey") % 25).cast("double")
    hb = (F.col("o_custkey") % 10).cast("double") + 1.0
    zero = F.lit(0.0)
    return o.select(
        ST.st_makebox2d(zero, zero, wa, ha).alias("ba"),
        ST.st_makebox2d(xb, zero, xb + 5.0, hb).alias("bb"),
    )


def q31_predicate_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Intersects/Contains/Touches/Overlaps counts over derived rectangle
    pairs, on the BOX_2D col-expr tier (closed-form oracle via interval
    arithmetic). Whole-stage codegen end to end — no python stage."""
    r = _rects2d(spark, sf)
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))
    return r.agg(
        one(ST.st_intersects_extent("ba", "bb")).alias("n_int"),
        one(ST.st_box_contains("ba", "bb")).alias("n_cont"),
        one(ST.st_box_touches("ba", "bb")).alias("n_touch"),
        one(ST.st_box_overlaps("ba", "bb")).alias("n_over"),
        F.count("*").alias("n"),
    )


def q32_intersection_area(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Area(ST_Intersection) over the rectangle pairs on the BOX_2D
    tier: clip = min/max col-exprs, area = width × height."""
    r = _rects2d(spark, sf)
    area = ST.st_box_area(ST.st_box_intersection("ba", "bb"))
    return r.agg(
        F.round(F.sum(area), 2).alias("inter_area"), F.count("*").alias("n")
    )


def q33_simplify(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Simplify (Douglas-Peucker): collinear vertex always dropped;
    0.5-offset vertex dropped only at tol ≥ 0.5."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    s2 = (F.col("p_size") * 2).cast("string")
    col_wkt = F.concat(F.lit("LINESTRING (0 0, "), s, F.lit(" "), s, F.lit(", "), s2, F.lit(" "), s2, F.lit(")"))
    off_wkt = F.concat(F.lit("LINESTRING (0 0, "), s, F.lit(" 0.5, "), s2, F.lit(" 0)"))
    np1 = ST.st_npoints(ST.st_simplify(ST.st_geomfromtext(col_wkt), 0.1))
    np2 = ST.st_npoints(ST.st_simplify(ST.st_geomfromtext(off_wkt), 0.25))
    np3 = ST.st_npoints(ST.st_simplify(ST.st_geomfromtext(off_wkt), 1.0))
    return part.agg(
        F.sum(np1).alias("np_collinear"),
        F.sum(np2).alias("np_keep"),
        F.sum(np3).alias("np_drop"),
        F.count("*").alias("n"),
    )


def q34_envelope_boundary(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Envelope area of a segment + ST_Boundary length of a square."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("double")
    seg = ST.st_makeline(
        ST.st_point(F.lit(0.0), F.lit(0.0)), ST.st_point(s, s * 2)
    )
    env_area = ST.st_area(ST.st_envelope(seg))
    sq = ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), s, s)
    blen = ST.st_length(ST.st_boundary(sq))
    return part.agg(
        F.round(F.sum(env_area), 2).alias("env_area"),
        F.round(F.sum(blen), 2).alias("bnd_len"),
        F.count("*").alias("n"),
    )


def q35_transform(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Transform EPSG:4326→3857 (native spherical web-mercator) over
    events-derived lon/lat, avg projected coords per event_type."""
    ev = load_table(spark, sf, "events")
    lon = F.col("value") * 0.7 - 170.0
    lat = (F.col("user_id") % 150).cast("double") * 0.8 - 60.0
    pt = ST.st_point(lon, lat)
    t = ST.st_transform(pt, "EPSG:4326", "EPSG:3857")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(ST.st_x(t)), 2).alias("avg_mx"),
            F.round(F.avg(ST.st_y(t)), 2).alias("avg_my"),
            F.count("*").alias("n"),
        )
        .transform(_ssort, "event_type")
    )


def q36_dwithin(spark: SparkSession, sf: str) -> DataFrame:
    """ST_DWithin(point, constant point, 60) count — constructor fusion
    compiles the predicate to a closed-form col-expr (no Python stage)."""
    pts = _events_pts(spark, sf, fan_out=False)
    pt = ST.st_point("x", "y")
    c = ST.st_point(F.lit(250.0), F.lit(75.0))
    return pts.agg(
        F.sum(F.when(ST.st_dwithin(pt, c, 60.0), 1).otherwise(0)).alias("n_within"),
        F.count("*").alias("n"),
    )


def q37_dump(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Dump part counts over mixed POINT/MULTIPOINT/POLYGON."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    wkt = (
        F.when(F.col("p_partkey") % 3 == 0,
               F.concat(F.lit("MULTIPOINT ("), s, F.lit(" "), s, F.lit(", 0 0, "), s, F.lit(" 0)")))
        .when(F.col("p_partkey") % 3 == 1, F.concat(F.lit("POINT ("), s, F.lit(" "), s, F.lit(")")))
        .otherwise(F.concat(
            F.lit("POLYGON ((0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s, F.lit(", 0 0))")
        ))
    )
    nparts = F.size(ST.st_dump(ST.st_geomfromtext(wkt)))
    return part.agg(F.sum(nparts).alias("nparts_sum"), F.count("*").alias("n"))


def q38_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH candidate pairs (4 hashes, 2 bands, md5 family) on
    documents doc_id<100 — the scale path for near-dup dedup."""
    from duckdb_spatial_spark.operators import minhash_lsh_candidates

    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    pairs = minhash_lsh_candidates(d, "doc_id", "text", num_hashes=4, bands=2, k=4, hash_fn="md5")
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("id_a") + F.col("id_b")).alias("pair_sum"),
    )


def q39_simhash_hamming(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash hamming-distance ≤ 2 near-dup pairs among doc_id<150."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 150)
    sh = d.select(F.col("doc_id").alias("id"), simhash(F.col("text"), bits=16).alias("sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.filter(ham <= 2).agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("id_a") + F.col("id_b")).alias("pair_sum"),
    )


def q40_hexwkb_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """ST_AsHEXWKB / ST_GeomFromHEXWKB round trip over customer points."""
    cust = load_table(spark, sf, "customer")
    g = ST.st_point(F.col("c_acctbal"), (F.col("c_custkey") % 500).cast("double"))
    hx = ST.st_ashexwkb(g)
    back = ST.st_x(ST.st_geomfromhexwkb(hx))
    return cust.agg(
        F.round(F.sum(back), 2).alias("x_sum"),
        F.sum(F.length(hx)).alias("hex_len_sum"),
        F.count("*").alias("n"),
    )


def q41_casts(spark: SparkSession, sf: str) -> DataFrame:
    """Cast lattice: GEOMETRY→POINT_2D→GEOMETRY round trip + BOX_2D→GEOMETRY
    polygon area (geometry_cast.cpp:243-271)."""
    from duckdb_spatial_spark.functions import (
        box2d_to_geom, geom_to_point2d, point2d_to_geom,
    )

    cust = load_table(spark, sf, "customer")
    w = (F.col("c_custkey") % 9).cast("double") + 1.0
    h = (F.col("c_custkey") % 5).cast("double") + 1.0
    pt2d = geom_to_point2d(ST.st_point(F.col("c_acctbal"), w))
    rt_y = ST.st_y(point2d_to_geom(pt2d))
    box = F.struct(
        F.lit(0.0).alias("xmin"), F.lit(0.0).alias("ymin"),
        w.alias("xmax"), h.alias("ymax"),
    )
    barea = ST.st_area(box2d_to_geom(box))
    return cust.agg(
        F.round(F.sum(pt2d["x"]), 2).alias("px_sum"),
        F.round(F.sum(rt_y), 2).alias("rty_sum"),
        F.round(F.sum(barea), 2).alias("box_area_sum"),
        F.count("*").alias("n"),
    )


def q42_general_overlay(spark: SparkSession, sf: str) -> DataFrame:
    """General (non-axis-box) polygon overlay: triangle∩triangle via convex
    decomposition — intersection/union/difference areas + line clip length
    (closed-form oracle: s², 3s², s², s√2 per row)."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    s2 = (F.col("p_size") * 2).cast("string")
    tri_a = ST.st_geomfromtext(F.concat(
        F.lit("POLYGON ((0 0, "), s2, F.lit(" 0, 0 "), s2, F.lit(", 0 0))")))
    tri_b = ST.st_geomfromtext(F.concat(
        F.lit("POLYGON ((0 0, "), s2, F.lit(" 0, "), s2, F.lit(" "), s2, F.lit(", 0 0))")))
    diag = ST.st_makeline(
        ST.st_point(F.lit(0.0), F.lit(0.0)),
        ST.st_point(F.col("p_size") * 2, F.col("p_size") * 2),
    )
    return part.agg(
        F.round(F.sum(ST.st_area(ST.st_intersection(tri_a, tri_b))), 2).alias("inter_area"),
        F.round(F.sum(ST.st_area(ST.st_union(tri_a, tri_b))), 2).alias("union_area"),
        F.round(F.sum(ST.st_area(ST.st_difference(tri_a, tri_b))), 2).alias("diff_area"),
        F.round(F.sum(ST.st_length(ST.st_intersection(diag, tri_a))), 2).alias("clip_len"),
        F.count("*").alias("n"),
    )


def q43_flip_reverse(spark: SparkSession, sf: str) -> DataFrame:
    """ST_FlipCoordinates + ST_Reverse over part-derived segments."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("double")
    line = ST.st_makeline(ST.st_point(F.lit(0.0), F.lit(0.0)), ST.st_point(s, s * 2))
    flip_end_x = ST.st_x(ST.st_endpoint(ST.st_flipcoordinates(line)))
    rev_start_y = ST.st_y(ST.st_startpoint(ST.st_reverse(line)))
    return part.agg(
        F.round(F.sum(flip_end_x), 2).alias("flip_x_sum"),
        F.round(F.sum(rev_start_y), 2).alias("rev_y_sum"),
        F.count("*").alias("n"),
    )


def q44_force_dims(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Force3DZ / ST_Force2D / ST_HasZ / ST_ZMin round trip."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("double")
    pt = ST.st_point(s, s * 2)
    g3 = ST.st_force3dz(pt, 7.5)
    back2d = ST.st_force2d(g3)
    return part.agg(
        F.round(F.sum(ST.st_zmin(g3)), 2).alias("z_sum"),
        F.sum(F.when(ST.st_hasz(g3), 1).otherwise(0)).alias("n_hasz"),
        F.sum(F.when(ST.st_hasz(back2d), 1).otherwise(0)).alias("n_hasz_after"),
        F.count("*").alias("n"),
    )


def q45_removerepeated(spark: SparkSession, sf: str) -> DataFrame:
    """ST_RemoveRepeatedPoints vertex counts."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    s2 = (F.col("p_size") * 2).cast("string")
    wkt = F.concat(
        F.lit("LINESTRING (0 0, 0 0, "), s, F.lit(" "), s, F.lit(", "),
        s, F.lit(" "), s, F.lit(", "), s2, F.lit(" "), s2, F.lit(")"),
    )
    cleaned = ST.st_removerepeatedpoints(ST.st_geomfromtext(wkt))
    return part.agg(
        F.sum(ST.st_npoints(cleaned)).alias("np_sum"),
        F.count("*").alias("n"),
    )


def q46_geojson_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """ST_AsGeoJSON → ST_GeomFromGeoJSON round trip preserves area."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    wkt = F.concat(
        F.lit("POLYGON ((0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s,
        F.lit(", 0 "), s, F.lit(", 0 0))"),
    )
    g = ST.st_geomfromtext(wkt)
    back = ST.st_geomfromgeojson(ST.st_asgeojson(g))
    return part.agg(
        F.round(F.sum(ST.st_area(back)), 2).alias("area_sum"),
        F.count("*").alias("n"),
    )


def q47_makepolygon(spark: SparkSession, sf: str) -> DataFrame:
    """ST_MakePolygon from a closed ST_MakeLine ring."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    ring_wkt = F.concat(
        F.lit("LINESTRING (0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s,
        F.lit(", 0 "), s, F.lit(", 0 0)"),
    )
    poly = ST.st_makepolygon(ST.st_geomfromtext(ring_wkt))
    return part.agg(
        F.round(F.sum(ST.st_area(poly)), 2).alias("area_sum"),
        F.sum(F.when(ST.st_isclosed(ST.st_geomfromtext(ring_wkt)), 1).otherwise(0)).alias("n_closed"),
        F.count("*").alias("n"),
    )


def q48_pointonsurface(spark: SparkSession, sf: str) -> DataFrame:
    """ST_PointOnSurface lands inside; ST_Centroid of a square is exact."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("double")
    sq = ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), s, s)
    pos = ST.st_pointonsurface(sq)
    cen = ST.st_centroid(sq)
    return part.agg(
        F.sum(F.when(ST.st_contains(sq, pos), 1).otherwise(0)).alias("n_inside"),
        F.round(F.sum(ST.st_x(cen)), 2).alias("cx_sum"),
        F.count("*").alias("n"),
    )


def q49_collectionextract(spark: SparkSession, sf: str) -> DataFrame:
    """ST_CollectionExtract by dimension from a mixed collection."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    wkt = F.concat(
        F.lit("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, "), s,
        F.lit(" 0), POLYGON ((0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s,
        F.lit(", 0 "), s, F.lit(", 0 0)))"),
    )
    g = ST.st_geomfromtext(wkt)
    return part.agg(
        F.round(F.sum(ST.st_area(ST.st_collectionextract(g, 3))), 2).alias("poly_area"),
        F.round(F.sum(ST.st_length(ST.st_collectionextract(g, 2))), 2).alias("line_len"),
        F.sum(ST.st_npoints(ST.st_collectionextract(g, 1))).alias("pt_count"),
        F.count("*").alias("n"),
    )


def q50_validity(spark: SparkSession, sf: str) -> DataFrame:
    """ST_IsValid / ST_IsSimple / ST_IsRing over valid squares and a
    self-intersecting bowtie."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    sq_wkt = F.concat(
        F.lit("POLYGON ((0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s,
        F.lit(", 0 "), s, F.lit(", 0 0))"),
    )
    bow_wkt = F.concat(
        F.lit("POLYGON ((0 0, "), s, F.lit(" "), s, F.lit(", "), s,
        F.lit(" 0, 0 "), s, F.lit(", 0 0))"),
    )
    ring_wkt = F.concat(
        F.lit("LINESTRING (0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s,
        F.lit(", 0 0)"),
    )
    return part.agg(
        F.sum(F.when(ST.st_isvalid(ST.st_geomfromtext(sq_wkt)), 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(ST.st_isvalid(ST.st_geomfromtext(bow_wkt)), 1).otherwise(0)).alias("n_bowtie_valid"),
        F.sum(F.when(ST.st_isring(ST.st_geomfromtext(ring_wkt)), 1).otherwise(0)).alias("n_ring"),
        F.count("*").alias("n"),
    )


def q51_buffer_line(spark: SparkSession, sf: str) -> DataFrame:
    """Full ST_Buffer on linestrings (capsule union). A single-segment
    buffer's area has the exact closed form 2·d·L + ngon(d): the rectangle
    plus two half 4q-gon end caps (oracle reproduces it in SQL)."""
    li = load_table(spark, sf, "lineitem").filter(F.col("l_orderkey") < 2000)
    a = ST.st_point(F.col("l_discount") * 100, F.col("l_tax") * 100)
    b = ST.st_point(F.col("l_quantity") + 10, F.col("l_linenumber").cast("double"))
    ln = ST.st_makeline(a, b)
    buf_area = ST.st_area(ST.st_buffer(ln, 2.0, segments=8))
    return li.agg(
        F.round(F.sum(buf_area), 2).alias("buf_area_sum"),
        F.count("*").alias("n"),
    )


def q52_buffer_polygon(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Buffer ± on polygons: dilation area = A + P·d + ngon(d); erosion
    of a W×H box = (W−2d)(H−2d) clamped at empty (closed-form oracle)."""
    part = load_table(spark, sf, "part")
    w = F.col("p_size").cast("double") + 4.0
    h = (F.col("p_partkey") % 7).cast("double") + 5.0
    box = ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), w, h)
    dil = ST.st_area(ST.st_buffer(box, 2.0, segments=8))
    ero = ST.st_area(ST.st_buffer(box, -2.0, segments=8))
    return part.agg(
        F.round(F.sum(dil), 2).alias("dilate_sum"),
        F.round(F.sum(ero), 2).alias("erode_sum"),
        F.count("*").alias("n"),
    )


def q53_transform_utm(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Transform 4326 → UTM 17N (native Krüger-series TM) → back; the
    round trip reproduces the source lon/lat to 1e-9°, so the oracle is
    computable from the original columns. Also pins the northern-hemisphere
    easting/northing ranges as a sanity band."""
    pts = _events_pts(spark, sf)
    lon = F.col("x") / 490.0 * 5.0 - 83.0   # within zone 17 (-84..-78)
    lat = (F.col("y") % 150.0) / 150.0 * 40.0 + 10.0  # 10..50 N
    g = ST.st_point(lon, lat)
    utm = ST.st_transform(g, "EPSG:4326", "EPSG:32617")
    back = ST.st_transform(utm, "EPSG:32617", "EPSG:4326")
    return pts.agg(
        F.round(F.sum(F.round(ST.st_x(back), 6)), 4).alias("lon_sum"),
        F.round(F.sum(F.round(ST.st_y(back), 6)), 4).alias("lat_sum"),
        F.sum(
            F.when(
                (ST.st_x(utm) > 0) & (ST.st_x(utm) < 1000000)
                & (ST.st_y(utm) > 0) & (ST.st_y(utm) < 10000000), 1
            ).otherwise(0)
        ).alias("n_in_band"),
        F.count("*").alias("n"),
    )


def q54_langid_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Character-trigram language ID (Cavnar–Trenkle rank distance) over
    documents — the n-gram tier above q23's marker heuristic. Rank-distance
    argmin isn't SQL-expressible → rows-only check."""
    d = load_table(spark, sf, "documents")
    return (
        d.select(textops.language_id_ngram(F.col("text")).alias("lang"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .transform(_ssort, "lang")
    )


def q55_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN (distributed cell assign, nprobe cell join, exact re-rank)
    with a DETERMINISTIC coarse quantizer — the first 32 corpus vectors,
    L2-normalized — so the whole pipeline (cell argmax, probe set, top-5)
    is SQL-expressible and the oracle replicates it exactly with DuckDB's
    list_cosine_similarity (k-means training stays available via
    ann_ivf_topk's default path; train_ivf_centroids is covered by
    tests/test_pipeline_ops.py)."""
    import numpy as np

    from duckdb_spatial_spark.operators import ann_ivf_topk

    emb = load_table(spark, sf, "embeddings", fan_out=False)
    probe = _probe_pairs(
        emb.filter((F.col("vec_id") < 32)
                   & F.col("embedding").isNotNull()),
        "vec_id", "embedding")
    C = np.asarray([v for _, v in probe], dtype=np.float64)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    # the <=5 query vectors are a PREFIX of the probe rows already on
    # the driver — inline them so neither ANN branch pays a broadcast-
    # build job that re-scans the corpus (null embeddings are excluded
    # by the probe exactly as both branches' isNotNull filters would)
    queries = _local_queries(spark, emb, probe, 5)
    exact = ann_bruteforce_topk(emb, queries, k=5).select(
        "query_id", F.col("vec_id").alias("exact_id")
    )
    approx = ann_ivf_topk(emb, queries, k=5, centroids=C, nprobe=8).select(
        "query_id", F.col("vec_id").alias("ivf_id")
    )
    # both sides are (n_queries × k) rows; a MERGE hint keeps the final
    # compare inside ONE job — a broadcast(approx) build is its own job
    # that runs the whole IVF subtree before the main job starts
    # (trap 13), while the SMJ's two tiny exchanges are stages of the
    # same job (the r3 audit's broadcast pick predates job-count
    # currency)
    hits = exact.join(
        approx.hint("merge"),
        (exact["query_id"] == approx["query_id"])
        & (exact["exact_id"] == approx["ivf_id"]),
    )
    return hits.agg(
        F.count("*").alias("n_hits"),
    )


# --------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-polygon zone join + per-zone counts at sf0.001."""
    return q02_zone_pip_join(spark, "/root/testdata/sf0.001")



def q56_predicate_matrix2(spark: SparkSession, sf: str) -> DataFrame:
    """The remaining predicates: ST_Covers/CoveredBy/Equals/ST_Disjoint
    over the rectangle pairs + ST_Crosses over diagonal-vs-horizontal
    segment pairs. Constructor fusion keeps every predicate a pure
    col-expr (zero python stages) while the WKB kernels stay covered by
    tests/test_join.py and tests/test_functions_spark.py."""
    o = load_table(spark, sf, "orders", fan_out=False)
    wa = (F.col("o_orderkey") % 20).cast("double") + 1.0
    ha = (F.col("o_custkey") % 15).cast("double") + 1.0
    xb = (F.col("o_orderkey") % 25).cast("double")
    hb = (F.col("o_custkey") % 10).cast("double") + 1.0
    ga = ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), wa, ha)
    gb = ST.st_makeenvelope(xb, F.lit(0.0), xb + 5.0, hb)
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))
    rect_part = o.agg(
        one(ST.st_covers(ga, gb)).alias("n_covers"),
        one(ST.st_coveredby(gb, ga)).alias("n_coveredby"),
        one(ST.st_equals(ga, gb)).alias("n_equals"),
        one(ST.st_disjoint(ga, gb)).alias("n_disjoint"),
        F.count("*").alias("n_rect"),
    )
    li = load_table(spark, sf, "lineitem", fan_out=False).filter(
        F.col("l_orderkey") < 4000
    )
    diag = ST.st_makeline(
        ST.st_point(F.lit(0.0), F.lit(0.0)), ST.st_point(F.lit(10.0), F.lit(10.0))
    )
    yc = F.col("l_linenumber").cast("double") * 2 - 1
    horiz = ST.st_makeline(
        ST.st_point(F.lit(-1.0), yc), ST.st_point(F.lit(11.0), yc)
    )
    line_part = li.agg(
        F.sum(F.when(ST.st_crosses(diag, horiz), 1).otherwise(0)).alias("n_crosses"),
        F.count("*").alias("n_lines"),
    )
    return rect_part.crossJoin(line_part)


def q57_shortestline(spark: SparkSession, sf: str) -> DataFrame:
    """ST_ShortestLine point→segment; sum of ST_Length of the connector
    (closed-form clamp oracle)."""
    part = load_table(spark, sf, "part")
    p = ST.st_point(F.col("p_size").cast("double"),
                    (F.col("p_partkey") % 7).cast("double") + 1.0)
    seg = ST.st_makeline(
        ST.st_point(F.lit(0.0), F.lit(0.0)), ST.st_point(F.lit(20.0), F.lit(0.0))
    )
    ln = ST.st_length(ST.st_shortestline(p, seg))
    return part.agg(
        F.round(F.sum(ln), 2).alias("sl_len_sum"), F.count("*").alias("n")
    )


def q58_linemerge_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """ST_LineMerge of touching segment pairs (3-vertex merged line, length
    2s) + ST_Equals on start-rotated rings + ST_Normalize WKT canon check."""
    part = load_table(spark, sf, "part")
    s = F.col("p_size").cast("string")
    ml = ST.st_geomfromtext(F.concat(
        F.lit("MULTILINESTRING ((0 0, "), s, F.lit(" 0), ("), s,
        F.lit(" 0, "), s, F.lit(" "), s, F.lit("))"),
    ))
    merged = ST.st_linemerge(ml)
    ring_a = ST.st_geomfromtext(F.concat(
        F.lit("POLYGON ((0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s,
        F.lit(", 0 "), s, F.lit(", 0 0))"),
    ))
    ring_b = ST.st_geomfromtext(F.concat(
        F.lit("POLYGON (("), s, F.lit(" "), s, F.lit(", 0 "), s,
        F.lit(", 0 0, "), s, F.lit(" 0, "), s, F.lit(" "), s, F.lit("))"),
    ))
    norm_eq = ST.st_astext(ST.st_normalize(ring_a)) == ST.st_astext(ST.st_normalize(ring_b))
    return part.agg(
        F.sum(ST.st_npoints(merged)).alias("np_merged"),
        F.round(F.sum(ST.st_length(merged)), 2).alias("len_merged"),
        F.sum(F.when(ST.st_equals(ring_a, ring_b), 1).otherwise(0)).alias("n_eq"),
        F.sum(F.when(norm_eq, 1).otherwise(0)).alias("n_norm_eq"),
        F.count("*").alias("n"),
    )


def q59_reduceprecision(spark: SparkSession, sf: str) -> DataFrame:
    """ST_ReducePrecision to a 0.25 grid; coordinate sums after snapping
    (closed-form round(x/0.25)*0.25 oracle — offsets chosen to never hit
    half-grid ties)."""
    part = load_table(spark, sf, "part")
    x = F.col("p_size").cast("double") + 0.1
    y = F.col("p_size").cast("double") + 0.35
    g = ST.st_reduceprecision(ST.st_point(x, y), 0.25)
    return part.agg(
        F.round(F.sum(ST.st_x(g)), 2).alias("sx"),
        F.round(F.sum(ST.st_y(g)), 2).alias("sy"),
        F.count("*").alias("n"),
    )


def q60_spheroid(spark: SparkSession, sf: str) -> DataFrame:
    """Exact geodesic (spheroid) distances — geographiclib tier, now a
    Karney-style exact inverse (geom/geodesic.py). Oracle: meridional rows
    have the closed-form Bessel meridian-arc series (third flattening n,
    sub-µm truncation, SQL-expressible); equatorial rows are a·Δλ exactly
    (arcs ≤ 171° < (1−f)·180°, so the equator is the geodesic)."""
    c = load_table(spark, sf, "customer", fan_out=False)
    lon = (F.col("c_custkey") % 360).cast("double") - 180.0
    lat1 = (F.col("c_custkey") % 140).cast("double") - 70.0
    dlat = (F.col("c_custkey") % 37).cast("double") * 0.5 + 0.5
    lat2 = lat1 + dlat  # ≤ 88.5
    dlon = (F.col("c_custkey") % 170).cast("double") + 1.0
    # reference axis order: x = latitude (st_distance_spheroid.cpp docs)
    dm = ST.st_distance_spheroid(lat1, lon, lat2, lon)
    de = ST.st_distance_spheroid(F.lit(0.0), lon, F.lit(0.0), lon + dlon)
    return c.agg(
        F.round(F.sum(dm), 2).alias("merid_sum_m"),
        F.round(F.sum(de), 2).alias("equat_sum_m"),
        F.count("*").alias("n"),
    )


def q61_rtree_points(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's R-tree benchmark workload (benchmark/
    rtree_points_index.benchmark:10-18): 10M uniform points in [0,10000]^2,
    count inside envelope (450,450,650,650). Pure col-expr generate +
    filter + count — zero shuffle, zero python; the Spark analog of the
    index path is bbox-predicate pruning, exercised end-to-end here.
    The portable 31-bit multiply-xorshift RNG evaluates identically in
    ANSI SQL, so the envelope count is hash-checked against a DuckDB
    range(10M) mirror of the generator."""
    pts = st_generatepoints(spark, 0.0, 0.0, 10000.0, 10000.0, 10_000_000,
                            seed=1337, rng="portable")
    inside = ST.st_point_in_box("x", "y", 450.0, 450.0, 650.0, 650.0, strict=False)
    return pts.filter(inside).agg(F.count("*").alias("n"))


def q62_buffer_joinstyles(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Buffer mitre/bevel join styles (geos/.../st_buffer.cpp:74-79,104
    JOIN_MITRE/JOIN_BEVEL + mitre_limit): for an axis-aligned W×H box with
    d=2, mitre (limit ≥ √2) = (W+2d)(H+2d); bevel cuts 4 corner triangles
    of d²/2 each → −2d² (closed-form oracle)."""
    part = load_table(spark, sf, "part")
    w = F.col("p_size").cast("double") + 4.0
    h = (F.col("p_partkey") % 7).cast("double") + 5.0
    box = ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), w, h)
    mit = ST.st_area(ST.st_buffer(box, 2.0, segments=8,
                                  join_style="mitre", mitre_limit=5.0))
    bev = ST.st_area(ST.st_buffer(box, 2.0, segments=8, join_style="bevel"))
    return part.agg(
        F.round(F.sum(mit), 2).alias("mitre_sum"),
        F.round(F.sum(bev), 2).alias("bevel_sum"),
        F.count("*").alias("n"),
    )


def q63_intersection_agg(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Intersection_Agg (geos/functions/aggregate.cpp:205-212): per
    nation, n-ary intersection of boxes anchored at the origin =
    (0,0,min w,min h) → area = min(w)·min(h) (closed-form oracle)."""
    cust = load_table(spark, sf, "customer").filter(F.col("c_custkey") < 500)
    w = (F.col("c_custkey") % 7).cast("double") + 1.0
    h = (F.col("c_custkey") % 5).cast("double") + 1.0
    df = cust.select(
        "c_nationkey",
        ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), w, h).alias("box"),
    )
    from duckdb_spatial_spark.functions import st_intersection_agg

    ig = st_intersection_agg(df, "box", ["c_nationkey"], out_col="ig")
    return ig.select(
        "c_nationkey", F.round(ST.st_area("ig"), 4).alias("inter_area")
    ).transform(_ssort, "c_nationkey")


def q64_mixed_overlay(spark: SparkSession, sf: str) -> DataFrame:
    """Mixed-dimension dissolving overlay (geos/.../st_union.cpp:65,
    st_difference.cpp:59): line∪polygon keeps the polygon plus the line
    parts outside it; line−polygon is the complement clip; collinear
    line∪line counts the shared length once. Closed-form oracle: the box is
    (0,0,w,10) and the horizontal probe line spans x∈[−5, w+5] at
    yc=(p_partkey%14)+0.5, so the outside length is 10 when the line
    crosses the box (yc<10) and w+10 when it misses."""
    part = load_table(spark, sf, "part")
    w = F.col("p_size").cast("double") + 2.0
    yc = (F.col("p_partkey") % 14).cast("double") + 0.5
    box = ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), w, F.lit(10.0))
    line = ST.st_makeline(ST.st_point(F.lit(-5.0), yc), ST.st_point(w + 5.0, yc))
    u = ST.st_union(line, box)
    d = ST.st_difference(line, box)
    # collinear 1D overlap: a=(0,0)->(k,k), b=(k/2,k/2)->(2k,2k)
    k = (F.col("p_partkey") % 5).cast("double") + 1.0
    la = ST.st_makeline(ST.st_point(F.lit(0.0), F.lit(0.0)), ST.st_point(k, k))
    lb = ST.st_makeline(ST.st_point(k / 2, k / 2), ST.st_point(k * 2, k * 2))
    lu = ST.st_union(la, lb)
    return part.agg(
        F.round(F.sum(ST.st_area(u)), 2).alias("union_area_sum"),
        F.round(F.sum(ST.st_length(u)), 2).alias("union_len_sum"),
        F.round(F.sum(ST.st_length(d)), 2).alias("diff_len_sum"),
        F.round(F.sum(ST.st_length(lu)), 2).alias("collinear_union_len_sum"),
        F.count("*").alias("n"),
    )


def q65_gpkg_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Native GeoPackage sink+source (ST_Read/COPY FORMAT GDAL 'x.gpkg'
    analog, stdlib-sqlite container): write customer points to a GPKG,
    read the layer back distributed, aggregate. Oracle: same aggregate
    straight off the customer table."""
    import tempfile

    from duckdb_spatial_spark.sources import st_read_gpkg, st_write_gpkg

    cust = (
        load_table(spark, sf, "customer", fan_out=False)
        .filter(F.col("c_custkey") < 400)
        .select(
            F.col("c_custkey").alias("k"),
            ST.st_point(
                F.col("c_acctbal"), (F.col("c_custkey") % 100).cast("double")
            ).alias("geom"),
        )
    )
    path = tempfile.mktemp(suffix=".gpkg", prefix="dss_q65_")
    st_write_gpkg(cust, path, layer="cust")
    back = st_read_gpkg(spark, path, layer="cust")
    return back.agg(
        F.count("*").alias("n"),
        F.round(F.sum(ST.st_x("geom")), 2).alias("sx"),
        F.round(F.sum(ST.st_y("geom")), 2).alias("sy"),
        F.sum("k").alias("sk"),
    )


def q69_dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Candidate pairs → duplicate CLUSTERS (the keep-one-per-cluster step
    of an LLM dedup pipeline): q38's MinHash-LSH pairs fed through
    connected_components (min-label propagation, O(diameter) rounds of
    join+min). Oracle: the same pairs in SQL + a recursive-CTE transitive
    closure with min-label per node."""
    from duckdb_spatial_spark.operators import (connected_components,
                                                minhash_lsh_candidates)

    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    pairs = minhash_lsh_candidates(d, "doc_id", "text", num_hashes=4,
                                   bands=2, k=4, hash_fn="md5")
    comp = connected_components(
        pairs, "id_a", "id_b",
        nodes=d.select(F.col("doc_id").alias("id")), id_col="id")
    sizes = comp.groupBy("comp").agg(F.count("*").alias("sz"))
    return comp.agg(
        F.countDistinct("comp").alias("n_components"),
        F.sum("comp").alias("comp_sum"),
        F.count("*").alias("n_docs"),
    ).crossJoin(
        sizes.agg(F.max("sz").alias("max_cluster"),
                  F.sum(F.when(F.col("sz") > 1, 1).otherwise(0))
                  .alias("n_nontrivial"))
    )


def q68_gdb_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Native OpenFileGDB sink+source (the reference's own GDB test is a
    write→read roundtrip, test/sql/gdal/st_read_gdb.test; codec
    geom/gdbtable.py, public FGDB spec): write customer points to a .gdb,
    read the layer back via the distributed rowid-range scan, aggregate.
    Oracle: same aggregate straight off the customer table."""
    import tempfile

    from duckdb_spatial_spark.sources.gdb import st_read_gdb, st_write_gdb

    cust = (
        load_table(spark, sf, "customer", fan_out=False)
        .filter(F.col("c_custkey") < 400)
        .select(
            F.col("c_custkey").cast("int").alias("k"),
            ST.st_point(
                F.col("c_acctbal"), (F.col("c_custkey") % 100).cast("double")
            ).alias("geom"),
        )
    )
    path = tempfile.mktemp(suffix=".gdb", prefix="dss_q68_")
    st_write_gdb(cust, path, layer="cust")
    back = st_read_gdb(spark, path, layer="cust", num_partitions=4)
    return back.agg(
        F.count("*").alias("n"),
        F.round(F.sum(ST.st_x("geom")), 2).alias("sx"),
        F.round(F.sum(ST.st_y("geom")), 2).alias("sy"),
        F.sum("k").alias("sk"),
    )


def q66_multimodal(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal tier end-to-end with REAL decode: per part row build a
    solid-color 16×12 PPM image, a solid-color PNG (round-3 stdlib-zlib
    codec: deflate + scanline unfilter), and a constant-amplitude PCM WAV
    payload in the executor (mapInPandas), run image_features on both image
    codecs + audio_features, and aggregate. Closed-form oracle: a solid
    (r,g,b) image has channel means exactly (r,g,b) in either container; a
    constant-amplitude square wave has RMS exactly A."""
    import numpy as np

    from duckdb_spatial_spark.operators import (audio_features,
                                                image_features,
                                                video_metadata)
    from duckdb_spatial_spark.operators.media_codecs import (
        encode_bmff_skeleton, encode_gif, encode_jpeg, encode_png,
        encode_ppm, encode_wav)

    part = load_table(spark, sf, "part").filter(F.col("p_partkey") < 400).select(
        "p_partkey", (F.col("p_partkey") % 251).cast("int").alias("r"),
        (F.col("p_size") % 251).cast("int").alias("g"),
    )

    def build(batches):
        import pandas as pd

        for pdf in batches:
            img = []
            png = []
            jpg = []
            gif = []
            mp4 = []
            wav = []
            for r, g in zip(pdf["r"], pdf["g"]):
                im = np.zeros((12, 16, 3), dtype=np.uint8)
                im[:, :, 0] = r
                im[:, :, 1] = g
                im[:, :, 2] = 40
                img.append(encode_ppm(im))
                png.append(encode_png(im[:, :, ::-1]))  # swapped channels
                # solid GRAY block: DC-only DCT at quant=1 → bit-exact
                gray = np.full((12, 16, 3), int(g), dtype=np.uint8)
                jpg.append(encode_jpeg(gray, quant=1))
                gif.append(encode_gif(im))  # GIF is lossless → means exact
                mp4.append(encode_bmff_skeleton(
                    int(r) * 10 + 40, width=640, height=360,
                    sample_rate=16000, n_channels=1))
                amp = (int(r) % 50 + 1) / 100.0
                sig = np.where(np.arange(400) % 2 == 0, amp, -amp)
                wav.append(encode_wav(sig, 8000))
            out = pdf.copy()
            out["img"] = img
            out["png"] = png
            out["jpg"] = jpg
            out["gif"] = gif
            out["mp4"] = mp4
            out["wav"] = wav
            yield out

    built = part.mapInPandas(
        build,
        schema=("p_partkey long, r int, g int, img binary, png binary, "
                "jpg binary, gif binary, mp4 binary, wav binary"),
    )
    feats = image_features(built, "img")
    feats = image_features(feats, "png", out_col="png_features")
    feats = image_features(feats, "jpg", out_col="jpg_features")
    feats = image_features(feats, "gif", out_col="gif_features")
    feats = video_metadata(feats, "mp4")
    feats = audio_features(feats, "wav")
    return feats.agg(
        F.round(F.sum(F.col("img_features.mean_r")), 4).alias("sum_mean_r"),
        F.round(F.sum(F.col("img_features.mean_g")), 4).alias("sum_mean_g"),
        F.round(F.sum(F.col("png_features.mean_b")), 4).alias("sum_png_b"),
        F.round(F.sum(F.col("jpg_features.mean_r")), 4).alias("sum_jpg_r"),
        F.round(F.sum(F.col("gif_features.mean_g")), 4).alias("sum_gif_g"),
        F.sum(F.col("video_meta.duration_ms")).alias("sum_mp4_ms"),
        F.round(F.sum(F.col("audio_features.rms")), 6).alias("sum_rms"),
        F.sum(F.col("audio_features.duration_ms")).alias("sum_dur_ms"),
        F.count("*").alias("n"),
    )


def q67_transform_epsg(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Transform through the round-3 table-driven EPSG registry
    (geom/proj.py _EPSG_PROJ — previously these codes raised): World
    Mercator EPSG:3395 forward with a closed-form ellipsoidal-Mercator SQL
    oracle, plus exact roundtrips through NZTM2000 (EPSG:2193, tmerc),
    Australian Albers (EPSG:3577, aea, southern-hemisphere n<0 inverse)
    and Statistics Canada Lambert (EPSG:3347, lcc)."""
    pts = _events_pts(spark, sf)
    lon_m = F.col("x") / 490.0 * 60.0 - 30.0
    lat_m = (F.col("y") % 150.0) / 150.0 * 100.0 - 50.0
    merc = ST.st_transform(ST.st_point(lon_m, lat_m),
                           "EPSG:4326", "EPSG:3395")
    lon_nz = F.col("x") / 490.0 * 10.0 + 167.0
    lat_nz = (F.col("y") % 150.0) / 150.0 * 12.0 - 46.0
    rt_nz = ST.st_transform(
        ST.st_transform(ST.st_point(lon_nz, lat_nz), "EPSG:4326", "EPSG:2193"),
        "EPSG:2193", "EPSG:4326")
    lon_au = F.col("x") / 490.0 * 30.0 + 115.0
    lat_au = (F.col("y") % 150.0) / 150.0 * 25.0 - 40.0
    rt_au = ST.st_transform(
        ST.st_transform(ST.st_point(lon_au, lat_au), "EPSG:4326", "EPSG:3577"),
        "EPSG:3577", "EPSG:4326")
    lon_ca = F.col("x") / 490.0 * 50.0 - 130.0
    lat_ca = (F.col("y") % 150.0) / 150.0 * 20.0 + 45.0
    rt_ca = ST.st_transform(
        ST.st_transform(ST.st_point(lon_ca, lat_ca), "EPSG:4326", "EPSG:3347"),
        "EPSG:3347", "EPSG:4326")
    # round-3 projection families: oblique stereographic (RD New, Helmert),
    # Swiss oblique Mercator (LV95, Helmert), polar stereographic
    lon_nl = F.col("x") / 490.0 * 3.5 + 3.4
    lat_nl = (F.col("y") % 150.0) / 150.0 * 2.6 + 50.8
    rt_nl = ST.st_transform(
        ST.st_transform(ST.st_point(lon_nl, lat_nl), "EPSG:4326", "EPSG:28992"),
        "EPSG:28992", "EPSG:4326")
    lon_ch = F.col("x") / 490.0 * 3.0 + 6.2
    lat_ch = (F.col("y") % 150.0) / 150.0 * 1.8 + 45.9
    rt_ch = ST.st_transform(
        ST.st_transform(ST.st_point(lon_ch, lat_ch), "EPSG:4326", "EPSG:2056"),
        "EPSG:2056", "EPSG:4326")
    lon_aa = F.col("x") / 490.0 * 360.0 - 180.0
    lat_aa = (F.col("y") % 150.0) / 150.0 * 25.0 - 89.0
    rt_aa = ST.st_transform(
        ST.st_transform(ST.st_point(lon_aa, lat_aa), "EPSG:4326", "EPSG:3031"),
        "EPSG:3031", "EPSG:4326")
    return pts.agg(
        F.round(F.avg(ST.st_x(merc)), 2).alias("avg_merc_x"),
        F.round(F.avg(ST.st_y(merc)), 2).alias("avg_merc_y"),
        F.round(F.sum(F.round(ST.st_x(rt_nz), 6)), 4).alias("nz_lon_sum"),
        F.round(F.sum(F.round(ST.st_y(rt_au), 6)), 4).alias("au_lat_sum"),
        F.round(F.sum(F.round(ST.st_x(rt_ca), 6)), 4).alias("ca_lon_sum"),
        F.round(F.sum(F.round(ST.st_y(rt_nl), 6)), 4).alias("nl_lat_sum"),
        F.round(F.sum(F.round(ST.st_x(rt_ch), 6)), 4).alias("ch_lon_sum"),
        F.round(F.sum(F.round(ST.st_y(rt_aa), 6)), 4).alias("aa_lat_sum"),
        F.count("*").alias("n"),
    )


def q70_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Test-set decontamination: the eval set is built from leaked training
    docs (first 12 words of every doc_id % 50 == 0 document), then every
    corpus doc sharing any word 8-gram with it is flagged. Broadcast
    semi-join on the benchmark n-gram set — no wide shuffle of text."""
    from duckdb_spatial_spark.operators.pipeline import decontaminate

    d = load_table(spark, sf, "documents", fan_out=True)
    bench = d.where(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 12)).alias("text"),
    )
    flagged = decontaminate(d, bench, n=8, mode="flag")
    return flagged.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("contaminated").cast("long")).alias("n_contam"),
        F.sum(F.when(~F.col("contaminated"), F.col("n_chars")).otherwise(F.lit(0))).alias("chars_clean"),
    )


def q71_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-language corpus mixing: portable hash-uniform on
    doc_id vs per-stratum keep fraction (reproducible across partitioning
    — F.rand is not). Zero shuffles before the final agg."""
    from duckdb_spatial_spark.operators.pipeline import stratified_sample

    d = load_table(spark, sf, "documents", fan_out=False)
    fr = {"en": 0.5, "de": 0.25, "es": 0.1, "fr": 0.75, "zh": 0.05}
    out = stratified_sample(d, "doc_id", "lang", fr, seed=42)
    return (
        out.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
        .transform(_ssort, "lang")
    )


def q72_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub over synthesized contact lines (deterministic email + IPv4
    per doc appended to the text): single-pass chained regexp_replace, all
    JVM-side; identical RE2-safe patterns run in the oracle."""
    from duckdb_spatial_spark.operators.pipeline import pii_count, redact_pii

    d = load_table(spark, sf, "documents", fan_out=False)
    pii_text = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@ex"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".org or 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".3."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" now"),
    )
    t = d.select(
        pii_text.alias("t"),
        pii_count(pii_text, "email").alias("ne"),
        pii_count(pii_text, "ipv4").alias("ni"),
    )
    red = t.select(redact_pii(F.col("t"), kinds=("email", "ipv4")).alias("r"), "t", "ne", "ni")
    return red.agg(
        F.sum("ne").cast("long").alias("n_email"),
        F.sum("ni").cast("long").alias("n_ipv4"),
        F.sum(F.length("t") - F.length("r")).cast("long").alias("removed_chars"),
        F.count("*").alias("n_docs"),
    )


def q73_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide boilerplate paragraph removal: 3-paragraph docs (slice,
    shared boilerplate, slice) → keep only the globally-first occurrence of
    each paragraph → reassemble. One shuffle on the paragraph hash, one on
    the doc id."""
    from duckdb_spatial_spark.operators.pipeline import paragraph_dedup

    d = load_table(spark, sf, "documents", fan_out=False)
    boiler = "subscribe to our newsletter today"
    built = d.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.substring(F.col("text"), 1, 30),
            F.lit(boiler),
            F.substring(F.col("text"), 31, 60),
        ).alias("text"),
    )
    out = paragraph_dedup(built, "doc_id", "text")
    return out.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_paragraphs").cast("long").alias("n_para"),
        F.sum(F.length("text")).cast("long").alias("chars_kept"),
    )


_Q75_SINK_SEQ = [0]


def q75_streaming_extent(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end Structured Streaming: the events table read as a file
    STREAM (availableNow trigger), watermarked daily tumbling windows per
    event_type, decomposable extent (min/max/count) aggregation into a
    memory sink — the streaming form of ST_Extent_Agg. availableNow
    processes the full input and terminates, so the result is
    deterministic and exactly SQL-checkable; the same plan keeps running
    incrementally on a live source at scale (bounded state: one row per
    open window × event_type)."""
    from duckdb_spatial_spark.streaming import streaming_extent_agg

    batch = load_table(spark, sf, "events", fan_out=False)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", (F.col("ts") / F.lit(1e9)).cast("timestamp"))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        # watermarks require TIMESTAMP (LTZ); pin the session to UTC so the
        # NTZ→LTZ cast is epoch-faithful regardless of host timezone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    pts = stream.select(
        "ts", "event_type", F.col("value").alias("x"),
        F.col("user_id").cast("double").alias("y"),
    )
    agg = streaming_extent_agg(
        pts, "ts", "x", "y", window="1 day", watermark="1 day",
        group_cols=("event_type",),
    )
    _Q75_SINK_SEQ[0] += 1
    sink = f"q75_sink_{_Q75_SINK_SEQ[0]}"
    # complete-mode min/max partials: per-batch state rows are bounded
    # by open windows x event_type, so state partitions follow the
    # input-size estimate (1 here, defaultParallelism at scale)
    with _stream_state_partitions(spark, batch):
        q = (
            agg.writeStream.format("memory").queryName(sink)
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            "event_type",
            (F.col("window.start").cast("long") / F.lit(86400)).cast("long").alias("day_idx"),
            F.round("xmin", 6).alias("xmin"),
            F.round("ymin", 6).alias("ymin"),
            F.round("xmax", 6).alias("xmax"),
            F.round("ymax", 6).alias("ymax"),
            F.col("n"),
        )
        .transform(_ssort, "event_type", "day_idx")
    )


def q76_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-split sequence packing (pretraining example packing):
    global token prefix-sum computed distributed (range partitions +
    per-partition totals offset), capacity-512 windows."""
    from duckdb_spatial_spark.operators.pipeline import pack_sequences

    d = load_table(spark, sf, "documents", fan_out=False)
    toks = d.select("doc_id", textops.token_count(F.col("text")).alias("tokens"))
    p = pack_sequences(toks, "doc_id", "tokens", capacity=512, num_partitions=8)
    return p.agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("long").alias("total_tokens"),
        (F.max("bin_id") + 1).cast("long").alias("n_bins"),
        F.sum(F.col("spans_boundary").cast("long")).alias("n_spanning"),
        F.sum(
            F.when(F.col("bin_id") % 2 == 0, F.col("tokens")).otherwise(F.lit(0))
        ).cast("long").alias("even_bin_tokens"),
    )


def q77_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window chunking: 64-token windows, 16-token overlap — pure
    col-expr (projected word array + transform + posexplode, zero
    shuffles before the agg)."""
    from duckdb_spatial_spark.operators.pipeline import chunk_documents

    d = load_table(spark, sf, "documents", fan_out=False)
    c = chunk_documents(d, max_tokens=64, overlap=16)
    return c.agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("chunk_tokens").cast("long").alias("chunk_tokens_total"),
        F.max("chunk_idx").cast("long").alias("max_chunk_idx"),
    )


def q78_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature (sqrt-weighted) source mixing toward total/3 rows:
    tiny per-source count collected once, then the zero-shuffle portable
    hash predicate. Fractions pinned to 9 digits so the SQL replica is
    bit-identical."""
    from duckdb_spatial_spark.operators.pipeline import temperature_mix

    d = load_table(spark, sf, "documents", fan_out=False)
    target = d.count() // 3
    out, _fr = temperature_mix(
        d, "doc_id", "source", target_rows=target, alpha=0.5, seed=7, ndigits=9
    )
    return (
        out.groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("chars_kept"))
        .transform(_ssort, "source")
    )


def q79_dedup_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """One-call corpus dedup (exact collapse → LSH candidates → exact
    Jaccard verify → connected components → keep cluster min): the
    end-to-end operator, driver-checked against a full SQL replica of all
    four stages (recursive-CTE components)."""
    from duckdb_spatial_spark.operators import dedup_pipeline

    d = (
        load_table(spark, sf, "documents", fan_out=False)
        .where(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    kept = dedup_pipeline(
        d, "doc_id", "text", method="minhash", threshold=0.5,
        num_hashes=4, bands=2, k=4, hash_fn="md5",
    )
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("kept_sum"),
    )


def q80_webdataset_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """WebDataset tar-shard sink+source (the multimodal training-data
    container): build deterministic (image-bytes, caption) samples from
    part rows, write 4 shards distributed (one per partition, samples
    key-sorted and never split), read back one-task-per-shard, group to
    samples, aggregate. Oracle: the same aggregates arithmetically off the
    part table (payload sizes are closed-form in p_partkey)."""
    import tempfile

    from duckdb_spatial_spark.sources import (group_samples,
                                              st_read_webdataset,
                                              st_write_webdataset)

    part = (
        load_table(spark, sf, "part", fan_out=False)
        .filter(F.col("p_partkey") < 300)
        .select(
            F.format_string("%06d", F.col("p_partkey")).alias("key"),
            # img payload: (p_partkey % 17 + 1) repeated bytes
            F.expr(
                "repeat(chr(65 + p_partkey % 26), CAST(p_partkey % 17 + 1 AS INT))"
            ).cast("binary").alias("img"),
            F.encode(F.concat(F.lit("caption "), F.col("p_name")), "UTF-8")
            .alias("txt"),
        )
    )
    out = tempfile.mkdtemp(prefix="dss_q80_")
    st_write_webdataset(part, out, "key", {"img": "img.bin", "txt": "txt"},
                        num_shards=4)
    back = group_samples(st_read_webdataset(spark, out))
    return back.agg(
        F.count("*").alias("n_samples"),
        F.sum("n_parts").cast("long").alias("n_members"),
        F.sum("total_bytes").cast("long").alias("bytes_total"),
        F.sum(F.length(F.map_keys(F.col("parts")).getItem(0))).cast("long")
        .alias("ext_chars"),
    )


def q81_streaming_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-key
    running bbox sessions over the event stream. Update-mode rows grow
    monotonically per key, so aggregating min/max/max-n over the sink
    reconstructs each key's final state deterministically — giving a
    bespoke-state operator an exact SQL oracle."""
    from duckdb_spatial_spark.streaming import streaming_session_extents

    batch = load_table(spark, sf, "events", fan_out=False)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", (F.col("ts") / F.lit(1e9)).cast("timestamp"))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    pts = stream.select(
        "ts",
        (F.col("user_id") % 20).cast("string").alias("key"),
        F.col("value").alias("x"),
        F.col("user_id").cast("double").alias("y"),
    )
    sess = streaming_session_extents(
        pts, "key", "x", "y", "ts", watermark="1 day", timeout="1 second"
    )
    _Q75_SINK_SEQ[0] += 1
    sink = f"q81_sink_{_Q75_SINK_SEQ[0]}"
    # Single-pass drain: with no-data micro-batches disabled the
    # availableNow query terminates right after the data batches
    # instead of firing empty timeout-service epochs (ProcessingTime
    # timeouts only re-emit each closed session's last extents, which
    # the min/max/max-n sink aggregate already carries — row-level
    # verified + oracle-green both SFs). The drain loop keeps the old
    # empty-batch condition as a fallback and adds the is-active check
    # the self-terminating form needs.
    import time as _time

    with _stream_single_pass(spark):
        q = (
            sess.writeStream.format("memory").queryName(sink)
            .outputMode("update").trigger(availableNow=True).start()
        )
        deadline = _time.time() + 300
        while _time.time() < deadline:
            if not q.isActive:
                break
            prog = q.recentProgress
            if any(p["numInputRows"] > 0 for p in prog) and prog and \
                    prog[-1]["numInputRows"] == 0:
                break
            _time.sleep(0.2)
        q.stop()
        q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("key")
        .agg(
            F.round(F.min("xmin"), 6).alias("xmin"),
            F.round(F.min("ymin"), 6).alias("ymin"),
            F.round(F.max("xmax"), 6).alias("xmax"),
            F.round(F.max("ymax"), 6).alias("ymax"),
            F.max("n").alias("n"),
        )
        .transform(_ssort, "key")
    )


def q74_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition quality rules: docs with an injected spam
    block (doc_id % 7 == 0) must be dropped by the top-ngram / dup-ngram
    char-fraction thresholds. One Arrow-batched mapInPandas stage (per-doc
    Counters are linear; a col-expr formulation would be O(words²))."""
    from duckdb_spatial_spark.operators.pipeline import repetition_metrics

    d = load_table(spark, sf, "documents", fan_out=True)
    built = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.expr("repeat(' click here to win', 40)")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    m = repetition_metrics(built, top_ns=(2, 3, 4), dup_ns=(5, 10))
    keep = (
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("dup_line_char_frac") <= 0.20)
        & (F.col("top_2gram_char_frac") <= 0.20)
        & (F.col("top_3gram_char_frac") <= 0.18)
        & (F.col("top_4gram_char_frac") <= 0.16)
        & (F.col("dup_5gram_char_frac") <= 0.15)
        & (F.col("dup_10gram_char_frac") <= 0.10)
    )
    return m.agg(
        F.count("*").alias("n_docs"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.round(F.avg("top_2gram_char_frac"), 6).alias("avg_top2"),
        F.round(F.avg("dup_5gram_char_frac"), 6).alias("avg_dup5"),
    )


def q82_warc_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """WARC ingestion — the Common Crawl entry point of a web-scale
    training-data pipeline: render documents as HTML pages, write a
    Common-Crawl-layout .warc.gz corpus (distributed sink, one gzip member
    per record), scan it back one-task-per-file, split the HTTP payloads,
    extract clean text (html_to_text codegen regex chain), aggregate per
    language parsed off the target URI. The escape→render→extract
    composition reduces to exact whitespace normalization, so the oracle
    is the same aggregate straight off documents."""
    import tempfile

    from duckdb_spatial_spark.operators.textops import (escape_html,
                                                        html_to_text)
    from duckdb_spatial_spark.sources import st_read_warc, st_write_warc

    docs = load_table(spark, sf, "documents", fan_out=False)
    html = F.concat(
        F.lit("<html><head><title>doc</title>"
              "<style>p{margin:0}</style></head><body><!-- corpus --><p>"),
        escape_html(F.col("text")),
        F.lit("</p><script>var t='<p>';</script></body></html>"),
    )
    pages = docs.select(
        F.format_string("https://%s.example/%s/%d", F.col("source"),
                        F.col("lang"), F.col("doc_id")).alias("uri"),
        F.encode(html, "UTF-8").alias("body"),
    )
    out = tempfile.mkdtemp(prefix="dss_q82_")
    st_write_warc(pages, out, "uri", "body", num_files=8)
    back = st_read_warc(spark, out)
    txt = back.select(
        F.regexp_extract("target_uri", r"\.example/([a-z]+)/", 1)
        .alias("lang"),
        html_to_text(F.decode(F.col("payload"), "UTF-8")).alias("t"),
    )
    return (
        txt.groupBy("lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct(F.md5(F.col("t"))).cast("long")
            .alias("n_unique"),
            F.sum(F.length("t")).cast("long").alias("chars_total"),
        )
        .transform(_ssort, "lang")
    )


def _q83_url_expr_spark():
    """Deterministic URL corpus off orders — five shapes exercising mixed
    case, default/explicit ports, userinfo, tracking params, fragments and
    co.uk-style registrable domains."""
    shop = (F.col("o_custkey") % 50).cast("string")
    okey = F.col("o_orderkey").cast("string")
    p7 = (F.col("o_orderkey") % 7).cast("string")
    m = F.col("o_orderkey") % 5
    return (
        F.when(m == 0, F.concat(
            F.lit("https://Shop"), shop, F.lit(".example.COM/item/"), okey,
            F.lit("?utm_source=x&p="), p7))
        .when(m == 1, F.concat(
            F.lit("http://shop"), shop, F.lit(".example.com:80/item/"), okey))
        .when(m == 2, F.concat(
            F.lit("https://media.shop"), shop,
            F.lit(".example.co.uk/item/"), okey, F.lit("?fbclid=abc")))
        .when(m == 3, F.concat(
            F.lit("https://shop"), shop, F.lit(".example.com/item/"), okey,
            F.lit("#frag")))
        .otherwise(F.concat(
            F.lit("http://user@shop"), shop, F.lit(".example.com/item/"),
            okey, F.lit("?a=1&b="), p7))
    )


_Q83_URL_EXPR_SQL = """
    CASE o_orderkey % 5
      WHEN 0 THEN 'https://Shop' || CAST(o_custkey % 50 AS VARCHAR)
        || '.example.COM/item/' || CAST(o_orderkey AS VARCHAR)
        || '?utm_source=x&p=' || CAST(o_orderkey % 7 AS VARCHAR)
      WHEN 1 THEN 'http://shop' || CAST(o_custkey % 50 AS VARCHAR)
        || '.example.com:80/item/' || CAST(o_orderkey AS VARCHAR)
      WHEN 2 THEN 'https://media.shop' || CAST(o_custkey % 50 AS VARCHAR)
        || '.example.co.uk/item/' || CAST(o_orderkey AS VARCHAR)
        || '?fbclid=abc'
      WHEN 3 THEN 'https://shop' || CAST(o_custkey % 50 AS VARCHAR)
        || '.example.com/item/' || CAST(o_orderkey AS VARCHAR) || '#frag'
      ELSE 'http://user@shop' || CAST(o_custkey % 50 AS VARCHAR)
        || '.example.com/item/' || CAST(o_orderkey AS VARCHAR)
        || '?a=1&b=' || CAST(o_orderkey % 7 AS VARCHAR)
    END
"""


def _q83_oracle_sql() -> str:
    """DuckDB oracle for q83, generated from the SAME regex/step constants
    the Spark expressions use (operators/urlops.py *_sql twins)."""
    from duckdb_spatial_spark.operators import urlops as U

    nu = U.url_normalize_sql("url")
    dom = U.registrable_domain_sql(U.url_host_sql("url"))
    sch = U.url_scheme_sql("url")
    return f"""
        WITH u AS (SELECT {_Q83_URL_EXPR_SQL} AS url FROM orders),
        n AS (
          SELECT {nu} AS nu, {dom} AS domain, {sch} AS scheme FROM u
        )
        SELECT domain,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT nu) AS BIGINT) AS n_canonical,
               CAST(count(DISTINCT regexp_extract(nu, '^https?://([^/]+)', 1))
                    AS BIGINT) AS n_hosts,
               CAST(sum(CASE WHEN scheme = 'https' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_https
        FROM n GROUP BY 1 ORDER BY 1
    """


def q83_url_domain_stats(spark: SparkSession, sf: str) -> DataFrame:
    """URL tier of the web pipeline: normalize (case, default ports,
    userinfo, tracking params, fragments), dedup on the canonical form,
    group by registrable domain. Pure codegen projections → one shuffle on
    the low-cardinality domain key. Oracle: the DuckDB twin chain built
    from the same regex constants (operators/urlops.py)."""
    from duckdb_spatial_spark.operators import urlops as U

    orders = load_table(spark, sf, "orders", fan_out=True)
    u = orders.select(_q83_url_expr_spark().alias("url"))
    n = u.select(
        U.url_normalize(F.col("url")).alias("nu"),
        U.registrable_domain(U.url_host(F.col("url"))).alias("domain"),
        U.url_scheme(F.col("url")).alias("scheme"),
    )
    return (
        n.groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("nu").cast("long").alias("n_canonical"),
            F.countDistinct(F.regexp_extract("nu", r"^https?://([^/]+)", 1))
            .cast("long").alias("n_hosts"),
            F.sum((F.col("scheme") == "https").cast("long")).alias("n_https"),
        )
        .orderBy("domain")
    )


def q84_quality_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style head/middle/tail split: per-language quality-score
    ntile(3), the gate deciding what web text reaches training. Exact
    path (window sort per language — SQL-replicable); the scale path
    (percentile_approx cutoffs, no sort) is covered by unit tests."""
    from duckdb_spatial_spark.operators.pipeline import quality_buckets

    # fan_out=True: the multi-regex quality scoring is the heavy stage
    # and the testdata file is one row group — single-task otherwise
    d = load_table(spark, sf, "documents", fan_out=True)
    # score_col threads the already-computed score to the aggregate —
    # re-deriving it there would pay the multi-regex scan twice per row
    b = quality_buckets(d, "text", "lang", n_buckets=3, exact=True,
                        score_col="__qs")
    return (
        b.groupBy("lang", F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("__qs"), 6).alias("avg_q"),
            F.sum("n_chars").cast("long").alias("chars_total"),
        )
        .transform(_ssort, "lang", "bucket")
    )


def _q84_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.textops import quality_score_sql

    q = quality_score_sql("text")
    return f"""
        WITH s AS (
          SELECT doc_id, lang, n_chars, {q} AS q FROM documents
        ), b AS (
          SELECT lang, n_chars, q,
                 CAST(ntile(3) OVER (PARTITION BY lang
                                     ORDER BY q DESC, doc_id) AS BIGINT)
                   AS bucket
          FROM s
        )
        SELECT lang, bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(q), 6) AS avg_q,
               CAST(sum(n_chars) AS BIGINT) AS chars_total
        FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """


def q85_vocab_build(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed vocabulary induction (the corpus-wide stage of BPE
    training): explode → partial-aggregated groupBy count → TakeOrdered
    top-K by (freq DESC, word) — a per-partition heap + driver merge, no
    full sort. Deterministic total order, so the top-K SET matches the
    SQL oracle exactly."""
    from duckdb_spatial_spark.operators.tokenize import word_frequencies

    d = load_table(spark, sf, "documents", fan_out=False)
    return word_frequencies(d, "text", max_words=100) \
        .select("word", F.col("freq").cast("long").alias("freq"))


def q86_bpe_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end BPE tier: induce vocabulary distributed, train merges on
    the bounded word-frequency table (driver-side, like the IVF k-means
    train), broadcast-apply to every document (Arrow-batched, memoized),
    aggregate the token budget. Value-oracled since round 8: the DuckDB
    twin replays train AND apply with 200 unrolled merge-round CTEs
    (tokenize.bpe_doc_tokens_sql — the q111/PageRank unrolling pattern);
    unit tests additionally pin apply against an independent reference
    implementation."""
    from duckdb_spatial_spark.operators.tokenize import (apply_bpe,
                                                         train_bpe,
                                                         word_frequencies)

    d = load_table(spark, sf, "documents", fan_out=False)
    wf = [(r.word, r.freq)
          for r in word_frequencies(d, "text", max_words=5000).collect()]
    # 120 merge rounds: training CONVERGES at ~107 merges on this corpus
    # (31-word vocabulary), so the extra rounds are no-ops on both
    # engines — at 200 the oracle's unrolled replay paid ~22 s of pure
    # per-CTE overhead in DuckDB, distorting the engine pairing
    merges = train_bpe(wf, num_merges=120)
    tok = apply_bpe(d, "text", merges)
    return tok.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("tokens")).cast("long").alias("tokens_total"),
        F.round(F.avg(F.size("tokens")), 4).alias("avg_tokens"),
        # get() (0-based) instead of element_at: NULL for empty docs
        # rather than an ANSI INVALID_ARRAY_INDEX error
        F.countDistinct(F.get("tokens", 0)).cast("long")
        .alias("n_first_tokens"),
    )


def _q86_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.tokenize import bpe_doc_tokens_sql

    inner = bpe_doc_tokens_sql("documents", "text", "doc_id",
                               num_merges=120, max_words=5000)
    return f"""
        WITH __bpe AS ({inner})
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
               round(avg(n_tokens), 4) AS avg_tokens,
               CAST(count(DISTINCT first_tok) AS BIGINT) AS n_first_tokens
        FROM __bpe
    """


_Q87_V = 20  # vocab truncation small enough to force real <unk> mass


def q87_lm_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style fluency scoring: train an add-k-smoothed bigram LM on
    the corpus (two partial-aggregated shuffles, heavy-hitter vocab),
    score every document via broadcast joins, aggregate perplexity per
    language. Oracle: the self-contained SQL replica trains and scores
    with the identical formula."""
    from duckdb_spatial_spark.operators.lm import ngram_lm_doc_scores

    d = load_table(spark, sf, "documents", fan_out=True)
    # fused train+score: one word-count job + ONE final job (small-vocab
    # fast path: literal-map word ids, salted shared exchange); lang
    # rides the pipeline so no post-hoc join with the source table
    s = ngram_lm_doc_scores(d, "doc_id", "text", vocab_size=_Q87_V,
                            kind="addk", carry_cols=["lang"])
    return (
        s.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ppl"), 4).alias("avg_ppl"),
            F.round(F.min("ppl"), 4).alias("min_ppl"),
            F.round(F.max("ppl"), 4).alias("max_ppl"),
        )
        .transform(_ssort, "lang")
    )


def _q87_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.lm import ngram_lm_score_sql

    inner = ngram_lm_score_sql("documents", "doc_id", "text",
                               vocab_size=_Q87_V)
    return f"""
        WITH s AS ({inner})
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(s.ppl), 4) AS avg_ppl,
               round(min(s.ppl), 4) AS min_ppl,
               round(max(s.ppl), 4) AS max_ppl
        FROM s JOIN documents d ON d.doc_id = s.__id
        GROUP BY 1 ORDER BY 1
    """


def q88_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """Spatial KNN join (beyond-reference: the query shape next to the
    reference's R-tree range scans): 3 nearest supplier sites per event
    point, broadcast tier (right side bounded), deterministic
    (dist, right_id) tie-break. Oracle: cross join + row_number window
    with identical multiply-form distance arithmetic."""
    from duckdb_spatial_spark.operators.knn import st_knn_join

    ev = load_table(spark, sf, "events", fan_out=False).select(
        F.col("event_id").alias("left_id"),
        F.col("value").alias("x"),
        (F.col("user_id") % 150).cast("double").alias("y"),
    )
    sup = load_table(spark, sf, "supplier", fan_out=False).select(
        F.col("s_suppkey").alias("right_id"),
        ((F.col("s_suppkey") * 37) % 200).cast("double").alias("x"),
        ((F.col("s_suppkey") * 91) % 150).cast("double").alias("y"),
    )
    knn = st_knn_join(ev, sup, k=3)
    return (
        knn.groupBy(F.col("rank").cast("long").alias("rank"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("dist"), 6).alias("avg_dist"),
            F.countDistinct("right_id").cast("long").alias("n_neighbors"),
            F.sum("right_id").cast("long").alias("sum_rid"),
        )
        .transform(_ssort, "rank")
    )


def _q89_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.textops import split_sentences_sql

    ss = split_sentences_sql(
        "regexp_replace(text, '((?:\\w+ ){4}\\w+) ', '\\1. ', 'g')")
    return f"""
        WITH s AS (
          SELECT lang, unnest({ss}) AS s FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_sent,
               round(avg(len(string_split_regex(s, '\\s+'))), 6)
                 AS avg_words,
               CAST(max(length(s)) AS BIGINT) AS max_chars,
               CAST(count(DISTINCT md5(s)) AS BIGINT) AS n_unique
        FROM s GROUP BY 1 ORDER BY 1
    """


def _q90_oracle_sql() -> str:
    from duckdb_spatial_spark.operators import urlops as U

    dom = U.registrable_domain_sql(U.url_host_sql("url"))
    return f"""
        WITH u AS (
          SELECT o_orderkey, {_Q83_URL_EXPR_SQL} AS url FROM orders
        ), d AS (
          SELECT o_orderkey, {dom} AS domain,
                 row_number() OVER (PARTITION BY {dom}
                                    ORDER BY o_orderkey) AS rn
          FROM u
        )
        SELECT domain,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
               CAST(max(o_orderkey) AS BIGINT) AS max_key
        FROM d WHERE rn <= 100
        GROUP BY 1 ORDER BY 1
    """


def q89_sentence_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Sentence segmentation (RE2-safe extraction — no lookbehind, so the
    identical pattern runs in both engines): derive sentenced text by
    terminating every 5-word run, split, aggregate per language."""
    from duckdb_spatial_spark.operators.textops import split_sentences

    d = load_table(spark, sf, "documents", fan_out=False)
    sent = d.select(
        "lang",
        split_sentences(
            F.regexp_replace(F.col("text"), r"((?:\w+ ){4}\w+) ", "$1. ")
        ).alias("ss"),
    )
    ex = sent.select("lang", F.explode("ss").alias("s"))
    return (
        ex.groupBy("lang")
        .agg(
            F.count("*").alias("n_sent"),
            F.round(F.avg(F.size(F.split(F.col("s"), r"\s+"))), 6)
            .alias("avg_words"),
            F.max(F.length("s")).cast("long").alias("max_chars"),
            F.countDistinct(F.md5(F.col("s"))).cast("long")
            .alias("n_unique"),
        )
        .transform(_ssort, "lang")
    )


def q90_domain_quota(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain document cap (the anti-megadomain quota of web-corpus
    recipes): cap each registrable domain at 100 URLs in deterministic
    o_orderkey order, then report the realized mix."""
    from duckdb_spatial_spark.operators import urlops as U
    from duckdb_spatial_spark.operators.pipeline import cap_per_key

    orders = load_table(spark, sf, "orders", fan_out=True)
    u = orders.select("o_orderkey", _q83_url_expr_spark().alias("url"))
    d = u.select(
        "o_orderkey",
        U.registrable_domain(U.url_host(F.col("url"))).alias("domain"),
    )
    kept = cap_per_key(d, "domain", 100, "o_orderkey")
    return (
        kept.groupBy("domain")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
        .orderBy("domain")
    )


def q91_streaming_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join driven end-to-end: purchases follow
    clicks by ≤ 10 minutes per user (events split into two derived
    streams), availableNow drain, append sink. With all data drained the
    result equals the batch interval join, so a plain SQL self-join is an
    exact oracle."""
    from duckdb_spatial_spark.streaming import streaming_interval_join

    batch = load_table(spark, sf, "events", fan_out=False)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = stream.filter(F.col("event_type") == "click").select(
        (F.col("user_id") % 50).alias("k"), F.col("ts").alias("lt"),
        F.col("event_id").alias("click_id"))
    buys = stream.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 50).alias("k"), F.col("ts").alias("rt"),
        F.col("event_id").alias("buy_id"))
    j = streaming_interval_join(clicks, buys, "k", "lt", "rt",
                                lower="0 seconds", upper="10 minutes",
                                watermark="365 days")
    _Q75_SINK_SEQ[0] += 1
    sink = f"q91_sink_{_Q75_SINK_SEQ[0]}"
    # inner-join append output is emitted IN the data batch; the empty
    # trailing batch only advances the watermark to evict state this
    # terminating drain discards — skipping it removes one full round
    # of planning + 32 state-store commits (measured 1.27 s trigger)
    with _stream_single_pass(spark):
        q = (j.writeStream.format("memory").queryName(sink)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)
    return (
        spark.table(sink)
        .groupBy("k")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("click_id").cast("long").alias("sum_click"),
            F.sum("buy_id").cast("long").alias("sum_buy"),
        )
        .transform(_ssort, "k")
    )


def q92_text_clean(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode corpus cleaning: inject decomposed accents, a control char
    and a zero-width space into every document, clean (control/ZW strip
    codegen-side + NFC pandas stage), verify canonicalization via
    per-language md5/length aggregates. Oracle: DuckDB nfc_normalize +
    the same regexp chain (twin constants)."""
    from duckdb_spatial_spark.operators.textops import clean_text

    d = load_table(spark, sf, "documents", fan_out=False)
    # explicitly DECOMPOSED accent (e + U+0301) so NFC has real work to do
    dirty = F.concat(F.col("text"), F.lit(" cafee\u0301\x07\u200bdone"))
    c = d.select("lang", clean_text(dirty).alias("t"))
    return (
        c.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5(F.col("t"))).cast("long")
            .alias("n_unique"),
            F.sum(F.length("t")).cast("long").alias("chars_total"),
        )
        .transform(_ssort, "lang")
    )


def _q92_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.textops import clean_text_sql

    dirty = "text || ' cafee' || chr(769) || chr(7) || chr(8203) || 'done'"
    return f"""
        WITH c AS (
          SELECT lang, {clean_text_sql(f"({dirty})")} AS t FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT md5(t)) AS BIGINT) AS n_unique,
               CAST(sum(length(t)) AS BIGINT) AS chars_total
        FROM c GROUP BY 1 ORDER BY 1
    """


def q93_vec_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """int8 embedding quantization (4× storage for ANN corpora):
    quantize → dequantize, reconstruction-error stats per label. Pure
    col-expr with an exact DuckDB twin (same round-half-away rule)."""
    from duckdb_spatial_spark.operators.vectors import (dequantize_vec,
                                                        quantize_vec)

    e = load_table(spark, sf, "embeddings", fan_out=True)
    q = e.select(
        "label", "embedding",
        quantize_vec(F.col("embedding")).alias("q"),
    ).withColumn("deq", dequantize_vec(F.col("q")))
    err = F.array_max(F.zip_with(
        F.col("embedding"), F.col("deq"),
        lambda a, b: F.abs(a.cast("double") - b)))
    return (
        q.select(F.col("label").cast("long").alias("label"),
                 err.alias("err"),
                 F.col("q.scale").alias("scale"),
                 F.aggregate(F.col("q.codes"), F.lit(0),
                             lambda acc, c: acc + F.abs(c))
                 .cast("long").alias("l1"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("err"), 9).alias("avg_err"),
            F.round(F.max("err"), 9).alias("max_err"),
            F.round(F.avg("scale"), 9).alias("avg_scale"),
            F.sum("l1").cast("long").alias("l1_total"),
        )
        .transform(_ssort, "label")
    )


def _q93_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.vectors import (dequantize_vec_sql,
                                                        quantize_vec_sql)

    qs = quantize_vec_sql("embedding")
    deq = dequantize_vec_sql("q")
    return f"""
        WITH b AS (
          SELECT label, embedding, {qs} AS q FROM embeddings
        ), c AS (
          SELECT CAST(label AS BIGINT) AS label,
                 list_max(list_transform(
                   list_zip(embedding, {deq}),
                   p -> abs(CAST(p[1] AS DOUBLE) - p[2]))) AS err,
                 q.scale AS scale,
                 list_sum(list_transform(q.codes, x -> abs(x))) AS l1
          FROM b
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(err), 9) AS avg_err,
               round(max(err), 9) AS max_err,
               round(avg(scale), 9) AS avg_scale,
               CAST(sum(l1) AS BIGINT) AS l1_total
        FROM c GROUP BY 1 ORDER BY 1
    """


def q94_pca_project(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed PCA projection: one Gramian pass, pinned DEFLATED
    power iteration driver-side (8 components × 8 fixed steps from
    v0 = 1/√64 — vectors.pca_power_train), broadcast batched-matmul
    apply; report per-axis projected variance. Value-oracled since
    round 8: the recurrence replays exactly in SQL (pca_power_sql, the
    q111 unrolling extended with per-component deflation CTEs) — the
    eigh path (pca_train) stays for library users but is not
    SQL-replayable, which kept this query rows-only through round 7."""
    from duckdb_spatial_spark.operators.vectors import (pca_apply,
                                                        pca_power_train)

    e = load_table(spark, sf, "embeddings", fan_out=False)
    mean, comps, _lams = pca_power_train(e, "embedding", dim=64, k=8)
    p = pca_apply(e, "embedding", mean, comps)
    axes = [F.round(
        F.avg(F.col("pca")[i] * F.col("pca")[i])
        - F.avg(F.col("pca")[i]) * F.avg(F.col("pca")[i]), 6
    ).alias(f"var_{i}") for i in range(8)]
    return p.agg(F.count("*").alias("n"), *axes)


def _q94_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.vectors import pca_power_sql

    comps = pca_power_sql("embeddings", "embedding", dim=64, k=8, iters=8)
    axes = ",\n               ".join(
        f"round(max(CASE WHEN comp = {c + 1} THEN v END), 6) AS var_{c}"
        for c in range(8))
    return f"""
        WITH comps AS MATERIALIZED ({comps}),
        idx AS (SELECT unnest(generate_series(1, 64)) AS i),
        x AS MATERIALIZED (
          SELECT ROW_NUMBER() OVER () AS rid, embedding AS e
          FROM embeddings
        ),
        xi AS MATERIALIZED (
          SELECT rid, i, CAST(e[i] AS DOUBLE) AS x FROM x CROSS JOIN idx
        ),
        nn AS (SELECT count(*) AS n FROM x),
        mu AS (SELECT i, sum(x) / nn.n AS m
               FROM xi CROSS JOIN nn GROUP BY i, nn.n),
        proj AS (
          SELECT xi.rid, comps.comp,
                 sum((xi.x - mu.m) * comps.loading) AS p
          FROM xi JOIN mu USING (i) JOIN comps USING (i)
          GROUP BY 1, 2
        ),
        vars AS (
          SELECT comp, avg(p * p) - avg(p) * avg(p) AS v
          FROM proj GROUP BY 1
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM x) AS n,
               {axes}
        FROM vars
    """


def q95_profile_table(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality profile of lineitem (the ingest sanity pass): one job
    computes every column's (n, nulls, distinct, min, max); the tall
    result stacks driver-side. Oracle: per-column UNION ALL of the same
    aggregates."""
    from duckdb_spatial_spark.operators.pipeline import profile_table

    li = load_table(spark, sf, "lineitem", fan_out=False)
    cols = ["l_orderkey", "l_partkey", "l_quantity", "l_shipdate",
            "l_returnflag"]
    return profile_table(li, cols).transform(_ssort, "column")


def _q95_oracle_sql() -> str:
    cols = ["l_orderkey", "l_partkey", "l_quantity", "l_shipdate",
            "l_returnflag"]
    parts = []
    for c in cols:
        parts.append(f"""
          SELECT '{c}' AS column,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_null,
                 CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                 CAST(min({c}) AS VARCHAR) AS min_str,
                 CAST(max({c}) AS VARCHAR) AS max_str
          FROM lineitem""")
        # noqa
    return " UNION ALL ".join(parts) + " ORDER BY 1"


def q96_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Iterative PageRank (domain-authority shape): 5 synchronous
    iterations over a part→supplier link graph; each iteration is one
    equi-join + one aggregation, lineage kept O(1) by per-iteration
    persist. Oracle: the SAME recurrence unrolled as chained SQL CTEs
    (aggregates can't appear in a recursive CTE term, so fixed-iteration
    unrolling IS the SQL form)."""
    from duckdb_spatial_spark.operators.graph import pagerank

    li = load_table(spark, sf, "lineitem", fan_out=False)
    edges = li.select((F.col("l_partkey") % 300).alias("src"),
                      (F.col("l_suppkey") % 300).alias("dst"))
    r = pagerank(edges, iters=5)
    return (
        r.agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.round(F.sum("rank"), 9).alias("mass"),
            F.round(F.max("rank"), 9).alias("max_rank"),
            F.round(F.min("rank"), 9).alias("min_rank"),
            F.round(F.avg("rank"), 9).alias("avg_rank"),
        )
    )


def _q96_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.graph import pagerank_sql

    inner = pagerank_sql(
        "SELECT l_partkey % 300 AS src, l_suppkey % 300 AS dst "
        "FROM lineitem", iters=5)
    return f"""
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               round(sum(rank), 9) AS mass,
               round(max(rank), 9) AS max_rank,
               round(min(rank), 9) AS min_rank,
               round(avg(rank), 9) AS avg_rank
        FROM ({inner})
    """


def q97_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe two-level aggregation: lineitem revenue per return flag
    (3 keys over 600k rows at sf0.1 — exactly the hot-key shape) through
    the salted partial/final plan; result provably equals the direct
    groupBy, which is the oracle."""
    from duckdb_spatial_spark.operators.pipeline import salted_agg

    li = load_table(spark, sf, "lineitem", fan_out=False)
    out = salted_agg(
        li, "l_returnflag",
        {
            "n": (F.col("l_quantity"), "count"),
            "qty": (F.col("l_quantity").cast("long"), "sum"),
            "min_ext": (F.col("l_extendedprice"), "min"),
            "max_ext": (F.col("l_extendedprice"), "max"),
        },
        salt=16,
    )
    return out.select(
        "l_returnflag", F.col("n").cast("long").alias("n"),
        F.col("qty").cast("long").alias("qty"),
        F.round("min_ext", 2).alias("min_ext"),
        F.round("max_ext", 2).alias("max_ext"),
    ).transform(_ssort, "l_returnflag")


def q98_corpus_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot audit between two corpus versions (derived
    deterministically: v2 drops doc_id%7==0, rewrites doc_id%5==0,
    appends shifted ids): added/removed/changed/unchanged counts — only
    hashes shuffle, never text."""
    from duckdb_spatial_spark.operators.pipeline import corpus_diff

    d = load_table(spark, sf, "documents", fan_out=False)
    v2 = (
        d.filter(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            d.limit(0).select("doc_id", "text")  # schema anchor
        )
        .unionByName(
            d.filter(F.col("doc_id") % 11 == 0)
            .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        )
    )
    diff = corpus_diff(d.select("doc_id", "text"), v2, "doc_id", "text")
    return (
        diff.groupBy("status")
        .agg(F.count("*").alias("n"),
             F.sum("id").cast("long").alias("sum_id"))
        .transform(_ssort, "status")
    )


def q99_minhash_index(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental near-dup ingestion: LSH index built over the OLD half
    of the corpus, NEW half queried against it with one (band, key)
    equi-join — old text never re-read. Oracle: the same signature/bucket
    arithmetic in SQL with a cross-half bucket join."""
    from duckdb_spatial_spark.operators.dedup import (minhash_index_build,
                                                      minhash_index_query)

    d = load_table(spark, sf, "documents", fan_out=False)
    old = d.filter(F.col("doc_id") < 100)
    new = d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    index = minhash_index_build(old, "doc_id", "text",
                                num_hashes=4, bands=2, k=4)
    cand = minhash_index_query(new, index, "doc_id", "text",
                               num_hashes=4, bands=2, k=4)
    return cand.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.coalesce(F.sum(F.col("id_a") + F.col("id_b")), F.lit(0))
        .cast("long").alias("pair_sum"),
    )


def q100_bloom_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """q70's decontamination through the Bloom-prefiltered scale path
    (distributed bit-array build via treeReduce, executor-side gram drop
    before the join). The Bloom is prefilter-only — false positives die
    in the exact join — so the ORACLE IS THE SAME SQL as the exact path:
    a driver-checked proof the scale path changes shuffle volume, not
    results."""
    from duckdb_spatial_spark.operators.pipeline import decontaminate

    # fan_out=True: the gram explode + hash is the heavy stage and the
    # testdata file is a single row group — without the fan-out the
    # whole 2.3M-gram build runs on ONE core
    d = load_table(spark, sf, "documents", fan_out=True)
    bench = d.where(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 12))
        .alias("text"),
    )
    flagged = decontaminate(d, bench, n=8, mode="flag", bloom_fpp=0.01,
                            flag_projection=["n_chars"])
    return flagged.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("contaminated").cast("long")).alias("n_contam"),
        F.sum(F.when(~F.col("contaminated"), F.col("n_chars"))
              .otherwise(F.lit(0))).alias("chars_clean"),
    )


def q101_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide repeated-span removal (word-level Lee et al. 2021):
    every duplicated 8-word window keeps only its globally-first
    occurrence. Int-only shuffles (window hash, then kill positions);
    text never shuffles — the reconstruction join is on doc_id."""
    from duckdb_spatial_spark.operators.dedup import substring_dedup

    d = load_table(spark, sf, "documents", fan_out=True)
    out = substring_dedup(d, "doc_id", "text", k=8)
    return (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("words_total"),
            F.sum("n_removed").cast("long").alias("words_removed"),
            F.sum(F.length("text")).cast("long").alias("chars_after"),
        )
        .transform(_ssort, "source")
    )


def _render_c4_pages(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-line page corpus derived from documents (the word-soup rows
    have no newlines/punctuation, so — like q82's HTML render — the query
    first builds pages deterministically: 7-word lines whose terminator
    cycles . ! ? <none> on (doc_id + line#) % 4, plus a 'lorem ipsum'
    line on doc_id%41 and a curly-brace line on doc_id%43). The SQL
    oracle replays the identical arithmetic. fan_out=True: the render +
    multi-regex clean is the heavy stage and the file is one row group
    — single-task otherwise."""
    d = load_table(spark, sf, "documents", fan_out=True)
    w = d.select(
        "doc_id", "source",
        F.split(F.regexp_replace(F.trim(F.lower(F.col("text"))),
                                 r"\s+", " "), " ").alias("_w"),
    )
    nlines = F.ceil(F.size(F.col("_w")) / F.lit(7.0)).cast("int")
    term = lambda j: (
        F.when((F.col("doc_id") + j) % 4 == 0, F.lit("."))
        .when((F.col("doc_id") + j) % 4 == 1, F.lit("!"))
        .when((F.col("doc_id") + j) % 4 == 2, F.lit("?"))
        .otherwise(F.lit(""))
    )
    lines = F.transform(
        F.sequence(F.lit(1), nlines),
        lambda j: F.concat(
            F.concat_ws(" ", F.slice(F.col("_w"), (j - 1) * 7 + 1, 7)),
            term(j),
        ),
    )
    page = F.concat_ws("\n", lines)
    page = F.when(F.col("doc_id") % 41 == 0,
                  F.concat(page, F.lit("\nlorem ipsum vestibulum amet.")))\
        .otherwise(page)
    page = F.when(F.col("doc_id") % 43 == 0,
                  F.concat(page, F.lit("\nheader { margin: 0; }")))\
        .otherwise(page)
    return w.select("doc_id", "source", page.alias("page"))


def q102_c4_filters(spark: SparkSession, sf: str) -> DataFrame:
    """The published C4 cleaning heuristics (Raffel et al. 2020 §2.2:
    terminal-punctuation lines of >=5 words, no javascript lines; pages
    need >=3 surviving sentence-lines, no blocklist hit, no 'lorem
    ipsum', no '{') as one whole-stage-codegen projection — zero
    shuffles before the final rollup."""
    from duckdb_spatial_spark.operators.pipeline import c4_clean

    pages = _render_c4_pages(spark, sf)
    cleaned = c4_clean(pages, text_col="page", min_words_per_line=5,
                       min_lines=3)
    return (
        cleaned.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.sum(F.col("c4_keep").cast("long")).alias("n_kept"),
            F.sum("n_lines").cast("long").alias("lines_total"),
            F.sum("n_lines_kept").cast("long").alias("lines_kept"),
            F.sum(F.when(F.col("c4_keep"), F.length("clean_text"))
                  .otherwise(F.lit(0))).cast("long").alias("chars_clean"),
        )
        .transform(_ssort, "source")
    )


def q103_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 term saliency, top-3 terms per doc over a 100-doc slice:
    one (doc, term) partial-agg shuffle; document frequencies, doc count
    and avgdl broadcast back; per-doc window for the top-k. Scores join
    identical double arithmetic in the SQL twin (constants embedded via
    repr so both engines parse the same doubles)."""
    from duckdb_spatial_spark.operators.rank import bm25_topk

    d = load_table(spark, sf, "documents", fan_out=False) \
        .filter(F.col("doc_id") < 100)
    out = bm25_topk(d, "doc_id", "text", k=3, k1=1.2, b=0.75)
    return out.select(
        "doc_id", "term", "tf", "dfreq", "dl",
        (F.round(F.col("score"), 6) + F.lit(0.0)).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    ).transform(_ssort, "doc_id", "rank")


def q104_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means cells + within-cell
    drop-if-earlier-neighbor-within-cosine-tau. Centroids are pinned to
    the first 32 embeddings (like q55's IVF oracle) so the assignment is
    SQL-replayable; tau=0.45 sits inside the corpus' cosine range. Only
    ids leave the per-cell Python stage."""
    import numpy as np

    from duckdb_spatial_spark.operators.similarity import semdedup

    e = load_table(spark, sf, "embeddings", fan_out=False)
    cent_rows = _probe_sorted(
        e.filter((F.col("vec_id") < 32)
                 & F.col("embedding").isNotNull()),
        "vec_id", "embedding")
    C = np.asarray(cent_rows, dtype=np.float64)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    flagged = semdedup(e, "vec_id", "embedding", threshold=0.45,
                       centroids=C, mode="flag")
    return (
        flagged.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(F.col("semdedup_drop").cast("long")).alias("n_dropped"),
            F.sum(F.when(~F.col("semdedup_drop"), F.col("vec_id"))
                  .otherwise(F.lit(0))).cast("long").alias("kept_id_sum"),
        )
        .transform(_ssort, "label")
    )


def q105_dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance resampling (Xie et al., NeurIPS 2023 — public
    method): hashed unigram+bigram bucket models (2048 buckets, ascii-
    decoded md5 — the portable hash), target = English src0/src1 docs,
    add-1 smoothing, Gumbel top-25 with the portable seeded uniform
    (Gumbel top-k == sampling-without-replacement ∝ w). Pure codegen:
    one explode per corpus pass, ≤2048-row models broadcast back,
    int-only shuffles past the explode."""
    from duckdb_spatial_spark.operators import dsir

    d = load_table(spark, sf, "documents", fan_out=True)
    target = d.filter(
        (F.col("lang") == "en") & F.col("source").isin("src0", "src1"))
    out = dsir.dsir_sample(d, target, k=25, buckets=2048, alpha=1.0,
                           gumbel_seed=7)
    return out.select(
        "doc_id", "n_grams",
        # + 0.0 normalizes IEEE -0.0 (the q147/q148 signed-zero class:
        # logw and the Gumbel key are signed quantities whose 6-dp
        # rounding can hit zero, and the engines disagree on its sign)
        (F.round("logw", 6) + F.lit(0.0)).alias("logw"),
        (F.round("key", 6) + F.lit(0.0)).alias("key"),
    ).transform(_ssort, F.col("key").desc(), "doc_id")


def q106_nb_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based quality filtering (the fastText-classifier stage of
    the GPT-3/LLaMA/CCNet recipes), as multinomial Naive Bayes over
    hashed unigram+bigram buckets: trains in ONE distributed counting
    pass on the even-doc_id half (label: lang='en'), scores the odd
    half with a broadcast ≤2·buckets-row model. Exact oracle replays
    train AND score (log-odds decomposed as delta-above-smoothing-floor
    so untrained buckets cancel exactly in both engines)."""
    from duckdb_spatial_spark.operators import classify

    d = load_table(spark, sf, "documents", fan_out=True)
    # split-of-one-corpus form: ONE shared gram aggregate feeds both the
    # train counts and the scored side via exchange reuse, and the tiny
    # model shuffle-joins instead of broadcasting — one job end to end
    out = classify.nb_train_score_split(
        d.withColumn("label", F.col("lang") == "en"),
        F.col("doc_id") % 2 == 0,
        buckets=2048, alpha=1.0)
    return out.select(
        "doc_id", "n_grams",
        (F.round("nb_score", 6) + F.lit(0.0)).alias("nb_score"),
    ).orderBy(F.col("nb_score").desc(), "doc_id").limit(20)


def _q107_ph_expr():
    """Deterministic 63-bit fingerprint per doc: four independent 15/16-bit
    md5-bucket hashes of the doc's base id packed into one long, with a
    planted 1-bit flip for the upper doc half — every step replays in SQL."""
    from duckdb_spatial_spark.operators.dsir import hashed_bucket

    base = (F.col("doc_id") % 250).cast("string")
    h1 = hashed_bucket(F.concat(F.lit("s1|"), base), 32768).cast("long")
    h2 = hashed_bucket(F.concat(F.lit("s2|"), base), 65536).cast("long")
    h3 = hashed_bucket(F.concat(F.lit("s3|"), base), 65536).cast("long")
    h4 = hashed_bucket(F.concat(F.lit("s4|"), base), 65536).cast("long")
    ph = (h1 * F.lit(1 << 48) + h2 * F.lit(1 << 32)
          + h3 * F.lit(1 << 16) + h4)
    # F.shiftleft only takes a Python-int bit count — use the SQL form,
    # which accepts a column expression for the shift amount
    flip = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 6 AS INT))")
    return F.when(F.col("doc_id") < 250, ph).otherwise(ph.bitwiseXOR(flip))


def q107_hamming_image_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash near-dup tier (image dedup): hamming_neardup_pairs
    over a 64-bit fingerprint column — the same operator consumes the
    aHash that image_features emits (tested on real decoded images in
    tests/test_hamming_dedup.py; here the fingerprint is a deterministic
    md5-packed long with planted 1-bit flips so the oracle is exact).
    The LSH candidate set is provably lossless for max_hamming < bands,
    so the oracle deliberately uses the straight all-pairs formulation —
    a different algorithm checking the same answer."""
    from duckdb_spatial_spark.operators.dedup import hamming_neardup_pairs

    d = load_table(spark, sf, "documents", fan_out=False) \
        .select("doc_id", _q107_ph_expr().alias("ph"))
    pairs = hamming_neardup_pairs(d, "doc_id", "ph", bits=64, bands=8,
                                  max_hamming=2)
    return (
        pairs.select(
            F.col("id_a"), F.col("id_b"),
            F.col("hamming").cast("long").alias("hamming"))
        .transform(_ssort, "id_a", "id_b")
    )


def q108_lm_kneser_ney(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995 /
    Chen & Goodman 1999 — the standard upgrade over q87's add-k for
    fluency filtering): absolute discounting with distinct-continuation
    backoff. All three KN statistics tables derive from the bigram
    counts alone (no extra corpus pass), stay bounded by the vocab, and
    broadcast at score time. Oracle: self-contained SQL replica of
    train + KN score."""
    from duckdb_spatial_spark.operators.lm import ngram_lm_doc_scores

    d = load_table(spark, sf, "documents", fan_out=True)
    # fused train+score (see q87): the KN statistics derive from the
    # same salted exchange that scoring consumes; lang rides the
    # pipeline (carry_cols) so no post-hoc join with the source table
    s = ngram_lm_doc_scores(d, "doc_id", "text", vocab_size=_Q87_V,
                            kind="kn", discount=0.75, carry_cols=["lang"])
    return (
        s.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ppl"), 4).alias("avg_ppl"),
            F.round(F.min("ppl"), 4).alias("min_ppl"),
            F.round(F.max("ppl"), 4).alias("max_ppl"),
        )
        .transform(_ssort, "lang")
    )


def q109_geoparquet_covering(spark: SparkSession, sf: str) -> DataFrame:
    """GeoParquet 1.1 bbox-covering roundtrip: write supplier points to a
    covered GeoParquet (distributed sink emits the per-row bbox struct +
    covering metadata), read back with a spatial window — the reader
    turns the window into PushedFilters on bbox.* (parquet row-group
    pruning, zero geometry decode on pruned groups) — aggregate. Oracle:
    the same window straight off the supplier table."""
    import tempfile

    from duckdb_spatial_spark.sources.geoparquet import st_write_geoparquet
    from duckdb_spatial_spark.sources.read import st_read

    sup = (
        load_table(spark, sf, "supplier", fan_out=False)
        .select(
            F.col("s_suppkey").alias("k"),
            ST.st_point(
                (F.col("s_suppkey") % 200).cast("double"),
                F.col("s_acctbal"),
            ).alias("geom"),
        )
    )
    path = tempfile.mkdtemp(prefix="dss_q109_")
    st_write_geoparquet(sup, path, geom_col="geom", covering=True)
    back = st_read(spark, path, bbox=(50.0, -100000.0, 120.0, 100000.0),
                   geom_col="geom")
    return back.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("sk"),
        F.round(F.sum(ST.st_x("geom")), 2).alias("sx"),
        F.round(F.sum(ST.st_y("geom")), 2).alias("sy"),
    )


def q110_unigram_tokenizer(spark: SparkSession, sf: str) -> DataFrame:
    """SentencePiece-ULM tokenization end-to-end (train driver-side over
    the heavy-hitter word table, broadcast Viterbi apply): per-language
    document counts and total token characters. The oracle is the
    tokenizer's coverage INVARIANT — Viterbi segmentation with never-
    pruned single-char pieces reproduces each word exactly, so the total
    token characters equal the corpus' non-whitespace characters, which
    SQL computes directly (the training itself is iterative and has no
    SQL form; this pins that the full train+apply pipeline ran and
    covered every word)."""
    from duckdb_spatial_spark.operators.tokenize import (apply_unigram,
                                                         train_unigram,
                                                         word_frequencies)

    d = load_table(spark, sf, "documents", fan_out=True)
    wf = [(r.word, r.freq)
          for r in word_frequencies(d, "text", max_words=3000).collect()]
    logp = train_unigram(wf, vocab_size=400, max_piece_len=6,
                         em_iters=1, prune_rounds=2)
    toks = apply_unigram(d, "text", logp)
    return (
        toks.select("lang",
                    F.aggregate(F.transform("tokens", lambda t: F.length(t)),
                                F.lit(0), lambda a, x: a + x).alias("_tc"))
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("_tc").cast("long").alias("token_chars"))
        .transform(_ssort, "lang")
    )


def q111_pca_power_iteration(spark: SparkSession, sf: str) -> DataFrame:
    """Principal component by pinned power iteration (8 fixed steps from
    v0 = 1/√64): each step is ONE distributed pass — per-row centered dot
    with the broadcast v, then 64 covariance averages — so, unlike q94's
    eigh path, the whole computation replays exactly in SQL (unrolled
    CTEs, like the PageRank oracle). Output: the 64 loadings and the
    Rayleigh-quotient eigenvalue, hash-checked."""
    from duckdb_spatial_spark.operators.vectors import power_iteration_top1

    e = load_table(spark, sf, "embeddings", fan_out=False)
    v, lam = power_iteration_top1(e, "embedding", dim=64, iters=8)
    rows = [(i + 1, round(v[i], 6), round(lam, 6)) for i in range(64)]
    return spark.createDataFrame(
        rows, "i long, loading double, eigenvalue double").transform(_ssort, "i")


def q116_ann_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): the 64-dim embeddings
    compress to m=8 codes against per-subspace codebooks; search is the
    compressed exhaustive ADC scan — codes explode to int triples, meet
    the per-query distance LUT on an equi-join, and one map-side-combined
    SUM yields the approximate distance; raw vectors are never read at
    scan time. Codebooks pinned to the first 16 vectors' subvectors (the
    q55 pattern) so the oracle replays encode + LUT + top-k in pure SQL
    with DOUBLE-cast arithmetic and (rounded distance, id) ordering."""
    import numpy as np

    from duckdb_spatial_spark.operators.pq import (ann_pq_topk,
                                                   subvectors_from_rows)

    emb = load_table(spark, sf, "embeddings", fan_out=False)
    probe = _probe_pairs(
        emb.filter((F.col("vec_id") < 16)
                   & F.col("embedding").isNotNull()),
        "vec_id", "embedding")
    codebooks = subvectors_from_rows([v for _, v in probe], 8)  # (8,16,8)
    # query vectors are a prefix of the codebook probe already on the
    # driver — inlined, the ADC-LUT build's queries.collect() reads a
    # LocalRelation instead of running a second corpus-scan job
    queries = _local_queries(spark, emb, probe, 5)
    return (
        ann_pq_topk(emb, queries, codebooks, k=5)
        .withColumn("rank", F.col("rank").cast("long"))
        .transform(_ssort, "query_id", "rank")
    )


def _q116_oracle_sql() -> str:
    """Full SQL replay of the PQ pipeline: subvector slicing, argmin
    encode (tie-break on code index, matching numpy argmin), ADC LUT,
    lookup-sum, (rounded d2, id) top-k."""
    return """
        WITH js AS (SELECT unnest(range(8)) AS j),
        sub AS (
          SELECT vec_id, j,
                 list_transform(list_slice(embedding, j*8+1, j*8+8),
                                x -> CAST(x AS DOUBLE)) AS sv
          FROM embeddings, js
        ),
        cb AS (
          SELECT j, CAST(vec_id AS INT) AS c, sv AS cent
          FROM sub WHERE vec_id < 16 AND sv IS NOT NULL
        ),
        enc AS (
          SELECT vec_id, j, c FROM (
            SELECT s.vec_id, s.j, cb.c,
                   row_number() OVER (
                     PARTITION BY s.vec_id, s.j
                     ORDER BY list_sum(list_transform(range(1, 9),
                       t -> (s.sv[t] - cb.cent[t]) * (s.sv[t] - cb.cent[t]))),
                       cb.c) AS rn
            FROM sub s JOIN cb ON s.j = cb.j
          ) WHERE rn = 1
        ),
        lut AS (
          SELECT q.vec_id AS query_id, cb.j, cb.c,
                 list_sum(list_transform(range(1, 9),
                   t -> (q.sv[t] - cb.cent[t]) * (q.sv[t] - cb.cent[t])))
                   AS d2
          FROM sub q JOIN cb ON q.j = cb.j
          WHERE q.vec_id < 5
        ),
        scored AS (
          SELECT lut.query_id, enc.vec_id,
                 round(sum(lut.d2), 6) AS adc_d2
          FROM enc JOIN lut ON enc.j = lut.j AND enc.c = lut.c
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT query_id, vec_id, adc_d2,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc_d2, vec_id) AS rank
          FROM scored
        )
        SELECT query_id, vec_id, adc_d2, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """


def q117_dbscan(spark: SparkSession, sf: str) -> DataFrame:
    """Exact distributed DBSCAN (grid method): eps-neighbors via a 3×3
    cell equi-join (one shuffle, no cross join), core points by a
    map-side-combined neighbor count, clusters as connected components of
    the core-core graph (the dedup tier's three-tier components), borders
    adopt the smallest core-neighbor label — fully deterministic, so the
    oracle replays it with the same cell grid and a recursive reach.
    Points: the q88 synthetic plane (value, user_id%150), pinned to
    event_id < 1500 — a fixed workload at every sf, so the oracle's
    quadratic recursive reach stays bounded (the Spark components tier
    itself has no such bound)."""
    from duckdb_spatial_spark.operators.dbscan import dbscan

    e = load_table(spark, sf, "events", fan_out=False)
    pts = e.filter(F.col("event_id") < 1500).select(
        F.col("event_id").alias("id"), F.col("value").alias("x"),
        (F.col("user_id") % 150).cast("double").alias("y"))
    lab = dbscan(pts, "id", "x", "y", eps=6.0, min_pts=5)
    return (
        lab.groupBy("role")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("label").cast("long").alias("n_labels"),
            F.sum("label").cast("long").alias("sum_label"),
        )
        .transform(_ssort, "role")
    )


def _q117_oracle_sql() -> str:
    offs = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""
        WITH RECURSIVE p AS (
          SELECT event_id AS id, value AS x,
                 CAST(user_id % 150 AS DOUBLE) AS y
          FROM events WHERE event_id < 1500
        ), cell AS (
          SELECT id, x, y,
                 CAST(floor(x / 6.0) AS BIGINT) AS cx,
                 CAST(floor(y / 6.0) AS BIGINT) AS cy
          FROM p
        ), probe AS (
          SELECT c.id, c.x, c.y, c.cx + o.dx AS cx, c.cy + o.dy AS cy
          FROM cell c, (VALUES {offs}) o(dx, dy)
        ), nbr AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM probe a JOIN cell b ON a.cx = b.cx AND a.cy = b.cy
          WHERE a.id <> b.id
            AND (a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y) <= 36.0
        ), cnt AS (
          SELECT p.id, 1 + count(n.id_b) AS n_nbr
          FROM p LEFT JOIN nbr n ON n.id_a = p.id GROUP BY p.id
        ), core AS (
          SELECT id FROM cnt WHERE n_nbr >= 5
        ), edges AS (
          SELECT n.id_a AS src, n.id_b AS dst FROM nbr n
          JOIN core c1 ON c1.id = n.id_a
          JOIN core c2 ON c2.id = n.id_b
        ), reach AS (
          SELECT id AS node, id AS lbl FROM core
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
        ), comp AS (
          SELECT node AS id, min(lbl) AS comp FROM reach GROUP BY 1
        ), border AS (
          SELECT n.id_a AS id, min(c.comp) AS b_label
          FROM nbr n JOIN comp c ON c.id = n.id_b
          WHERE n.id_a NOT IN (SELECT id FROM core)
          GROUP BY 1
        ), lab AS (
          SELECT p.id,
                 COALESCE(c.comp, b.b_label, -1) AS label,
                 CASE WHEN c.comp IS NOT NULL THEN 'core'
                      WHEN b.b_label IS NOT NULL THEN 'border'
                      ELSE 'noise' END AS role
          FROM p LEFT JOIN comp c ON c.id = p.id
                 LEFT JOIN border b ON b.id = p.id
        )
        SELECT role,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT label) AS BIGINT) AS n_labels,
               CAST(sum(label) AS BIGINT) AS sum_label
        FROM lab GROUP BY 1 ORDER BY 1
    """


def q118_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe equi-join: events join a per-type dim on event_type —
    5 distinct keys, the textbook mega-key shape that melts one reducer
    in a plain shuffle join. salted_join spreads each key over 8 sub-keys
    (deterministic row-hash salt) and replicates the dim side per salt;
    the result is row-identical to the plain join, which is exactly what
    the oracle runs."""
    from duckdb_spatial_spark.operators.pipeline import salted_join

    e = load_table(spark, sf, "events", fan_out=False)
    dim = e.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("type_avg"))
    j = salted_join(e.select("event_type", "value"), dim,
                    ["event_type"], salt=8)
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.max("type_avg"), 6).alias("type_avg"),
        )
        .transform(_ssort, "event_type")
    )


def q119_histogram_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Portable quantiles from a fixed-bin histogram sketch: per event
    type, p50/p90/p99 of value from a ≤256-row-per-group sketch
    (map-side-combined counts; merge across corpora = per-bin +). Unlike
    Spark's native approxQuantile (Greenwald-Khanna), every step —
    binning, cumsum, interpolation — replays in ANSI SQL, so the oracle
    is bit-identical before rounding."""
    from duckdb_spatial_spark.operators.sketch import (histogram_quantiles,
                                                       histogram_sketch)

    e = load_table(spark, sf, "events", fan_out=False)
    sk = histogram_sketch(e, F.col("value"), 0.0, 500.0, 256,
                          by=["event_type"])
    out = histogram_quantiles(sk, [0.5, 0.9, 0.99], 0.0, 500.0, 256,
                              by=["event_type"])
    return out.select(
        "event_type", "q", F.round("est", 6).alias("est")
    ).transform(_ssort, "event_type", "q")


def _q119_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.sketch import (histogram_bin_sql,
                                                       histogram_quantile_sql)

    b = histogram_bin_sql("value", 0.0, 500.0, 256)
    parts = " UNION ALL ".join(
        f"SELECT event_type, q, round(est, 6) AS est FROM ("
        f"{histogram_quantile_sql(q, 0.0, 500.0, 256, 'sk', ['event_type'])})"
        for q in (0.5, 0.9, 0.99))
    return f"""
        WITH sk AS (
          SELECT event_type, {b} AS bin,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        )
        SELECT * FROM ({parts}) ORDER BY event_type, q
    """


def q120_wordpiece_tokenizer(spark: SparkSession, sf: str) -> DataFrame:
    """WordPiece (BERT) tokenization end-to-end — the third tokenizer
    next to BPE (q85/q86) and unigram-LM (q110): likelihood-scored merge
    training driver-side over the heavy-hitter word table, broadcast
    greedy longest-match apply. Oracle: the coverage invariant (single-
    char fallback pieces make segmentation lossless, so token characters
    minus '##' prefixes equal the corpus' non-whitespace characters,
    which SQL computes directly — the q110 pattern; the segmentations
    themselves are pinned by unit tests)."""
    from duckdb_spatial_spark.operators.tokenize import (apply_wordpiece,
                                                         train_wordpiece,
                                                         word_frequencies)

    d = load_table(spark, sf, "documents", fan_out=True)
    wf = [(r.word, r.freq)
          for r in word_frequencies(d, "text", max_words=3000).collect()]
    vocab = train_wordpiece(wf, vocab_size=600)
    toks = apply_wordpiece(d, "text", vocab)
    tlen = F.transform(
        "tokens",
        lambda t: F.length(t)
        - F.when(t.startswith("##"), F.lit(2)).otherwise(F.lit(0)))
    return (
        toks.select(
            "lang",
            F.aggregate(tlen, F.lit(0), lambda a, x: a + x).alias("_tc"))
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("_tc").cast("long").alias("token_chars"))
        .transform(_ssort, "lang")
    )


def q121_resample_ffill(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series gap-fill (TimescaleDB time_bucket_gapfill + locf /
    InfluxDB fill(previous)): per user-group, a regular 6-hour grid over
    the observed span carrying the latest purchase at-or-before each tick
    — grid = distinct keys × sequence (no driver loop), fill = the asof
    machinery, two narrow shuffles total. Oracle: DuckDB generate-series
    grid + native ASOF LEFT JOIN."""
    from duckdb_spatial_spark.operators.temporal import resample_ffill

    e = _events_utc(spark, load_table(spark, sf, "events", fan_out=False))
    obs = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy((F.col("user_id") % 20).alias("k"),
                 F.unix_micros("ts").alias("t_us"))
        .agg(F.max("value").alias("v"))
    )
    grid = resample_ffill(obs, ["k"], "t_us", ["v"],
                          step_us=6 * 3600 * 1_000_000)
    return (
        grid.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_ticks"),
            F.count("v").cast("long").alias("n_filled"),
            F.round(F.sum("v"), 6).alias("v_sum"),
        )
        .transform(_ssort, "k")
    )


def q122_rolling_window(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time rolling aggregate via Spark's native RANGE window frame
    (rangeBetween −7 days … now over integer µs): per user-group, each
    event's trailing-week spend (exact BIGINT cents — no float drift
    across engines) and event count; checksummed per key. Pure built-in
    window — §2.J relational breadth the reference gets from DuckDB's
    RANGE frames."""
    e = _events_utc(spark, load_table(spark, sf, "events", fan_out=False))
    look = 7 * 86400 * 1_000_000
    pts = e.select(
        F.col("event_id").alias("eid"),
        (F.col("user_id") % 20).alias("k"),
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # Sliding RANGE frames are O(rows x frame) in Spark's WindowExec (the
    # aggregate buffer is rebuilt per row — ~100k rows x ~1k-row frames =
    # 10^8 updates here, and frame width grows with data density at
    # scale). Rewritten as O(rows): trailing sum == running RANGE-cum at
    # the row minus the cum at a probe row planted at (t - look - 1µs);
    # RANGE unbounded..current includes ties, so the probe's cum is
    # exactly the mass strictly before the window start. Integer sums —
    # bit-identical to the frame form (verified row-level incl. null
    # ts/cents: null-t rows form their own peer-group frame, handled by
    # the whole-partition window below; roll_cents NULL-vs-0 differences
    # are erased by the final sum()).
    nn = pts.filter(F.col("t").isNotNull())
    probes = nn.select(
        "eid", "k", (F.col("t") - F.lit(look) - 1).alias("t"),
        F.lit(None).cast("long").alias("cents"), F.lit(1).alias("probe"))
    un = nn.withColumn("probe", F.lit(0)).unionByName(probes)
    wc = (Window.partitionBy("k").orderBy("t")
          .rangeBetween(Window.unboundedPreceding, 0))
    cnt_w = F.when((F.col("probe") == 0) & F.col("cents").isNotNull(),
                   F.lit(1)).otherwise(F.lit(0))
    per = (
        un.select("eid", "k", "probe",
                  F.sum("cents").over(wc).alias("cum_c"),
                  F.sum(cnt_w).over(wc).alias("cum_n"))
        .groupBy("eid")
        .agg(F.max("k").alias("k"),
             F.max(F.when(F.col("probe") == 0, F.col("cum_c"))).alias("ac"),
             F.max(F.when(F.col("probe") == 0, F.col("cum_n"))).alias("an"),
             F.max(F.when(F.col("probe") == 1, F.col("cum_c"))).alias("bc"),
             F.max(F.when(F.col("probe") == 1, F.col("cum_n"))).alias("bn"))
        .select("k",
                (F.col("ac") - F.coalesce("bc", F.lit(0))).alias("roll_cents"),
                (F.col("an") - F.coalesce("bn", F.lit(0))).alias("roll_n"))
    )
    wnull = Window.partitionBy("k")
    nulls = pts.filter(F.col("t").isNull()).select(
        "k", F.sum("cents").over(wnull).alias("roll_cents"),
        F.count("cents").over(wnull).alias("roll_n"))
    return (
        per.unionByName(nulls).groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("roll_cents").cast("long").alias("sum_roll_cents"),
            F.max("roll_n").cast("long").alias("max_roll_n"),
            F.sum("roll_n").cast("long").alias("sum_roll_n"),
        )
        .transform(_ssort, "k")
    )


def q123_hll_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """HLL set algebra: estimated vocabulary overlap between two document
    sources — union is register-wise max (the merge that makes the sketch
    shardable), intersection is inclusion-exclusion. Exact overlap
    computed alongside. Every register and every estimator step replays
    in SQL, so the oracle is hash-exact after rounding."""
    from duckdb_spatial_spark.operators.sketch import (hll_overlap_estimate,
                                                       hll_registers)

    d = load_table(spark, sf, "documents", fan_out=False)
    words = (
        d.filter(F.col("source").isin("src1", "src2"))
        .select("source", F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    ra = hll_registers(words.filter(F.col("source") == "src1"),
                       F.col("word"), 10)
    rb = hll_registers(words.filter(F.col("source") == "src2"),
                       F.col("word"), 10)
    est = hll_overlap_estimate(ra, rb, 10)
    exact = (
        words.groupBy("word")
        .agg(F.countDistinct("source").alias("ns"))
        .agg(F.count("*").cast("long").alias("n_union_exact"),
             F.sum(F.when(F.col("ns") == 2, 1).otherwise(0))
             .cast("long").alias("n_both_exact"))
    )
    return est.crossJoin(exact).select(
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.round("est_union", 4).alias("est_union"),
        F.round("est_intersect", 4).alias("est_intersect"),
        "n_union_exact", "n_both_exact",
    )


def _q123_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.sketch import (hll_estimate_sql,
                                                       hll_register_sql)

    bucket, rho = hll_register_sql("word", 10)
    est = hll_estimate_sql(10)
    return f"""
        WITH w AS (
          SELECT source,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents WHERE source IN ('src1', 'src2')
        ), ww AS (
          SELECT source, word FROM w WHERE word <> ''
        ), ra AS (
          SELECT {bucket} AS bucket, max({rho}) AS reg FROM ww
          WHERE source = 'src1' GROUP BY 1
        ), rb AS (
          SELECT {bucket} AS bucket, max({rho}) AS reg FROM ww
          WHERE source = 'src2' GROUP BY 1
        ), ru AS (
          SELECT bucket, max(reg) AS reg FROM (
            SELECT * FROM ra UNION ALL SELECT * FROM rb
          ) GROUP BY 1
        ), ga AS (
          SELECT CAST(sum(CAST(1 AS BIGINT) << (49 - reg)) AS BIGINT)
                   AS s_present,
                 CAST(count(*) AS BIGINT) AS n_present FROM ra
        ), gb AS (
          SELECT CAST(sum(CAST(1 AS BIGINT) << (49 - reg)) AS BIGINT)
                   AS s_present,
                 CAST(count(*) AS BIGINT) AS n_present FROM rb
        ), gu AS (
          SELECT CAST(sum(CAST(1 AS BIGINT) << (49 - reg)) AS BIGINT)
                   AS s_present,
                 CAST(count(*) AS BIGINT) AS n_present FROM ru
        ), ests AS (
          SELECT (SELECT {est} FROM ga) AS est_a,
                 (SELECT {est} FROM gb) AS est_b,
                 (SELECT {est} FROM gu) AS est_union
        ), exact AS (
          SELECT CAST(count(*) AS BIGINT) AS n_union_exact,
                 CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_both_exact
          FROM (SELECT word, count(DISTINCT source) AS ns
                FROM ww GROUP BY 1)
        )
        SELECT round(est_a, 4) AS est_a,
               round(est_b, 4) AS est_b,
               round(est_union, 4) AS est_union,
               round(est_a + est_b - est_union, 4) AS est_intersect,
               n_union_exact, n_both_exact
        FROM ests, exact
    """


def q124_corpus_divergence(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus drift metric: add-k-smoothed unigram KL(A‖B)/KL(B‖A)/JS
    between two source halves of the corpus over the shared heavy-hitter
    vocabulary — the language-level monitoring step next to q98's
    document-level corpus_diff. One bounded vocab table, single-pass
    divergence aggregates; the oracle replays counts, the deterministic
    vocab cut, and the identical double arithmetic."""
    from duckdb_spatial_spark.operators.textops import corpus_divergence

    d = load_table(spark, sf, "documents", fan_out=False)
    half_a = F.col("source").rlike("^src[0-9]$")
    res = corpus_divergence(
        d.filter(half_a), d.filter(~half_a), vocab_limit=3000)
    return res.select(
        "vocab_size", "n_a", "n_b",
        F.round("kl_ab", 6).alias("kl_ab"),
        F.round("kl_ba", 6).alias("kl_ba"),
        F.round("js", 6).alias("js"),
    )


def _q124_oracle_sql() -> str:
    add_k, lim = 0.5, 3000
    return f"""
        WITH w AS (
          SELECT source,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents
        ), ww AS (
          SELECT regexp_matches(source, '^src[0-9]$') AS in_a, word
          FROM w WHERE word <> ''
        ), ca AS (
          SELECT word, CAST(count(*) AS BIGINT) AS na FROM ww
          WHERE in_a GROUP BY 1
        ), cb AS (
          SELECT word, CAST(count(*) AS BIGINT) AS nb FROM ww
          WHERE NOT in_a GROUP BY 1
        ), merged AS (
          SELECT coalesce(ca.word, cb.word) AS word,
                 coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
          FROM ca FULL OUTER JOIN cb ON ca.word = cb.word
        ), vocab AS (
          SELECT * FROM merged ORDER BY na + nb DESC, word LIMIT {lim}
        ), tot AS (
          SELECT CAST(sum(na) AS BIGINT) AS ta,
                 CAST(sum(nb) AS BIGINT) AS tb,
                 CAST(count(*) AS BIGINT) AS v
          FROM vocab
        ), probs AS (
          SELECT (na + {add_k!r}) / (ta + {add_k!r} * v) AS pa,
                 (nb + {add_k!r}) / (tb + {add_k!r} * v) AS pb
          FROM vocab, tot
        )
        SELECT (SELECT v FROM tot) AS vocab_size,
               (SELECT ta FROM tot) AS n_a,
               (SELECT tb FROM tot) AS n_b,
               round(sum(pa * ln(pa / pb)), 6) AS kl_ab,
               round(sum(pb * ln(pb / pa)), 6) AS kl_ba,
               round(0.5 * sum(pa * ln(pa / ((pa + pb) / 2.0)))
                     + 0.5 * sum(pb * ln(pb / ((pa + pb) / 2.0))), 6) AS js
        FROM probs
    """


def _events_utc(spark: SparkSession, e: DataFrame) -> DataFrame:
    """events.ts as TIMESTAMP (LTZ): the driver parquet may surface NTZ,
    which unix_micros rejects — pin the session to UTC so the cast is
    epoch-faithful (the q75/q91 pattern)."""
    if dict(e.dtypes).get("ts") == "timestamp_ntz":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        e = e.withColumn("ts", F.col("ts").cast("timestamp"))
    return e


def q112_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join, the temporal operator DuckDB ships natively (ASOF JOIN)
    and Spark lacks: every click event picks the latest purchase at or
    before it within its user-group key, 1-hour tolerance. Spark plan: the
    union-tag window formulation — ONE hash shuffle on the key, no range
    join (operators/temporal.py). Oracle: DuckDB's own ASOF LEFT JOIN with
    the identical tolerance CASE — a different algorithm entirely."""
    from duckdb_spatial_spark.operators.temporal import asof_join

    e = _events_utc(spark, load_table(spark, sf, "events", fan_out=False))
    clicks = e.filter(F.col("event_type") == "click").select(
        (F.col("user_id") % 50).alias("k"), F.col("ts"),
        F.col("event_id").alias("click_id"))
    # purchases deduped to one row per (k, ts): ASOF tie-breaking between
    # equal right timestamps is engine-defined, so the inputs make it moot
    buys = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy((F.col("user_id") % 50).alias("k"), F.col("ts"))
        .agg(F.max("event_id").alias("buy_id"),
             F.max("value").alias("buy_value"))
    )
    j = asof_join(clicks, buys, "ts", "ts", by=["k"],
                  value_cols=["buy_id", "buy_value"],
                  tolerance_us=3_600_000_000)
    return (
        j.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_clicks"),
            F.count("matched_ts").cast("long").alias("n_matched"),
            F.sum("buy_id").cast("long").alias("sum_buy"),
            F.round(F.sum("buy_value"), 6).alias("sum_value"),
            F.sum(F.unix_micros("ts") - F.unix_micros("matched_ts"))
            .cast("long").alias("lag_us"),
        )
        .transform(_ssort, "k")
    )


def q113_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-overlap join (DuckDB: IEJoin range join; Spark has no
    native range join): click validity windows [ts, ts+10·value s] overlap
    purchase windows [ts, ts+600 s] per user-group key. Plan: fixed-width
    bucket grid, pairs deduped by the greatest-start bucket (no distinct),
    long intervals diverted to a broadcast path (operators/temporal.py).
    Oracle: the plain overlap-predicate join."""
    from duckdb_spatial_spark.operators.temporal import interval_join

    e = _events_utc(spark, load_table(spark, sf, "events", fan_out=False))
    us = F.unix_micros(F.col("ts"))
    clicks = e.filter(F.col("event_type") == "click").select(
        (F.col("user_id") % 50).alias("k"), us.alias("s"),
        (us + F.floor(F.col("value") * 10).cast("long") * 1_000_000)
        .alias("e"),
        F.col("event_id").alias("click_id"))
    buys = e.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 50).alias("k"), us.alias("s"),
        (us + F.lit(600_000_000)).alias("e"),
        F.col("event_id").alias("buy_id"))
    j = interval_join(clicks, buys, "s", "e", "s", "e", by=["k"],
                      bucket_width=600e6)
    overlap = (F.least(F.col("e"), F.col("e_r"))
               - F.greatest(F.col("s"), F.col("s_r")))
    return (
        j.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("click_id").cast("long").alias("sum_click"),
            F.sum("buy_id").cast("long").alias("sum_buy"),
            F.sum(overlap).cast("long").alias("overlap_us"),
        )
        .transform(_ssort, "k")
    )


def q114_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language distinct-word cardinality by portable HyperLogLog
    (m=1024) next to the exact count. The registers are a map-side-combined
    groupBy(bucket).max(rho) — the sketch, not the values, crosses the
    wire; merging corpora is the same max. The oracle replays the IDENTICAL
    register computation in SQL (ascii-decoded md5, integer harmonic sum) —
    both engines produce the same estimate to the last bit before
    rounding."""
    from duckdb_spatial_spark.operators.sketch import (hll_estimate,
                                                       hll_registers)

    d = load_table(spark, sf, "documents", fan_out=False)
    words = (
        d.select("lang", F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    regs = hll_registers(words, F.col("word"), 10, by=["lang"])
    est = hll_estimate(regs, 10, by=["lang"]).withColumn(
        "hll_est", F.round(F.col("est"), 4)).drop("est")
    exact = words.groupBy("lang").agg(
        F.countDistinct("word").cast("long").alias("n_exact"))
    return exact.join(est, "lang").select(
        "lang", "n_exact", "hll_est").transform(_ssort, "lang")


def q115_count_min(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min frequency sketch (depth 4 × width 1024) over corpus words:
    the sketch is a bounded 4096-cell table (map-side partial sums — raw
    words never shuffle), probed for the 15 globally most frequent words.
    Estimates are upper bounds; the oracle rebuilds the identical sketch
    cells in SQL and reports the same (est, true) pairs."""
    from duckdb_spatial_spark.operators.sketch import (count_min_estimate,
                                                       count_min_sketch)

    d = load_table(spark, sf, "documents", fan_out=False)
    words = (
        d.select(F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    # ONE corpus-weight shuffle: aggregate words→freq first, then derive
    # BOTH the sketch (weight=freq: Σ_cell freq ≡ Σ_cell 1-per-occurrence,
    # exact integers) and the top-15 from that vocab-bounded table. The
    # raw-words formulation paid the corpus scan 5× (4 sketch branches +
    # the count): measured 4.7 s → this shape. LAZY persist, not eager
    # localCheckpoint or a limit-probe: the sketch broadcast evaluates
    # first and fills the cache, the top-15 branch then reads it — the
    # corpus shuffle runs once with NO extra job barrier (localCheckpoint
    # added a 0.5 s materialization job; a limit(cap).collect() probe was
    # worse still — CollectLimit's incremental partition waves re-ran the
    # whole aggregate per wave, measured 4.3 s).
    wf = (
        words.groupBy("word").agg(F.count("*").cast("long").alias("freq"))
        .persist()
    )
    sk = count_min_sketch(wf, F.col("word"), depth=4, width=1024,
                          weight=F.col("freq"))
    top = wf.orderBy(F.col("freq").desc(), F.col("word")).limit(15)
    # broadcast=False: the probe side is 15 rows, so the 4096-cell
    # sketch joins as a plain shuffle join inside the ONE final job —
    # a broadcast would add a whole build-job barrier just to avoid
    # exchanging 60 probe rows
    est = count_min_estimate(sk, top, F.col("word"), depth=4, width=1024,
                             broadcast=False)
    return est.select(
        "word", "freq", "est",
        (F.col("est") - F.col("freq")).cast("long").alias("overshoot"),
    ).transform(_ssort, F.col("freq").desc(), F.col("word"))


def q125_cluster_append(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental layout maintenance — the reference R-tree's CRUD path
    (rtree.cpp:75-267, rtree_crud.test): the even-key supplier half is
    hilbert-clustered to parquet, the odd half arrives as TWO
    st_cluster_append batches (fresh sorted files, existing files
    untouched), st_cluster_compact then merges the small files; a
    count-in-envelope + checksums off the maintained dataset must equal
    the same filter over the full table — the full-recompute oracle."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import (st_cluster,
                                                st_cluster_append,
                                                st_cluster_compact)

    sup = (
        load_table(spark, sf, "supplier", fan_out=False)
        .select(
            F.col("s_suppkey").alias("k"),
            (F.col("s_suppkey") % 200).cast("double").alias("x"),
            F.col("s_acctbal").cast("double").alias("y"),
        )
    )
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q125_"), "ds")
    st_cluster(sup.filter(F.col("k") % 2 == 0), "x", "y",
               num_partitions=4).write.parquet(path)
    st_cluster_append(sup.filter(F.col("k") % 4 == 1), path, "x", "y")
    st_cluster_append(sup.filter(F.col("k") % 4 == 3), path, "x", "y")
    st_cluster_compact(spark, path, "x", "y", small_file_bytes=256 << 10)
    ds = read_layout(spark, path)
    win = ds.filter(
        (F.col("x") >= 50.0) & (F.col("x") <= 120.0)
        & (F.col("y") >= -1000.0) & (F.col("y") <= 5000.0)
    )
    return win.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("sk"),
        F.round(F.sum("x"), 2).alias("sx"),
        F.round(F.sum("y"), 2).alias("sy"),
    )


def q126_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization (Snowflake SESSIONIZE / Flink session-window
    analog, the batch twin of q81's stateful streaming sessions): per
    user-group, events split into sessions at >30-minute gaps with a
    total (ts, event_id) order; per-key session count, event count, max
    session size and summed session span. One shuffle + one window pass
    (operators/temporal.py sessionize); integer-µs arithmetic keeps the
    oracle bit-exact — the oracle is the same lag/cumsum window replayed
    in ANSI SQL."""
    from duckdb_spatial_spark.operators.temporal import sessionize

    e = _events_utc(spark, load_table(spark, sf, "events", fan_out=False))
    ev = e.select(
        (F.col("user_id") % 50).alias("k"),
        F.unix_micros("ts").alias("t"),
        F.col("event_id").alias("eid"),
    )
    sess = sessionize(ev, ["k"], "t", gap_us=30 * 60 * 1_000_000,
                      order_cols=["eid"])
    per_sess = sess.groupBy("k", "session_id").agg(
        F.count("*").alias("n"),
        (F.max("t") - F.min("t")).alias("span"),
    )
    return (
        per_sess.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("n").cast("long").alias("n_events"),
            F.max("n").cast("long").alias("max_session_events"),
            F.sum("span").cast("long").alias("span_sum_us"),
        )
        .transform(_ssort, "k")
    )


def _q126_oracle_sql() -> str:
    return """
        WITH ev AS (
          SELECT user_id % 50 AS k,
                 epoch_us(ts) AS t,
                 event_id AS eid
          FROM events
        ), flagged AS (
          SELECT k, t, eid,
                 CASE WHEN lag(t) OVER w IS NULL
                       OR t - lag(t) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM ev WINDOW w AS (PARTITION BY k ORDER BY t, eid)
        ), sess AS (
          SELECT k, t,
                 sum(new_s) OVER (PARTITION BY k ORDER BY t, eid
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        ), per_sess AS (
          SELECT k, sid, count(*) AS n, max(t) - min(t) AS span
          FROM sess GROUP BY 1, 2
        )
        SELECT k,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(n) AS BIGINT) AS n_events,
               CAST(max(n) AS BIGINT) AS max_session_events,
               CAST(sum(span) AS BIGINT) AS span_sum_us
        FROM per_sess GROUP BY 1 ORDER BY 1
    """


def q127_edit_distance_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact edit-distance near-dup over document-head fingerprints
    (the string-similarity dedup tier next to jaccard/minhash/simhash/
    hamming): all pairs within levenshtein distance 2 of the first-32-
    char whitespace-stripped lowercased head. Candidates via the q-gram
    COUNT filter (Gravano et al., VLDB 2001 — multiset-intersection
    bound, zero recall loss), verified with Spark's banded levenshtein.
    Oracle: the brute-force quadratic definition in DuckDB — a different
    algorithm agreeing on the same exact pair set."""
    from duckdb_spatial_spark.operators.dedup import edit_distance_pairs

    d = load_table(spark, sf, "documents", fan_out=True)
    s = d.select(
        "doc_id",
        F.lower(F.regexp_replace(
            F.substring("text", 1, 32), r"\s", "")).alias("head"),
    )
    # q=6: templated corpus heads share most trigrams at most positions,
    # so 3-gram candidates were ~2.7M pairs for 256 survivors; 6-grams
    # cut the candidate join ~7x (the bound stays positive: heads are
    # >= 24 chars > q*(d+1)-1 = 17)
    pairs = edit_distance_pairs(s, "doc_id", "head", max_distance=2, q=6)
    # _ssort, not a global orderBy: the trailing orderBy's range-bounds
    # sampling job re-executed the whole verification join (trap 15)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("distance").cast("int").alias("distance"),
    ).transform(_ssort, "id_a", "id_b")


def _q127_oracle_sql() -> str:
    return """
        WITH s AS (
          SELECT doc_id,
                 lower(regexp_replace(substring(text, 1, 32),
                                      '\\s', '', 'g')) AS head
          FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.head, b.head) AS INT) AS distance
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE abs(length(a.head) - length(b.head)) <= 2
          AND levenshtein(a.head, b.head) <= 2
        ORDER BY id_a, id_b
    """


def q128_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Exact triangle counting over an events-derived graph — the third
    graph workload next to PageRank (q96) and connected components
    (q69): degree-ordered edge orientation (Suri & Vassilvitskii
    WWW'11) caps the wedge join's fanout at ~sqrt(m) per vertex, so hub
    neighborhoods never go quadratic. Oracle: the a<b<c three-way
    self-join definition in SQL — a different enumeration agreeing on
    the exact count."""
    from duckdb_spatial_spark.operators.graph import triangle_count

    e = load_table(spark, sf, "events", fan_out=False)
    edges = e.select(
        (F.col("user_id") % 2000).alias("src"),
        ((F.col("user_id") * 31 + F.col("event_id")) % 2000).alias("dst"),
    )
    return triangle_count(edges)


_Q128_ORACLE = """
    WITH e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM (SELECT user_id % 2000 AS src,
                   (user_id * 31 + event_id) % 2000 AS dst
            FROM events)
      WHERE src <> dst AND src IS NOT NULL AND dst IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e xy
    JOIN e yz ON yz.a = xy.b
    JOIN e xz ON xz.a = xy.a AND xz.b = yz.b
"""


def q129_cluster_delete(spark: SparkSession, sf: str) -> DataFrame:
    """Full CRUD cycle on a hilbert-clustered layout — the reference
    R-tree's delete path (rtree.cpp:75-267 RTreeIndex::Delete,
    test/sql/index/rtree_crud.test:14,37): cluster the even-key supplier
    half, st_cluster_append the odd half, st_cluster_delete a spatially
    tight slice (rewrites only the affected files), st_cluster_compact
    the small remainder; deleted-row count + count-in-envelope +
    checksums off the maintained dataset must equal the full-recompute
    oracle over supplier with the delete predicate negated."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import (st_cluster,
                                                st_cluster_append,
                                                st_cluster_compact,
                                                st_cluster_delete)

    sup = (
        load_table(spark, sf, "supplier", fan_out=False)
        .select(
            F.col("s_suppkey").alias("k"),
            (F.col("s_suppkey") % 200).cast("double").alias("x"),
            F.col("s_acctbal").cast("double").alias("y"),
        )
    )
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q129_"), "ds")
    st_cluster(sup.filter(F.col("k") % 2 == 0), "x", "y",
               num_partitions=4).write.parquet(path)
    st_cluster_append(sup.filter(F.col("k") % 2 == 1), path, "x", "y")
    nd = st_cluster_delete(
        spark, path, "x >= 80.0 AND x <= 130.0 AND y < 0.0")
    st_cluster_compact(spark, path, "x", "y", small_file_bytes=256 << 10)
    ds = read_layout(spark, path)
    win = ds.filter(
        (F.col("x") >= 50.0) & (F.col("x") <= 120.0)
        & (F.col("y") >= -1000.0) & (F.col("y") <= 5000.0)
    )
    return win.agg(
        F.lit(int(nd)).cast("long").alias("nd"),
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("sk"),
        F.round(F.sum("x"), 2).alias("sx"),
        F.round(F.sum("y"), 2).alias("sy"),
    )


def q130_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index layout + conjunctive query — the text twin of the
    R-tree layout family (the reference's CREATE INDEX → pruned-scan
    rewrite, rtree_index_plan_scan.cpp, re-expressed for terms): build
    a (term, segment) posting Parquet sorted by term (min/max stats
    prune a query's scan to the requested terms; posting lists are
    SEGMENTED so a stopword's list never materializes as one row), then
    answer df('dup'), df('the') and the conjunctive 'dup' AND 'the'
    count + doc-id checksum from the INDEX alone. Oracle recomputes all
    of it straight off the corpus."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import (build_inverted_index,
                                                conjunctive_query,
                                                index_term_stats)

    d = load_table(spark, sf, "documents", fan_out=True)
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q130_"), "idx")
    build_inverted_index(d, path, "doc_id", "text", segment_size=500)
    ta, tb = "dup", "the"
    st = (
        index_term_stats(spark, path, [ta, tb])
        .agg(
            F.max(F.when(F.col("term") == ta, F.col("df"))).alias("df_a"),
            F.max(F.when(F.col("term") == tb, F.col("df"))).alias("df_b"),
        )
    )
    both = conjunctive_query(spark, path, [ta, tb]).agg(
        F.count("*").cast("long").alias("n_both"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("sk_both"),
    )
    return st.crossJoin(both).select(
        F.lit(ta).alias("term_a"), F.lit(tb).alias("term_b"),
        "df_a", "df_b", "n_both", "sk_both",
    )


def q131_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-k SEARCH served from the scored inverted-index layout
    (term frequencies and doc lengths denormalized into the postings —
    the norms-in-the-index design), INCLUDING the append path: build
    the index over the even docs, ``scored_index_append`` the odd docs
    (new generation files only — the old postings are never re-read),
    then answer a 3-term disjunctive query from the index ALONE (pruned
    postings scan + one per-doc aggregation; document frequency and
    (N, avgdl) aggregate across generations at query time). The oracle
    recomputes BM25 over the WHOLE corpus, so a stale df or stats row
    after the append would hash-mismatch. Per-doc double sums fold in
    ascending-term order so the oracle's ``SUM(p ORDER BY term)``
    replays them bit-for-bit; ranking uses the ROUNDED score so the
    k-boundary can't split on a last-ulp difference."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import (bm25_search,
                                                build_scored_index,
                                                scored_index_append)

    d = load_table(spark, sf, "documents", fan_out=True)
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q131_"), "sidx")
    build_scored_index(d.filter(F.col("doc_id") % 2 == 0), path,
                       "doc_id", "text", segment_size=500)
    scored_index_append(d.filter(F.col("doc_id") % 2 == 1), path,
                        "doc_id", "text", segment_size=500)
    return (
        bm25_search(spark, path, ["hash", "vector", "data"], k=10)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
    )


def _q131_oracle_sql(k1: float = 1.2, b: float = 0.75,
                     terms=("hash", "vector", "data")) -> str:
    # constants embedded via repr so both engines parse the very same
    # doubles the Spark plan uses (q103's convention)
    _d = lambda v: f"CAST({v!r} AS DOUBLE)"
    return f"""
    WITH words AS (
      SELECT doc_id,
             string_split(regexp_replace(trim(lower(text)),
                                         '\\s+', ' ', 'g'), ' ') AS w
      FROM documents
    ), terms AS (
      SELECT doc_id, t.term
      FROM words, LATERAL (SELECT unnest(w)) AS t(term)
      WHERE t.term <> ''
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM terms GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM tf GROUP BY 1
    ), nd AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM documents
    ), dl AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
    ), ad AS (SELECT avg(dl) AS avgdl FROM dl),
    q AS (SELECT unnest([{', '.join(repr(t) for t in terms)}]) AS term),
    partials AS (
      SELECT tf.doc_id, tf.term,
             ln({_d(1.0)} + (n_docs - dfreq + {_d(0.5)})
                            / (dfreq + {_d(0.5)}))
               * tf.tf * {_d(k1 + 1.0)}
               / (tf.tf + {_d(k1)} * ({_d(1.0 - b)}
                                      + {_d(b)} * dl.dl / avgdl)) AS p
      FROM tf JOIN q USING (term) JOIN dfreq USING (term)
              JOIN dl USING (doc_id), nd, ad
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
           round(sum(p ORDER BY term), 6) AS score
    FROM partials GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 10
    """


def q132_shard_permutation(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic training-shard assignment (the seeded global
    shuffle every LLM export runs): shard = portable-hash bucket of the
    doc id, pos = rank of a second independent hash within the shard —
    a retry-stable pseudo-random permutation with ONE hash exchange and
    a per-shard spillable sort, never a corpus-wide total sort. Output:
    per-shard row count, pos range, and a (doc, pos)-coupling checksum
    the oracle replays from the same portable hash."""
    from duckdb_spatial_spark.operators import shard_assign

    d = load_table(spark, sf, "documents", fan_out=True)
    a = shard_assign(d, "doc_id", n_shards=16, seed=7)
    return (
        a.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("pos").cast("long").alias("min_pos"),
            F.max("pos").cast("long").alias("max_pos"),
            F.sum(F.col("doc_id") * (F.col("pos") % 97)).cast("long")
             .alias("sk"),
        )
        .orderBy("shard")
        .select(F.col("shard").cast("int").alias("shard"),
                "n", "min_pos", "max_pos", "sk")
    )


def q133_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    """N-dimensional Z-order layout (the multi-column generalization of
    the hilbert family; Delta/Iceberg's OPTIMIZE ZORDER BY shape):
    events clustered on (value, user_id) with an interleaved-bit
    col-expr key, written to Parquet, then a 2-column range query runs
    OFF THE LAYOUT — count + id/value checksums must equal a straight
    recompute from the source table (the layout must preserve the
    multiset exactly; pruning effectiveness is pinned by
    tests/test_zorder.py's row-group stats assertions)."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import zorder_cluster

    ev = load_table(spark, sf, "events", fan_out=True)
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q133_"), "z")
    zorder_cluster(ev.select("event_id", "user_id", "value"),
                   ["value", "user_id"], num_partitions=8).write.parquet(path)
    back = read_layout(spark, path)
    return (
        back.filter(F.col("value").between(100.0, 250.0)
                    & F.col("user_id").between(20, 80))
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("event_id").cast("long").alias("sk"),
             F.round(F.sum("value"), 2).alias("sv"))
    )


_Q133_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS sk,
           round(sum(value), 2) AS sv
    FROM events
    WHERE value BETWEEN 100.0 AND 250.0 AND user_id BETWEEN 20 AND 80
"""


def q134_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-phrase search ('hash join') off a POSITIONAL inverted
    index: postings carry each term's token positions per doc, so the
    phrase becomes an adjacency fold —
    array_intersect(positions+1, next_positions) over doc-keyed joins
    of the two terms' postings; the corpus is never re-scanned at query
    time. Oracle recomputes via tokenize-with-ordinality + positional
    self-join straight off the documents table."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import (build_positional_index,
                                                phrase_query)

    d = load_table(spark, sf, "documents", fan_out=True)
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q134_"), "pidx")
    build_positional_index(d, path, "doc_id", "text", segment_size=500)
    m = phrase_query(spark, path, ["hash", "join"])
    return m.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_occurrences").cast("long").alias("n_occ"),
        F.max("n_occurrences").cast("long").alias("max_occ"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("sk"),
    )


_Q134_ORACLE = """
    WITH w AS (
      SELECT doc_id,
             string_split(regexp_replace(trim(lower(text)),
                                         '\\s+', ' ', 'g'), ' ') AS w
      FROM documents
    ), t AS (
      SELECT doc_id, unnest(w) AS term, generate_subscripts(w, 1) AS pos
      FROM w
    ), hits AS (
      SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      WHERE a.term = 'hash' AND b.term = 'join'
      GROUP BY a.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_occurrences) AS BIGINT) AS n_occ,
           CAST(max(n_occurrences) AS BIGINT) AS max_occ,
           CAST(COALESCE(sum(doc_id), 0) AS BIGINT) AS sk
    FROM hits
"""


def q138_streaming_index(spark: SparkSession, sf: str) -> DataFrame:
    """Structured-Streaming maintenance of the BM25 index: the even
    docs are batch-built, the odd docs arrive as a file STREAM
    (availableNow) whose micro-batches append index GENERATIONS via
    foreachBatch → scored_index_append (existing postings never read);
    after the drain the index answers a 3-term search that the oracle
    recomputes over the whole corpus — stale df/stats from any batch
    would hash-mismatch. The streaming form of q131's append path."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import (bm25_search,
                                                build_scored_index)
    from duckdb_spatial_spark.streaming import streaming_index_append

    d = load_table(spark, sf, "documents", fan_out=False)
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q138_"), "sidx")
    build_scored_index(d.filter(F.col("doc_id") % 2 == 0), path,
                       "doc_id", "text", segment_size=500)
    stream = (
        spark.readStream.schema(d.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf)
        .filter(F.col("doc_id") % 2 == 1)
    )
    q = streaming_index_append(stream, path, segment_size=500)
    q.awaitTermination()
    return (
        bm25_search(spark, path, ["merge", "scan", "row"], k=10)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
    )


def q148_group_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group standardization (the feature-engineering normalize
    step): z = (value − mean_g) / stddev_samp_g per event_type — one
    bounded stats aggregate joined back (codegen end to end), with
    min/max/avg of z per group as the checksum."""
    ev = load_table(spark, sf, "events", fan_out=False)
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("__m"),
        F.stddev_samp("value").alias("__s"))
    # try_divide: a CONSTANT group has stddev 0 and Spark's ANSI mode
    # throws DIVIDE_BY_ZERO where DuckDB yields NULL — NULL z-scores for
    # degenerate groups are the cross-engine semantics (probed round 9)
    z = F.try_divide(F.col("value") - F.col("__m"), F.col("__s"))
    return (
        ev.join(stats, "event_type")
        .select("event_type", z.alias("z"))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"),
             (F.round(F.min("z"), 6) + F.lit(0.0)).alias("z_min"),
             (F.round(F.max("z"), 6) + F.lit(0.0)).alias("z_max"),
             # + 0.0 normalizes IEEE -0.0 → +0.0: avg(z) is mathematically
             # zero, so the float residue (~1e-16) has an order-dependent
             # SIGN and round(...,6) yields ±0.0 engine-dependently — the
             # driver's value-hash distinguishes them (round-8 red row).
             (F.round(F.avg("z"), 6) + F.lit(0.0)).alias("z_avg"))
        .transform(_ssort, "event_type")
    )


_Q148_ORACLE = """
    WITH s AS (
      SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    ), z AS (
      SELECT e.event_type, (e.value - s.m) / s.sd AS z
      FROM events e JOIN s USING (event_type)
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(min(z), 6) + 0.0 AS z_min, round(max(z), 6) + 0.0 AS z_max,
           round(avg(z), 6) + 0.0 AS z_avg
    FROM z GROUP BY event_type ORDER BY event_type
"""


def q149_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Argmax-row selection (top-2 longest docs per language): one
    window partitioned by the group, deterministic (n_chars DESC,
    doc_id) tie-break — the per-group-champion primitive every
    pipeline reaches for."""
    d = load_table(spark, sf, "documents", fan_out=False)
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(),
                                           F.col("doc_id"))
    return (
        d.select("lang", "doc_id", "n_chars",
                 F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 2)
        .transform(_ssort, "lang", "rk")
    )


_Q149_ORACLE = """
    SELECT lang, doc_id, n_chars, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    ) WHERE rk <= 2 ORDER BY lang, rk
"""


def q150_time_bucket_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    """Daily OHLC rollup per event_type (the open/high/low/close shape
    every metrics pipeline computes): open/close picked by a
    deterministic (ts, event_id)-ordered window — no arg_min tie
    ambiguity across engines — high/low/count as plain aggregates."""
    ev = load_table(spark, sf, "events", fan_out=False)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    base = ev.select("event_type", day.alias("d"), "event_id", "ts",
                     "value")
    w = Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
    wdesc = Window.partitionBy("event_type", "d") \
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    tagged = base.select(
        "event_type", "d", "value",
        F.row_number().over(w).alias("__a"),
        F.row_number().over(wdesc).alias("__z"))
    return (
        tagged.groupBy("event_type", "d")
        .agg(F.count("*").cast("long").alias("n"),
             F.max(F.when(F.col("__a") == 1, F.col("value")))
              .alias("open"),
             F.max(F.when(F.col("__z") == 1, F.col("value")))
              .alias("close"),
             F.round(F.max("value"), 2).alias("hi"),
             F.round(F.min("value"), 2).alias("lo"))
        .transform(_ssort, "event_type", "d")
        .select("event_type", F.col("d").cast("string").alias("day"),
                "n", "open", "close", "hi", "lo")
    )


_Q150_ORACLE = """
    WITH base AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             event_id, ts, value
      FROM events
    ), tagged AS (
      SELECT event_type, d, value,
             row_number() OVER (PARTITION BY event_type, d
                                ORDER BY ts, event_id) AS a,
             row_number() OVER (PARTITION BY event_type, d
                                ORDER BY ts DESC, event_id DESC) AS z
      FROM base
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n,
           max(CASE WHEN a = 1 THEN value END) AS open,
           max(CASE WHEN z = 1 THEN value END) AS close,
           round(max(value), 2) AS hi, round(min(value), 2) AS lo
    FROM tagged GROUP BY event_type, d ORDER BY event_type, day
"""


def q151_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified re-ranking (Carbonell &
    Goldstein 1998 — the retrieval-diversity step between ANN search
    and context assembly): top-32 query-relevant vectors by one codegen
    cosine scan + TakeOrdered, then the greedy λ-tradeoff selection
    over that BOUNDED pool driver-side (pool size is a parameter, not a
    data scale — the IVF/BPE train-apply discipline). Every similarity
    rounds to 6 dp before any comparison and ties break on the id, so
    the oracle replays the selection exactly with k unrolled argmax
    CTEs (the q111 pattern)."""
    from duckdb_spatial_spark.operators.rank import mmr_rerank

    e = load_table(spark, sf, "embeddings", fan_out=False)
    q = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    rows = mmr_rerank(e.filter(F.col("vec_id") > 0), q, id_col="vec_id",
                      vec_col="embedding", k=8, pool=32, lam=0.7)
    return spark.createDataFrame(
        rows, "rank long, id long, rel double, mmr double").orderBy("rank")


def _q151_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.rank import mmr_sql

    return mmr_sql("(SELECT * FROM embeddings WHERE vec_id > 0)",
                   "embedding", "vec_id", "embeddings", "vec_id = 0",
                   k=8, pool=32, lam=0.7)


def q152_session_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Per-SESSION funnel conversion — the composition every product
    analytics store runs (sessionize ∘ funnel): events sessionize at
    >30-minute gaps per user, then each session runs the ordered
    view→click→purchase funnel independently (greedy earliest-match
    WITHIN the session — the composite session key bounds matching, no
    extra time window needed). Round 11: the funnel runs as
    session_funnel's chained unordered window mins — funnel()'s
    step-scans re-executed the sessionize window once per step and
    shuffled two joins on top (1.7 s warm, 2 jobs); the one-pass form
    is one shuffle on the session key, zero joins, ONE job. The oracle
    replays the lag/cumsum sessionization and the iterative min-CTE
    funnel on the identical composite key (plan-independent
    semantics)."""
    from duckdb_spatial_spark.operators.temporal import (session_funnel,
                                                         sessionize)

    e = _events_utc(spark, load_table(spark, sf, "events", fan_out=False))
    ev = e.select("user_id", "event_type", "ts",
                  F.unix_micros("ts").alias("t"),
                  F.col("event_id").alias("eid"))
    sess = sessionize(ev, ["user_id"], "t", gap_us=30 * 60 * 1_000_000,
                      order_cols=["eid"])
    # funnel windows partition by (user_id, session_id): the sessionize
    # user hash already satisfies that clustering (hash keys ⊆ window
    # keys), so the funnel adds NO second exchange — only a partition-
    # local re-sort. The composite sk (sessions-per-user is gap-bounded
    # tiny, so user_id*1000+session_id is collision-free) is projected
    # AFTER the per-session row exists, for the checksums only.
    out = session_funnel(sess, ["view", "click", "purchase"],
                         key_col=["user_id", "session_id"], ts_col="ts")
    out = out.select(
        (F.col("user_id") * F.lit(1000) + F.col("session_id")).alias("sk"),
        "steps_completed", "t_first_us", "t_last_us")
    return (
        out.groupBy("steps_completed")
        .agg(F.count("*").cast("long").alias("n_sessions"),
             F.sum("sk").cast("long").alias("sks"),
             F.sum(F.col("t_last_us") - F.col("t_first_us"))
              .cast("long").alias("span_us"))
        .transform(_ssort, "steps_completed")
    )


_Q152_ORACLE = """
    WITH ev AS (
      SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
             event_type AS et
      FROM events
    ), flagged AS (
      SELECT u, t, eid, et,
             CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM ev WINDOW w AS (PARTITION BY u ORDER BY t, eid)
    ), keyed AS (
      SELECT u * 1000 + sum(new_s) OVER (PARTITION BY u ORDER BY t, eid
                                         ROWS UNBOUNDED PRECEDING) - 1
               AS sk,
             et, t
      FROM flagged
    ), s1 AS (
      SELECT sk, CAST(min(t) AS BIGINT) AS t1 FROM keyed
      WHERE et = 'view' GROUP BY sk
    ), h2 AS (
      SELECT k.sk, CAST(min(k.t) AS BIGINT) AS t2
      FROM keyed k JOIN s1 ON k.sk = s1.sk
      WHERE k.et = 'click' AND k.t > s1.t1
      GROUP BY k.sk
    ), h3 AS (
      SELECT k.sk, CAST(min(k.t) AS BIGINT) AS t3
      FROM keyed k JOIN h2 ON k.sk = h2.sk
      WHERE k.et = 'purchase' AND k.t > h2.t2
      GROUP BY k.sk
    ), per AS (
      SELECT s1.sk,
             CASE WHEN h3.sk IS NOT NULL THEN 3
                  WHEN h2.sk IS NOT NULL THEN 2 ELSE 1 END AS d,
             s1.t1,
             CASE WHEN h3.sk IS NOT NULL THEN h3.t3
                  WHEN h2.sk IS NOT NULL THEN h2.t2 ELSE s1.t1 END AS tl
      FROM s1 LEFT JOIN h2 ON s1.sk = h2.sk LEFT JOIN h3 ON s1.sk = h3.sk
    )
    SELECT CAST(d AS INT) AS steps_completed,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(sk) AS BIGINT) AS sks,
           CAST(sum(tl - t1) AS BIGINT) AS span_us
    FROM per GROUP BY d ORDER BY d
"""


def q153_streaming_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING ordered funnel via applyInPandasWithState — the
    stateful-operator twin of q143: events drain as a file stream, each
    user\'s state accumulates step-relevant event times, every update
    recomputes the greedy matches so emitted (depth, n_seen) are
    monotone per user and the LAST update row per user is the batch
    answer. The oracle is the BATCH funnel over the same events — a
    lost batch, a state merge bug, or a non-greedy match desyncs the
    hash."""
    from duckdb_spatial_spark.streaming import streaming_funnel

    batch = load_table(spark, sf, "events", fan_out=False)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", (F.col("ts") / F.lit(1e9)).cast("timestamp"))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    # thin the stream (1/7 of events) so the depth distribution spans
    # 0..3 — on the full table every user completes the funnel and the
    # check degenerates to one row
    fun = streaming_funnel(stream.filter(F.col("event_id") % 7 == 0),
                           ["view", "click", "purchase"])
    _Q75_SINK_SEQ[0] += 1
    sink = f"q153_sink_{_Q75_SINK_SEQ[0]}"
    q = (
        fun.writeStream.format("memory").queryName(sink)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    upd = spark.table(sink)
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_seen").desc(), F.col("depth").desc())
    final = (upd.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1))
    return (
        final.groupBy(F.col("depth").cast("int").alias("steps_completed"))
        .agg(F.count("*").cast("long").alias("n_users"),
             F.sum("user_id").cast("long").alias("su"))
        .transform(_ssort, "steps_completed")
    )


_Q153_ORACLE = """
    WITH ev AS (
      SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
      FROM events WHERE event_id % 7 = 0
    ), users AS (SELECT DISTINCT u FROM ev),
    s1 AS (
      SELECT u, CAST(min(us) AS BIGINT) AS t1 FROM ev
      WHERE t = 'view' GROUP BY u
    ), h2 AS (
      SELECT ev.u, CAST(min(ev.us) AS BIGINT) AS t2
      FROM ev JOIN s1 ON ev.u = s1.u
      WHERE ev.t = 'click' AND ev.us > s1.t1
      GROUP BY ev.u
    ), h3 AS (
      SELECT ev.u, CAST(min(ev.us) AS BIGINT) AS t3
      FROM ev JOIN h2 ON ev.u = h2.u
      WHERE ev.t = 'purchase' AND ev.us > h2.t2
      GROUP BY ev.u
    ), per AS (
      SELECT users.u,
             CASE WHEN h3.u IS NOT NULL THEN 3
                  WHEN h2.u IS NOT NULL THEN 2
                  WHEN s1.u IS NOT NULL THEN 1 ELSE 0 END AS d
      FROM users LEFT JOIN s1 ON users.u = s1.u
                 LEFT JOIN h2 ON users.u = h2.u
                 LEFT JOIN h3 ON users.u = h3.u
    )
    SELECT CAST(d AS INT) AS steps_completed,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(u) AS BIGINT) AS su
    FROM per GROUP BY d ORDER BY d
"""


def q154_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Character-entropy quality profile per source (the gibberish /
    boilerplate signal a web-scale cleaner thresholds on): one char
    explode + one partial-aggregated (doc, char) shuffle + per-doc sum
    (operators/textops.char_entropy_per_doc — relational on purpose;
    the array-side scalar would re-evaluate the split per distinct
    char). Decomposed as H = ln L − (Σ n·ln n)/L so both engines sum
    the identical terms."""
    from duckdb_spatial_spark.operators.textops import char_entropy_per_doc

    d = load_table(spark, sf, "documents", fan_out=True)
    ent = char_entropy_per_doc(d, "doc_id", "text", carry_cols=["source"])
    return (
        ent.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.round(F.avg("entropy"), 6).alias("avg_entropy"),
             F.round(F.min("entropy"), 6).alias("min_entropy"),
             F.round(F.max("entropy"), 6).alias("max_entropy"))
        .transform(_ssort, "source")
    )


def _q154_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.textops import char_entropy_sql

    inner = char_entropy_sql("documents", "doc_id", "text", carry="source")
    return f"""
        WITH ent AS ({inner})
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(entropy), 6) AS avg_entropy,
               round(min(entropy), 6) AS min_entropy,
               round(max(entropy), 6) AS max_entropy
        FROM ent GROUP BY source ORDER BY source
    """


def q155_rollup_aggregate(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING-SETS breadth (§2.J relational substrate — the subtotal
    surface BI layers push down): ROLLUP over (l_returnflag,
    l_linestatus) with grouping_id disambiguating the subtotal levels —
    Spark and DuckDB both emit the standard bitmask, so the oracle is
    the literal ANSI ROLLUP. NULL group keys at subtotal levels
    coalesce to a sentinel so the hash compare can't conflate a real
    NULL with a rollup row."""
    li = load_table(spark, sf, "lineitem", fan_out=False)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("l_quantity").cast("long").alias("qty"),
             F.round(F.sum(F.col("l_extendedprice")
                           * (F.lit(1.0) - F.col("l_discount"))), 2)
              .alias("revenue"),
             F.grouping_id().cast("long").alias("gid"))
        .select(F.coalesce("l_returnflag", F.lit("(all)")).alias("rf"),
                F.coalesce("l_linestatus", F.lit("(all)")).alias("ls"),
                "n", "qty", "revenue", "gid")
        .transform(_ssort, "gid", "rf", "ls")
    )


_Q155_ORACLE = """
    SELECT coalesce(l_returnflag, '(all)') AS rf,
           coalesce(l_linestatus, '(all)') AS ls,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(l_quantity) AS BIGINT) AS qty,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, rf, ls
"""


def q156_exact_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group (the q119 histogram
    tier's exact sibling): Spark's percentile() and DuckDB's
    quantile_cont() both implement the linear-interpolation estimator,
    so p25/p50/p75/p99 of the value column hash-match after rounding.
    One partial-aggregated shuffle; exact percentile state is the
    per-group value multiset (bounded here by group fan-in — the
    histogram tier is the stream/huge-group path)."""
    e = load_table(spark, sf, "events", fan_out=False)
    pct = F.percentile(F.col("value"),
                       F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75,
                                                    0.99)]))
    return (
        e.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"), pct.alias("__p"))
        .select("event_type", "n",
                F.round(F.col("__p")[0], 6).alias("p25"),
                F.round(F.col("__p")[1], 6).alias("p50"),
                F.round(F.col("__p")[2], 6).alias("p75"),
                F.round(F.col("__p")[3], 6).alias("p99"))
        .transform(_ssort, "event_type")
    )


_Q156_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
"""


def q157_pivot_table(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT breadth (§2.J): per user-group row, one revenue column per
    event type — Spark's groupBy().pivot() with an EXPLICIT value list
    (never the implicit distinct scan, which is an extra job AND
    nondeterministic column order); the oracle is the equivalent
    CASE-sum projection, the form PIVOT desugars to in every engine."""
    e = load_table(spark, sf, "events", fan_out=False)
    types = ["click", "error", "purchase", "signup", "view"]
    p = (
        e.groupBy((F.col("user_id") % 25).alias("k"))
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 4))
    )
    return p.select(
        "k", *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in types]
    ).transform(_ssort, "k")


_Q157_ORACLE = """
    SELECT user_id % 25 AS k,
           coalesce(round(sum(CASE WHEN event_type = 'click'
                                   THEN value END), 4), 0.0) AS click,
           coalesce(round(sum(CASE WHEN event_type = 'error'
                                   THEN value END), 4), 0.0) AS error,
           coalesce(round(sum(CASE WHEN event_type = 'purchase'
                                   THEN value END), 4), 0.0) AS purchase,
           coalesce(round(sum(CASE WHEN event_type = 'signup'
                                   THEN value END), 4), 0.0) AS signup,
           coalesce(round(sum(CASE WHEN event_type = 'view'
                                   THEN value END), 4), 0.0) AS view
    FROM events GROUP BY 1 ORDER BY 1
"""


def q158_bfs_hops(spark: SparkSession, sf: str) -> DataFrame:
    """Breadth-first hop distances from a source node over the
    undirected part-supplier graph (the shortest-path surface DuckDB
    gets from recursive CTEs and Spark expresses as iterative
    frontier joins — §2 graph family next to PageRank/components/
    triangles): 4 unrolled rounds of (dist join edges → min-relax),
    each ONE equi-join + one min-aggregate with per-round persist for
    O(1) lineage (the PageRank discipline — without it the union's
    double reference to dist re-evaluates the whole prefix,
    2^rounds). Output: node count + id checksum per distance. The
    oracle unrolls the same 4 relaxations as chained CTEs."""
    li = load_table(spark, sf, "lineitem", fan_out=False)
    e0 = li.select((F.col("l_partkey") % 300).alias("src"),
                   (F.col("l_suppkey") % 300).alias("dst")).distinct()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()  # reused by every round — 4 lineitem scans otherwise;
    # like q115's wf, reclaimed by the ContextCleaner when refs drop
    dist = spark.range(1).select(
        F.lit(0).cast("long").alias("node"),
        F.lit(0).cast("int").alias("d"))
    for r in range(1, 5):
        nxt = (dist.join(edges, dist["node"] == edges["src"])
               .select(F.col("dst").alias("node"),
                       F.lit(r).cast("int").alias("d")))
        dist = (dist.unionByName(nxt)
                .groupBy("node").agg(F.min("d").alias("d"))
                .persist())
    return (
        dist.groupBy("d")
        .agg(F.count("*").cast("long").alias("n_nodes"),
             F.sum("node").cast("long").alias("node_sum"))
        .transform(_ssort, "d")
    )


_Q158_ORACLE = """
    WITH e0 AS (
      SELECT DISTINCT l_partkey % 300 AS src, l_suppkey % 300 AS dst
      FROM lineitem
    ), edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
    ), d0 AS (SELECT CAST(0 AS BIGINT) AS node, 0 AS d),
    d1 AS MATERIALIZED (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM d0
        UNION ALL SELECT e.dst, 1 FROM d0 JOIN edges e ON e.src = d0.node
      ) GROUP BY node
    ), d2 AS MATERIALIZED (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM d1
        UNION ALL SELECT e.dst, 2 FROM d1 JOIN edges e ON e.src = d1.node
      ) GROUP BY node
    ), d3 AS MATERIALIZED (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM d2
        UNION ALL SELECT e.dst, 3 FROM d2 JOIN edges e ON e.src = d2.node
      ) GROUP BY node
    ), d4 AS MATERIALIZED (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM d3
        UNION ALL SELECT e.dst, 4 FROM d3 JOIN edges e ON e.src = d3.node
      ) GROUP BY node
    )
    SELECT CAST(d AS INT) AS d,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(node) AS BIGINT) AS node_sum
    FROM d4 GROUP BY d ORDER BY d
"""


def q147_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted sampling without replacement ∝ document length
    (Efraimidis–Spirakis Gumbel keys off the portable hash — the
    deterministic weighted pick a mixture recipe needs): top-25 by
    (rounded key DESC, id); pure projection + TakeOrdered, zero
    shuffles. The oracle replays the identical key expression."""
    from duckdb_spatial_spark.operators import weighted_sample

    d = load_table(spark, sf, "documents", fan_out=False)
    return weighted_sample(d.select("doc_id", "n_chars"),
                           "n_chars", k=25, id_col="doc_id", seed=9)


def _q147_oracle_sql() -> str:
    from duckdb_spatial_spark.operators import weighted_sample_sql

    key = weighted_sample_sql("doc_id", "n_chars", seed=9)
    return f"""
        SELECT doc_id, n_chars AS weight, {key} AS key
        FROM documents WHERE n_chars > 0
        ORDER BY key DESC, doc_id LIMIT 25
    """


def q146_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 PMI collocations over the corpus (the corpus-linguistics
    association signal): one pair explode + one word explode, two
    map-side-combined counts, the unigram table joined twice, exact
    integer counts through a single ln. Orders by the ROUNDED score so
    the k-boundary can't split on an ulp."""
    from duckdb_spatial_spark.operators.textops import collocations

    d = load_table(spark, sf, "documents", fan_out=True)
    return collocations(d, "text", min_count=5, k=20)


_Q146_ORACLE = """
    WITH w AS (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), p AS (
      SELECT w[CAST(i AS BIGINT)] AS a, w[CAST(i AS BIGINT) + 1] AS b
      FROM (SELECT w, generate_subscripts(w, 1) AS i FROM w)
      WHERE i <= len(w) - 1
    ), c2 AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
      FROM p GROUP BY 1, 2
    ), u AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(w) AS t FROM w) GROUP BY 1
    ), n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n1 FROM u),
    n2 AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n2 FROM c2),
    scored AS (
      SELECT a || ' ' || b AS pair, c_ab,
             round(ln((CAST(c_ab AS DOUBLE) / n2)
                      / ((CAST(ua.c AS DOUBLE) / n1)
                         * (CAST(ub.c AS DOUBLE) / n1))), 6) + 0.0 AS pmi
      FROM c2 JOIN u ua ON ua.t = c2.a JOIN u ub ON ub.t = c2.b,
           n1, n2
      WHERE c_ab >= 5
    )
    SELECT pair, c_ab, pmi FROM scored
    ORDER BY pmi DESC, pair LIMIT 20
"""


def q145_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention (the signup-week → active-week matrix every
    growth dashboard runs): cohort = each user's first event week,
    retention = distinct users active k weeks later. Two user-keyed
    aggregates + one distinct — all codegen date arithmetic
    (date_trunc/datediff), no UDFs; the oracle replays the identical
    truncation in DuckDB."""
    ev = load_table(spark, sf, "events", fan_out=False)
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    act = ev.select(F.col("user_id"), wk.alias("w")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("w").alias("c"))
    return (
        act.join(cohort, "user_id")
        .groupBy("c", F.floor(F.datediff(F.col("w"), F.col("c")) / 7)
                 .cast("long").alias("k"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"),
             F.sum("user_id").cast("long").alias("su"))
        .transform(_ssort, "c", "k")
        .select(F.col("c").cast("string").alias("cohort_week"),
                "k", "n_users", "su")
    )


_Q145_ORACLE = """
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events
    ), cohort AS (
      SELECT user_id, min(w) AS c FROM act GROUP BY user_id
    )
    SELECT CAST(c AS VARCHAR) AS cohort_week,
           CAST(floor((w - c) / 7) AS BIGINT) AS k,
           CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_users,
           CAST(sum(act.user_id) AS BIGINT) AS su
    FROM act JOIN cohort USING (user_id)
    GROUP BY c, k ORDER BY cohort_week, k
"""


def q144_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured column handling (every event pipeline carries a
    JSON props blob): from_json with an explicit schema — Catalyst
    keeps the parse in codegen and prunes it to the referenced field
    (JSON is parsed once per row, no UDF) — then typed aggregation per
    event_type. Oracle uses DuckDB's native json_extract on the same
    strings."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf, "events", fan_out=False)
    k = F.from_json(F.col("props"),
                    T.StructType([T.StructField("k", T.LongType())]))["k"]
    return (
        ev.select("event_type", "user_id", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("k").cast("long").alias("sum_k"),
             F.min("k").cast("long").alias("min_k"),
             F.max("k").cast("long").alias("max_k"),
             F.round(F.avg("k"), 6).alias("avg_k"))
        .transform(_ssort, "event_type")
    )


_Q144_ORACLE = """
    WITH t AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           round(avg(k), 6) AS avg_k
    FROM t WHERE k IS NOT NULL
    GROUP BY event_type ORDER BY event_type
"""


def q143_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel view→click→purchase with a 3-day completion
    window (greedy earliest-match semantics, replayed identically by
    the oracle's iterative min-CTEs): per completion depth, user count,
    id checksum, and total first→last µs span. K-1 user-keyed joins of
    min-aggregated frames — the event mass is scanned once per step
    with the step filter pushed down, never joined row-to-row."""
    from duckdb_spatial_spark.operators.temporal import funnel

    ev = load_table(spark, sf, "events", fan_out=False)
    out = funnel(ev, ["view", "click", "purchase"],
                 within_us=3 * 86_400_000_000)
    return (
        out.groupBy("steps_completed")
        .agg(F.count("*").cast("long").alias("n_users"),
             F.sum("user_id").cast("long").alias("su"),
             F.sum(F.col("t_last_us") - F.col("t_first_us"))
              .cast("long").alias("span_us"))
        .transform(_ssort, "steps_completed")
    )


_Q143_ORACLE = """
    WITH ev AS (
      SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
      FROM events
    ), s1 AS (
      SELECT u, CAST(min(us) AS BIGINT) AS t1 FROM ev
      WHERE t = 'view' GROUP BY u
    ), h2 AS (
      SELECT ev.u, CAST(min(ev.us) AS BIGINT) AS t2,
             CAST(max(s1.t1) AS BIGINT) AS t1
      FROM ev JOIN s1 ON ev.u = s1.u
      WHERE ev.t = 'click' AND ev.us > s1.t1
        AND ev.us <= s1.t1 + 259200000000
      GROUP BY ev.u
    ), h3 AS (
      SELECT ev.u, CAST(min(ev.us) AS BIGINT) AS t3,
             CAST(max(h2.t1) AS BIGINT) AS t1
      FROM ev JOIN h2 ON ev.u = h2.u
      WHERE ev.t = 'purchase' AND ev.us > h2.t2
        AND ev.us <= h2.t1 + 259200000000
      GROUP BY ev.u
    ), per AS (
      SELECT s1.u,
             CASE WHEN h3.u IS NOT NULL THEN 3
                  WHEN h2.u IS NOT NULL THEN 2 ELSE 1 END AS d,
             s1.t1,
             CASE WHEN h3.u IS NOT NULL THEN h3.t3
                  WHEN h2.u IS NOT NULL THEN h2.t2 ELSE s1.t1 END AS tl
      FROM s1 LEFT JOIN h2 ON s1.u = h2.u LEFT JOIN h3 ON s1.u = h3.u
    )
    SELECT CAST(d AS INT) AS steps_completed,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(u) AS BIGINT) AS su,
           CAST(sum(tl - t1) AS BIGINT) AS span_us
    FROM per GROUP BY d ORDER BY d
"""


def q142_streaming_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Continuous ingest into a multi-column z-order layout: half the
    events seed the layout (batch), the other half arrive as a file
    STREAM whose micro-batches append Morton-sorted generation files
    via foreachBatch → zorder_append (shared key ranges so batches land
    on the dataset's grid); after the availableNow drain a 2-column
    range aggregate runs OFF THE LAYOUT and must equal a straight
    recompute — a lost/duplicated batch or a key-grid corruption
    hash-mismatches. The streaming form of q137's append path (the
    hypertable continuous-ingest shape)."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import zorder_cluster
    from duckdb_spatial_spark.streaming import streaming_zorder_append

    ev = load_table(spark, sf, "events", fan_out=False) \
        .select("event_id", "user_id", "value")
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q142_"), "z")
    ranges = {"value": (0.0, 600.0), "user_id": (0.0, 1500.0)}
    zorder_cluster(ev.filter(F.col("event_id") % 2 == 0),
                   ["value", "user_id"], ranges=ranges,
                   num_partitions=4).write.parquet(path)
    batch = load_table(spark, sf, "events", fan_out=False)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
        .filter(F.col("event_id") % 2 == 1)
        .select("event_id", "user_id", "value")
    )
    q = streaming_zorder_append(stream, path, ["value", "user_id"],
                                ranges=ranges)
    q.awaitTermination()
    back = read_layout(spark, path)
    return (
        back.filter(F.col("value").between(50.0, 300.0)
                    & F.col("user_id").between(5, 100))
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("event_id").cast("long").alias("sk"),
             F.round(F.sum("value"), 2).alias("sv"))
    )


_Q142_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS sk,
           round(sum(value), 2) AS sv
    FROM events
    WHERE value BETWEEN 50.0 AND 300.0 AND user_id BETWEEN 5 AND 100
"""


def q141_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-novelty scoring (the rarity signal next to the Gopher
    repetition filters): per doc, the fraction of its distinct word
    8-grams unique to it corpus-wide. Gram text never shuffles — md5
    hashes carry the count join; the oracle groups by the SAME md5 so
    even a hash collision couldn't desync the engines. Aggregated per
    source: the duplicated docs planted in the corpus drag their
    sources' novelty down, which is what the signal is for."""
    from duckdb_spatial_spark.operators import ngram_novelty

    d = load_table(spark, sf, "documents", fan_out=True)
    nov = ngram_novelty(d, "doc_id", "text", n=8, rare_max_df=1)
    return (
        nov.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("n_grams").cast("long").alias("grams"),
             F.sum("n_rare").cast("long").alias("rare"),
             F.round(F.avg("novelty"), 6).alias("avg_novelty"))
        .transform(_ssort, "source")
    )


_Q141_ORACLE = """
    WITH norm AS (
      SELECT doc_id, source,
             string_split(regexp_replace(trim(lower(text)),
                                         '\\s+', ' ', 'g'), ' ') AS w
      FROM documents
    ), cg AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(w, CAST(i AS BIGINT),
                                            CAST(i AS BIGINT) + 7),
                                 ' ')) AS h
      FROM (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM norm)
      WHERE i <= greatest(len(w) - 7, 1)
    ), dfreq AS (
      SELECT h, CAST(count(*) AS BIGINT) AS df FROM cg GROUP BY h
    ), per AS (
      SELECT cg.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN df <= 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rare
      FROM cg JOIN dfreq USING (h) GROUP BY cg.doc_id
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS grams,
           CAST(sum(n_rare) AS BIGINT) AS rare,
           round(avg(CAST(n_rare AS DOUBLE) / n_grams), 6) AS avg_novelty
    FROM per JOIN norm USING (doc_id)
    GROUP BY source ORDER BY source
"""


def q140_token_budget_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mixture downsampling to TOKEN budgets (the recipe-weights
    step of a training-data pipeline): keep fraction
    min(1, budget_d / domain_tokens_d) per source, document-level
    deterministic Bernoulli via the portable hash. src1's huge budget
    passes the domain whole (keep_frac exactly 1.0 — the oracle pins
    the least() clamp), src0's budget trims it, everything else rides
    the default. Output: per-source kept doc/token counts + id
    checksum."""
    from duckdb_spatial_spark.operators import token_budget_mix

    d = load_table(spark, sf, "documents", fan_out=True)
    kept = token_budget_mix(
        d, "source",
        budgets={"src0": 700.0, "src1": 10_000_000.0},
        id_col="doc_id", text_col="text", seed=5, default_budget=500.0)
    return (
        kept.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_kept"),
             F.sum("tokens").cast("long").alias("tokens_kept"),
             F.round(F.max("keep_frac"), 6).alias("keep_frac"),
             F.sum("doc_id").cast("long").alias("sk"))
        .transform(_ssort, "source")
    )


def _q140_oracle_sql() -> str:
    from duckdb_spatial_spark.operators import token_budget_sql

    u = token_budget_sql("doc_id", seed=5)
    return f"""
        WITH t AS (
          SELECT doc_id, source,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+'))
                 END AS tokens
          FROM documents
        ), totals AS (
          SELECT source, CAST(sum(tokens) AS BIGINT) AS tot
          FROM t GROUP BY source
        ), j AS (
          SELECT t.doc_id, t.source, t.tokens,
                 CASE WHEN tot > 0 THEN least(CAST(1.0 AS DOUBLE),
                        CASE WHEN t.source = 'src0' THEN {700.0!r}
                             WHEN t.source = 'src1' THEN {10_000_000.0!r}
                             ELSE {500.0!r} END / tot)
                      ELSE 0.0 END AS keep_frac
          FROM t JOIN totals USING (source)
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(tokens) AS BIGINT) AS tokens_kept,
               round(max(keep_frac), 6) AS keep_frac,
               CAST(sum(doc_id) AS BIGINT) AS sk
        FROM j WHERE {u} < keep_frac
        GROUP BY source ORDER BY source
    """


def q139_hybrid_search(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval, the RAG-pipeline shape: BM25 top-50 lexical
    candidates OFF THE SCORED INDEX (corpus never re-read) → inner-join
    the embeddings table (docs without embeddings drop, deterministic)
    → cosine re-rank against a pinned query vector (vec_id 0, the
    q55/q104 pinning convention) → top-10 by (rounded cosine DESC,
    doc_id). Lexical recall pays one pruned postings scan; the dense
    re-rank touches only the 50 candidates — the two-stage cost shape
    that makes hybrid search viable at corpus scale."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import (bm25_search,
                                                build_scored_index)
    from duckdb_spatial_spark.operators.similarity import cosine_similarity

    d = load_table(spark, sf, "documents", fan_out=True)
    e = load_table(spark, sf, "embeddings", fan_out=False)
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q139_"), "sidx")
    build_scored_index(d, path, "doc_id", "text", segment_size=500)
    cands = bm25_search(spark, path, ["hash", "vector", "data"], k=50) \
        .withColumnRenamed("score", "bm25")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    rer = (
        cands.join(e, cands["doc_id"] == e["vec_id"])
        .select(cands["doc_id"], "bm25",
                (F.round(cosine_similarity(
                    F.col("embedding").cast("array<double>"), qlit), 6)
                 + F.lit(0.0)).alias("cos"))
    )
    return rer.orderBy(F.col("cos").desc(), F.col("doc_id")).limit(10)


def _q139_oracle_sql() -> str:
    # stage 1 reuses the BM25 corpus recompute (q131's generator CTEs)
    inner = _q131_oracle_sql(terms=("hash", "vector", "data"))
    # swap the final LIMIT 10 for the candidate LIMIT 50
    inner = inner.replace("ORDER BY score DESC, doc_id LIMIT 10",
                          "ORDER BY score DESC, doc_id LIMIT 50")
    return f"""
        WITH cands AS ({inner}),
        qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
               WHERE vec_id = 0)
        SELECT c.doc_id, c.score AS bm25,
               round(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), qv.v), 6) + 0.0 AS cos
        FROM cands c JOIN embeddings e ON e.vec_id = c.doc_id, qv
        ORDER BY cos DESC, c.doc_id LIMIT 10
    """


def q137_zorder_crud(spark: SparkSession, sf: str) -> DataFrame:
    """Full CRUD cycle on a MULTI-COLUMN z-order layout (the twin of
    q129's hilbert cycle, proving layout maintenance generalizes past
    geometry): cluster the even events → zorder_append the odds (fresh
    Morton-sorted files only) → st_cluster_delete a (value, user_id)
    predicate (layout-agnostic affected-file rewrite) → zorder_compact
    the small files → a 2-column range aggregate off the maintained
    dataset. Oracle recomputes from the source with the delete
    predicate negated — any stale/duplicated/lost row hash-mismatches."""
    import os
    import tempfile

    from duckdb_spatial_spark.operators import (st_cluster_delete,
                                                zorder_append,
                                                zorder_cluster,
                                                zorder_compact)

    ev = load_table(spark, sf, "events", fan_out=True) \
        .select("event_id", "user_id", "value")
    path = os.path.join(tempfile.mkdtemp(prefix="dss_q137_"), "z")
    zorder_cluster(ev.filter(F.col("event_id") % 2 == 0),
                   ["value", "user_id"], num_partitions=4) \
        .write.parquet(path)
    zorder_append(ev.filter(F.col("event_id") % 2 == 1), path,
                  ["value", "user_id"])
    nd = st_cluster_delete(
        spark, path,
        "value >= 300.0 AND value < 350.0 AND user_id % 3 = 0")
    zorder_compact(spark, path, ["value", "user_id"],
                   small_file_bytes=1 << 20)
    back = read_layout(spark, path)
    return (
        back.filter(F.col("value").between(100.0, 400.0)
                    & F.col("user_id").between(10, 120))
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("event_id").cast("long").alias("sk"),
             F.round(F.sum("value"), 2).alias("sv"))
        .select(F.lit(int(nd)).cast("long").alias("nd"), "n", "sk", "sv")
    )


_Q137_ORACLE = """
    WITH kept AS (
      SELECT event_id, user_id, value FROM events
      WHERE NOT (value >= 300.0 AND value < 350.0 AND user_id % 3 = 0)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM events
            WHERE value >= 300.0 AND value < 350.0
              AND user_id % 3 = 0) AS nd,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS sk,
           round(sum(value), 2) AS sv
    FROM kept
    WHERE value BETWEEN 100.0 AND 400.0 AND user_id BETWEEN 10 AND 120
"""


def q135_cluster_balanced_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Topic-balanced subset selection (DataComp/DFN recipe shape):
    nearest-centroid assignment over pinned centroids (first 16
    embeddings, the q55/q104 convention that makes the assignment
    SQL-replayable) + a deterministic k-per-cluster pick — candidate
    pool u*size <= oversample*k, then the k smallest (u, id). Both
    steps are the SEMANTICS, so the oracle replays them bit-for-bit;
    the per-cluster sort never sees a whole cluster."""
    import numpy as np

    from duckdb_spatial_spark.operators import cluster_balanced_sample

    e = load_table(spark, sf, "embeddings", fan_out=False)
    cent_rows = _probe_sorted(
        e.filter((F.col("vec_id") < 16)
                 & F.col("embedding").isNotNull()),
        "vec_id", "embedding")
    C = np.asarray(cent_rows, dtype=np.float64)
    out = cluster_balanced_sample(e, "vec_id", "embedding",
                                  centroids=C, k=4, seed=3)
    return out.transform(_ssort, "cluster", "rk")


def _q135_oracle_sql() -> str:
    # same salt stream as cluster_balanced_sample (1_000_003*seed + 71)
    from duckdb_spatial_spark.sources.generate import portable_uniform_sql

    u = portable_uniform_sql("vec_id", 1_000_003 * 3 + 71)
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), cent AS (
          SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < 16 AND v IS NOT NULL
        ), asgn AS (
          SELECT vec_id,
                 (SELECT cid FROM cent
                  ORDER BY list_cosine_similarity(v, cvec) DESC, cid
                  LIMIT 1) AS cluster,
                 {u} AS u
          FROM e
        ), sized AS (
          SELECT vec_id, cluster, u,
                 count(*) OVER (PARTITION BY cluster) AS n
          FROM asgn
        ), cand AS (
          SELECT vec_id, cluster, u FROM sized
          WHERE u * n <= {float(4.0 * 4)!r}
        ), ranked AS (
          SELECT vec_id, cluster,
                 row_number() OVER (PARTITION BY cluster
                                    ORDER BY u, vec_id) AS rk
          FROM cand
        )
        SELECT vec_id, CAST(cluster AS INT) AS cluster,
               CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 4 ORDER BY cluster, rk
    """


def q136_group_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-count per-group sampling (eval-set carving: k docs per
    (lang, source) cell): candidate pool u*group_size <= oversample*k,
    then the k smallest (u, id) — deterministic, retry-stable, and the
    per-group sort is bounded by the pool, not the group."""
    from duckdb_spatial_spark.operators import group_sample

    d = load_table(spark, sf, "documents", fan_out=True)
    out = group_sample(d.select("doc_id", "lang", "source"),
                       ["lang", "source"], k=3, id_col="doc_id", seed=11)
    return out.select("lang", "source", "rk", "doc_id") \
        .transform(_ssort, "lang", "source", "rk")


def _q136_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.pipeline import group_sample_sql

    u, cutoff = group_sample_sql("doc_id", 3, seed=11)
    return f"""
        WITH t AS (
          SELECT doc_id, lang, source, {u} AS u,
                 count(*) OVER (PARTITION BY lang, source) AS n
          FROM documents
        ), cand AS (
          SELECT doc_id, lang, source, u FROM t WHERE u * n <= {cutoff}
        ), ranked AS (
          SELECT lang, source, doc_id,
                 row_number() OVER (PARTITION BY lang, source
                                    ORDER BY u, doc_id) AS rk
          FROM cand
        )
        SELECT lang, source, CAST(rk AS BIGINT) AS rk, doc_id
        FROM ranked WHERE rk <= 3 ORDER BY lang, source, rk
    """


def _q132_oracle_sql() -> str:
    from duckdb_spatial_spark.operators import shard_assign_sql

    shard, u2 = shard_assign_sql("doc_id", 16, 7)
    return f"""
        WITH a AS (
          SELECT doc_id, {shard} AS shard, {u2} AS u2 FROM documents
        ), p AS (
          SELECT doc_id, shard,
                 row_number() OVER (PARTITION BY shard
                                    ORDER BY u2, doc_id) - 1 AS pos
          FROM a
        )
        SELECT CAST(shard AS INT) AS shard,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(pos) AS BIGINT) AS min_pos,
               CAST(max(pos) AS BIGINT) AS max_pos,
               CAST(sum(doc_id * (pos % 97)) AS BIGINT) AS sk
        FROM p GROUP BY shard ORDER BY shard
    """


_Q130_ORACLE = """
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)),
                                                   '\\s+'),
                                x -> x <> '')) AS t
      FROM documents
    )
    SELECT 'dup' AS term_a, 'the' AS term_b,
           (SELECT CAST(count(*) AS BIGINT) FROM toks
            WHERE t = 'dup') AS df_a,
           (SELECT CAST(count(*) AS BIGINT) FROM toks
            WHERE t = 'the') AS df_b,
           CAST(count(*) AS BIGINT) AS n_both,
           CAST(COALESCE(sum(doc_id), 0) AS BIGINT) AS sk_both
    FROM (SELECT doc_id FROM toks WHERE t = 'dup'
          INTERSECT
          SELECT doc_id FROM toks WHERE t = 'the') b(doc_id)
"""


_Q129_ORACLE = """
    WITH t AS (
      SELECT s_suppkey AS k,
             CAST(s_suppkey % 200 AS DOUBLE) AS x,
             CAST(s_acctbal AS DOUBLE) AS y
      FROM supplier
    ), kept AS (
      SELECT * FROM t WHERE NOT (x >= 80.0 AND x <= 130.0 AND y < 0.0)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM t
            WHERE x >= 80.0 AND x <= 130.0 AND y < 0.0) AS nd,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sk,
           round(sum(x), 2) AS sx,
           round(sum(y), 2) AS sy
    FROM kept
    WHERE x BETWEEN 50.0 AND 120.0 AND y BETWEEN -1000.0 AND 5000.0
"""


def q159_isotonic_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Isotonic (PAV) probability calibration — the step between a
    quality classifier's raw score and the filter threshold (Zadrozny &
    Elkan KDD'02; completes the q106 NB tier). Score = the q21/q84
    quality heuristic, label = long-document indicator; one map-side-
    combined shuffle bins the corpus into ≤32 (count, positives) rows,
    the PAV fit runs on that bounded state via the minimax
    characterization (max_{j<=i} min_{k>=i} block mean), every block
    mean ONE double division of exact BIGINT prefix sums — the oracle
    replays it bit-for-bit as a bounded self-join over the bin CTE."""
    from duckdb_spatial_spark.operators.classify import isotonic_calibrate
    from duckdb_spatial_spark.operators.textops import quality_score

    d = load_table(spark, sf, "documents", fan_out=True)
    # text IS NOT NULL on BOTH engines: DuckDB's CASE WHEN length(NULL)
    # falls to ELSE 0 where Spark's boolean->int cast yields NULL — the
    # explicit filter keeps q159 value-parity even on null-injected data
    scored = d.where(F.col("text").isNotNull()).select(
        quality_score(F.col("text")).alias("score"),
        (F.length("text") > 300).cast("int").alias("label"))
    return isotonic_calibrate(scored, "score", "label", n_bins=32)


def _q159_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.classify import isotonic_sql
    from duckdb_spatial_spark.operators.textops import quality_score_sql

    scored = (f"SELECT {quality_score_sql('text')} AS score, "
              f"CASE WHEN length(text) > 300 THEN 1 ELSE 0 END AS label "
              f"FROM documents WHERE text IS NOT NULL")
    return isotonic_sql(scored, n_bins=32)


def q160_streaming_mmr(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING Maximal-Marginal-Relevance re-ranking per event-time
    window — the stateful twin of q151 (retrieval diversity over a
    live candidate stream, e.g. dedup-aware context assembly as
    embeddings arrive). Vectors drain as a file stream into four
    1-hour windows; per window the state keeps only the top-``pool``
    candidates by (rounded cos DESC, id) — an ASSOCIATIVE merge, so
    the final update per window equals the batch MMR exactly. The
    oracle replays each window with the q151 unrolled-argmax CTE
    generator (a lost batch, a pool-merge bug, or a tie-break drift
    desyncs the hash)."""
    from duckdb_spatial_spark.streaming import streaming_mmr_rerank

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = load_table(spark, sf, "embeddings", fan_out=False)
    qv = batch.filter(F.col("vec_id") == 0).select(
        "embedding").collect()[0][0]
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf)
    )
    ev = (
        stream.filter(F.col("vec_id") > 0)
        .withColumn("ts", F.timestamp_seconds(
            F.lit(1704067200)
            + (F.col("vec_id") % 4) * 3600
            + F.col("vec_id") % 60))
    )
    out = streaming_mmr_rerank(ev, qv, id_col="vec_id",
                               vec_col="embedding", ts_col="ts",
                               k=5, pool=24, lam=0.7, window="1 hour")
    _Q75_SINK_SEQ[0] += 1
    sink = f"q160_sink_{_Q75_SINK_SEQ[0]}"
    # pool-bounded state (<= pool triples x 4 windows): state partitions
    # follow the input-size estimate (1 here, defaultParallelism at
    # scale — the shuffle fans out exactly when the stream does)
    with _stream_state_partitions(spark, batch):
        q = (
            out.writeStream.format("memory").queryName(sink)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    upd = spark.table(sink)
    w = Window.partitionBy("win", "rank").orderBy(F.col("n_seen").desc())
    final = (upd.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1))
    return final.select(
        ((F.col("win") - F.lit(1704067200)) / F.lit(3600))
        .cast("int").alias("win_idx"),
        F.col("rank").cast("long").alias("rank"),
        F.col("id").alias("vec_id"),
        "rel", "mmr",
    ).transform(_ssort, "win_idx", "rank")


def _q160_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.rank import mmr_sql

    parts = []
    for w in range(4):
        sub = mmr_sql(
            f"(SELECT * FROM embeddings "
            f"WHERE vec_id > 0 AND vec_id % 4 = {w})",
            "embedding", "vec_id", "embeddings", "vec_id = 0",
            k=5, pool=24, lam=0.7)
        parts.append(f"SELECT CAST({w} AS INT) AS win_idx, rank, "
                     f"id AS vec_id, rel, mmr FROM ({sub})")
    return " UNION ALL ".join(parts) + " ORDER BY win_idx, rank"


def q161_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    """Community detection via synchronous label propagation
    (Raghavan 2007) — completes the graph tier next to PageRank (q96),
    components (q69), triangles (q128), and BFS (q158). Five fixed
    iterations over the part→supplier co-occurrence graph; the whole
    recurrence is INTEGER-only (labels are node ids, votes are counts),
    so the unrolled-CTE oracle matches exactly with no float discipline
    needed. Returns the 10 largest communities by (size DESC, label)."""
    from duckdb_spatial_spark.operators.graph import label_propagation

    li = load_table(spark, sf, "lineitem", fan_out=False)
    edges = li.select((F.col("l_partkey") % 300).alias("src"),
                      (300 + F.col("l_suppkey") % 150).alias("dst"))
    r = label_propagation(edges, iters=5)
    comm = r.groupBy("lab").agg(F.count("*").cast("long").alias("sz"))
    w = Window.orderBy(F.col("sz").desc(), F.col("lab").asc())
    return (comm.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 10)
            .select("rank", "lab", "sz")
            .transform(_ssort, "rank"))


def _q161_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.graph import label_propagation_sql

    lpa = label_propagation_sql(
        "SELECT l_partkey % 300 AS src, 300 + l_suppkey % 150 AS dst "
        "FROM lineitem", iters=5)
    return f"""
        WITH comm AS (
          SELECT lab, CAST(count(*) AS BIGINT) AS sz
          FROM ({lpa}) res GROUP BY 1
        )
        SELECT CAST(row_number() OVER (ORDER BY sz DESC, lab ASC)
                    AS BIGINT) AS rank, lab, sz
        FROM comm
        ORDER BY sz DESC, lab ASC
        LIMIT 10
    """


def q162_k_core(spark: SparkSession, sf: str) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983) — the
    graph-quality filter (spam farms and weakly-connected fringe peel
    away; the dense core survives), sixth member of the graph tier.
    4-core of the natural-key order↔part bipartite graph, 8 peel
    rounds; the recurrence is INTEGER-only (degrees among survivors),
    so the unrolled peel CTEs replay it exactly. Early stop at a fixed
    point is output-neutral: the oracle's remaining rounds are no-ops.
    Returns one summary row of the surviving core (strict non-trivial
    subset at every test sf)."""
    from duckdb_spatial_spark.operators.graph import k_core

    li = load_table(spark, sf, "lineitem", fan_out=False)
    edges = li.select(F.col("l_orderkey").alias("src"),
                      (-F.lit(1) - F.col("l_partkey")).alias("dst"))
    core = k_core(edges, k=4, rounds=8)
    return core.agg(
        F.count("*").cast("long").alias("n_core"),
        F.sum(F.when(F.col("node") >= 0, 1).otherwise(0))
         .cast("long").alias("n_orders"),
        F.sum(F.when(F.col("node") < 0, 1).otherwise(0))
         .cast("long").alias("n_parts"),
        F.sum("node").cast("long").alias("checksum"),
        F.min("node").cast("long").alias("min_node"),
        F.max("node").cast("long").alias("max_node"),
    )


def _q162_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.graph import k_core_sql

    core = k_core_sql(
        "SELECT l_orderkey AS src, -1 - l_partkey AS dst FROM lineitem",
        k=4, rounds=8)
    return f"""
        SELECT CAST(count(*) AS BIGINT) AS n_core,
               CAST(sum(CASE WHEN node >= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN node < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_parts,
               CAST(sum(node) AS BIGINT) AS checksum,
               CAST(min(node) AS BIGINT) AS min_node,
               CAST(max(node) AS BIGINT) AS max_node
        FROM ({core}) core
    """


def q164_hits(spark: SparkSession, sf: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) — completes the classic
    link-analysis pair next to PageRank (q96), seventh member of the
    graph tier. Four unnormalized double-steps over the order→supplier
    bipartite purchase graph (hubs = buyer keys, authorities =
    supplier keys); scores are scale-invariant so normalization happens
    ONCE in-plan (divide by the per-kind max, round 6 dp) — zero
    driver round-trips inside the loop, one materializing job per
    iteration. Output: top-10 per kind by (normalized score DESC,
    node ASC). Oracle: the same recurrence unrolled as chained
    MATERIALIZED CTEs (hits_sql) + the same window normalize."""
    from duckdb_spatial_spark.operators.graph import hits

    li = load_table(spark, sf, "lineitem", fan_out=False)
    edges = li.select((F.col("l_orderkey") % 500).alias("src"),
                      (1000 + F.col("l_suppkey") % 200).alias("dst"))
    r = hits(edges, iters=4)
    w = Window.partitionBy("kind")
    scored = r.withColumn(
        "score_n",
        (F.round(F.col("score") / F.max("score").over(w), 6)
         + F.lit(0.0)))
    w2 = Window.partitionBy("kind").orderBy(
        F.col("score_n").desc(), F.col("node").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("kind", "rank", "node", "score_n")
        .transform(_ssort, "kind", "rank")
    )


def _q164_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.graph import hits_sql

    inner = hits_sql(
        "SELECT l_orderkey % 500 AS src, 1000 + l_suppkey % 200 AS dst "
        "FROM lineitem", iters=4)
    return f"""
        WITH raw AS MATERIALIZED ({inner}),
        scored AS (
          SELECT kind, node,
                 round(score / max(score) OVER (PARTITION BY kind), 6)
                   + 0.0 AS score_n
          FROM raw
        ),
        ranked AS (
          SELECT kind, node, score_n,
                 row_number() OVER (PARTITION BY kind
                                    ORDER BY score_n DESC, node ASC)
                   AS rank
          FROM scored
        )
        SELECT kind, CAST(rank AS BIGINT) AS rank, node, score_n
        FROM ranked WHERE rank <= 10 ORDER BY kind, rank
    """


def q163_pca_rotation_pq(spark: SparkSession, sf: str) -> DataFrame:
    """PCA-rotation product quantization (OPQ-lite — the parametric
    variant of Ge et al. CVPR'13): rotate the 64-dim embeddings into
    the top-16 PCA basis with components allocated to the m=4 subspaces
    ROUND-ROBIN by eigenvalue rank (balanced subspace variance — the
    OPQ benefit naive PCA-then-slice forfeits), then PQ-encode against
    codebooks pinned to the first 16 rotated vectors (the q116
    pattern). Output: the per-(subspace, code) histogram with mean
    quantization distortion — train + rotate + encode exercised end to
    end, ≤64 rows.

    Exactness: the rotation is the pinned deflated power iteration
    (q111/q94 discipline) so the oracle replays the train as unrolled
    MATERIALIZED CTEs; rotated coordinates round to 6 dp on BOTH
    engines before encode, so argmins see identical doubles (ties
    break on code index, matching numpy argmin). Plan: one Gramian
    pass + one rotate+encode stage (two chained Arrow UDFs, no
    shuffle between) + a 16-row codebook probe + ONE ≤64-group
    map-side-combined aggregate."""
    from duckdb_spatial_spark.operators.pq import (pq_codebook_df,
                                                   pq_encode,
                                                   rotate_vectors,
                                                   subvectors_from_rows,
                                                   train_pca_rotation)

    e = (load_table(spark, sf, "embeddings", fan_out=False)
         .filter(F.col("embedding").isNotNull()))
    mean, R, _lams = train_pca_rotation(e, "embedding", dim=64, k=16, m=4)
    rot = rotate_vectors(e.select("vec_id", "embedding"), "embedding",
                         mean, R)
    cb_rows = _probe_sorted(rot.filter(F.col("vec_id") < 16),
                            "vec_id", "rot")
    books = subvectors_from_rows(cb_rows, 4)
    coded = pq_encode(rot.select("vec_id", "rot"), "rot", books)
    ex = coded.select(
        "vec_id", "rot", F.posexplode("pq_code").alias("j", "c"))
    cb = pq_codebook_df(spark, books)
    d2 = F.aggregate(
        F.zip_with(F.slice("rot", F.col("j") * 4 + 1, 4),
                   F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (
        ex.join(F.broadcast(cb), ["j", "c"])
        .withColumn("d2", d2)
        .groupBy("j", "c")
        .agg(F.count("*").cast("long").alias("n_vecs"),
             (F.round(F.avg("d2"), 6) + F.lit(0.0)).alias("avg_d2"))
        .transform(_ssort, "j", "c")
    )


def _q163_oracle_sql() -> str:
    """SQL replay of the full OPQ-lite pipeline: pca_power_sql train
    (k=16 deflated chains), 6-dp rotated projection (the q94 proj
    shape), (comp-1)%4 round-robin subspace bucketing, positional
    codebook over the first 16 non-null vectors per subspace, argmin
    encode with code-index tie-break, per-(j, c) distortion."""
    from duckdb_spatial_spark.operators.vectors import pca_power_sql

    comps = pca_power_sql(
        "(SELECT embedding FROM embeddings WHERE embedding IS NOT NULL)",
        "embedding", dim=64, k=16, iters=8)
    return f"""
        WITH comps AS MATERIALIZED ({comps}),
        idx AS (SELECT unnest(generate_series(1, 64)) AS i),
        x AS MATERIALIZED (
          SELECT vec_id, embedding AS e FROM embeddings
          WHERE embedding IS NOT NULL
        ),
        xi AS MATERIALIZED (
          SELECT vec_id, i, CAST(e[i] AS DOUBLE) AS x
          FROM x CROSS JOIN idx
        ),
        nn AS (SELECT count(*) AS n FROM x),
        mu AS (SELECT i, sum(x) / nn.n AS m
               FROM xi CROSS JOIN nn GROUP BY i, nn.n),
        proj AS MATERIALIZED (
          SELECT xi.vec_id, comps.comp,
                 round(sum((xi.x - mu.m) * comps.loading), 6) AS p
          FROM xi JOIN mu USING (i) JOIN comps USING (i)
          GROUP BY 1, 2
        ),
        sub AS MATERIALIZED (
          SELECT vec_id, CAST((comp - 1) % 4 AS INT) AS j,
                 list(p ORDER BY comp) AS sv
          FROM proj GROUP BY 1, 2
        ),
        cb AS (
          SELECT j, CAST(row_number() OVER (PARTITION BY j
                                            ORDER BY vec_id) - 1
                         AS INT) AS c,
                 sv AS cent
          FROM sub WHERE vec_id < 16
        ),
        enc AS (
          SELECT vec_id, j, c, d2 FROM (
            SELECT s.vec_id, s.j, cb.c,
                   list_sum(list_transform(range(1, 5),
                     t -> (s.sv[t] - cb.cent[t])
                          * (s.sv[t] - cb.cent[t]))) AS d2,
                   row_number() OVER (
                     PARTITION BY s.vec_id, s.j
                     ORDER BY list_sum(list_transform(range(1, 5),
                       t -> (s.sv[t] - cb.cent[t])
                            * (s.sv[t] - cb.cent[t]))),
                       cb.c) AS rn
            FROM sub s JOIN cb ON s.j = cb.j
          ) WHERE rn = 1
        )
        SELECT j, c, CAST(count(*) AS BIGINT) AS n_vecs,
               round(avg(d2), 6) + 0.0 AS avg_d2
        FROM enc GROUP BY 1, 2 ORDER BY j, c
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness gate checks the first 50
    # entries. ROUND-11 window — staleness-first continuation of the
    # round-10 rotation (round-10 verdict ask #1):
    #   * round-11 new/changed code leads: q163 (new PCA-rotation PQ),
    #     q164 (new HITS), q159 (NaN/out-of-range bin clamp), q160
    #     (null-id entry filter), q152 (session_funnel one-pass plan);
    #   * then EVERY query whose latest driver check is round 6
    #     (8: q57 q75 q90 q97 q99 q103 q118 q123) or round 7
    #     (13: q60 q76 q95 q98 q112 q124 q128 q130 q132-q135 q147);
    #   * the remaining 24 slots take the r8 tier ranked by OLDEST
    #     prior evidence: the first-ever-r8 rows (q149/q150/q154-q158),
    #     q74/q94, the round-1 evergreens (q02 q07 q12 q15 q28 q31),
    #     then q108/q109/q115/q117/q64/q66/q84/q87/q126.
    # Displaced: the whole round-10 window (all 50 driver-green in r10,
    # byte-unchanged) and the fresher r8/r9 rows.
    return {
        "q163_pca_rotation_pq": q163_pca_rotation_pq,
        "q164_hits": q164_hits,
        "q159_isotonic_calibration": q159_isotonic_calibration,
        "q160_streaming_mmr": q160_streaming_mmr,
        "q152_session_funnel": q152_session_funnel,
        "q57_shortestline": q57_shortestline,
        "q75_streaming_extent": q75_streaming_extent,
        "q90_domain_quota": q90_domain_quota,
        "q97_salted_agg": q97_salted_agg,
        "q99_minhash_index": q99_minhash_index,
        "q103_bm25_topk": q103_bm25_topk,
        "q118_salted_join": q118_salted_join,
        "q123_hll_overlap": q123_hll_overlap,
        "q60_spheroid": q60_spheroid,
        "q76_pack_sequences": q76_pack_sequences,
        "q95_profile_table": q95_profile_table,
        "q98_corpus_diff": q98_corpus_diff,
        "q112_asof_join": q112_asof_join,
        "q124_corpus_divergence": q124_corpus_divergence,
        "q128_triangle_count": q128_triangle_count,
        "q130_inverted_index": q130_inverted_index,
        "q132_shard_permutation": q132_shard_permutation,
        "q133_zorder_layout": q133_zorder_layout,
        "q134_phrase_search": q134_phrase_search,
        "q135_cluster_balanced_sample": q135_cluster_balanced_sample,
        "q147_weighted_sample": q147_weighted_sample,
        "q149_topk_per_group": q149_topk_per_group,
        "q150_time_bucket_ohlc": q150_time_bucket_ohlc,
        "q154_char_entropy": q154_char_entropy,
        "q155_rollup_aggregate": q155_rollup_aggregate,
        "q156_exact_percentiles": q156_exact_percentiles,
        "q157_pivot_table": q157_pivot_table,
        "q158_bfs_hops": q158_bfs_hops,
        "q74_repetition_filter": q74_repetition_filter,
        "q94_pca_project": q94_pca_project,
        "q02_zone_pip_join": q02_zone_pip_join,
        "q07_wkt_area": q07_wkt_area,
        "q12_npoints": q12_npoints,
        "q15_tpch_q1": q15_tpch_q1,
        "q28_union_agg": q28_union_agg,
        "q31_predicate_matrix": q31_predicate_matrix,
        "q108_lm_kneser_ney": q108_lm_kneser_ney,
        "q109_geoparquet_covering": q109_geoparquet_covering,
        "q115_count_min": q115_count_min,
        "q117_dbscan": q117_dbscan,
        "q64_mixed_overlay": q64_mixed_overlay,
        "q66_multimodal": q66_multimodal,
        "q84_quality_buckets": q84_quality_buckets,
        "q87_lm_perplexity": q87_lm_perplexity,
        "q126_sessionize": q126_sessionize,
        # ---- below the 50-query driver window (latest driver check r8-r10, byte-unchanged) ----
        "q161_label_propagation": q161_label_propagation,
        "q162_k_core": q162_k_core,
        "q96_pagerank": q96_pagerank,
        "q153_streaming_funnel": q153_streaming_funnel,
        "q10_quadkey": q10_quadkey,
        "q48_pointonsurface": q48_pointonsurface,
        "q51_buffer_line": q51_buffer_line,
        "q52_buffer_polygon": q52_buffer_polygon,
        "q59_reduceprecision": q59_reduceprecision,
        "q63_intersection_agg": q63_intersection_agg,
        "q26_ngram_jaccard": q26_ngram_jaccard,
        "q55_ann_ivf": q55_ann_ivf,
        "q58_linemerge_normalize": q58_linemerge_normalize,
        "q71_sample_stratified": q71_sample_stratified,
        "q72_pii_redact": q72_pii_redact,
        "q73_paragraph_dedup": q73_paragraph_dedup,
        "q93_vec_quantize": q93_vec_quantize,
        "q05_centroid_collect": q05_centroid_collect,
        "q101_substring_dedup": q101_substring_dedup,
        "q102_c4_filters": q102_c4_filters,
        "q104_semdedup": q104_semdedup,
        "q111_pca_power_iteration": q111_pca_power_iteration,
        "q114_hll_distinct": q114_hll_distinct,
        "q116_ann_ivfpq": q116_ann_ivfpq,
        "q35_transform": q35_transform,
        "q38_minhash_lsh": q38_minhash_lsh,
        "q61_rtree_points": q61_rtree_points,
        "q65_gpkg_roundtrip": q65_gpkg_roundtrip,
        "q69_dedup_components": q69_dedup_components,
        "q77_chunk_documents": q77_chunk_documents,
        "q78_temperature_mix": q78_temperature_mix,
        "q79_dedup_pipeline": q79_dedup_pipeline,
        "q81_streaming_sessions": q81_streaming_sessions,
        "q82_warc_pipeline": q82_warc_pipeline,
        "q83_url_domain_stats": q83_url_domain_stats,
        "q85_vocab_build": q85_vocab_build,
        "q92_text_clean": q92_text_clean,
        "q110_unigram_tokenizer": q110_unigram_tokenizer,
        "q113_interval_join": q113_interval_join,
        "q119_histogram_quantiles": q119_histogram_quantiles,
        "q120_wordpiece_tokenizer": q120_wordpiece_tokenizer,
        "q121_resample_ffill": q121_resample_ffill,
        "q125_cluster_append": q125_cluster_append,
        "q41_casts": q41_casts,
        "q50_validity": q50_validity,
        "q68_gdb_roundtrip": q68_gdb_roundtrip,
        "q80_webdataset_roundtrip": q80_webdataset_roundtrip,
        "q89_sentence_stats": q89_sentence_stats,
        "q148_group_zscore": q148_group_zscore,
        "q70_decontaminate": q70_decontaminate,
        "q54_langid_ngram": q54_langid_ngram,
        "q105_dsir_select": q105_dsir_select,
        "q106_nb_quality_classifier": q106_nb_quality_classifier,
        "q107_hamming_image_dedup": q107_hamming_image_dedup,
        "q151_mmr_rerank": q151_mmr_rerank,
        "q142_streaming_layout": q142_streaming_layout,
        "q100_bloom_decontaminate": q100_bloom_decontaminate,
        "q01_point_in_envelope": q01_point_in_envelope,
        "q08_buffer_area": q08_buffer_area,
        "q11_geometrytype": q11_geometrytype,
        "q13_length": q13_length,
        "q14_envelope_area": q14_envelope_area,
        "q16_revenue_by_nation": q16_revenue_by_nation,
        "q17_window_topk": q17_window_topk,
        "q22_fingerprint": q22_fingerprint,
        "q23_langid": q23_langid,
        "q24_ann_topk": q24_ann_topk,
        "q27_generatepoints": q27_generatepoints,
        "q29_accessors": q29_accessors,
        "q30_pointn_ring": q30_pointn_ring,
        "q32_intersection_area": q32_intersection_area,
        "q43_flip_reverse": q43_flip_reverse,
        "q45_removerepeated": q45_removerepeated,
        "q19_minhash": q19_minhash,
        "q25_embedding_neardup": q25_embedding_neardup,
        "q06_convexhull_area": q06_convexhull_area,
        "q20_simhash": q20_simhash,
        "q33_simplify": q33_simplify,
        "q18_dedup_exact": q18_dedup_exact,
        "q34_envelope_boundary": q34_envelope_boundary,
        "q47_makepolygon": q47_makepolygon,
        "q62_buffer_joinstyles": q62_buffer_joinstyles,
        "q09_hilbert_distribution": q09_hilbert_distribution,
        "q21_text_quality": q21_text_quality,
        "q67_transform_epsg": q67_transform_epsg,
        "q42_general_overlay": q42_general_overlay,
        "q56_predicate_matrix2": q56_predicate_matrix2,
        "q40_hexwkb_roundtrip": q40_hexwkb_roundtrip,
        "q39_simhash_hamming": q39_simhash_hamming,
        "q04_extent_agg": q04_extent_agg,
        "q03_distance_sphere": q03_distance_sphere,
        "q36_dwithin": q36_dwithin,
        "q37_dump": q37_dump,
        "q44_force_dims": q44_force_dims,
        "q46_geojson_roundtrip": q46_geojson_roundtrip,
        "q49_collectionextract": q49_collectionextract,
        "q127_edit_distance_dedup": q127_edit_distance_dedup,
        "q137_zorder_crud": q137_zorder_crud,
        "q146_collocations": q146_collocations,
        "q144_json_extract": q144_json_extract,
        "q143_funnel": q143_funnel,
        "q129_cluster_delete": q129_cluster_delete,
        "q145_cohort_retention": q145_cohort_retention,
        "q53_transform_utm": q53_transform_utm,
        "q140_token_budget_mix": q140_token_budget_mix,
        "q138_streaming_index": q138_streaming_index,
        "q86_bpe_pipeline": q86_bpe_pipeline,
        "q88_knn_join": q88_knn_join,
        "q139_hybrid_search": q139_hybrid_search,
        "q131_bm25_search": q131_bm25_search,
        "q91_streaming_interval_join": q91_streaming_interval_join,
        "q136_group_sample": q136_group_sample,
        "q141_ngram_novelty": q141_ngram_novelty,
        "q122_rolling_window": q122_rolling_window,
    }


def _q54_oracle_sql() -> str:
    """DuckDB mirror of language_id_ngram: the Cavnar–Trenkle profiles are
    deterministic module constants, embedded as VALUES; trigram extraction,
    rank, and out-of-place distance replicated in SQL."""
    from duckdb_spatial_spark.operators.textops import _LANG_PROFILES, _PROFILE_K

    rows = []
    for lang in sorted(_LANG_PROFILES):
        for g, r in _LANG_PROFILES[lang].items():
            esc = g.replace("'", "''")
            rows.append(f"('{lang}', '{esc}', {r})")
    prof_values = ", ".join(rows)
    return f"""
        WITH prof(lang, gram, prank) AS (VALUES {prof_values}),
        norm AS (
          SELECT doc_id,
                 ' ' || regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
                     || ' ' AS t
          FROM documents
        ),
        grams AS (
          SELECT doc_id, substr(t, CAST(i AS INT), 3) AS gram
          FROM norm, LATERAL (
            SELECT unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS i)
        ),
        counts AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
        docg AS (
          SELECT doc_id, gram, drank FROM (
            SELECT doc_id, gram,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, gram) - 1 AS drank
            FROM counts
          ) WHERE drank < {_PROFILE_K}
        ),
        dist AS (
          SELECT d.doc_id, l.lang,
                 sum(CASE WHEN p.prank IS NULL THEN {_PROFILE_K}
                          ELSE abs(p.prank - d.drank) END) AS dd
          FROM docg d
          CROSS JOIN (SELECT DISTINCT lang FROM prof) l
          LEFT JOIN prof p ON p.lang = l.lang AND p.gram = d.gram
          GROUP BY 1, 2
        ),
        best AS (
          SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY dd, lang) AS rn
            FROM dist
          ) WHERE rn = 1
        )
        SELECT COALESCE(b.lang, 'und') AS lang, count(*) AS n
        FROM documents doc LEFT JOIN best b ON b.doc_id = doc.doc_id
        GROUP BY 1 ORDER BY 1
    """


def _q61_oracle_sql() -> str:
    """DuckDB mirror of the portable point generator: same 31-bit
    multiply-xorshift uniforms over range(10M)."""
    from duckdb_spatial_spark.sources.generate import portable_uniform_sql

    salt_base = 1337 * 1_000_003
    u1 = portable_uniform_sql("i * 2", salt_base + 2)
    u2 = portable_uniform_sql("i * 2", salt_base + 3)
    return f"""
        SELECT count(*) AS n FROM (
          SELECT {u1} * 10000.0 AS x, {u2} * 10000.0 AS y
          FROM range(0, 10000000) t(i)
        ) WHERE x >= 450.0 AND x <= 650.0 AND y >= 450.0 AND y <= 650.0
    """


def _q71_oracle_sql() -> str:
    """DuckDB mirror of stratified_sample's keep-predicate (portable
    31-bit hash-uniform — same arithmetic both engines)."""
    from duckdb_spatial_spark.operators.pipeline import stratified_predicate_sql

    fr = {"en": 0.5, "de": 0.25, "es": 0.1, "fr": 0.75, "zh": 0.05}
    pred = stratified_predicate_sql("doc_id", "lang", fr, seed=42)
    return f"""
        SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
        FROM documents WHERE {pred}
        GROUP BY lang ORDER BY lang
    """


def _q72_oracle_sql() -> str:
    """DuckDB mirror of the PII scrub: identical RE2-safe patterns."""
    from duckdb_spatial_spark.operators.pipeline import PII_PATTERNS, redact_sql

    email = PII_PATTERNS["email"].replace("'", "''")
    ipv4 = PII_PATTERNS["ipv4"].replace("'", "''")
    red = redact_sql("t", kinds=("email", "ipv4"))
    return f"""
        WITH t AS (
          SELECT substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                 || '.org or 10.' || CAST(doc_id % 200 AS VARCHAR)
                 || '.3.' || CAST(doc_id % 250 AS VARCHAR) || ' now' AS t
          FROM documents
        ), r AS (
          SELECT t, {red} AS r,
                 len(regexp_extract_all(t, '{email}')) AS ne,
                 len(regexp_extract_all(t, '{ipv4}')) AS ni
          FROM t
        )
        SELECT CAST(sum(ne) AS BIGINT) AS n_email,
               CAST(sum(ni) AS BIGINT) AS n_ipv4,
               CAST(sum(length(t) - length(r)) AS BIGINT) AS removed_chars,
               count(*) AS n_docs
        FROM r
    """


def _q74_oracle_sql() -> str:
    """DuckDB mirror of the Gopher repetition metrics: per-n gram CTEs,
    top-gram by (count DESC, gram ASC), duplicated-gram char mass / L."""
    top_ns, dup_ns = (2, 3, 4), (5, 10)
    gram_ctes, metric_joins, metric_exprs = [], [], []
    for n in sorted(set(top_ns) | set(dup_ns)):
        gram_ctes.append(f"""
            g{n} AS (
              SELECT doc_id, L,
                     array_to_string(list_slice(w, CAST(i AS BIGINT), CAST(i AS BIGINT) + {n - 1}), ' ') AS g
              FROM (SELECT doc_id, L, w, generate_subscripts(w, 1) AS i
                    FROM norm)
              WHERE i <= len(w) - {n - 1}
            )""")
    for n in top_ns:
        gram_ctes.append(f"""
            top{n} AS (
              SELECT doc_id, CAST(cnt * length(g) AS DOUBLE) / L AS frac FROM (
                SELECT doc_id, g, L, count(*) AS cnt,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY count(*) DESC, g) AS rn
                FROM g{n} GROUP BY doc_id, g, L
              ) WHERE rn = 1
            )""")
        metric_joins.append(f"LEFT JOIN top{n} ON top{n}.doc_id = b.doc_id")
        metric_exprs.append((f"top_{n}gram_char_frac", f"COALESCE(top{n}.frac, 0.0)"))
    for n in dup_ns:
        gram_ctes.append(f"""
            dup{n} AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(g) ELSE 0 END) AS DOUBLE)
                       / any_value(L) AS frac
              FROM (SELECT doc_id, g, L, count(*) AS cnt
                    FROM g{n} GROUP BY doc_id, g, L)
              GROUP BY doc_id
            )""")
        metric_joins.append(f"LEFT JOIN dup{n} ON dup{n}.doc_id = b.doc_id")
        metric_exprs.append((f"dup_{n}gram_char_frac", f"COALESCE(dup{n}.frac, 0.0)"))

    sel = ",\n".join(f"{e} AS {name}" for name, e in metric_exprs)
    keep = (
        "m.top_2gram_char_frac <= 0.20 AND m.top_3gram_char_frac <= 0.18 "
        "AND m.top_4gram_char_frac <= 0.16 AND m.dup_5gram_char_frac <= 0.15 "
        "AND m.dup_10gram_char_frac <= 0.10"
    )
    return f"""
        WITH built AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0
                      THEN text || repeat(' click here to win', 40)
                      ELSE text END AS text
          FROM documents
        ), norm AS (
          SELECT doc_id,
                 length(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS L,
                 string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
          FROM built
        ),{",".join(gram_ctes)},
        m AS (
          SELECT b.doc_id, {sel}
          FROM built b {" ".join(metric_joins)}
        )
        SELECT count(*) AS n_docs,
               CAST(sum(CASE WHEN {keep} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               round(avg(m.top_2gram_char_frac), 6) AS avg_top2,
               round(avg(m.dup_5gram_char_frac), 6) AS avg_dup5
        FROM m
    """


def _q77_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.pipeline import chunk_documents_sql

    expr = chunk_documents_sql(64, 16)
    return f"""
        WITH c AS (
          SELECT doc_id, unnest({expr}) AS ch FROM documents
        )
        SELECT count(*) AS n_chunks,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(ch.chunk_text, ' '))) AS BIGINT)
                 AS chunk_tokens_total,
               CAST(max(ch.chunk_idx) AS BIGINT) AS max_chunk_idx
        FROM c
    """


def _q78_oracle_sql() -> str:
    """DuckDB mirror of sqrt-temperature mixing: identical operation order
    (T·√n → /Σ√n → /n), least(1, ·), round 9."""
    from duckdb_spatial_spark.operators.pipeline import stratified_predicate_sql

    # the keep predicate needs per-source fractions computed IN SQL; reuse
    # the portable-uniform mirror with the fraction joined per row
    from duckdb_spatial_spark.sources.generate import portable_uniform_sql

    u = portable_uniform_sql("d.doc_id", 1_000_003 * 7 + 11)
    return f"""
        WITH tot AS (SELECT count(*) // 3 AS t FROM documents),
        c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        fr AS (
          SELECT source,
                 round(least(1.0,
                   (SELECT t FROM tot) * sqrt(CAST(n AS DOUBLE))
                     / (SELECT sum(sqrt(CAST(n AS DOUBLE))) FROM c) / n), 9) AS f
          FROM c
        )
        SELECT d.source, count(*) AS n_kept,
               CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
        FROM documents d JOIN fr ON fr.source = d.source
        WHERE {u} < fr.f
        GROUP BY d.source ORDER BY d.source
    """


_Q70_ORACLE = """
            WITH bench_t AS (
              SELECT array_to_string(list_slice(string_split(text, ' '), 1, 12), ' ') AS text
              FROM documents WHERE doc_id % 50 = 0
            ), bn AS (
              SELECT string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
              FROM bench_t
            ), bg AS (
              SELECT DISTINCT array_to_string(list_slice(w, CAST(i AS BIGINT), CAST(i AS BIGINT) + 7), ' ') AS gram
              FROM (SELECT w, generate_subscripts(w, 1) AS i FROM bn)
              WHERE i <= greatest(len(w) - 7, 1)
            ), norm AS (
              SELECT doc_id,
                     string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
              FROM documents
            ), cg AS (
              SELECT doc_id, array_to_string(list_slice(w, CAST(i AS BIGINT), CAST(i AS BIGINT) + 7), ' ') AS gram
              FROM (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM norm)
              WHERE i <= greatest(len(w) - 7, 1)
            ), hits AS (
              SELECT DISTINCT doc_id FROM cg WHERE gram IN (SELECT gram FROM bg)
            )
            SELECT count(*) AS n_docs,
                   CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contam,
                   CAST(sum(CASE WHEN h.doc_id IS NULL THEN d.n_chars ELSE 0 END) AS BIGINT) AS chars_clean
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """


def _q112_oracle_sql() -> str:
    """DuckDB's NATIVE ASOF JOIN — a different algorithm (sort-merge range
    probe) validating the union-tag window plan."""
    tol = ("mts IS NOT NULL AND epoch_us(ts) - epoch_us(mts) <= 3600000000")
    return f"""
        WITH c AS (
          SELECT CAST(user_id % 50 AS BIGINT) AS k, ts, event_id AS click_id
          FROM events WHERE event_type = 'click'
        ), b AS (
          SELECT CAST(user_id % 50 AS BIGINT) AS k, ts,
                 CAST(max(event_id) AS BIGINT) AS buy_id,
                 max(value) AS buy_value
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ), j AS (
          SELECT c.k, c.ts, b.ts AS mts, b.buy_id, b.buy_value
          FROM c ASOF LEFT JOIN b ON c.k = b.k AND c.ts >= b.ts
        ), t AS (
          SELECT k, ts,
                 CASE WHEN {tol} THEN mts END AS mts,
                 CASE WHEN {tol} THEN buy_id END AS buy_id,
                 CASE WHEN {tol} THEN buy_value END AS buy_value
          FROM j
        )
        SELECT k,
               CAST(count(*) AS BIGINT) AS n_clicks,
               CAST(count(mts) AS BIGINT) AS n_matched,
               CAST(sum(buy_id) AS BIGINT) AS sum_buy,
               round(sum(buy_value), 6) AS sum_value,
               CAST(sum(epoch_us(ts) - epoch_us(mts)) AS BIGINT) AS lag_us
        FROM t GROUP BY 1 ORDER BY 1
    """


def _q113_oracle_sql() -> str:
    """Plain overlap-predicate join (DuckDB plans IEJoin) — validates the
    bucket-grid + greatest-start-dedup plan."""
    return """
        WITH c AS (
          SELECT CAST(user_id % 50 AS BIGINT) AS k,
                 epoch_us(ts) AS s,
                 epoch_us(ts) + CAST(floor(value * 10) AS BIGINT) * 1000000
                   AS e,
                 event_id AS click_id
          FROM events WHERE event_type = 'click'
        ), b AS (
          SELECT CAST(user_id % 50 AS BIGINT) AS k, epoch_us(ts) AS s,
                 epoch_us(ts) + 600000000 AS e, event_id AS buy_id
          FROM events WHERE event_type = 'purchase'
        )
        SELECT c.k,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(c.click_id) AS BIGINT) AS sum_click,
               CAST(sum(b.buy_id) AS BIGINT) AS sum_buy,
               CAST(sum(least(c.e, b.e) - greatest(c.s, b.s)) AS BIGINT)
                 AS overlap_us
        FROM c JOIN b ON c.k = b.k AND c.s <= b.e AND b.s <= c.e
        GROUP BY 1 ORDER BY 1
    """


def _q114_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.sketch import (hll_estimate_sql,
                                                       hll_register_sql)

    bucket, rho = hll_register_sql("word", 10)
    return f"""
        WITH w AS (
          SELECT lang,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents
        ), ww AS (
          SELECT lang, word FROM w WHERE word <> ''
        ), regs AS (
          SELECT lang, {bucket} AS bucket, max({rho}) AS reg
          FROM ww GROUP BY 1, 2
        ), g AS (
          SELECT lang,
                 CAST(sum(CAST(1 AS BIGINT) << (49 - reg)) AS BIGINT)
                   AS s_present,
                 CAST(count(*) AS BIGINT) AS n_present
          FROM regs GROUP BY 1
        ), est AS (
          SELECT lang, round({hll_estimate_sql(10)}, 4) AS hll_est FROM g
        ), ex AS (
          SELECT lang, CAST(count(DISTINCT word) AS BIGINT) AS n_exact
          FROM ww GROUP BY 1
        )
        SELECT ex.lang, n_exact, hll_est
        FROM ex JOIN est USING (lang) ORDER BY 1
    """


def _q115_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.sketch import cms_bucket_sql

    d, wdt = 4, 1024
    cells = " UNION ALL ".join(
        f"SELECT {i} AS row, {cms_bucket_sql('word', i, wdt)} AS col, "
        f"1 AS one FROM ww" for i in range(d))
    probes = " UNION ALL ".join(
        f"SELECT word, freq, {i} AS row, "
        f"{cms_bucket_sql('word', i, wdt)} AS col FROM top" for i in range(d))
    return f"""
        WITH w AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents
        ), ww AS (
          SELECT word FROM w WHERE word <> ''
        ), cells AS ({cells}),
        sk AS (
          SELECT row, col, CAST(sum(one) AS BIGINT) AS cnt
          FROM cells GROUP BY 1, 2
        ), top AS (
          SELECT word, CAST(count(*) AS BIGINT) AS freq
          FROM ww GROUP BY 1 ORDER BY freq DESC, word LIMIT 15
        ), probes AS ({probes})
        SELECT word, freq,
               CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est,
               CAST(min(coalesce(cnt, 0)) - freq AS BIGINT) AS overshoot
        FROM probes LEFT JOIN sk USING (row, col)
        GROUP BY word, freq ORDER BY freq DESC, word
    """


def oracle_sql() -> dict[str, str]:
    xmin, ymin, xmax, ymax = ENV
    # WGS84 meridian-arc series (Bessel, third flattening n) — coefficients
    # as exact literals so the oracle is plain ANSI SQL
    _a = 6378137.0
    _f = 1.0 / 298.257223563
    _n = _f / (2.0 - _f)
    _c0 = (_a / (1 + _n)) * (1 + _n * _n / 4 + _n ** 4 / 64)
    _c2 = (_a / (1 + _n)) * (3 * _n / 2 - 3 * _n ** 3 / 16)
    _c4 = (_a / (1 + _n)) * (15 * _n * _n / 16 - 15 * _n ** 4 / 64)
    _c6 = (_a / (1 + _n)) * (35 * _n ** 3 / 48)
    _c8 = (_a / (1 + _n)) * (315 * _n ** 4 / 512)
    _marc = (
        lambda phi: f"({_c0!r}*{phi} - {_c2!r}*sin(2*{phi}) + {_c4!r}*sin(4*{phi})"
        f" - {_c6!r}*sin(6*{phi}) + {_c8!r}*sin(8*{phi}))"
    )
    return {
        "q61_rtree_points": _q61_oracle_sql(),
        "q54_langid_ngram": _q54_oracle_sql(),
        "q55_ann_ivf": """
            WITH ee AS MATERIALIZED (
              -- null vectors never rank; MATERIALIZED so decorrelation
              -- cannot evaluate list_cosine_similarity before the filter
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS evec
              FROM embeddings WHERE embedding IS NOT NULL
            ), cent AS (
              SELECT vec_id AS cid, evec AS cvec FROM ee WHERE vec_id < 32
            ), q AS (
              SELECT vec_id AS qid, evec AS qvec FROM ee WHERE vec_id < 5
            ), asgn AS (
              SELECT e.vec_id, e.evec,
                     (SELECT cid FROM cent
                      ORDER BY list_cosine_similarity(e.evec, cvec)
                        DESC, cid
                      LIMIT 1) AS cell
              FROM ee e
            ), probe AS (
              SELECT qid, cid FROM (
                SELECT q.qid, cent.cid,
                       row_number() OVER (
                         PARTITION BY q.qid
                         ORDER BY list_cosine_similarity(qvec, cvec) DESC, cid
                       ) AS rn
                FROM q CROSS JOIN cent
              ) WHERE rn <= 8
            ), ivf AS (
              SELECT qid, vec_id FROM (
                SELECT p.qid, a.vec_id,
                       row_number() OVER (
                         PARTITION BY p.qid
                         ORDER BY list_cosine_similarity(a.evec, q2.qvec) DESC,
                                  a.vec_id
                       ) AS rn
                FROM probe p
                JOIN asgn a ON a.cell = p.cid
                JOIN q q2 ON q2.qid = p.qid
              ) WHERE rn <= 5
            ), exact AS (
              SELECT qid, vec_id FROM (
                SELECT q.qid, e.vec_id,
                       row_number() OVER (
                         PARTITION BY q.qid
                         ORDER BY list_cosine_similarity(e.evec, q.qvec)
                           DESC, e.vec_id
                       ) AS rn
                FROM ee e CROSS JOIN q
              ) WHERE rn <= 5
            )
            SELECT count(*) AS n_hits
            FROM exact JOIN ivf USING (qid, vec_id)
        """,
        "q60_spheroid": f"""
            WITH d AS (
              SELECT radians(CAST(c_custkey % 140 AS DOUBLE) - 70.0) AS p1,
                     radians(CAST(c_custkey % 140 AS DOUBLE) - 70.0
                             + CAST(c_custkey % 37 AS DOUBLE)*0.5 + 0.5) AS p2,
                     radians(CAST(c_custkey % 170 AS DOUBLE) + 1.0) AS dl
              FROM customer
            )
            SELECT round(sum({_marc('p2')} - {_marc('p1')}), 2) AS merid_sum_m,
                   round(sum({_a!r} * dl), 2) AS equat_sum_m,
                   count(*) AS n
            FROM d
        """,
        "q01_point_in_envelope": f"""
            SELECT count(*) AS n FROM ({_EVENTS_PTS_SQL})
            WHERE x > {xmin} AND x < {xmax} AND y > {ymin} AND y < {ymax}
        """,
        # ST_Within excludes the boundary → strict comparisons and explicit
        # exclusion of internal cell borders
        "q02_zone_pip_join": f"""
            SELECT CAST(floor(x/100) AS INT)*3 + CAST(floor(y/50) AS INT) AS zone_id,
                   count(*) AS n
            FROM ({_EVENTS_PTS_SQL})
            WHERE x > 0 AND x < 500 AND y > 0 AND y < 150
              AND x <> floor(x/100)*100 AND y <> floor(y/50)*50
            GROUP BY 1 ORDER BY 1
        """,
        "q03_distance_sphere": """
            SELECT l_returnflag,
                   round(avg(2 * 6371000.0 * asin(least(1.0, sqrt(
                       pow(sin(radians(l_quantity*3 - l_discount*100)/2), 2)
                       + cos(radians(l_discount*100)) * cos(radians(l_quantity*3))
                         * pow(sin(radians(l_linenumber*10 - l_tax*100)/2), 2)
                   )))), 3) AS avg_dist_m,
                   count(*) AS n
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "q04_extent_agg": f"""
            SELECT event_type, min(x) AS xmin, min(y) AS ymin,
                   max(x) AS xmax, max(y) AS ymax, count(*) AS n
            FROM ({_EVENTS_PTS_SQL}) GROUP BY 1 ORDER BY 1
        """,
        "q05_centroid_collect": """
            SELECT c_nationkey,
                   round(avg(c_acctbal), 6) AS cx,
                   round(avg(CAST(c_custkey % 1000 AS DOUBLE)), 6) AS cy
            FROM customer GROUP BY 1 ORDER BY 1
        """,
        "q06_convexhull_area": """
            WITH pts AS (
              SELECT DISTINCT c_mktsegment AS seg, c_acctbal AS x,
                     CAST(c_custkey % 1000 AS DOUBLE) AS y
              FROM customer WHERE c_custkey < 240
            ), e AS (
              SELECT a.seg, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS b_y
              FROM pts a JOIN pts b
                ON a.seg = b.seg AND (a.x <> b.x OR a.y <> b.y)
              WHERE NOT EXISTS (
                SELECT 1 FROM pts c WHERE c.seg = a.seg
                  AND (b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x) < 0
              )
              AND NOT EXISTS (
                SELECT 1 FROM pts c WHERE c.seg = a.seg
                  AND (b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x) = 0
                  AND (c.x-a.x)*(b.x-a.x) + (c.y-a.y)*(b.y-a.y) > 0
                  AND (c.x-b.x)*(a.x-b.x) + (c.y-b.y)*(a.y-b.y) > 0
              )
            )
            SELECT seg AS c_mktsegment,
                   round(sum(ax*b_y - bx*ay)/2, 4) AS hull_area
            FROM e GROUP BY 1 ORDER BY 1
        """,
        "q09_hilbert_distribution": """
            WITH g AS (
              SELECT CAST(least(greatest(floor(value/500.0*65535), 0), 65535)
                          AS BIGINT) // 4096 AS cx,
                     CAST(least(greatest(floor(CAST(user_id AS DOUBLE)/150.0*65535),
                          0), 65535) AS BIGINT) // 4096 AS cy
              FROM events
            ), c AS (SELECT cx, cy, count(*) AS n FROM g GROUP BY 1, 2)
            SELECT count(*) AS n_buckets, CAST(sum(n) AS BIGINT) AS total,
                   max(n) AS max_bucket
            FROM c
        """,
        "q07_wkt_area": """
            SELECT p_brand,
                   round(sum(CAST(p_size AS DOUBLE) * p_size), 2) AS area_sum,
                   count(*) AS n
            FROM part GROUP BY 1 ORDER BY 1
        """,
        "q08_buffer_area": f"""
            SELECT event_type,
                   round(0.5 * 32 * 25.0 * sin(2*pi()/32), 6) AS avg_buf_area,
                   count(*) AS n
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "q10_quadkey": """
            WITH c AS (
              SELECT least(greatest(value*0.7 - 170.0, -180.0), 180.0) AS lon,
                     least(greatest(CAST(user_id AS DOUBLE)*0.8 - 59.6, -85.05112878), 85.05112878) AS lat
              FROM events
            ), p AS (
              SELECT CAST(floor(least(greatest((lon + 180.0)/360.0 * 8, 0), 7)) AS BIGINT) AS tx,
                     CAST(floor(least(greatest(
                        (0.5 - ln((1.0 + sin(radians(lat)))
                                / (1.0 - sin(radians(lat)))) / (4*pi())) * 8,
                        0), 7)) AS BIGINT) AS ty
              FROM c
            )
            SELECT concat(
                     CASE WHEN (tx & 4) != 0 AND (ty & 4) != 0 THEN '3'
                          WHEN (ty & 4) != 0 THEN '2'
                          WHEN (tx & 4) != 0 THEN '1' ELSE '0' END,
                     CASE WHEN (tx & 2) != 0 AND (ty & 2) != 0 THEN '3'
                          WHEN (ty & 2) != 0 THEN '2'
                          WHEN (tx & 2) != 0 THEN '1' ELSE '0' END,
                     CASE WHEN (tx & 1) != 0 AND (ty & 1) != 0 THEN '3'
                          WHEN (ty & 1) != 0 THEN '2'
                          WHEN (tx & 1) != 0 THEN '1' ELSE '0' END
                   ) AS quadkey, count(*) AS n
            FROM p GROUP BY 1 ORDER BY 1
        """,
        "q11_geometrytype": """
            SELECT CASE p_partkey % 3 WHEN 0 THEN 'POINT'
                                      WHEN 1 THEN 'LINESTRING'
                                      ELSE 'POLYGON' END AS gtype,
                   count(*) AS n
            FROM part GROUP BY 1 ORDER BY 1
        """,
        "q12_npoints": """
            SELECT CAST(sum(CASE p_partkey % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END) AS BIGINT) AS npoints_sum,
                   count(*) AS n
            FROM part
        """,
        "q13_length": """
            SELECT l_returnflag,
                   round(sum(sqrt(pow(l_quantity - l_discount*100, 2)
                                + pow(CAST(l_linenumber AS DOUBLE) - l_tax*100, 2))), 2) AS len_sum
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "q14_envelope_area": """
            SELECT o_orderstatus,
                   round(sum((CAST(o_orderkey % 50 AS DOUBLE)+1) * (CAST(o_custkey % 30 AS DOUBLE)+1)), 2) AS area_sum,
                   round(sum(2*((CAST(o_orderkey % 50 AS DOUBLE)+1) + (CAST(o_custkey % 30 AS DOUBLE)+1))), 2) AS perim_sum
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "q15_tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q16_revenue_by_nation": """
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1 ORDER BY revenue DESC, n_name ASC LIMIT 10
        """,
        "q17_window_topk": """
            SELECT count(*) AS n, round(sum(o_totalprice), 2) AS top3_sum FROM (
              SELECT o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders) WHERE rk <= 3
        """,
        "q18_dedup_exact": """
            SELECT lang, count(*) AS n FROM documents d
            WHERE doc_id = (SELECT min(doc_id) FROM documents d2 WHERE d2.text = d.text)
            GROUP BY 1 ORDER BY 1
        """,
        "q19_minhash": """
            WITH s AS (
              SELECT doc_id, substring(text, CAST(i AS INT), 4) AS sh
              FROM documents, LATERAL (SELECT unnest(range(1, greatest(length(text)-3, 1)+1)) AS i)
              WHERE doc_id < 50
            )
            SELECT doc_id, min(md5('0|' || sh)) AS mh0, min(md5('1|' || sh)) AS mh1
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "q20_simhash": """
            WITH tok AS (
              SELECT doc_id, md5(unnest(string_split_regex(trim(text), '\\s+'))) AS h
              FROM documents
            ), bits AS (
              SELECT doc_id,
                     """ + ", ".join(
                         f"sum(CASE WHEN ascii(substring(h, {j+1}, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
                         for j in range(16)
                     ) + """
              FROM tok GROUP BY 1
            ), fp AS (
              SELECT doc_id, """ + " + ".join(
                         f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)
                     ) + """ AS sh
              FROM bits
            )
            SELECT count(*) AS n, count(DISTINCT sh) AS n_distinct,
                   CAST(sum(sh) AS BIGINT) AS sh_sum FROM fp
        """,
        "q21_text_quality": """
            WITH m AS (
              SELECT lang,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                     END AS tokens,
                     CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct,
                     CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                          x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                                     'for','on','with','as','at','by','be','this','that','are'))) AS DOUBLE)
                       / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1) AS stop
              FROM documents
            )
            SELECT lang, CAST(sum(tokens) AS BIGINT) AS tokens, round(avg(punct), 6) AS avg_punct,
                   round(avg(stop), 6) AS avg_stop, count(*) AS n
            FROM m GROUP BY 1 ORDER BY 1
        """,
        "q22_fingerprint": """
            SELECT count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS n_fp,
                   count(*) AS n
            FROM documents
        """,
        "q23_langid": """
            WITH t AS (
              SELECT string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
            ), s AS (
              SELECT len(list_filter(toks, x -> x IN ('der','die','und','ist','das'))) AS s_de,
                     len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
                     len(list_filter(toks, x -> x IN ('el','la','y','es','los'))) AS s_es,
                     len(list_filter(toks, x -> x IN ('le','la','et','est','les'))) AS s_fr,
                     len(list_filter(toks, x -> x IN ('il','la','e','che','di'))) AS s_it,
                     len(list_filter(toks, x -> x IN ('o','a','e','que','de'))) AS s_pt
              FROM t
            )
            SELECT CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_it,s_pt) = 0 THEN 'und'
                        WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_it,s_pt) THEN 'de'
                        WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_it,s_pt) THEN 'en'
                        WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_it,s_pt) THEN 'es'
                        WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_it,s_pt) THEN 'fr'
                        WHEN s_it = greatest(s_de,s_en,s_es,s_fr,s_it,s_pt) THEN 'it'
                        ELSE 'pt' END AS lang_guess,
                   count(*) AS n
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "q24_ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
                 scored AS (
                   SELECT q.query_id, e.vec_id,
                          list_cosine_similarity(e.embedding, q.qv) AS c,
                          row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id ASC) AS rank
                   FROM embeddings e, q)
            SELECT query_id, vec_id, round(c, 4) + 0.0 AS cos4, rank
            FROM scored WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "q25_embedding_neardup": """
            SELECT count(*) AS n_pairs, round(avg(c), 4) AS avg_cos FROM (
              SELECT list_cosine_similarity(a.embedding, b.embedding) AS c
              FROM embeddings a, embeddings b
              WHERE a.vec_id < 200 AND b.vec_id < 200 AND a.vec_id < b.vec_id)
            WHERE c >= 0.55
        """,
        "q26_ngram_jaccard": """
            WITH s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                        range(1, greatest(length(text)-3, 1)+1),
                        i -> substring(text, CAST(i AS INT), 4))) AS sh
              FROM documents WHERE doc_id < 60
            )
            SELECT count(*) AS n_pairs, round(avg(jac), 6) AS avg_jac FROM (
              SELECT CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
              FROM s a, s b WHERE a.doc_id < b.doc_id)
            WHERE jac >= 0.12
        """,
        "q29_accessors": """
            SELECT round(sum(l_discount*100), 2) AS sx,
                   round(sum(CAST(l_linenumber AS DOUBLE)), 2) AS ey,
                   count(*) AS n
            FROM lineitem
        """,
        "q30_pointn_ring": """
            SELECT round(sum(2.0*CAST(p_size AS DOUBLE)), 2) AS v3_sum,
                   round(sum(CAST(0.0 AS DOUBLE)), 2) AS vlast_sum,
                   count(*) AS n
            FROM part
        """,
        "q31_predicate_matrix": f"""
            WITH r AS ({_RECTS_SQL})
            SELECT CAST(sum(CASE WHEN xb <= wa THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
                   CAST(sum(CASE WHEN xb+5 <= wa AND hb <= ha THEN 1 ELSE 0 END) AS BIGINT) AS n_cont,
                   CAST(sum(CASE WHEN xb = wa THEN 1 ELSE 0 END) AS BIGINT) AS n_touch,
                   CAST(sum(CASE WHEN xb < wa AND NOT (xb+5 <= wa AND hb <= ha)
                            AND NOT (xb <= 0 AND xb+5 >= wa AND hb >= ha)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
                   count(*) AS n
            FROM r
        """,
        "q32_intersection_area": f"""
            WITH r AS ({_RECTS_SQL})
            SELECT round(sum(greatest(0, least(wa, xb+5) - xb) * least(ha, hb)), 2) AS inter_area,
                   count(*) AS n
            FROM r
        """,
        "q33_simplify": """
            SELECT 2*count(*) AS np_collinear, 3*count(*) AS np_keep,
                   2*count(*) AS np_drop, count(*) AS n
            FROM part
        """,
        "q34_envelope_boundary": """
            SELECT round(sum(2.0*CAST(p_size AS DOUBLE)*p_size), 2) AS env_area,
                   round(sum(4.0*CAST(p_size AS DOUBLE)), 2) AS bnd_len,
                   count(*) AS n
            FROM part
        """,
        "q35_transform": """
            WITH p AS (
              SELECT event_type,
                     value*0.7 - 170.0 AS lon,
                     CAST(user_id % 150 AS DOUBLE)*0.8 - 60.0 AS lat
              FROM events)
            SELECT event_type,
                   round(avg(radians(lon) * 6378137.0), 2) AS avg_mx,
                   round(avg(6378137.0 * ln(tan(pi()/4 + radians(lat)/2))), 2) AS avg_my,
                   count(*) AS n
            FROM p GROUP BY 1 ORDER BY 1
        """,
        "q36_dwithin": f"""
            SELECT CAST(sum(CASE WHEN sqrt(pow(x-250, 2) + pow(y-75, 2)) <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
                   count(*) AS n
            FROM ({_EVENTS_PTS_SQL})
        """,
        "q37_dump": """
            SELECT CAST(sum(CASE p_partkey % 3 WHEN 0 THEN 3 ELSE 1 END) AS BIGINT) AS nparts_sum,
                   count(*) AS n
            FROM part
        """,
        # q38's pair CTE + recursive min-label closure: comp(node) =
        # min id reachable; singletons keep their own id
        "q69_dedup_components": """
            WITH RECURSIVE s AS (
              SELECT doc_id, substring(text, CAST(i AS INT), 4) AS sh
              FROM documents, LATERAL (SELECT unnest(range(1, greatest(length(text)-3, 1)+1)) AS i)
              WHERE doc_id < 100
            ), sig AS (
              SELECT doc_id,
                     min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
                     min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3
              FROM s GROUP BY 1
            ), b AS (
              SELECT doc_id, m0 || '_' || m1 AS b0, m2 || '_' || m3 AS b1 FROM sig
            ), pairs AS (
              SELECT a.doc_id AS id_a, b2.doc_id AS id_b
              FROM b a JOIN b b2 ON a.doc_id < b2.doc_id
                                AND (a.b0 = b2.b0 OR a.b1 = b2.b1)
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ), nodes AS (
              SELECT doc_id AS id FROM documents WHERE doc_id < 100
            ), reach AS (
              SELECT id AS node, id AS lbl FROM nodes
              UNION
              SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
            ), comp AS (
              SELECT node, min(lbl) AS comp FROM reach GROUP BY node
            ), sizes AS (
              SELECT comp, count(*) AS sz FROM comp GROUP BY comp
            )
            SELECT (SELECT count(DISTINCT comp) FROM comp) AS n_components,
                   (SELECT CAST(sum(comp) AS BIGINT) FROM comp) AS comp_sum,
                   (SELECT count(*) FROM comp) AS n_docs,
                   (SELECT CAST(max(sz) AS BIGINT) FROM sizes) AS max_cluster,
                   (SELECT CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
                    FROM sizes) AS n_nontrivial
        """,
        "q38_minhash_lsh": """
            WITH s AS (
              SELECT doc_id, substring(text, CAST(i AS INT), 4) AS sh
              FROM documents, LATERAL (SELECT unnest(range(1, greatest(length(text)-3, 1)+1)) AS i)
              WHERE doc_id < 100
            ), sig AS (
              SELECT doc_id,
                     min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
                     min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3
              FROM s GROUP BY 1
            ), b AS (
              SELECT doc_id, m0 || '_' || m1 AS b0, m2 || '_' || m3 AS b1 FROM sig
            )
            SELECT count(*) AS n_pairs, CAST(sum(id_a + id_b) AS BIGINT) AS pair_sum FROM (
              SELECT a.doc_id AS id_a, b2.doc_id AS id_b
              FROM b a JOIN b b2 ON a.doc_id < b2.doc_id AND (a.b0 = b2.b0 OR a.b1 = b2.b1))
        """,
        "q39_simhash_hamming": """
            WITH tok AS (
              SELECT doc_id, md5(unnest(string_split_regex(trim(text), '\\s+'))) AS h
              FROM documents WHERE doc_id < 150
            ), bits AS (
              SELECT doc_id,
                     """ + ", ".join(
                         f"sum(CASE WHEN ascii(substring(h, {j+1}, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
                         for j in range(16)
                     ) + """
              FROM tok GROUP BY 1
            ), fp AS (
              SELECT doc_id, """ + " + ".join(
                         f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)
                     ) + """ AS sh
              FROM bits
            )
            SELECT count(*) AS n_pairs, CAST(sum(id_a + id_b) AS BIGINT) AS pair_sum FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM fp a JOIN fp b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(CAST(a.sh AS BIGINT), CAST(b.sh AS BIGINT))) <= 2)
        """,
        "q40_hexwkb_roundtrip": """
            SELECT round(sum(c_acctbal), 2) AS x_sum,
                   42*count(*) AS hex_len_sum,
                   count(*) AS n
            FROM customer
        """,
        "q41_casts": """
            SELECT round(sum(c_acctbal), 2) AS px_sum,
                   round(sum(CAST(c_custkey % 9 AS DOUBLE)+1), 2) AS rty_sum,
                   round(sum((CAST(c_custkey % 9 AS DOUBLE)+1) * (CAST(c_custkey % 5 AS DOUBLE)+1)), 2) AS box_area_sum,
                   count(*) AS n
            FROM customer
        """,
        "q42_general_overlay": """
            SELECT round(sum(CAST(p_size AS DOUBLE)*p_size), 2) AS inter_area,
                   round(sum(3.0*CAST(p_size AS DOUBLE)*p_size), 2) AS union_area,
                   round(sum(CAST(p_size AS DOUBLE)*p_size), 2) AS diff_area,
                   round(sum(p_size * sqrt(2)), 2) AS clip_len,
                   count(*) AS n
            FROM part
        """,
        "q43_flip_reverse": """
            SELECT round(sum(2.0*CAST(p_size AS DOUBLE)), 2) AS flip_x_sum,
                   round(sum(2.0*CAST(p_size AS DOUBLE)), 2) AS rev_y_sum,
                   count(*) AS n
            FROM part
        """,
        "q44_force_dims": """
            SELECT round(CAST(sum(7.5) AS DOUBLE), 2) AS z_sum, count(*) AS n_hasz,
                   CAST(0 AS BIGINT) AS n_hasz_after, count(*) AS n
            FROM part
        """,
        "q45_removerepeated": """
            SELECT 3*count(*) AS np_sum, count(*) AS n FROM part
        """,
        "q46_geojson_roundtrip": """
            SELECT round(sum(CAST(p_size AS DOUBLE)*p_size), 2) AS area_sum,
                   count(*) AS n
            FROM part
        """,
        "q47_makepolygon": """
            SELECT round(sum(CAST(p_size AS DOUBLE)*p_size), 2) AS area_sum,
                   count(*) AS n_closed, count(*) AS n
            FROM part
        """,
        "q48_pointonsurface": """
            SELECT count(*) AS n_inside,
                   round(sum(CAST(p_size AS DOUBLE)/2), 2) AS cx_sum,
                   count(*) AS n
            FROM part
        """,
        "q49_collectionextract": """
            SELECT round(sum(CAST(p_size AS DOUBLE)*p_size), 2) AS poly_area,
                   round(sum(CAST(p_size AS DOUBLE)), 2) AS line_len,
                   count(*) AS pt_count, count(*) AS n
            FROM part
        """,
        "q50_validity": """
            SELECT count(*) AS n_valid, CAST(0 AS BIGINT) AS n_bowtie_valid,
                   count(*) AS n_ring, count(*) AS n
            FROM part
        """,
        "q27_generatepoints": "SELECT CAST(10000 AS BIGINT) AS n",
        # capsule closed form: 2·d·L + half-cap n-gons (d=2, quad_segs=8 → 32-gon)
        "q51_buffer_line": """
            SELECT round(sum(2.0*2.0*sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))
                             + 0.5*32*4.0*sin(2*pi()/32)), 2) AS buf_area_sum,
                   count(*) AS n
            FROM (
                SELECT l_discount*100 AS x1, l_tax*100 AS y1,
                       l_quantity+10 AS x2, CAST(l_linenumber AS DOUBLE) AS y2
                FROM lineitem WHERE l_orderkey < 2000
            )
        """,
        "q52_buffer_polygon": """
            SELECT round(sum(w*h + 2.0*(w+h)*2.0 + 0.5*32*4.0*sin(2*pi()/32)), 2) AS dilate_sum,
                   round(sum((w-4.0)*(h-4.0)), 2) AS erode_sum,
                   count(*) AS n
            FROM (
                SELECT p_size + 4.0 AS w, CAST(p_partkey % 7 AS DOUBLE) + 5.0 AS h
                FROM part
            )
        """,
        "q66_multimodal": """
            SELECT round(sum(CAST(p_partkey % 251 AS DOUBLE)), 4) AS sum_mean_r,
                   round(sum(CAST(p_size % 251 AS DOUBLE)), 4) AS sum_mean_g,
                   -- the PNG payload carries the channel-swapped image, so
                   -- its blue mean equals the PPM's red mean
                   round(sum(CAST(p_partkey % 251 AS DOUBLE)), 4) AS sum_png_b,
                   -- the JPEG payload is a solid gray at the green level:
                   -- DC-only DCT at quant=1 decodes bit-exact
                   round(sum(CAST(p_size % 251 AS DOUBLE)), 4) AS sum_jpg_r,
                   -- GIF is lossless: green mean == g exactly
                   round(sum(CAST(p_size % 251 AS DOUBLE)), 4) AS sum_gif_g,
                   -- the BMFF probe reads back the mvhd duration we wrote
                   CAST(sum(CAST(p_partkey % 251 AS BIGINT) * 10 + 40)
                        AS BIGINT) AS sum_mp4_ms,
                   round(sum(floor(((CAST(p_partkey % 251 AS BIGINT) % 50 + 1)
                                    / 100.0) * 32767) / 32768.0), 6) AS sum_rms,
                   CAST(sum(CAST(50 AS BIGINT)) AS BIGINT) AS sum_dur_ms,
                   count(*) AS n
            FROM part WHERE p_partkey < 400
        """,
        "q68_gdb_roundtrip": """
            SELECT count(*) AS n,
                   round(sum(c_acctbal), 2) AS sx,
                   round(sum(CAST(c_custkey % 100 AS DOUBLE)), 2) AS sy,
                   CAST(sum(c_custkey) AS BIGINT) AS sk
            FROM customer WHERE c_custkey < 400
        """,
        "q65_gpkg_roundtrip": """
            SELECT count(*) AS n,
                   round(sum(c_acctbal), 2) AS sx,
                   round(sum(CAST(c_custkey % 100 AS DOUBLE)), 2) AS sy,
                   CAST(sum(c_custkey) AS BIGINT) AS sk
            FROM customer WHERE c_custkey < 400
        """,
        "q64_mixed_overlay": """
            SELECT round(sum((CAST(p_size AS DOUBLE) + 2.0) * 10.0), 2)
                     AS union_area_sum,
                   round(sum(CASE WHEN CAST(p_partkey % 14 AS DOUBLE) + 0.5 < 10.0
                                  THEN 10.0
                                  ELSE CAST(p_size AS DOUBLE) + 12.0 END), 2)
                     AS union_len_sum,
                   round(sum(CASE WHEN CAST(p_partkey % 14 AS DOUBLE) + 0.5 < 10.0
                                  THEN 10.0
                                  ELSE CAST(p_size AS DOUBLE) + 12.0 END), 2)
                     AS diff_len_sum,
                   round(sum(2.0 * (CAST(p_partkey % 5 AS DOUBLE) + 1.0)
                             * sqrt(2.0)), 2) AS collinear_union_len_sum,
                   count(*) AS n
            FROM part
        """,
        "q63_intersection_agg": """
            SELECT c_nationkey,
                   round(min(CAST(c_custkey % 7 AS DOUBLE) + 1.0)
                         * min(CAST(c_custkey % 5 AS DOUBLE) + 1.0), 4) AS inter_area
            FROM customer
            WHERE c_custkey < 500
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "q62_buffer_joinstyles": """
            SELECT round(sum((w+4.0)*(h+4.0)), 2) AS mitre_sum,
                   round(sum((w+4.0)*(h+4.0) - 8.0), 2) AS bevel_sum,
                   count(*) AS n
            FROM (
                SELECT p_size + 4.0 AS w, CAST(p_partkey % 7 AS DOUBLE) + 5.0 AS h
                FROM part
            )
        """,
        # UTM round trip reproduces the source coordinates (1e-9° < the 1e-6
        # rounding), so the oracle aggregates the original lon/lat directly
        # EPSG:3395 forward = closed-form ellipsoidal Mercator
        # (x = a·λ, y = a·ln(tan(π/4+φ/2)·((1−e·sinφ)/(1+e·sinφ))^(e/2)),
        # e = 0.0818191908426215 for WGS84); the tmerc/aea/lcc codes
        # roundtrip to the source lon/lat within 1e-9°, so those sums are
        # computable from the original columns (same device as q53)
        "q67_transform_epsg": """
            WITH p AS (
              SELECT value/490.0*60.0 - 30.0   AS lon_m,
                     CAST(user_id % 150 AS DOUBLE)/150.0*100.0 - 50.0 AS lat_m,
                     value/490.0*10.0 + 167.0  AS lon_nz,
                     CAST(user_id % 150 AS DOUBLE)/150.0*25.0 - 40.0  AS lat_au,
                     value/490.0*50.0 - 130.0  AS lon_ca,
                     CAST(user_id % 150 AS DOUBLE)/150.0*2.6 + 50.8   AS lat_nl,
                     value/490.0*3.0 + 6.2     AS lon_ch,
                     CAST(user_id % 150 AS DOUBLE)/150.0*25.0 - 89.0  AS lat_aa
              FROM events)
            SELECT round(avg(radians(lon_m) * 6378137.0), 2) AS avg_merc_x,
                   round(avg(6378137.0 * ln(
                       tan(pi()/4 + radians(lat_m)/2)
                       * pow((1 - 0.0818191908426215*sin(radians(lat_m)))
                             / (1 + 0.0818191908426215*sin(radians(lat_m))),
                             0.04090959542131075))), 2) AS avg_merc_y,
                   round(sum(round(lon_nz, 6)), 4) AS nz_lon_sum,
                   round(sum(round(lat_au, 6)), 4) AS au_lat_sum,
                   round(sum(round(lon_ca, 6)), 4) AS ca_lon_sum,
                   round(sum(round(lat_nl, 6)), 4) AS nl_lat_sum,
                   round(sum(round(lon_ch, 6)), 4) AS ch_lon_sum,
                   round(sum(round(lat_aa, 6)), 4) AS aa_lat_sum,
                   count(*) AS n
            FROM p
        """,
        "q53_transform_utm": f"""
            SELECT round(sum(round(value/490.0*5.0 - 83.0, 6)), 4) AS lon_sum,
                   round(sum(round(CAST(user_id % 150 AS DOUBLE)/150.0*40.0 + 10.0, 6)), 4) AS lat_sum,
                   count(*) AS n_in_band,
                   count(*) AS n
            FROM events
        """,
        "q28_union_agg": """
            SELECT c_nationkey,
                   round(sum((CAST(c_custkey % 7 AS DOUBLE)+1) * (CAST(c_custkey % 7 AS DOUBLE)+1)), 4) AS union_area
            FROM customer WHERE c_custkey < 500
            GROUP BY 1 ORDER BY 1
        """,
        # covers: closed-interval containment of gb in ga; disjoint: the y
        # ranges always overlap so only x separation matters; crosses:
        # horizontal y=2k-1 lines cross the (0,0)-(10,10) diagonal's interior
        # iff y < 10
        "q56_predicate_matrix2": f"""
            SELECT * FROM (
              SELECT CAST(sum(CASE WHEN xb+5 <= wa AND hb <= ha THEN 1 ELSE 0 END) AS BIGINT) AS n_covers,
                     CAST(sum(CASE WHEN xb+5 <= wa AND hb <= ha THEN 1 ELSE 0 END) AS BIGINT) AS n_coveredby,
                     CAST(sum(CASE WHEN xb = 0 AND wa = 5 AND ha = hb THEN 1 ELSE 0 END) AS BIGINT) AS n_equals,
                     CAST(sum(CASE WHEN xb > wa THEN 1 ELSE 0 END) AS BIGINT) AS n_disjoint,
                     count(*) AS n_rect
              FROM ({_RECTS_SQL})
            ) CROSS JOIN (
              SELECT CAST(sum(CASE WHEN l_linenumber <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_crosses,
                     count(*) AS n_lines
              FROM lineitem WHERE l_orderkey < 4000
            )
        """,
        "q57_shortestline": """
            SELECT round(sum(sqrt(
                       power(CAST(p_size AS DOUBLE) - least(CAST(p_size AS DOUBLE), 20.0), 2)
                     + power(CAST(p_partkey % 7 AS DOUBLE) + 1.0, 2))), 2) AS sl_len_sum,
                   count(*) AS n
            FROM part
        """,
        "q58_linemerge_normalize": """
            SELECT CAST(sum(3) AS BIGINT) AS np_merged,
                   round(sum(2.0 * CAST(p_size AS DOUBLE)), 2) AS len_merged,
                   CAST(sum(1) AS BIGINT) AS n_eq,
                   CAST(sum(1) AS BIGINT) AS n_norm_eq,
                   count(*) AS n
            FROM part
        """,
        "q59_reduceprecision": """
            SELECT round(sum(round((CAST(p_size AS DOUBLE) + 0.1) / 0.25) * 0.25), 2) AS sx,
                   round(sum(round((CAST(p_size AS DOUBLE) + 0.35) / 0.25) * 0.25), 2) AS sy,
                   count(*) AS n
            FROM part
        """,
        "q70_decontaminate": _Q70_ORACLE,
        # same oracle by design: the Bloom prefilter must not
        # change results, only shuffle volume
        "q100_bloom_decontaminate": _Q70_ORACLE,
        "q71_sample_stratified": _q71_oracle_sql(),
        "q72_pii_redact": _q72_oracle_sql(),
        "q74_repetition_filter": _q74_oracle_sql(),
        "q77_chunk_documents": _q77_oracle_sql(),
        "q78_temperature_mix": _q78_oracle_sql(),
        "q81_streaming_sessions": """
            SELECT CAST(user_id % 20 AS VARCHAR) AS key,
                   round(min(value), 6) AS xmin,
                   round(min(CAST(user_id AS DOUBLE)), 6) AS ymin,
                   round(max(value), 6) AS xmax,
                   round(max(CAST(user_id AS DOUBLE)), 6) AS ymax,
                   count(*) AS n
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "q99_minhash_index": """
            WITH s AS (
              SELECT doc_id, substring(text, CAST(i AS INT), 4) AS sh
              FROM documents, LATERAL (
                SELECT unnest(range(1, greatest(length(text)-3, 1)+1)) AS i)
              WHERE doc_id < 200
            ), sig AS (
              SELECT doc_id,
                     min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
                     min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3
              FROM s GROUP BY 1
            ), b AS (
              SELECT doc_id, m0 || '_' || m1 AS b0, m2 || '_' || m3 AS b1
              FROM sig
            ), pairs AS (
              SELECT DISTINCT n.doc_id AS id_a, o.doc_id AS id_b
              FROM b n JOIN b o
                ON n.doc_id >= 100 AND n.doc_id < 200 AND o.doc_id < 100
               AND (n.b0 = o.b0 OR n.b1 = o.b1)
            )
            SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(COALESCE(sum(id_a + id_b), 0) AS BIGINT)
                     AS pair_sum
            FROM pairs
        """,
        "q97_salted_agg": """
            SELECT l_returnflag,
                   CAST(count(l_quantity) AS BIGINT) AS n,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
                   round(min(l_extendedprice), 2) AS min_ext,
                   round(max(l_extendedprice), 2) AS max_ext
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "q98_corpus_diff": """
            WITH v2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text
              FROM documents WHERE doc_id % 11 = 0
            ), j AS (
              SELECT COALESCE(o.doc_id, n.doc_id) AS id,
                     CASE WHEN o.doc_id IS NULL THEN 'added'
                          WHEN n.doc_id IS NULL THEN 'removed'
                          WHEN md5(o.text) <> md5(n.text) THEN 'changed'
                          ELSE 'unchanged' END AS status
              FROM documents o FULL OUTER JOIN v2 n
                ON o.doc_id = n.doc_id
            )
            SELECT status, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(id) AS BIGINT) AS sum_id
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "q96_pagerank": _q96_oracle_sql(),
        "q95_profile_table": _q95_oracle_sql(),
        "q93_vec_quantize": _q93_oracle_sql(),
        "q92_text_clean": _q92_oracle_sql(),
        "q116_ann_ivfpq": _q116_oracle_sql(),
        "q117_dbscan": _q117_oracle_sql(),
        "q123_hll_overlap": _q123_oracle_sql(),
        "q124_corpus_divergence": _q124_oracle_sql(),
        "q121_resample_ffill": """
            WITH obs AS (
              SELECT CAST(user_id % 20 AS BIGINT) AS k, epoch_us(ts) AS t_us,
                     max(value) AS v
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
            ), b AS (
              SELECT min(t_us) AS lo, max(t_us) AS hi FROM obs
            ), ks AS (
              SELECT DISTINCT k FROM obs
            ), grid AS (
              SELECT k, unnest(range(lo, hi + 1, 21600000000)) AS tick
              FROM ks, b
            ), j AS (
              SELECT g.k, g.tick, o.v
              FROM grid g ASOF LEFT JOIN obs o
                ON g.k = o.k AND g.tick >= o.t_us
            )
            SELECT k,
                   CAST(count(*) AS BIGINT) AS n_ticks,
                   CAST(count(v) AS BIGINT) AS n_filled,
                   round(sum(v), 6) AS v_sum
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "q122_rolling_window": """
            WITH pts AS (
              SELECT CAST(user_id % 20 AS BIGINT) AS k, epoch_us(ts) AS t,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events
            ), r AS (
              SELECT k,
                     sum(cents) OVER (PARTITION BY k ORDER BY t
                       RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
                       AS roll_cents,
                     count(cents) OVER (PARTITION BY k ORDER BY t
                       RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
                       AS roll_n
              FROM pts
            )
            SELECT k,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(roll_cents) AS BIGINT) AS sum_roll_cents,
                   CAST(max(roll_n) AS BIGINT) AS max_roll_n,
                   CAST(sum(roll_n) AS BIGINT) AS sum_roll_n
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "q118_salted_join": """
            WITH dim AS (
              SELECT event_type, round(avg(value), 6) AS type_avg
              FROM events GROUP BY 1
            )
            SELECT e.event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(e.value), 6) AS sum_value,
                   round(max(d.type_avg), 6) AS type_avg
            FROM events e JOIN dim d USING (event_type)
            GROUP BY 1 ORDER BY 1
        """,
        "q119_histogram_quantiles": _q119_oracle_sql(),
        "q112_asof_join": _q112_oracle_sql(),
        "q113_interval_join": _q113_oracle_sql(),
        "q114_hll_distinct": _q114_oracle_sql(),
        "q115_count_min": _q115_oracle_sql(),
        "q91_streaming_interval_join": """
            SELECT CAST(c.user_id % 50 AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(c.event_id) AS BIGINT) AS sum_click,
                   CAST(sum(b.event_id) AS BIGINT) AS sum_buy
            FROM events c JOIN events b
              ON c.user_id % 50 = b.user_id % 50
             AND c.event_type = 'click' AND b.event_type = 'purchase'
             AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 10 MINUTE
            GROUP BY 1 ORDER BY 1
        """,
        "q89_sentence_stats": _q89_oracle_sql(),
        "q90_domain_quota": _q90_oracle_sql(),
        "q88_knn_join": """
            WITH ev AS (
              SELECT event_id AS left_id, value AS x,
                     CAST(user_id % 150 AS DOUBLE) AS y
              FROM events
            ), sup AS (
              SELECT s_suppkey AS right_id,
                     CAST((s_suppkey * 37) % 200 AS DOUBLE) AS x,
                     CAST((s_suppkey * 91) % 150 AS DOUBLE) AS y
              FROM supplier
            ), cand AS (
              SELECT e.left_id, s.right_id,
                     sqrt((e.x - s.x) * (e.x - s.x)
                          + (e.y - s.y) * (e.y - s.y)) AS dist,
                     row_number() OVER (
                       PARTITION BY e.left_id
                       ORDER BY sqrt((e.x - s.x) * (e.x - s.x)
                                     + (e.y - s.y) * (e.y - s.y)),
                                s.right_id) AS rank
              FROM ev e CROSS JOIN sup s
            )
            SELECT CAST(rank AS BIGINT) AS rank,
                   CAST(count(*) AS BIGINT) AS n,
                   round(avg(dist), 6) AS avg_dist,
                   CAST(count(DISTINCT right_id) AS BIGINT) AS n_neighbors,
                   CAST(sum(right_id) AS BIGINT) AS sum_rid
            FROM cand WHERE rank <= 3
            GROUP BY 1 ORDER BY 1
        """,
        "q87_lm_perplexity": _q87_oracle_sql(),
        "q86_bpe_pipeline": _q86_oracle_sql(),
        "q85_vocab_build": """
            WITH w AS (
              SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
                AS word
              FROM documents
            ), f AS (
              SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w
              WHERE word <> '' GROUP BY 1
            )
            SELECT word, freq FROM f
            ORDER BY freq DESC, word LIMIT 100
        """,
        "q84_quality_buckets": _q84_oracle_sql(),
        "q83_url_domain_stats": _q83_oracle_sql(),
        "q82_warc_pipeline": """
            WITH norm AS (
              SELECT lang,
                     trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
              FROM documents
            )
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_pages,
                   CAST(count(DISTINCT md5(t)) AS BIGINT) AS n_unique,
                   CAST(sum(length(t)) AS BIGINT) AS chars_total
            FROM norm GROUP BY 1 ORDER BY 1
        """,
        "q80_webdataset_roundtrip": """
            SELECT count(*) AS n_samples,
                   CAST(2 * count(*) AS BIGINT) AS n_members,
                   CAST(sum(p_partkey % 17 + 1 + 8 + length(p_name)) AS BIGINT)
                     AS bytes_total,
                   CAST(7 * count(*) AS BIGINT) AS ext_chars
            FROM part WHERE p_partkey < 300
        """,
        "q79_dedup_pipeline": """
            WITH RECURSIVE d AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 100
            ), fp AS (
              SELECT doc_id, text, md5(text) AS f FROM d
            ), rep AS (
              SELECT f, min(doc_id) AS rep FROM fp GROUP BY f
            ), tagged AS (
              SELECT fp.doc_id, fp.text, r.rep FROM fp JOIN rep r ON r.f = fp.f
            ), exact_stars AS (
              SELECT rep AS id_a, doc_id AS id_b FROM tagged WHERE doc_id <> rep
            ), uniq AS (
              SELECT doc_id, text FROM tagged WHERE doc_id = rep
            ), s AS (
              SELECT doc_id, substring(text, CAST(i AS INT), 4) AS sh
              FROM uniq, LATERAL (SELECT unnest(range(1, greatest(length(text)-3, 1)+1)) AS i)
            ), sig AS (
              SELECT doc_id,
                     min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
                     min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3
              FROM s GROUP BY 1
            ), b AS (
              SELECT doc_id, m0 || '_' || m1 AS b0, m2 || '_' || m3 AS b1 FROM sig
            ), cand AS (
              SELECT a.doc_id AS id_a, b2.doc_id AS id_b
              FROM b a JOIN b b2 ON a.doc_id < b2.doc_id
                                AND (a.b0 = b2.b0 OR a.b1 = b2.b1)
            ), shset AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                        range(1, greatest(length(text)-3, 1)+1),
                        i -> substring(text, CAST(i AS INT), 4))) AS S
              FROM uniq
            ), ver AS (
              SELECT c.id_a, c.id_b
              FROM cand c
              JOIN shset a ON a.doc_id = c.id_a
              JOIN shset bb ON bb.doc_id = c.id_b
              WHERE CAST(len(list_intersect(a.S, bb.S)) AS DOUBLE)
                    / (len(a.S) + len(bb.S) - len(list_intersect(a.S, bb.S))) >= 0.5
            ), pairs2 AS (
              SELECT id_a, id_b FROM ver UNION SELECT id_a, id_b FROM exact_stars
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs2
              UNION SELECT id_b, id_a FROM pairs2
            ), nodes AS (
              SELECT doc_id AS id FROM d
            ), reach AS (
              SELECT id AS node, id AS lbl FROM nodes
              UNION
              SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
            ), comp AS (
              SELECT node, min(lbl) AS comp FROM reach GROUP BY node
            )
            SELECT count(*) AS n_kept,
                   CAST(sum(node) AS BIGINT) AS kept_sum
            FROM comp WHERE node = comp
        """,
        "q76_pack_sequences": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                     END AS tokens
              FROM documents
            ), p AS (
              SELECT doc_id, tokens,
                     sum(tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                       - tokens AS so
              FROM t
            )
            SELECT count(*) AS n_docs,
                   CAST(sum(tokens) AS BIGINT) AS total_tokens,
                   CAST(max(so // 512) + 1 AS BIGINT) AS n_bins,
                   CAST(sum(CASE WHEN tokens > 0
                                  AND so // 512 <> (so + tokens - 1) // 512
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning,
                   CAST(sum(CASE WHEN (so // 512) % 2 = 0 THEN tokens ELSE 0 END)
                        AS BIGINT) AS even_bin_tokens
            FROM p
        """,
        "q75_streaming_extent": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day_idx,
                   round(min(value), 6) AS xmin,
                   round(min(CAST(user_id AS DOUBLE)), 6) AS ymin,
                   round(max(value), 6) AS xmax,
                   round(max(CAST(user_id AS DOUBLE)), 6) AS ymax,
                   count(*) AS n
            FROM events
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q73_paragraph_dedup": """
            WITH built AS (
              SELECT doc_id,
                     substr(text, 1, 30) AS p1,
                     'subscribe to our newsletter today' AS p2,
                     substr(text, 31, 60) AS p3
              FROM documents
            ), paras AS (
              SELECT doc_id, 0 AS pos, p1 AS para FROM built WHERE length(p1) > 0
              UNION ALL SELECT doc_id, 1, p2 FROM built
              UNION ALL SELECT doc_id, 2, p3 FROM built WHERE length(p3) > 0
            ), kept AS (
              SELECT doc_id, pos, para,
                     row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
              FROM paras
            ), re AS (
              SELECT doc_id,
                     string_agg(para, e'\\n\\n' ORDER BY pos) AS text,
                     count(*) AS np
              FROM kept WHERE rn = 1 GROUP BY doc_id
            )
            SELECT count(*) AS n_docs,
                   CAST(sum(np) AS BIGINT) AS n_para,
                   CAST(sum(length(text)) AS BIGINT) AS chars_kept
            FROM re
        """,
        "q101_substring_dedup": _q101_oracle_sql(),
        "q102_c4_filters": _q102_oracle_sql(),
        "q103_bm25_topk": _q103_oracle_sql(),
        "q104_semdedup": """
            WITH e AS (
              SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), cent AS (
              SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < 32 AND v IS NOT NULL
            ), asgn AS (
              SELECT vec_id, label, v,
                     (SELECT cid FROM cent
                      ORDER BY list_cosine_similarity(v, cvec) DESC, cid
                      LIMIT 1) AS cell
              FROM e
            ), drops AS (
              SELECT DISTINCT b.vec_id
              FROM asgn a JOIN asgn b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.v, b.v) >= CAST(0.45 AS DOUBLE)
            ), fl AS (
              SELECT asgn.vec_id, asgn.label,
                     (drops.vec_id IS NOT NULL) AS dropped
              FROM asgn LEFT JOIN drops ON drops.vec_id = asgn.vec_id
            )
            SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dropped,
                   CAST(sum(CASE WHEN NOT dropped THEN vec_id ELSE 0 END)
                     AS BIGINT) AS kept_id_sum
            FROM fl GROUP BY 1 ORDER BY 1
        """,
        "q105_dsir_select": _q105_oracle_sql(),
        "q106_nb_quality_classifier": _q106_oracle_sql(),
        "q159_isotonic_calibration": _q159_oracle_sql(),
        "q160_streaming_mmr": _q160_oracle_sql(),
        "q161_label_propagation": _q161_oracle_sql(),
        "q162_k_core": _q162_oracle_sql(),
        "q163_pca_rotation_pq": _q163_oracle_sql(),
        "q164_hits": _q164_oracle_sql(),
        "q107_hamming_image_dedup": _q107_oracle_sql(),
        "q108_lm_kneser_ney": _q108_oracle_sql(),
        "q109_geoparquet_covering": """
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(s_suppkey) AS BIGINT) AS sk,
                   round(sum(CAST(s_suppkey % 200 AS DOUBLE)), 2) AS sx,
                   round(sum(s_acctbal), 2) AS sy
            FROM supplier
            WHERE (s_suppkey % 200) BETWEEN 50 AND 120
              AND s_acctbal BETWEEN -100000.0 AND 100000.0
        """,
        "q111_pca_power_iteration": _q111_oracle_sql(),
        "q151_mmr_rerank": _q151_oracle_sql(),
        "q152_session_funnel": _Q152_ORACLE,
        "q153_streaming_funnel": _Q153_ORACLE,
        "q154_char_entropy": _q154_oracle_sql(),
        "q155_rollup_aggregate": _Q155_ORACLE,
        "q156_exact_percentiles": _Q156_ORACLE,
        "q157_pivot_table": _Q157_ORACLE,
        "q158_bfs_hops": _Q158_ORACLE,
        "q94_pca_project": _q94_oracle_sql(),
        "q126_sessionize": _q126_oracle_sql(),
        "q127_edit_distance_dedup": _q127_oracle_sql(),
        "q128_triangle_count": _Q128_ORACLE,
        # full-recompute oracle for the append→delete→compact-maintained
        # dataset (delete predicate negated on the oracle side)
        "q129_cluster_delete": _Q129_ORACLE,
        # corpus-recompute oracle for the index-answered conjunctive query
        "q130_inverted_index": _Q130_ORACLE,
        "q131_bm25_search": _q131_oracle_sql(),
        "q132_shard_permutation": _q132_oracle_sql(),
        "q133_zorder_layout": _Q133_ORACLE,
        "q134_phrase_search": _Q134_ORACLE,
        "q135_cluster_balanced_sample": _q135_oracle_sql(),
        "q136_group_sample": _q136_oracle_sql(),
        "q137_zorder_crud": _Q137_ORACLE,
        "q138_streaming_index": _q131_oracle_sql(
            terms=("merge", "scan", "row")),
        "q139_hybrid_search": _q139_oracle_sql(),
        "q140_token_budget_mix": _q140_oracle_sql(),
        "q141_ngram_novelty": _Q141_ORACLE,
        "q142_streaming_layout": _Q142_ORACLE,
        "q143_funnel": _Q143_ORACLE,
        "q144_json_extract": _Q144_ORACLE,
        "q145_cohort_retention": _Q145_ORACLE,
        "q146_collocations": _Q146_ORACLE,
        "q147_weighted_sample": _q147_oracle_sql(),
        "q148_group_zscore": _Q148_ORACLE,
        "q149_topk_per_group": _Q149_ORACLE,
        "q150_time_bucket_ohlc": _Q150_ORACLE,
        # full-recompute oracle for the append/compact-maintained dataset
        "q125_cluster_append": """
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(s_suppkey) AS BIGINT) AS sk,
                   round(sum(CAST(s_suppkey % 200 AS DOUBLE)), 2) AS sx,
                   round(sum(CAST(s_acctbal AS DOUBLE)), 2) AS sy
            FROM supplier
            WHERE CAST(s_suppkey % 200 AS DOUBLE) BETWEEN 50.0 AND 120.0
              AND CAST(s_acctbal AS DOUBLE) BETWEEN -1000.0 AND 5000.0
        """,
        # coverage invariant of ULM Viterbi segmentation: token chars ==
        # non-whitespace chars (training is iterative — no SQL form).
        # lower() inside the oracle mirrors the tokenizers' .lower()
        # normalization so case folds that change code-point count
        # (e.g. U+0130 'İ' → 'i' + U+0307) can't desync the two sides.
        "q110_unigram_tokenizer": """
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(regexp_replace(lower(text), '\\s+', '',
                                                  'g')))
                        AS BIGINT) AS token_chars
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "q120_wordpiece_tokenizer": """
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(regexp_replace(lower(text), '\\s+', '',
                                                  'g')))
                        AS BIGINT) AS token_chars
            FROM documents GROUP BY 1 ORDER BY 1
        """,
    }


def _q108_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.lm import ngram_lm_score_kn_sql

    inner = ngram_lm_score_kn_sql("documents", "doc_id", "text",
                                  vocab_size=_Q87_V, discount=0.75)
    return f"""
        WITH s AS ({inner})
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(s.ppl), 4) AS avg_ppl,
               round(min(s.ppl), 4) AS min_ppl,
               round(max(s.ppl), 4) AS max_ppl
        FROM s JOIN documents d ON d.doc_id = s.__id
        GROUP BY 1 ORDER BY 1
    """


def _q107_oracle_sql() -> str:
    # deliberately the straight all-pairs formulation (different algorithm
    # from the banded LSH) — also validates the pigeonhole exactness claim
    from duckdb_spatial_spark.operators.dsir import bucket_sql

    def h(seed: str, buckets: int) -> str:
        return bucket_sql(f"'{seed}|' || CAST(doc_id % 250 AS VARCHAR)",
                          buckets)

    ph = (f"(CAST({h('s1', 32768)} AS BIGINT) * {1 << 48} "
          f"+ CAST({h('s2', 65536)} AS BIGINT) * {1 << 32} "
          f"+ CAST({h('s3', 65536)} AS BIGINT) * {1 << 16} "
          f"+ CAST({h('s4', 65536)} AS BIGINT))")
    return f"""
        WITH ph AS (
          SELECT doc_id,
                 CASE WHEN doc_id < 250 THEN {ph}
                      ELSE xor({ph}, CAST(1 AS BIGINT) << (doc_id % 6))
                 END AS ph
          FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
        FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.ph, b.ph)) <= 2
        ORDER BY 1, 2
    """


def _q106_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.classify import nb_score_sql

    inner = nb_score_sql(
        "(SELECT * FROM documents WHERE doc_id % 2 = 0)",
        "(SELECT * FROM documents WHERE doc_id % 2 = 1)",
        "lang = 'en'", "doc_id", "text", buckets=2048, alpha=1.0,
    )
    return f"""
        SELECT doc_id, n_grams, round(nb_score, 6) + 0.0 AS nb_score
        FROM ({inner})
        ORDER BY nb_score DESC, doc_id
        LIMIT 20
    """


def _q111_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.vectors import power_iteration_sql

    inner = power_iteration_sql("embeddings", "embedding", dim=64, iters=8)
    return f"""
        SELECT CAST(i AS BIGINT) AS i,
               round(loading, 6) AS loading,
               round(eigenvalue, 6) AS eigenvalue
        FROM ({inner})
        ORDER BY i
    """


def _q105_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.dsir import dsir_sample_sql

    inner = dsir_sample_sql(
        "documents",
        "(SELECT * FROM documents WHERE lang = 'en' "
        "AND source IN ('src0', 'src1'))",
        "doc_id", "text", buckets=2048, alpha=1.0, k=25,
        temperature=1.0, gumbel_seed=7,
    )
    return f"""
        SELECT doc_id, n_grams,
               round(logw, 6) + 0.0 AS logw,
               round(key, 6) + 0.0 AS key
        FROM ({inner})
        ORDER BY key DESC, doc_id
    """


def _q101_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.dedup import substring_dedup_sql

    return f"""
        WITH _dd AS ({substring_dedup_sql("documents", k=8)})
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(_dd.n_words) AS BIGINT) AS words_total,
               CAST(sum(_dd.n_removed) AS BIGINT) AS words_removed,
               CAST(sum(length(_dd.text)) AS BIGINT) AS chars_after
        FROM _dd JOIN documents d USING (doc_id)
        GROUP BY 1 ORDER BY 1
    """


def _q102_oracle_sql() -> str:
    from duckdb_spatial_spark.operators.pipeline import c4_clean_sql

    c4 = c4_clean_sql("page", min_words_per_line=5, min_lines=3)
    return f"""
        WITH _w AS (
          SELECT doc_id, source,
                 string_split(regexp_replace(trim(lower(text)),
                                             '\\s+', ' ', 'g'), ' ') AS w
          FROM documents
        ), _pages AS (
          SELECT doc_id, source,
            array_to_string(
              list_transform(
                generate_series(1, CAST(ceil(len(w)/7.0) AS INT)),
                j -> array_to_string(list_slice(w, (j-1)*7+1, (j-1)*7+7), ' ')
                     || CASE CAST((doc_id + j) % 4 AS INT)
                        WHEN 0 THEN '.' WHEN 1 THEN '!' WHEN 2 THEN '?'
                        ELSE '' END),
              chr(10))
            || CASE WHEN doc_id % 41 = 0
                    THEN chr(10) || 'lorem ipsum vestibulum amet.'
                    ELSE '' END
            || CASE WHEN doc_id % 43 = 0
                    THEN chr(10) || 'header {{ margin: 0; }}'
                    ELSE '' END AS page
          FROM _w
        ), _clean AS (
          SELECT source, {c4['n_lines']} AS n_lines,
                 {c4['n_lines_kept']} AS n_lines_kept,
                 {c4['c4_keep']} AS keep,
                 {c4['clean_text']} AS clean_text
          FROM _pages
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(n_lines) AS BIGINT) AS lines_total,
               CAST(sum(n_lines_kept) AS BIGINT) AS lines_kept,
               CAST(sum(CASE WHEN keep THEN length(clean_text) ELSE 0 END)
                 AS BIGINT) AS chars_clean
        FROM _clean GROUP BY 1 ORDER BY 1
    """


def _q103_oracle_sql(k1: float = 1.2, b: float = 0.75) -> str:
    # float constants embedded via repr so both engines parse the very
    # same doubles the Spark plan uses (0.5/1.0 are exact anyway; the
    # k1-derived values are not)
    _d = lambda v: f"CAST({v!r} AS DOUBLE)"
    return f"""
        WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        words AS (
          SELECT doc_id,
                 string_split(regexp_replace(trim(lower(text)),
                                             '\\s+', ' ', 'g'), ' ') AS w
          FROM d
        ), terms AS (
          SELECT doc_id, t.term
          FROM words, LATERAL (SELECT unnest(w)) AS t(term)
          WHERE t.term <> ''
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM terms GROUP BY 1, 2
        ), dfreq AS (
          SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM tf GROUP BY 1
        ), nd AS (
          SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM d
        ), dl AS (
          SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
        ), ad AS (SELECT avg(dl) AS avgdl FROM dl),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfreq.dfreq, dl.dl,
                 ln({_d(1.0)} + (n_docs - dfreq + {_d(0.5)})
                                / (dfreq + {_d(0.5)}))
                   * tf.tf * {_d(k1 + 1.0)}
                   / (tf.tf + {_d(k1)} * ({_d(1.0 - b)}
                                          + {_d(b)} * dl.dl / avgdl)) AS score
          FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), nd, ad
        ), ranked AS (
          SELECT doc_id, term, tf, dfreq, dl, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, term) AS rank
          FROM scored
        )
        SELECT doc_id, term, tf, dfreq, dl,
               round(score, 6) + 0.0 AS score, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """
