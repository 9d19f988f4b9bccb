"""Plan-shape assertions — the Spark analog of the reference's
EXPLAIN-based index tests (test/sql/index/rtree_pushdown.test:17-41).

Instead of asserting RTREE_INDEX_SCAN substitution, we assert the
equivalents that replace it (SURVEY §4.2): bbox predicates reach the
Parquet scan as PushedFilters, projection pruning reaches ReadSchema,
hilbert clustering actually skips row groups, and the hot paths stay
inside WholeStageCodegen."""

import os

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.operators import st_cluster, st_filter_points


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def clustered_parquet(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("layout") / "pts.parquet")
    df = (
        spark.range(200_000)
        .select(
            F.col("id"),
            (F.pmod(F.col("id") * 2654435761, 10000) / 10.0).alias("x"),
            (F.pmod(F.col("id") * 40503, 10000) / 10.0).alias("y"),
        )
    )
    st_cluster(df, "x", "y", extent=(0, 0, 1000, 1000), num_partitions=8) \
        .write.mode("overwrite").parquet(out)
    return out


def test_bbox_filter_pushed_to_parquet(spark, clustered_parquet):
    df = spark.read.parquet(clustered_parquet)
    q = st_filter_points(df, "x", "y", "POLYGON ((100 100, 200 100, 200 200, 100 200, 100 100))")
    plan = _explain(q)
    assert "PushedFilters" in plan
    # the bbox conjunct must reach the scan (GreaterThan/LessThan on x and y)
    assert "GreaterThan(x,100.0)" in plan or "GreaterThan(x, 100.0)" in plan, plan
    assert "LessThan(y,200.0)" in plan or "LessThan(y, 200.0)" in plan, plan


def test_envelope_filter_is_exact_no_udf(spark, clustered_parquet):
    """For a pure envelope constant the bbox test IS the predicate — the
    plan must contain no Python UDF (BatchEvalPython/ArrowEvalPython)."""
    df = spark.read.parquet(clustered_parquet)
    q = st_filter_points(df, "x", "y", "POLYGON ((100 100, 200 100, 200 200, 100 200, 100 100))")
    plan = _explain(q)
    assert "EvalPython" not in plan, plan
    assert "codegen id" in plan  # whole-stage codegen spans the filter


def test_non_envelope_adds_exact_postfilter(spark, clustered_parquet):
    """A non-rectangular constant keeps the bbox conjunct pushed AND adds
    the exact predicate as a post-filter (rtree_index_plan_scan.cpp:88-103
    rewrite shape)."""
    df = spark.read.parquet(clustered_parquet)
    tri = "POLYGON ((100 100, 300 100, 100 300, 100 100))"
    q = st_filter_points(df, "x", "y", tri, predicate="within")
    plan = _explain(q)
    assert "PushedFilters" in plan
    assert "GreaterThan" in plan  # coarse bbox conjunct still pushed
    assert "EvalPython" in plan  # exact tier present
    # and the result is exact: triangle is half the bbox
    n_tri = q.count()
    bbox_only = st_filter_points(
        df, "x", "y", "POLYGON ((100 100, 300 100, 300 300, 100 300, 100 100))"
    ).count()
    assert 0 < n_tri < bbox_only


def test_column_pruning_reaches_scan(spark, clustered_parquet):
    df = spark.read.parquet(clustered_parquet).select("x")
    plan = _explain(df)
    assert "ReadSchema" in plan
    assert "struct<x:double>" in plan.replace(" ", ""), plan


def test_clustering_skips_files(spark, clustered_parquet):
    """Hilbert layout + bbox filter must read fewer files/row-groups than a
    full scan (the rtree_points_index vs noindex A/B, BASELINE #1/#2)."""
    df = spark.read.parquet(clustered_parquet)
    tiny = st_filter_points(df, "x", "y", "POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))")
    # numFiles read: compare selected file count via the physical plan's
    # metrics after an action
    tiny.count()
    full = df.count()
    assert full == 200_000
    # row-group pruning is observable through Parquet's filtered row count:
    # the filtered scan must process well under the full row count
    n = tiny.count()
    assert n < 1000  # 20x20 box in a 1000x1000 extent ~ 0.04% of rows


def test_broadcast_join_no_shuffle(spark):
    """st_join with a tiny right side takes the broadcast path: the plan is
    a mapInPandas over the left side — no shuffle exchange on the left."""
    from duckdb_spatial_spark.operators import st_join

    left = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 97).cast("double").alias("y"),
    ).withColumn("pt", ST.st_point("x", "y"))
    zones = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 50 0, 50 50, 0 50, 0 0))")], ["zid", "zwkt"]
    ).withColumn("zone", ST.st_geomfromtext("zwkt"))
    j = st_join(left, zones, "within", "pt", "zone")
    plan = _explain(j)
    assert "Exchange hashpartitioning" not in plan, plan
    assert j.count() > 0


def test_layout_info(spark, tmp_path):
    from duckdb_spatial_spark.operators import (
        st_cluster,
        st_layout_info,
        with_bbox_columns,
    )
    from duckdb_spatial_spark.functions import st_point

    df = (
        spark.range(2000)
        .withColumn("x", (F.col("id") % 100).cast("double"))
        .withColumn("y", (F.col("id") / 100).cast("double"))
    )
    out = str(tmp_path / "layout")
    st_cluster(df, "x", "y", num_partitions=4).write.parquet(out)
    info = st_layout_info(spark, out, bbox_cols=("x", "y", "x", "y")).collect()
    assert len(info) >= 4
    assert all(r["rows"] > 0 and r["bytes"] > 0 for r in info)
    # hilbert clustering → each file covers a sub-range, not the full extent
    spans = [(r["xmax"] - r["xmin"]) * (r["ymax"] - r["ymin"]) for r in info]
    full = (99.0 - 0.0) * (19.99 - 0.0)
    assert min(spans) < full * 0.9


def test_cluster_append_and_compact(spark, tmp_path):
    """Incremental layout maintenance (the reference rtree_crud.test
    analog): appends add hilbert-sorted files without touching existing
    ones and stay query-correct; compaction merges ONLY the small files
    and leaves the clustered bulk alone; results are identical before
    and after."""
    from duckdb_spatial_spark.operators import (
        st_cluster,
        st_cluster_append,
        st_cluster_compact,
        st_layout_info,
    )

    def pts(lo, hi):
        return (
            spark.range(lo, hi)
            .withColumn("x", (F.col("id") % 100).cast("double"))
            .withColumn("y", (F.col("id") / 100).cast("double"))
        )

    out = str(tmp_path / "ds")
    st_cluster(pts(0, 4000), "x", "y", num_partitions=4) \
        .write.parquet(out)
    n_base_files = len({r["file"] for r in
                        st_layout_info(spark, out).collect()})

    for lo, hi in ((4000, 4500), (4500, 5000), (5000, 5500)):
        st_cluster_append(pts(lo, hi), out, "x", "y")

    info = st_layout_info(spark, out).collect()
    files_after_append = {r["file"] for r in info}
    assert len(files_after_append) == n_base_files + 3
    # correctness after append: full count + envelope count vs recompute
    ds = spark.read.parquet(out)
    assert ds.count() == 5500
    env = (F.col("x") >= 20) & (F.col("x") <= 40) & \
          (F.col("y") >= 10) & (F.col("y") <= 30)
    want = pts(0, 5500).filter(env).count()
    assert ds.filter(env).count() == want

    # compaction merges exactly the 3 small appended files (the base
    # files pass the small threshold too here, so bound it: set the
    # threshold between append-file size and base-file size)
    import os
    sizes = sorted(os.path.getsize(os.path.join(out, f))
                   for f in os.listdir(out) if f.endswith(".parquet"))
    threshold = sizes[3 - 1] + 1  # the 3 appended files are the smallest
    merged = st_cluster_compact(spark, out, "x", "y",
                                small_file_bytes=threshold)
    assert merged == 3
    info2 = st_layout_info(spark, out).collect()
    assert len({r["file"] for r in info2}) == n_base_files + 1
    ds2 = spark.read.parquet(out)
    assert ds2.count() == 5500
    assert ds2.filter(env).count() == want
    # idempotent: nothing small left to merge
    assert st_cluster_compact(spark, out, "x", "y",
                              small_file_bytes=threshold) in (0,)


def test_cluster_delete(spark, tmp_path):
    """Delete-path layout maintenance (rtree_crud.test:14,37 analog):
    a predicate DELETE rewrites ONLY the affected files (hilbert
    locality), keeps SQL NULL semantics (NULL predicate rows survive),
    and a full-table DELETE leaves a readable empty dataset."""
    import os

    from duckdb_spatial_spark.operators import (
        st_cluster,
        st_cluster_delete,
    )

    df = (
        spark.range(4000)
        .withColumn("x", (F.col("id") % 100).cast("double"))
        .withColumn("y", (F.col("id") / 100).cast("double"))
        .withColumn(
            "tag",
            F.when(F.col("id") % 7 == 0, F.lit(None).cast("int"))
            .otherwise((F.col("id") % 3).cast("int")),
        )
    )
    out = str(tmp_path / "ds")
    st_cluster(df, "x", "y", num_partitions=8).write.parquet(out)
    before = {f for f in os.listdir(out) if f.endswith(".parquet")}

    # spatially tight predicate — hilbert locality must leave most of
    # the 8 files untouched (same name on disk, never rewritten)
    n = st_cluster_delete(spark, out, "x >= 10.0 AND x < 13.0 AND y < 5.0")
    want_deleted = df.filter(
        (F.col("x") >= 10.0) & (F.col("x") < 13.0) & (F.col("y") < 5.0)
    ).count()
    assert n == want_deleted > 0
    after = {f for f in os.listdir(out) if f.endswith(".parquet")}
    assert len(before & after) >= 5, "tight delete rewrote too many files"
    ds = spark.read.parquet(out)
    assert ds.count() == 4000 - n

    # NULL semantics: DELETE WHERE tag = 0 keeps the NULL-tag rows
    survivors_before = ds.filter(
        F.col("tag").isNull() | (F.col("tag") != 0)).count()
    n2 = st_cluster_delete(spark, out, "tag = 0")
    ds2 = spark.read.parquet(out)
    assert ds2.count() == survivors_before
    assert ds2.filter(F.col("tag").isNull()).count() > 0

    # no-match predicate is a no-op
    assert st_cluster_delete(spark, out, "x > 1e9") == 0

    # full-table delete: readable, zero rows, schema preserved
    n3 = st_cluster_delete(spark, out, "true")
    assert n3 == survivors_before
    empty = spark.read.parquet(out)
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "x", "y", "tag"}


def test_constructor_fusion_no_python_stage(spark):
    """st_point→st_makeline→st_length, st_makeenvelope→st_area/perimeter,
    buffer(point)→area, shortestline→length, and box predicates over
    constructor columns must compile to pure col-exprs — no Arrow/Python
    eval node in the physical plan (the q13/q14/q56-class fast path)."""
    df = spark.range(10).select(
        (F.col("id") * 1.0).alias("x"), (F.col("id") * 2.0).alias("y"),
        (F.col("id") + 3.0).alias("x2"), (F.col("id") * 1.5).alias("y2"),
    )
    a = ST.st_point("x", "y")
    b = ST.st_point("x2", "y2")
    ln = ST.st_makeline(a, b)
    env = ST.st_makeenvelope(F.lit(0.0), F.lit(0.0), F.col("x") + 1, F.col("y") + 1)
    env2 = ST.st_makeenvelope(F.col("x"), F.lit(0.0), F.col("x") + 2, F.col("y2"))
    out = df.select(
        ST.st_length(ln).alias("len"),
        ST.st_distance(a, b).alias("dist"),
        ST.st_x(a).alias("px"),
        ST.st_area(env).alias("area"),
        ST.st_perimeter(env).alias("perim"),
        ST.st_area(ST.st_buffer(a, 5.0, segments=8)).alias("buf_area"),
        ST.st_length(ST.st_shortestline(a, ln)).alias("sl"),
        ST.st_covers(env, env2).alias("cov"),
        ST.st_equals(env, env2).alias("eq"),
        ST.st_disjoint(env, env2).alias("dis"),
        ST.st_contains(env, a).alias("cont"),
        ST.st_crosses(ln, ST.st_makeline(b, a)).alias("crs"),
    )
    plan = _explain(out)
    assert "EvalPython" not in plan, plan
    assert out.count() == 10


# ----------------------------------------------- pipeline-prep operators

def test_decontaminate_plan_broadcasts_benchmark(spark):
    """The eval-set gram side must be a broadcast build, never a shuffle
    of the corpus gram stream."""
    from duckdb_spatial_spark.operators.pipeline import decontaminate

    corpus = spark.createDataFrame(
        [(i, f"w{i} x y z a b c d e f") for i in range(50)], ["doc_id", "text"])
    bench = spark.createDataFrame([(0, "x y z a b c d e")], ["doc_id", "text"])
    plan = _explain(decontaminate(corpus, bench, n=4, mode="flag"))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_no_exchange(spark):
    """Sampling is a pure row-local predicate: zero shuffles."""
    from duckdb_spatial_spark.operators.pipeline import stratified_sample

    df = spark.createDataFrame([(1, "en"), (2, "de")], ["k", "lang"])
    plan = _explain(stratified_sample(df, "k", "lang", {"en": 0.5}, seed=1))
    assert "Exchange" not in plan, plan


def test_paragraph_dedup_exchange_budget(spark):
    """One shuffle for the paragraph-hash window + the doc-id regroup/join;
    no more than 3 exchanges total, and no text column in the window sort."""
    from duckdb_spatial_spark.operators.pipeline import paragraph_dedup

    df = spark.createDataFrame(
        [(i, f"p{i}\n\nshared\n\nq{i}") for i in range(20)], ["doc_id", "text"])
    plan = _explain(paragraph_dedup(df))
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_redact_pii_stays_codegen(spark):
    from duckdb_spatial_spark.operators.pipeline import redact_pii

    df = spark.createDataFrame([("a@b.co x",)], ["t"])
    plan = _explain(df.select(redact_pii(F.col("t")).alias("r")))
    assert "codegen id" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_nb_split_reuses_exchange(spark):
    """q106's train/score split must share ONE gram-scan exchange: the
    split flag comes out of the aggregate, so the filter can't push
    below it (a grouping-key flag splits the scan back in two)."""
    from duckdb_spatial_spark.operators.classify import nb_train_score_split

    df = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} gamma", i % 3 == 0)
         for i in range(60)],
        "doc_id long, text string, label boolean")
    # AQE defers exchange reuse to runtime — assert on the static plan
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = nb_train_score_split(df, F.col("doc_id") % 2 == 0,
                                   buckets=64, alpha=1.0)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert "ReusedExchange" in plan, "gram-scan exchange not shared"
    # the bounded model must NOT cost a broadcast-build job
    assert "BroadcastExchange" not in plan


def test_decontaminate_literal_bloom_stays_jvm(spark):
    """The bounded-benchmark bloom tier must be pure codegen: no Python
    eval node, no broadcast exchange — the filter rides the plan as an
    array<long> literal probed with getbit, the exact check as InSet."""
    from duckdb_spatial_spark.operators.pipeline import decontaminate

    docs = spark.createDataFrame(
        [(i, "w" + " w".join(str((i * 7 + j) % 40) for j in range(30)),
          30 + i) for i in range(50)],
        "doc_id long, text string, n_chars long")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    out = decontaminate(docs, bench, n=8, mode="flag", bloom_fpp=0.01,
                        flag_projection=["n_chars"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
    assert "BroadcastExchange" not in plan
    assert "getbit" in plan.lower()
    # and the semantics: every benchmark doc flags itself
    got = {r["doc_id"]: r["contaminated"] for r in out.collect()}
    assert all(got[i] for i in range(0, 50, 10))
    assert len(got) == 50


def test_ssort_has_no_range_sampling(spark):
    """_ssort results must not plan a RangePartitioning (whose bounds
    sampling re-executes the final stage)."""
    import __spark_entry__ as entry

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    out = entry._ssort(agg, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    ks = [r["k"] for r in out.collect()]
    assert ks == sorted(ks)
