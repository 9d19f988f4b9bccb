"""Z-order layout: key math, multiset preservation, multi-column
row-group pruning effectiveness."""
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators import zorder_cluster, zorder_key


def test_zorder_key_interleaves(spark):
    # 2 cols x 2 bits over [0,4]: v scales by maxv/(hi-lo)=3/4 and the
    # range max (and anything beyond) clamps to maxv=3
    df = spark.createDataFrame(
        [(0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (9.0, 4.0), (2.0, 1.0)],
        "a double, b double")
    r = {"a": (0.0, 4.0), "b": (0.0, 4.0)}
    got = [row[0] for row in
           df.select(zorder_key(["a", "b"], r, bits=2)).collect()]
    # a-bits at even positions, b-bits at odd: (3,0) -> 0b0101, (0,3)
    # -> 0b1010, (3,3) -> 0b1111; (2.0,1.0) -> a=1 (0b0001), b=0 -> 1
    assert got == [0, 0b0101, 0b1010, 0b1111, 0b0001]


def test_zorder_key_bit_budget(spark):
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c"], {c: (0.0, 1.0) for c in "abc"}, bits=21)


def test_zorder_cluster_preserves_multiset(spark):
    df = spark.range(2000).select(
        (F.col("id") % 97).cast("double").alias("a"),
        ((F.col("id") * 31) % 89).cast("double").alias("b"),
        F.col("id").alias("k"))
    out = zorder_cluster(df, ["a", "b"], num_partitions=4)
    assert out.count() == 2000
    assert out.agg(F.sum("k")).collect()[0][0] == sum(range(2000))
    assert set(out.columns) == {"a", "b", "k"}


def test_zorder_prunes_on_every_column(spark, tmp_path):
    """After z-ordering on (a, b), a range predicate on EITHER column
    must be satisfiable by a strict subset of row groups (the layout's
    whole point); a non-participating uniform column must not prune."""
    df = spark.range(40_000).select(
        (F.col("id") % 199).cast("double").alias("a"),
        ((F.col("id") * 31) % 211).cast("double").alias("b"),
        (F.col("id") % 7).cast("double").alias("noise"),
        F.col("id").alias("k"))
    path = str(tmp_path / "z")
    (zorder_cluster(df, ["a", "b"], num_partitions=4)
     .write.option("parquet.block.size", 64 * 1024).parquet(path))

    import glob
    groups = []
    for f in glob.glob(path + "/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i
               for i in range(meta.num_columns)}
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            st = {c: rg.column(idx[c]).statistics for c in ("a", "b", "noise")}
            groups.append({c: (s.min, s.max) for c, s in st.items()})
    assert len(groups) >= 8, "need multiple row groups to test pruning"

    def surviving(col, lo, hi):
        return sum(1 for g in groups
                   if g[col][0] <= hi and g[col][1] >= lo)

    # a 10%-wide range on each participating column prunes most groups
    assert surviving("a", 0.0, 20.0) < len(groups) / 2
    assert surviving("b", 0.0, 21.0) < len(groups) / 2
    # the uniform non-participating column cannot prune
    assert surviving("noise", 3.0, 3.5) == len(groups)

    # and the engine-level result off the layout matches a recompute
    got = (spark.read.parquet(path)
           .filter((F.col("a") < 20.0) & (F.col("b") < 21.0))
           .agg(F.count("*"), F.sum("k")).collect()[0])
    want = (df.filter((F.col("a") < 20.0) & (F.col("b") < 21.0))
            .agg(F.count("*"), F.sum("k")).collect()[0])
    assert tuple(got) == tuple(want)


def test_zorder_crud_cycle(spark, tmp_path):
    """append -> delete -> compact maintains the exact multiset."""
    from duckdb_spatial_spark.operators import (st_cluster_delete,
                                                zorder_append,
                                                zorder_cluster,
                                                zorder_compact)

    df = spark.range(5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("a"),
        ((F.col("id") * 31) % 89).cast("double").alias("b"))
    path = str(tmp_path / "zc")
    zorder_cluster(df.filter(F.col("k") % 2 == 0), ["a", "b"],
                   num_partitions=2).write.parquet(path)
    zorder_append(df.filter(F.col("k") % 2 == 1), path, ["a", "b"])
    nd = st_cluster_delete(spark, path, "a >= 10.0 AND a < 20.0")
    merged = zorder_compact(spark, path, ["a", "b"],
                            small_file_bytes=1 << 20)
    assert merged >= 2
    back = spark.read.parquet(path)
    want = df.filter(~((F.col("a") >= 10.0) & (F.col("a") < 20.0)))
    assert nd == df.count() - want.count()
    assert back.count() == want.count()
    assert (back.agg(F.sum("k")).collect()[0][0]
            == want.agg(F.sum("k")).collect()[0][0])


def test_streaming_zorder_append_drain_equals_batch(spark, tmp_path):
    """availableNow drain through foreachBatch zorder appends == the
    batch union, and the layout stays a readable z-ordered dataset."""
    from duckdb_spatial_spark.operators import zorder_cluster
    from duckdb_spatial_spark.streaming import streaming_zorder_append

    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("a"),
        ((F.col("id") * 31) % 89).cast("double").alias("b"))
    src = str(tmp_path / "src")
    df.filter(F.col("k") % 2 == 1).repartition(3).write.parquet(src)
    path = str(tmp_path / "z")
    r = {"a": (0.0, 97.0), "b": (0.0, 89.0)}
    zorder_cluster(df.filter(F.col("k") % 2 == 0), ["a", "b"],
                   ranges=r, num_partitions=2).write.parquet(path)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = streaming_zorder_append(stream, path, ["a", "b"], ranges=r,
                                checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert back.agg(F.sum("k")).collect()[0][0] == sum(range(2000))


def test_zorder_cluster_null_extent_raises(spark):
    """ranges=None on an empty frame / all-NULL column must raise a
    clear ValueError naming the column, not a NoneType TypeError."""
    empty = spark.range(0).select(
        F.col("id").cast("double").alias("a"),
        F.col("id").cast("double").alias("b"))
    with pytest.raises(ValueError, match="'a'"):
        zorder_cluster(empty, ["a", "b"], num_partitions=2)
    allnull = spark.range(5).select(
        F.col("id").cast("double").alias("a"),
        F.lit(None).cast("double").alias("b"))
    with pytest.raises(ValueError, match="'b'"):
        zorder_cluster(allnull, ["a", "b"], num_partitions=2)


def test_streaming_zorder_auto_compact_bounds_file_count(spark, tmp_path):
    """With auto_compact_files=4, many micro-batches may NOT accumulate
    unbounded generation files: the inline compact keeps the small-file
    population under the threshold (+1 for the merged output) while
    row-level results stay exact — the q142 growth-probe fix."""
    import glob
    from duckdb_spatial_spark.streaming import streaming_zorder_append

    df = spark.range(1200).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("a"),
        ((F.col("id") * 31) % 89).cast("double").alias("b"))
    src = str(tmp_path / "src")
    # 12 source files -> 12 micro-batches with maxFilesPerTrigger=1
    df.repartition(12).write.parquet(src)
    path = str(tmp_path / "z")
    r = {"a": (0.0, 97.0), "b": (0.0, 89.0)}
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = streaming_zorder_append(stream, path, ["a", "b"], ranges=r,
                                checkpoint=str(tmp_path / "ckpt"),
                                auto_compact_files=4)
    q.awaitTermination()
    n_files = len(glob.glob(path + "/*.parquet"))
    # 12 appends without compaction would leave 12 generation files
    assert n_files <= 5, f"auto-compact did not bound files: {n_files}"
    back = spark.read.parquet(path)
    assert back.count() == 1200
    assert back.agg(F.sum("k")).collect()[0][0] == sum(range(1200))
