"""Deterministic sharding: permutation, determinism, SQL-twin parity."""
import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators import (shard_assign, shard_assign_sql,
                                            shard_write)


@pytest.fixture
def docs(spark):
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
    )


def test_shard_assign_is_permutation(spark, docs):
    out = shard_assign(docs, "doc_id", n_shards=8, seed=3)
    assert out.count() == 500
    # within each shard, pos is exactly 0..n-1
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.min("pos").alias("mn"), F.max("pos").alias("mx"),
        F.countDistinct("pos").alias("d")).collect()
    assert sum(r["n"] for r in per) == 500
    assert len(per) == 8  # 500 uniform rows hit all 8 buckets
    for r in per:
        assert (r["mn"], r["mx"], r["d"]) == (0, r["n"] - 1, r["n"])


def test_shard_assign_deterministic_and_seeded(spark, docs):
    a = sorted(shard_assign(docs, "doc_id", 8, seed=1)
               .select("doc_id", "shard", "pos").collect())
    b = sorted(shard_assign(docs, "doc_id", 8, seed=1)
               .select("doc_id", "shard", "pos").collect())
    assert a == b
    c = sorted(shard_assign(docs, "doc_id", 8, seed=2)
               .select("doc_id", "shard", "pos").collect())
    assert a != c


def test_shard_assign_matches_sql_twin(spark, docs):
    got = {r["doc_id"]: (r["shard"], r["pos"])
           for r in shard_assign(docs, "doc_id", 8, seed=5).collect()}
    shard, u2 = shard_assign_sql("doc_id", 8, 5)
    con = duckdb.connect()
    ref = con.execute(f"""
        WITH t AS (SELECT range AS doc_id FROM range(500)),
        a AS (SELECT doc_id, {shard} AS shard, {u2} AS u2 FROM t)
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY u2, doc_id) - 1 AS pos
        FROM a
    """).fetchall()
    assert {d: (s, p) for d, s, p in ref} == got


def test_shard_write_layout(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    shard_write(docs, path, "doc_id", n_shards=4, seed=0)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert {r["shard"] for r in back.select("shard").distinct().collect()} \
        == {0, 1, 2, 3}
    # read-back matches the assignment (partition column round-trips)
    want = {(r["doc_id"], r["shard"], r["pos"]) for r in
            shard_assign(docs, "doc_id", 4, seed=0).collect()}
    got = {(r["doc_id"], r["shard"], r["pos"]) for r in
           back.select("doc_id", "shard", "pos").collect()}
    assert got == want
