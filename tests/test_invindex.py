"""Inverted-index layout: build/prune/query semantics."""
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators import (build_inverted_index,
                                            conjunctive_query,
                                            index_term_stats)


@pytest.fixture
def corpus(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "beta gamma delta"),
        (4, "Alpha  ALPHA beta"),      # case-fold + dup terms in one doc
        (5, "epsilon"),
        (6, ""),                        # empty doc contributes nothing
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_and_conjunctive_query(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_inverted_index(corpus, path, segment_size=2)
    # df counts DOCUMENTS, not occurrences (doc 4 counts once for alpha)
    stats = {r["term"]: r["df"]
             for r in index_term_stats(spark, path,
                                       ["alpha", "beta", "epsilon"]).collect()}
    assert stats == {"alpha": 3, "beta": 4, "epsilon": 1}
    got = sorted(r["doc_id"] for r in
                 conjunctive_query(spark, path, ["alpha", "beta"]).collect())
    assert got == [1, 2, 4]
    # single term == its posting list
    got1 = sorted(r["doc_id"] for r in
                  conjunctive_query(spark, path, ["gamma"]).collect())
    assert got1 == [1, 3]
    # disjoint terms intersect to nothing
    assert conjunctive_query(spark, path, ["alpha", "epsilon"]).count() == 0
    # duplicate terms in the query must not double-count
    got_dup = sorted(r["doc_id"] for r in
                     conjunctive_query(spark, path,
                                       ["beta", "beta", "gamma"]).collect())
    assert got_dup == [1, 3]


def test_segments_bounded_and_sorted(spark, tmp_path):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("common").alias("text"),
    )
    path = str(tmp_path / "idx")
    build_inverted_index(docs, path, segment_size=16)
    rows = (spark.read.parquet(path)
            .filter(F.col("term") == "common").collect())
    assert len(rows) >= 7, "a 100-doc posting must split into segments"
    for r in rows:
        assert len(r["docs"]) <= 16
        assert list(r["docs"]) == sorted(r["docs"])
        assert r["df"] == 100
    # segments partition the posting without overlap
    all_ids = sorted(d for r in rows for d in r["docs"])
    assert all_ids == list(range(100))


def test_term_filter_prunes_scan(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_inverted_index(corpus, path, segment_size=1000)
    plan = (spark.read.parquet(path)
            .filter(F.col("term") == "alpha")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters")[1][:120]
    # the layout is term-sorted so row-group stats carry term min/max
    files = [os.path.join(path, f) for f in os.listdir(path)
             if f.endswith(".parquet")]
    metas = [pq.ParquetFile(f).metadata for f in files]
    assert any(m.num_rows > 0 for m in metas)
