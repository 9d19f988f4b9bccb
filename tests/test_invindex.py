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


# ---------------------------------------------------------------- scored


def test_scored_index_matches_corpus_bm25(spark, tmp_path):
    """bm25_search off the index == per-doc sum of operators.rank.bm25
    partials for the query terms, straight off the corpus."""
    from duckdb_spatial_spark.operators import (bm25_search,
                                                build_scored_index)
    from duckdb_spatial_spark.operators.rank import bm25

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick fox"),
        (3, "lazy lazy lazy dog"),
        (4, "brown dog and brown fox"),
        (5, "unrelated words entirely different"),
        (6, ""),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "sidx")
    build_scored_index(corpus, path, segment_size=2)

    terms = ["fox", "lazy", "the"]
    got = {r["doc_id"]: (r["n_terms"], r["score"])
           for r in bm25_search(spark, path, terms, k=10).collect()}

    ref_rows = (
        bm25(corpus, "doc_id", "text")
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.sum("score").alias("s"))
        .collect()
    )
    ref = {r["doc_id"]: (r["n"], round(r["s"], 6)) for r in ref_rows}
    assert set(got) == set(ref)
    for d, (n, s) in ref.items():
        assert got[d][0] == n
        assert abs(got[d][1] - s) < 1e-6, (d, got[d], s)


def test_scored_index_topk_deterministic(spark, tmp_path):
    from duckdb_spatial_spark.operators import (bm25_search,
                                                build_scored_index)

    # identical docs -> identical scores -> tie-break on doc_id
    rows = [(i, "same text here") for i in range(8)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "sidx2")
    build_scored_index(corpus, path)
    got = [r["doc_id"] for r in
           bm25_search(spark, path, ["same"], k=3).collect()]
    assert got == [0, 1, 2]


def test_scored_index_prunes_to_query_terms(spark, tmp_path):
    """The postings scan of a query carries the term filter down to
    Parquet (PushedFilters In(term, ...))."""
    from duckdb_spatial_spark.operators import (bm25_search,
                                                build_scored_index)

    rows = [(i, f"w{i % 5} shared") for i in range(50)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "sidx3")
    build_scored_index(corpus, path)
    plan = (bm25_search(spark, path, ["w1"], k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "term" in plan


def test_scored_index_append_matches_full_build(spark, tmp_path):
    """build(evens) + append(odds) answers queries identically to a
    one-shot build over the whole corpus (df/N/avgdl aggregate across
    generations)."""
    from duckdb_spatial_spark.operators import (bm25_search,
                                                build_scored_index,
                                                scored_index_append)

    rows = [(i, f"alpha w{i % 7} beta" if i % 3 else "alpha only here")
            for i in range(40)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    full = str(tmp_path / "full")
    build_scored_index(corpus, full, segment_size=8)
    inc = str(tmp_path / "inc")
    build_scored_index(corpus.filter(F.col("doc_id") % 2 == 0), inc,
                       segment_size=8)
    scored_index_append(corpus.filter(F.col("doc_id") % 2 == 1), inc,
                        segment_size=8)
    terms = ["alpha", "w1", "only"]
    a = sorted(map(tuple, bm25_search(spark, full, terms, k=40).collect()))
    b = sorted(map(tuple, bm25_search(spark, inc, terms, k=40).collect()))
    assert a == b and len(a) == 40


def test_positional_index_phrase_query(spark, tmp_path):
    from duckdb_spatial_spark.operators import (build_positional_index,
                                                phrase_query)

    rows = [
        (1, "hash join beats sort merge join"),
        (2, "the hash join hash join doubled"),
        (3, "hash then join but not adjacent"),
        (4, "join hash reversed order"),
        (5, "three word phrase hash join win"),
        (6, ""),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "pidx")
    build_positional_index(corpus, path, segment_size=2)
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_query(spark, path, ["hash", "join"]).collect()}
    assert got == {1: 1, 2: 2, 5: 1}
    # 3-term phrase
    got3 = {r["doc_id"]: r["n_occurrences"]
            for r in phrase_query(spark, path,
                                  ["hash", "join", "beats"]).collect()}
    assert got3 == {1: 1}
    # repeated term in the phrase
    got_rep = {r["doc_id"]: r["n_occurrences"]
               for r in phrase_query(spark, path,
                                     ["join", "hash", "join"]).collect()}
    assert got_rep == {2: 1}
    # single term == posting presence with occurrence counts
    got1 = {r["doc_id"]: r["n_occurrences"]
            for r in phrase_query(spark, path, ["join"]).collect()}
    assert got1 == {1: 2, 2: 2, 3: 1, 4: 1, 5: 1}
    # absent phrase
    assert phrase_query(spark, path, ["sort", "hash"]).count() == 0


def test_scored_index_three_generations_and_absent_terms(spark, tmp_path):
    from duckdb_spatial_spark.operators import (bm25_search,
                                                build_scored_index,
                                                scored_index_append)

    rows = [(i, f"alpha beta w{i % 5}") for i in range(30)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    full = str(tmp_path / "full")
    build_scored_index(corpus, full, segment_size=4)
    inc = str(tmp_path / "inc")
    build_scored_index(corpus.filter(F.col("doc_id") % 3 == 0), inc,
                       segment_size=4)
    scored_index_append(corpus.filter(F.col("doc_id") % 3 == 1), inc,
                        segment_size=4)
    scored_index_append(corpus.filter(F.col("doc_id") % 3 == 2), inc,
                        segment_size=4)
    a = sorted(map(tuple,
                   bm25_search(spark, full, ["alpha", "w2"], k=30).collect()))
    b = sorted(map(tuple,
                   bm25_search(spark, inc, ["alpha", "w2"], k=30).collect()))
    assert a == b and len(a) == 30
    # absent term contributes nothing; fully-absent query -> empty
    assert bm25_search(spark, inc, ["zzz"], k=5).count() == 0
    c = sorted(map(tuple,
                   bm25_search(spark, inc, ["alpha", "zzz"], k=30).collect()))
    d = sorted(map(tuple,
                   bm25_search(spark, inc, ["alpha"], k=30).collect()))
    assert c == d


def test_phrase_query_absent_term_and_empty_phrase(spark, tmp_path):
    from duckdb_spatial_spark.operators import (build_positional_index,
                                                phrase_query)

    corpus = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    path = str(tmp_path / "pidx2")
    build_positional_index(corpus, path)
    assert phrase_query(spark, path, ["a", "zzz"]).count() == 0
    with pytest.raises(ValueError):
        phrase_query(spark, path, [])


def test_streaming_index_append_drain_equals_batch(spark, tmp_path):
    """availableNow drain of a doc stream through foreachBatch appends
    == one-shot batch build over the union corpus."""
    from duckdb_spatial_spark.operators import (bm25_search,
                                                build_scored_index)
    from duckdb_spatial_spark.streaming import streaming_index_append

    rows = [(i, f"alpha w{i % 5} beta") for i in range(40)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "src")
    corpus.filter(F.col("doc_id") % 2 == 1).repartition(3) \
        .write.parquet(src)

    full = str(tmp_path / "full")
    build_scored_index(corpus, full, segment_size=8)
    inc = str(tmp_path / "inc")
    build_scored_index(corpus.filter(F.col("doc_id") % 2 == 0), inc,
                       segment_size=8)
    stream = (spark.readStream.schema(corpus.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = streaming_index_append(stream, inc, segment_size=8,
                               checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()
    terms = ["alpha", "w3"]
    a = sorted(map(tuple, bm25_search(spark, full, terms, k=40).collect()))
    b = sorted(map(tuple, bm25_search(spark, inc, terms, k=40).collect()))
    assert a == b and len(a) == 40
    # multiple micro-batches actually happened (one per file)
    import glob
    assert len(glob.glob(inc + "/stats/*.parquet")) >= 3
