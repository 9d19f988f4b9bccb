"""Inverted-index layout: build a (term → posting segments) Parquet
dataset and answer conjunctive term queries from the INDEX alone — the
text-side sibling of the Hilbert layout in operators/cluster.py (the
reference's CREATE INDEX story, re-expressed as layout + pruned scans:
rtree_index_plan_scan.cpp turns a predicate into an index probe; here a
term predicate becomes a Parquet scan pruned to that term's rows).

Layout contract:

* one row per (term, segment): ``term``, ``seg`` (segment ordinal),
  ``df`` (the term's TOTAL document frequency, repeated on each
  segment), ``docs`` (sorted doc-id array, ≤ ``segment_size`` entries).
  Segmenting bounds the row width — a stopword's posting list at 100 TB
  is billions of ids, which must never materialize as ONE array value
  (Spark rows are memory-resident in whole); segments cap it at
  ``segment_size`` longs per row while keeping segment-local order.
* the dataset is written sorted by (term, seg), so Parquet min/max
  stats on ``term`` prune a conjunctive query's scan to exactly the
  requested terms' row groups — the index-probe analog.

Scale shape: build = one distinct (doc, term) projection → one
(term, segment) shuffle with map-side combine; query = a pruned scan of
the K requested terms + one explode + a doc-grouped count (rows =
Σ posting sizes of the K terms, never the corpus).
"""
from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["build_inverted_index", "index_term_stats", "conjunctive_query"]


def _terms(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )


def build_inverted_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_size: int = 100_000,
    num_partitions: Optional[int] = None,
) -> None:
    """Write the posting layout for ``df`` to ``path``.

    Plan: explode distinct (doc, term) pairs, assign each pair its
    segment ordinal ``floor(doc_id / span)`` with ``span`` sized so a
    uniform id range yields ≤ ``segment_size`` ids per segment — the
    segment key is derived from the DOC ID, not a row_number, so the
    build needs no per-term sort of unbounded posting lists: one
    groupBy (term, seg) with sort_array on the bounded segment array.
    ``df`` (total document frequency) is a window sum over the bounded
    per-segment counts.
    """
    from pyspark.sql import Window

    pairs = (
        df.select(F.col(id_col).alias("__d"), F.explode(_terms(text_col)).alias("term"))
        .distinct()
    )
    seg = F.floor(F.col("__d") / F.lit(int(segment_size))).cast("long")
    segs = (
        pairs.groupBy("term", seg.alias("seg"))
        .agg(F.sort_array(F.collect_list("__d")).alias("docs"),
             F.count("*").alias("__n"))
    )
    out = segs.select(
        "term", "seg",
        F.sum("__n").over(Window.partitionBy("term")).cast("long").alias("df"),
        "docs",
    )
    np_ = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        out.repartitionByRange(np_, "term", "seg")
        .sortWithinPartitions("term", "seg")
        .write.mode("overwrite").parquet(path)
    )


def index_term_stats(spark: SparkSession, path: str,
                     terms: List[str]) -> DataFrame:
    """(term, df) for the requested terms — reads ONLY their rows (the
    term filter reaches the Parquet scan as a PushedFilter; min/max
    stats on the sorted layout prune everything else)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("term").isin(list(terms)))
        .groupBy("term").agg(F.max("df").cast("long").alias("df"))
    )


def conjunctive_query(spark: SparkSession, path: str,
                      terms: List[str]) -> DataFrame:
    """Doc ids containing ALL of ``terms``, answered from the index
    alone: pruned scan of the K terms' segments → explode → count per
    doc == K. Output: (doc_id) — one row per matching document.

    The per-doc aggregation shuffles Σ posting sizes of the K requested
    terms (never corpus-sized); a query for stopwords degrades to their
    posting mass, which is the inherent cost of the ANSWER, not a plan
    artifact."""
    k = len(set(terms))
    idx = (
        spark.read.parquet(path)
        .filter(F.col("term").isin(list(terms)))
    )
    hits = idx.select("term", F.explode("docs").alias("doc_id")).distinct()
    return (
        hits.groupBy("doc_id").agg(F.count("*").alias("__k"))
        .filter(F.col("__k") == k)
        .select("doc_id")
    )
