"""Term-weighting / keyword-ranking operators: TF-IDF and Okapi BM25.

A training-data pipeline uses these for keyword extraction (document
tagging), topic-balanced sampling, and query-relevance scoring of a
corpus against a probe set. Everything here is exact, deterministic, and
pure Spark built-ins, so the same arithmetic replays in ANSI SQL for the
oracle gate.

Scale shape (the whole module):
  * one explode of the projected word array (linear in corpus tokens);
  * one partial-aggregated shuffle on (doc, term) for term frequencies —
    map-side combine collapses repeats before the exchange;
  * document frequencies / doc count / average doc length are
    vocabulary-sized or scalar aggregates → broadcast back (no second
    wide shuffle of the corpus);
  * top-k per doc is a window partitioned by the doc id (each partition
    is one document's vocabulary — no skew beyond document size).

Formulas (stated so the SQL twin can't drift):
  tf-idf:  score = tf * (ln((1 + N) / (1 + df)) + 1)       (smoothed idf)
  BM25:    idf   = ln(1 + (N - df + 0.5) / (df + 0.5))
           score = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pipeline import normalized_words

__all__ = ["doc_terms", "tf_idf", "tf_idf_topk", "bm25", "bm25_topk"]


def doc_terms(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, term) rows: normalized words of each doc, one row per token."""
    words = df.select(
        F.col(id_col), normalized_words(F.col(text_col)).alias("_w")
    )
    return (
        words.select(F.col(id_col), F.explode(F.col("_w")).alias("term"))
        .filter(F.col("term") != "")
    )


def _tf_and_stats(df: DataFrame, id_col: str, text_col: str):
    terms = doc_terms(df, id_col, text_col)
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # tf rows are distinct (doc, term) pairs, so counting them per term IS
    # the document frequency — no extra distinct pass
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("dfreq")
    )
    ndocs = df.agg(F.countDistinct(F.col(id_col)).alias("n_docs"))
    return tf, dfreq, ndocs


def tf_idf(df: DataFrame, id_col: str = "doc_id",
           text_col: str = "text") -> DataFrame:
    """(id, term, tf, dfreq, score) with the smoothed-idf tf-idf score.

    No broadcast hint on the document-frequency table: its cardinality is
    the corpus' distinct-term count, unbounded at web scale (URLs, typos,
    multilingual tokens) — a forced hint would collect it regardless of
    size. Small corpora still broadcast via size estimation; huge ones
    fall back to an equi-join on the term, which both sides already
    shuffle on."""
    tf, dfreq, ndocs = _tf_and_stats(df, id_col, text_col)
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(ndocs))
    idf = F.log((F.lit(1.0) + F.col("n_docs"))
                / (F.lit(1.0) + F.col("dfreq"))) + F.lit(1.0)
    return scored.select(
        id_col, "term", "tf", "dfreq",
        (F.col("tf") * idf).alias("score"),
    )


def tf_idf_topk(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", k: int = 5) -> DataFrame:
    """Top-k tf-idf terms per doc; ties break on the term string so the
    selection is deterministic and oracle-replayable."""
    scored = tf_idf(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "dfreq", "score", "rank")
    )


def bm25(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
         k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(id, term, tf, dfreq, dl, score) with the Okapi BM25 weight of each
    term within its document (term-saliency form: the per-term partial a
    query score would sum)."""
    tf, dfreq, ndocs = _tf_and_stats(df, id_col, text_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    # no broadcast hint on dfreq — unbounded distinct-term cardinality
    # at web scale; see tf_idf
    scored = (
        tf.join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(ndocs))
        .crossJoin(F.broadcast(avgdl))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
        / (F.col("dfreq") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    return scored.select(
        id_col, "term", "tf", "dfreq", "dl",
        (idf * F.col("tf") * F.lit(k1 + 1.0) / denom).alias("score"),
    )


def bm25_topk(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              k: int = 5, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k BM25-salient terms per doc (deterministic tie-break)."""
    scored = bm25(df, id_col, text_col, k1, b)
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "dfreq", "dl", "score", "rank")
    )
