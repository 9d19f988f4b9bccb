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
from .similarity import cosine_similarity

__all__ = ["doc_terms", "tf_idf", "tf_idf_topk", "bm25", "bm25_topk",
           "mmr_rerank", "mmr_greedy", "mmr_sql"]


def _round6(x: float) -> float:
    """DuckDB's round(DOUBLE, 6) arithmetic exactly (floor of
    x*1e6 + 0.5, sign-aware) — Python's round() is half-EVEN and
    desyncs on the exact-half decimals that λ·(6-dp value) products
    produce systematically."""
    import math

    return (math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0
            else math.ceil(x * 1e6 - 0.5) / 1e6)


def _cos_r6(a, b) -> float:
    """6-dp-rounded cosine; zero-norm → -1.0, matching DuckDB's
    list_cosine_similarity (the SQL twins' pairwise sims) and the Spark
    kernel."""
    import math

    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return _round6(d / (na * nb)) if na > 0 and nb > 0 else -1.0


def mmr_greedy(cand: dict, k: int, lam: float) -> list:
    """The bounded-pool greedy MMR selection shared by the batch
    re-ranker and the streaming window re-ranker: ``cand`` maps id →
    (6-dp relevance, vector); returns [(rank, id, rel, mmr)] with the
    exact tie-break the SQL twin replays (score DESC, id ASC, both
    compared AFTER 6-dp rounding)."""
    cand = dict(cand)
    sel = []
    out = []
    while cand and len(sel) < k:
        best = None
        for i, (r, e) in cand.items():
            ms = max((_cos_r6(e, se) for _, se in sel), default=0.0)
            score = _round6(lam * r - (1.0 - lam) * ms)
            # score DESC, id ASC — compare without negating the id so a
            # string/any-orderable id works exactly like the SQL twin's
            # ORDER BY score DESC, id (arithmetic -i raised TypeError)
            if (best is None or score > best[3]
                    or (score == best[3] and i < best[1])):
                best = (None, i, r, score)
        _, i, r, score = best
        sel.append((i, cand[i][1]))
        cand.pop(i)
        out.append((len(sel), i, r, score))
    return out


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


def mmr_rerank(df, query_vec, id_col: str = "vec_id",
               vec_col: str = "embedding", k: int = 8, pool: int = 32,
               lam: float = 0.7):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): from the corpus, take the ``pool`` most query-relevant
    vectors, then greedily pick ``k`` of them trading relevance against
    similarity-to-already-picked:

        mmr_i = λ·rel_i − (1−λ)·max_{s∈S} cos(e_i, e_s)

    Scale split (the IVF/BPE train-apply discipline): RELEVANCE is the
    distributed part — one codegen cosine scan + TakeOrdered, never a
    sort; the greedy loop runs driver-side over the BOUNDED pool (pool
    is a parameter, not a data scale). Determinism: every similarity
    rounds to 6 dp before comparisons and ties break on the id, so the
    selection replays exactly in SQL (:func:`mmr_sql`, k unrolled
    rounds — the q111 pattern).

    Returns list of (rank, id, rel, mmr) with 6-dp rounded scores.
    """
    q = [float(x) for x in query_vec]
    rel = cosine_similarity(F.col(vec_col), F.array(*[F.lit(x) for x in q]))
    top = (
        # null vectors never rank (the ANN-kernel contract): a NULL
        # reaching the pool would land on `__rel + 0.0` as None + float
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__e"),
                F.round(rel, 6).alias("__rel"))
        .orderBy(F.col("__rel").desc(), F.col("__id"))
        .limit(pool)
        .collect()
    )
    # + 0.0 normalizes IEEE -0.0 out of the collected rounded relevance
    # (the SQL twin's outputs are +0.0-normalized the same way)
    cand = {r["__id"]: (r["__rel"] + 0.0, [float(x) for x in r["__e"]])
            for r in top}
    return mmr_greedy(cand, k, lam)


def mmr_sql(table: str, vec_expr: str, id_col: str, query_table: str,
            query_where: str,
            k: int = 8, pool: int = 32, lam: float = 0.7) -> str:
    """DuckDB twin of :func:`mmr_rerank` — pool by (rounded cos DESC,
    id), pairwise 6-dp sims, then k unrolled greedy rounds (argmax via
    ORDER BY score DESC, id LIMIT 1; aggregates can't live in a
    recursive CTE term, so fixed-round unrolling IS the SQL form).
    Produces (rank, id, rel, mmr)."""
    lam_r = repr(float(lam))
    # embed the PYTHON-computed complement: 1.0 - 0.7 is
    # 0.30000000000000004 in binary floats, while SQL's (1.0 - 0.7) is
    # exact DECIMAL 0.3 → a 1-ulp multiplier difference that flips
    # 6-dp rounding at the half-boundaries λ·(6-dp) products hit
    # systematically
    om_r = repr(1.0 - float(lam))
    pre = f"""
        q AS (SELECT CAST({vec_expr} AS DOUBLE[]) AS qv
              FROM {query_table} WHERE {query_where}),
        pool AS MATERIALIZED (
          SELECT {id_col} AS id, ev, rel FROM (
            SELECT {id_col},
                   CAST({vec_expr} AS DOUBLE[]) AS ev,
                   round(list_cosine_similarity(
                       CAST({vec_expr} AS DOUBLE[]), q.qv), 6) AS rel,
                   row_number() OVER (
                     ORDER BY round(list_cosine_similarity(
                         CAST({vec_expr} AS DOUBLE[]), q.qv), 6) DESC,
                       {id_col}) AS rn
            FROM {table}, q
          ) WHERE rn <= {pool}
        ),
        sims AS MATERIALIZED (
          SELECT a.id AS ia, b.id AS ib,
                 round(list_cosine_similarity(a.ev, b.ev), 6) AS s
          FROM pool a JOIN pool b ON a.id <> b.id
        ),
        sel1 AS MATERIALIZED (
          SELECT id, rel, round({lam_r} * rel, 6) AS mmr, 1 AS rank
          FROM pool ORDER BY round({lam_r} * rel, 6) DESC, id LIMIT 1
        )"""
    rounds = []
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(f"SELECT id FROM sel{i}"
                                  for i in range(1, r))
        prev_rows = " UNION ALL ".join(
            f"SELECT id, rel, mmr, rank FROM sel{i}" for i in range(1, r))
        rounds.append(f"""
        sel{r} AS MATERIALIZED (
          SELECT p.id, p.rel,
                 round({lam_r} * p.rel
                       - {om_r} * max(s.s), 6) AS mmr,
                 {r} AS rank
          FROM pool p
          JOIN sims s ON s.ia = p.id AND s.ib IN ({prev})
          WHERE p.id NOT IN ({prev})
          GROUP BY p.id, p.rel
          ORDER BY round({lam_r} * p.rel
                         - {om_r} * max(s.s), 6) DESC, p.id
          LIMIT 1
        )""")
    all_rows = " UNION ALL ".join(f"SELECT id, rel, mmr, rank FROM sel{i}"
                                  for i in range(1, k + 1))
    # + 0.0 normalizes IEEE -0.0 on the OUTPUT columns: the Python side
    # never emits -0.0 (its sign-aware rounding goes through an int), so
    # a rel/mmr that rounds to zero must come out +0.0 here too
    return ("WITH" + pre + "," + ",".join(rounds)
            + f" SELECT CAST(rank AS BIGINT) AS rank, id,"
              f" rel + 0.0 AS rel, mmr + 0.0 AS mmr"
              f" FROM ({all_rows}) ORDER BY rank")
