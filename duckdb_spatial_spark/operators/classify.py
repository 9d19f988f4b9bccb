"""Model-based quality classification: multinomial Naive Bayes over
hashed n-gram buckets.

The GPT-3 / LLaMA / CCNet data pipelines filter web text with a linear
classifier trained on "known-good vs raw" examples (fastText supervised
in the published recipes). The count-based analog with the same bag-of-
hashed-ngrams features is multinomial Naive Bayes — it trains in ONE
distributed counting pass (no iterations, no gradients), its decision
function is a per-bucket log-odds dot product, and every step is exact
integer/double arithmetic, so the whole train+score pipeline replays in
ANSI SQL for the oracle gate. (DSIR in operators/dsir.py is the
two-model generative-ratio sibling; NB adds class priors and a labeled
decision boundary.)

    score(d) = ln P(pos)/P(neg)
             + Σ_b n_{d,b} · ( ln p̂_b|pos − ln p̂_b|neg )
    p̂_b|c   = (cnt_{c,b} + α) / (tot_c + α·B)

Scale shape:
  * training: one explode of the labeled corpus → one partial-aggregated
    (label, bucket) shuffle → a model of ≤ 2·buckets rows collected
    driver-side (bounded by buckets, never by data) and re-shipped as a
    broadcast LocalRelation — the same one-pass-per-corpus discipline as
    operators/dsir.py;
  * scoring: one explode of the unlabeled corpus → broadcast model join
    → per-doc sum. Int-only shuffles, whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import _gram_rows, bucket_sql, gram_rows_sql, hashed_bucket

__all__ = ["nb_train", "nb_score", "nb_score_sql"]


def nb_train(labeled_df: DataFrame, label_col: str = "label",
             text_col: str = "text", buckets: int = 4096,
             alpha: float = 1.0, bigrams: bool = True):
    """Train on a boolean ``label_col`` (True = quality/positive).

    Returns ``(model_rows, stats)`` where ``model_rows`` is a list of
    (bucket, cnt_pos, cnt_neg) and ``stats`` a dict with n_pos/n_neg doc
    counts and tot_pos/tot_neg gram totals — everything downstream needs,
    bounded at 2·buckets rows of driver memory.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (log of the smoothed counts)")
    g = _gram_rows(labeled_df, [F.col(label_col).alias("_y")], text_col,
                   bigrams)
    # ONE collect for the bucket counts AND the doc-count stats: the doc
    # totals ride along as a sentinel bucket=-1 row (hashed buckets are
    # always >= 0), halving the train-time job barriers.
    both = (
        g.select("_y", hashed_bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.col("_y").cast("long")).alias("cnt_pos"),
            F.sum((~F.col("_y")).cast("long")).alias("cnt_neg"),
        )
        .unionByName(labeled_df.agg(
            F.lit(-1).alias("bucket"),
            F.sum(F.col(label_col).cast("long")).alias("cnt_pos"),
            F.sum((~F.col(label_col)).cast("long")).alias("cnt_neg"),
        ))
    ).collect()
    docs = next(r for r in both if r["bucket"] == -1)
    model_rows = [(r["bucket"], r["cnt_pos"], r["cnt_neg"])
                  for r in both if r["bucket"] >= 0]
    stats = {
        "n_pos": docs["cnt_pos"] or 0,
        "n_neg": docs["cnt_neg"] or 0,
        "tot_pos": sum(r[1] for r in model_rows),
        "tot_neg": sum(r[2] for r in model_rows),
        "buckets": buckets,
        "alpha": float(alpha),
        "bigrams": bigrams,
    }
    return model_rows, stats


def nb_score(df: DataFrame, model_rows, stats, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(id, n_grams, nb_score): positive-class log-odds per document.

    Buckets unseen in training still contribute their smoothing-only
    log-odds ln(α/(tot_pos+αB)) − ln(α/(tot_neg+αB)); rather than
    materialize all B buckets, that constant-per-gram term folds into
    the normalizer, and the broadcast model carries only trained buckets
    with the DELTA above the smoothing floor — identical arithmetic to
    the SQL twin, which uses the same decomposition.
    """
    buckets, alpha = stats["buckets"], stats["alpha"]
    spark = df.sparkSession
    schema = "bucket int, cnt_pos long, cnt_neg long"
    model = (spark.createDataFrame(model_rows, schema) if model_rows
             else spark.createDataFrame([], schema))

    a = F.lit(alpha)
    ab = F.lit(alpha * buckets)
    prior = (F.log(F.lit(stats["n_pos"] + 1.0))
             - F.log(F.lit(stats["n_neg"] + 1.0)))
    # per-gram floor for an untrained bucket (cnt=0 both classes)
    floor = (F.log(a) - F.log(F.lit(stats["tot_pos"]) + ab)) \
        - (F.log(a) - F.log(F.lit(stats["tot_neg"]) + ab))

    doc_b = (
        _gram_rows(df, [F.col(id_col)], text_col, stats["bigrams"])
        .select(F.col(id_col),
                hashed_bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    delta = F.col("cnt") * (
        (F.log(F.coalesce(F.col("cnt_pos"), F.lit(0)) + a)
         - F.log(F.lit(stats["tot_pos"]) + ab))
        - (F.log(F.coalesce(F.col("cnt_neg"), F.lit(0)) + a)
           - F.log(F.lit(stats["tot_neg"]) + ab))
        - floor
    )
    return (
        doc_b.join(F.broadcast(model), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum("cnt").alias("n_grams"), F.sum(delta).alias("_d"))
        .select(
            id_col,
            "n_grams",
            (prior + F.col("_d") + F.col("n_grams") * floor)
            .alias("nb_score"),
        )
    )


def nb_train_score(train_df: DataFrame, score_df: DataFrame,
                   label_col: str = "label", text_col: str = "text",
                   buckets: int = 4096, alpha: float = 1.0,
                   bigrams: bool = True,
                   id_col: str = "doc_id") -> DataFrame:
    """Fused train+score with NO driver round trip: the bucket-count
    model and the (tot/doc-count) stats stay in-plan as broadcast
    frames, so the whole pipeline is one collected job plus its
    broadcast evaluations (the persisted model fills its cache during
    the first broadcast). Identical arithmetic to nb_train + nb_score —
    the smoothing-floor decomposition reads the totals from a 1-row
    cross-joined frame instead of Python floats (same IEEE doubles).

    Measured: the collect-model-then-rebuild-plan shape paid an extra
    full train-scan job barrier; this shape cut q106 at sf0.1 from
    1.6 s toward the single-scan floor.

    Cache lifetime: the persisted model frame stays cached after the
    caller's action (the return is lazy, so no in-function unpersist
    point exists); ContextCleaner reclaims the ≤``buckets``-row blocks
    once the caller drops the returned DataFrame, and long-lived
    sessions can force it with ``spark.catalog.clearCache()``."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (log of the smoothed counts)")
    g = _gram_rows(train_df, [F.col(label_col).alias("_y")], text_col,
                   bigrams)
    model = (
        g.select("_y", hashed_bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.col("_y").cast("long")).alias("cnt_pos"),
            F.sum((~F.col("_y")).cast("long")).alias("cnt_neg"),
        )
        .persist()  # ≤ buckets rows; feeds the stats agg AND the join
    )
    stats = (
        model.agg(
            F.coalesce(F.sum("cnt_pos"), F.lit(0)).alias("_tot_pos"),
            F.coalesce(F.sum("cnt_neg"), F.lit(0)).alias("_tot_neg"),
        )
        .crossJoin(train_df.agg(
            F.coalesce(F.sum(F.col(label_col).cast("long")),
                       F.lit(0)).alias("_n_pos"),
            F.coalesce(F.sum((~F.col(label_col)).cast("long")),
                       F.lit(0)).alias("_n_neg"),
        ))
    )
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha) * buckets)
    prior = (F.log(F.col("_n_pos") + F.lit(1.0))
             - F.log(F.col("_n_neg") + F.lit(1.0)))
    floor = (F.log(a) - F.log(F.col("_tot_pos") + ab)) \
        - (F.log(a) - F.log(F.col("_tot_neg") + ab))
    delta = F.col("cnt") * (
        (F.log(F.coalesce(F.col("cnt_pos"), F.lit(0)) + a)
         - F.log(F.col("_tot_pos") + ab))
        - (F.log(F.coalesce(F.col("cnt_neg"), F.lit(0)) + a)
           - F.log(F.col("_tot_neg") + ab))
        - floor
    )
    doc_b = (
        _gram_rows(score_df, [F.col(id_col)], text_col, bigrams)
        .select(F.col(id_col),
                hashed_bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        doc_b.join(F.broadcast(model), "bucket", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col, "_n_pos", "_n_neg", "_tot_pos", "_tot_neg")
        .agg(F.sum("cnt").alias("n_grams"), F.sum(delta).alias("_d"))
        .select(
            id_col,
            "n_grams",
            (prior + F.col("_d") + F.col("n_grams") * floor)
            .alias("nb_score"),
        )
    )


def nb_score_sql(train_table: str, score_table: str, label_expr: str,
                 id_col: str, text_col: str, buckets: int,
                 alpha: float, bigrams: bool = True) -> str:
    """DuckDB replica of nb_train + nb_score as one WITH…SELECT producing
    (id, n_grams, nb_score). Same decomposition (delta above the
    smoothing floor + n_grams·floor + prior) so the float arithmetic
    matches term-for-term."""
    b = bucket_sql("gram", buckets)
    a = repr(float(alpha))
    ab = repr(float(alpha) * buckets)
    train_grams = gram_rows_sql(train_table, f"({label_expr}) AS _y",
                                text_col, bigrams)
    score_grams = gram_rows_sql(score_table, id_col, text_col, bigrams)
    return f"""
        WITH tg AS ({train_grams}),
        m AS (
          SELECT {b} AS bucket,
                 CAST(sum(CASE WHEN _y THEN 1 ELSE 0 END) AS BIGINT)
                   AS cnt_pos,
                 -- NOT NULL is NULL -> falls to ELSE 0, matching Spark's
                 -- null-skipping sum (a NULL label counts toward neither)
                 CAST(sum(CASE WHEN NOT _y THEN 1 ELSE 0 END) AS BIGINT)
                   AS cnt_neg
          FROM tg WHERE gram <> '' GROUP BY 1
        ),
        st AS (
          SELECT
            (SELECT count(*) FROM {train_table} WHERE {label_expr})
              AS n_pos,
            (SELECT count(*) FROM {train_table} WHERE NOT ({label_expr}))
              AS n_neg,
            COALESCE(sum(cnt_pos), 0) AS tot_pos,
            COALESCE(sum(cnt_neg), 0) AS tot_neg
          FROM m
        ),
        sg AS ({score_grams}),
        doc_b AS (
          SELECT {id_col}, {b} AS bucket, CAST(count(*) AS BIGINT) AS cnt
          FROM sg WHERE gram <> '' GROUP BY 1, 2
        ),
        fl AS (
          SELECT (ln({a}) - ln(tot_pos + {ab}))
               - (ln({a}) - ln(tot_neg + {ab})) AS floor_term,
                 ln(n_pos + 1.0) - ln(n_neg + 1.0) AS prior,
                 tot_pos, tot_neg
          FROM st
        )
        SELECT j.{id_col} AS {id_col},
               CAST(sum(cnt) AS BIGINT) AS n_grams,
               first(prior)
                 + sum(cnt * ((ln(COALESCE(cnt_pos, 0) + {a})
                               - ln(tp + {ab}))
                            - (ln(COALESCE(cnt_neg, 0) + {a})
                               - ln(tn + {ab}))
                            - floor_term))
                 + sum(cnt) * first(floor_term) AS nb_score
        FROM (
          SELECT doc_b.*, m.cnt_pos, m.cnt_neg,
                 fl.floor_term, fl.prior,
                 fl.tot_pos AS tp, fl.tot_neg AS tn
          FROM doc_b
          LEFT JOIN m USING (bucket)
          CROSS JOIN fl
        ) j
        GROUP BY 1
    """
