"""Build a DEGENERATE scale-factor directory for edge-case gating:
constant-valued event groups (stddev 0), empty / whitespace-only /
one-word / unicode documents, and zero / constant embedding vectors —
the inputs that ANSI mode and ±0.0 rounding punish.

Usage:
    python scripts/make_degenerate_sf.py [out_dir] [--nulls]
    python scripts/check_oracle.py <out_dir>     # then gate on it

--nulls builds the NULL-injection variant instead (NULL text/value/
embedding rows): the engine guarantee there is CRASH-freedom — 23
queries value-diverge by design (Spark and DuckDB propagate NULLs
through regex/split differently; TESTDATA's columns are non-null and
the oracles assume that contract; see PLANS.md round 9).

Round 9 ran this against all 158 queries and found five zero-vector
cosine DIVIDE_BY_ZERO crashes, two empty-text token-count oracle
divergences, a zero-token boundary-span miscount, and an
argpartition-vs-cid-ASC probe-set tie divergence — all fixed and green.
"""
from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
ARGS = [a for a in sys.argv[1:] if a != "--nulls"]
NULLS = "--nulls" in sys.argv
DST = ARGS[0] if ARGS else ("/tmp/null_sf" if NULLS else "/tmp/degenerate_sf")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").limit(20) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{DST}/{t}.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet").limit(40)
    if NULLS:
        ev = ev.withColumn(
            "value",
            F.when(F.col("event_id") % 5 == 0, F.lit(None))
            .otherwise(F.col("value")))
    else:
        ev = ev.withColumn(
            "value",
            F.when(F.col("event_type") == "view", F.lit(5.0))
            .otherwise(F.col("value")))   # constant group: stddev 0
    ev.coalesce(1).write.mode("overwrite").parquet(f"{DST}/events.parquet")

    d = spark.read.parquet(f"{SRC}/documents.parquet").limit(30)
    if NULLS:
        d = d.withColumn(
            "text",
            F.when(F.col("doc_id") % 6 == 0, F.lit(None))
            .otherwise(F.col("text")))
    else:
        d = d.withColumn(
            "text",
            F.when(F.col("doc_id") % 7 == 0, F.lit(""))
            .when(F.col("doc_id") % 7 == 1, F.lit("word"))
            .when(F.col("doc_id") % 7 == 2, F.lit("   "))
            .when(F.col("doc_id") % 7 == 3, F.lit("中文 é ü"))
            .otherwise(F.col("text")))
        d = d.withColumn(
            "n_chars", F.length("text").cast(dict(d.dtypes)["n_chars"]))
    d.coalesce(1).write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    e = spark.read.parquet(f"{SRC}/embeddings.parquet").limit(40)
    dim = len(e.select("embedding").first()[0])
    etype = dict(e.dtypes)["embedding"]
    zero = F.array(*[F.lit(0.0) for _ in range(dim)]).cast(etype)
    one = F.array(*[F.lit(1.0) for _ in range(dim)]).cast(etype)
    if NULLS:
        e = e.withColumn(
            "embedding",
            F.when(F.col("vec_id") % 8 == 3, F.lit(None).cast(etype))
            .otherwise(F.col("embedding")))
    else:
        e = e.withColumn(
            "embedding",
            F.when(F.col("vec_id") % 9 == 1, zero)
            .when(F.col("vec_id") % 9 == 2, one)
            .otherwise(F.col("embedding")))
    e.coalesce(1).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    # flatten: DuckDB's read_parquet('{t}.parquet') expects a FILE
    for dirp in sorted(glob.glob(DST + "/*.parquet")):
        if os.path.isdir(dirp):
            parts = glob.glob(dirp + "/part-*.parquet")
            assert len(parts) == 1, (dirp, parts)
            tmp = dirp + ".file"
            shutil.copyfile(parts[0], tmp)
            shutil.rmtree(dirp)
            os.rename(tmp, dirp)
    print("degenerate sf written:", DST)


if __name__ == "__main__":
    main()
