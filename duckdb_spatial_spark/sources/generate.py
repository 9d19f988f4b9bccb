"""ST_GeneratePoints — table function generating uniform random points in a
box (reference: core/functions/table/st_generatepoints.cpp:14-69).

Spark-first: ``spark.range(count)`` + a **hash-derived** uniform per row id,
so the output is deterministic for a given seed regardless of partitioning
or parallelism (``F.rand(seed)`` is only per-partition-deterministic, which
breaks reproducibility under AQE / repartition). Same distribution contract
as the reference (uniform in box, seeded); identical sequences are not
required (SURVEY §2.A)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _uniform01(seed_col, salt: int):
    # xxhash64 → [0,1): shift to 53-bit mantissa range for exact doubles
    h = F.xxhash64(seed_col, F.lit(salt))
    return (F.shiftrightunsigned(h, 11).cast("double")) / F.lit(float(1 << 53))


def st_generatepoints(
    spark: SparkSession,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    count: int,
    seed: int = 0,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """→ DataFrame(id BIGINT, x DOUBLE, y DOUBLE) of ``count`` uniform
    points in the box. Fully parallel, no shuffle, deterministic by seed."""
    np_ = num_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, count, 1, np_)
    u1 = _uniform01(F.col("id"), seed * 2 + 1)
    u2 = _uniform01(F.col("id"), seed * 2 + 2)
    return base.select(
        F.col("id"),
        (F.lit(float(xmin)) + u1 * F.lit(float(xmax - xmin))).alias("x"),
        (F.lit(float(ymin)) + u2 * F.lit(float(ymax - ymin))).alias("y"),
    )
