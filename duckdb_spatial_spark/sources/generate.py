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


_M31 = 2147483648  # 2^31
_MUL1 = 1597334677
_MUL2 = 1203793051


def _uniform01_portable(seed_col, salt: int):
    """31-bit multiply-xorshift hash → [0,1): every step stays below 2^62,
    so the SAME expression evaluates identically in Spark SQL and ANSI SQL
    with non-wrapping BIGINT multiplication (DuckDB) — this is what makes
    generated-point workloads oracle-checkable (see q61's SQL mirror)."""
    h = (F.lit(_MUL1) * (seed_col + F.lit(salt))) % F.lit(_M31)
    h = h.bitwiseXOR(F.shiftright(h, 15))
    h = (F.lit(_MUL2) * h) % F.lit(_M31)
    h = h.bitwiseXOR(F.shiftright(h, 13))
    return h.cast("double") / F.lit(float(_M31))


def portable_uniform_sql(index_expr: str, salt: int) -> str:
    """The DuckDB-SQL mirror of _uniform01_portable for oracles."""
    h0 = f"((CAST({_MUL1} AS BIGINT) * (({index_expr}) + {salt})) % {_M31})"
    h1 = f"xor({h0}, {h0} >> 15)"
    h2 = f"((CAST({_MUL2} AS BIGINT) * {h1}) % {_M31})"
    h3 = f"xor({h2}, {h2} >> 13)"
    return f"({h3} / {float(_M31)!r})"


def st_generatepoints(
    spark: SparkSession,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    count: int,
    seed: int = 0,
    num_partitions: Optional[int] = None,
    rng: str = "xxhash",
) -> DataFrame:
    """→ DataFrame(id BIGINT, x DOUBLE, y DOUBLE) of ``count`` uniform
    points in the box. Fully parallel, no shuffle, deterministic by seed.
    ``rng='portable'`` uses the 31-bit multiply-xorshift hash that an
    ANSI-SQL oracle can replicate bit-for-bit."""
    np_ = num_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, count, 1, np_)
    if rng == "portable":
        salt_base = seed * 1_000_003
        u1 = _uniform01_portable(F.col("id") * 2, salt_base + 2)
        u2 = _uniform01_portable(F.col("id") * 2, salt_base + 3)
    else:
        u1 = _uniform01(F.col("id"), seed * 2 + 1)
        u2 = _uniform01(F.col("id"), seed * 2 + 2)
    return base.select(
        F.col("id"),
        (F.lit(float(xmin)) + u1 * F.lit(float(xmax - xmin))).alias("x"),
        (F.lit(float(ymin)) + u2 * F.lit(float(ymax - ymin))).alias("y"),
    )
