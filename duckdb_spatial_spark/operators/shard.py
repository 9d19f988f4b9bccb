"""Deterministic training-data sharding: assign every row a (shard,
pos) coordinate from a seeded portable hash, so a 100-TB corpus can be
re-exported as N shards with a stable pseudo-random global order — the
"global shuffle" step every LLM training pipeline runs before packing,
without a total sort of the corpus.

Why not ``orderBy(rand())``: a corpus-wide sort is a range-partitioned
total order (sampling pass + skew-prone exchange), and ``F.rand`` is
non-deterministic across retries. Here the shard is a pure hash of the
row id (one hash-partitioned exchange, retry-stable) and the position
is a per-shard sort of a second independent hash — each shard sorts
corpus/N rows with Spark's spillable external sort, and no two stages
ever need the same row twice.

The hash is the repo's portable 31-bit multiply-xorshift
(`sources/generate.py`), so an ANSI-SQL oracle replays the exact
assignment bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.generate import _uniform01_portable, portable_uniform_sql

__all__ = ["shard_assign", "shard_write", "shard_assign_sql"]


def _salts(seed: int) -> tuple[int, int]:
    # two decorrelated salt streams; the odd offsets keep them distinct
    # from hash_sample's ``1_000_003 * seed + 11`` stream
    return 1_000_003 * seed + 101, 1_000_003 * seed + 257


def shard_assign(df: DataFrame, id_col: str = "doc_id",
                 n_shards: int = 64, seed: int = 0) -> DataFrame:
    """Add (shard INT, pos BIGINT) columns: ``shard`` is a seeded hash
    bucket of the id, ``pos`` a 0-based rank within the shard ordered by
    a SECOND independent hash (ties broken by the id) — together a
    deterministic pseudo-random permutation of the corpus.

    Scale: one hash exchange (the window's partitionBy) + per-shard
    external sort; pick ``n_shards`` so corpus/n_shards fits a task's
    spillable sort (at 100 TB, thousands of shards — the exchange is
    uniform by construction, no skew).

    ``id_col`` must be UNIQUE: both hashes derive from it, so duplicate
    ids collide to the same (shard, u) and their relative ``pos`` is
    tie-broken arbitrarily (determinism holds only per distinct id).
    """
    s1, s2 = _salts(seed)
    u1 = _uniform01_portable(F.col(id_col).cast("long"), s1)
    u2 = _uniform01_portable(F.col(id_col).cast("long"), s2)
    shard = F.least(F.floor(u1 * F.lit(float(n_shards))),
                    F.lit(n_shards - 1)).cast("int")
    out = df.withColumn("shard", shard).withColumn("__u2", u2)
    w = Window.partitionBy("shard").orderBy(F.col("__u2"), F.col(id_col))
    return (
        out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__u2")
    )


def shard_assign_sql(id_expr: str, n_shards: int, seed: int) -> tuple[str, str]:
    """(shard_expr, order_key_expr) — the DuckDB twins of
    ``shard_assign``'s bucket and within-shard sort key, for oracles."""
    s1, s2 = _salts(seed)
    u1 = portable_uniform_sql(id_expr, s1)
    u2 = portable_uniform_sql(id_expr, s2)
    shard = (f"CAST(least(floor({u1} * {float(n_shards)!r}), "
             f"{n_shards - 1}) AS INT)")
    return shard, u2


def shard_write(df: DataFrame, path: str, id_col: str = "doc_id",
                n_shards: int = 64, seed: int = 0) -> None:
    """Materialize the permutation: ``path/shard=K/`` Parquet files with
    rows in ``pos`` order inside each shard. One exchange on the shard
    key, position order preserved by the same within-partition sort that
    computed it (no second shuffle)."""
    assigned = shard_assign(df, id_col, n_shards, seed)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    )
