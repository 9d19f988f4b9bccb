"""N-dimensional Z-order (Morton) layout — the multi-column
generalization of the Hilbert spatial layout in ``operators/cluster.py``
(the reference's CREATE INDEX story: rtree_index_create_physical.cpp
bulk-loads by a space-filling sort; here ANY numeric columns get the
same treatment, the shape Delta/Iceberg expose as ``OPTIMIZE ZORDER
BY``).

Layout contract: rows are sorted by an interleaved-bit key of the
chosen columns, so Parquet row-group min/max stats stay tight on EVERY
participating column at once — a range predicate on any subset of them
prunes the scan without an index structure. Queries need no special
operator: the predicate is an ordinary pushable col-expr; the layout is
what makes the pushed filter selective at the row-group level.

Scale shape: one cheap global-extent agg (per-column min/max), one
range exchange on the key, per-partition sort — the identical plan
family as ``st_cluster``; no UDFs, the key is a pure col-expr bit fold
inside whole-stage codegen.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_cluster", "zorder_append",
           "zorder_compact"]


def zorder_key(cols: Sequence[str],
               ranges: Dict[str, Tuple[float, float]],
               bits: int = 12) -> Column:
    """Pure col-expr Morton key: each column scales to a ``bits``-bit
    integer over its [lo, hi) range (clamped, so out-of-range appends
    still sort sanely), then bits interleave column-major — bit i of
    column j lands at position ``i * N + j``. ``N * bits`` must stay
    ≤ 62 (the key is one signed BIGINT)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} > 62 key "
            f"bits; lower bits= (pruning needs only row-group-level "
            f"resolution — 8-12 bits per column is plenty)")
    maxv = (1 << bits) - 1
    ints = []
    for c in cols:
        lo, hi = ranges[c]
        if hi > lo:
            scaled = (F.col(c).cast("double") - F.lit(float(lo))) \
                * F.lit(maxv / (hi - lo))
        else:
            scaled = F.lit(0.0)
        ints.append(
            F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(maxv)))
            .cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, v in enumerate(ints):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_cluster(
    df: DataFrame,
    cols: Sequence[str],
    ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    num_partitions: Optional[int] = None,
    bits: int = 12,
    key_col: str = "__z",
) -> DataFrame:
    """Z-order-cluster ``df`` by ``cols``. ``ranges`` defaults to the
    data's global per-column extent (one agg job). Result is
    range-partitioned and sorted by the Morton key — write to Parquet
    and range predicates on any of ``cols`` prune via min/max stats."""
    cols = list(cols)
    if ranges is None:
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")),
                     F.max(F.col(c).cast("double"))]
        row = df.agg(*aggs).collect()[0]
        for i, c in enumerate(cols):
            if row[2 * i] is None or row[2 * i + 1] is None:
                raise ValueError(
                    f"zorder_cluster: cannot infer a range for column "
                    f"{c!r} — the DataFrame is empty or the column is "
                    f"all NULL; pass ranges= explicitly")
        ranges = {c: (row[2 * i], row[2 * i + 1])
                  for i, c in enumerate(cols)}
    keyed = df.withColumn(key_col, zorder_key(cols, ranges, bits))
    np_ = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(np_, key_col)
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )


def zorder_append(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    num_partitions: Optional[int] = None,
    bits: int = 12,
) -> None:
    """Incrementally add rows to a z-ordered Parquet dataset: the batch
    lands as fresh Morton-sorted files, existing files are never read —
    the multi-column twin of ``st_cluster_append``. Queries are
    immediately correct (a Parquet scan is the union of files) and each
    appended file carries its own tight per-column min/max stats, so
    pruning degrades only gradually until :func:`zorder_compact` merges
    the small files. ``ranges`` defaults to the BATCH's extent — keys
    only order rows within the new files, so a range drift between
    generations affects locality, never correctness.

    ``num_partitions`` defaults to 1 (file count stays linear in the
    number of appends, not in cores). Not concurrent-safe — single
    maintenance job, like the reference's index maintenance.
    """
    out = zorder_cluster(df, cols, ranges=ranges,
                         num_partitions=num_partitions or 1, bits=bits)
    out.write.mode("append").parquet(path)


def zorder_compact(
    spark,
    path: str,
    cols: Sequence[str],
    small_file_bytes: int = 16 << 20,
    ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    num_partitions: Optional[int] = None,
    bits: int = 12,
) -> int:
    """Merge the small files a sequence of :func:`zorder_append` calls
    leaves behind — minor compaction only: files ≥ ``small_file_bytes``
    are left untouched (at scale the clustered bulk is never rewritten),
    the small ones re-cluster as one sorted batch. Returns the number of
    files compacted away. Predicate deletes need no z-order-specific
    code: ``st_cluster_delete`` is layout-agnostic (affected-file
    discovery via input_file_name + anti-filter rewrite) and works on a
    z-ordered dataset as-is.

    Same non-transactional crash story as ``st_cluster_compact``
    (write-then-delete: duplicates on a crash window, never loss).
    """
    import glob as _glob
    import os

    files = sorted(
        f for f in _glob.glob(os.path.join(path, "*.parquet"))
        if os.path.getsize(f) < small_file_bytes
    )
    if len(files) < 2:
        return 0
    from ..sources.tables import parquet_minmax, read_layout

    small = read_layout(spark, *files)
    if ranges is None:
        # per-column batch ranges are exactly the footers' min/max stats
        # (driver-side metadata) — skips zorder_cluster's extent-agg
        # job; degenerate stats (NaN/all-null) fall back to the agg
        mm = parquet_minmax(files, list(cols))
        if mm:
            ranges = {c: (float(mm[c][0]), float(mm[c][1])) for c in cols}
    zorder_cluster(
        small, cols, ranges=ranges,
        num_partitions=num_partitions or 1, bits=bits,
    ).write.mode("append").parquet(path)
    for f in files:
        os.remove(f)
        for side in (f + ".crc", os.path.join(
                os.path.dirname(f), "." + os.path.basename(f) + ".crc")):
            if os.path.exists(side):
                os.remove(side)
    return len(files)
