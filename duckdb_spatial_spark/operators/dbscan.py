"""Exact distributed DBSCAN over point columns (grid-partitioned).

DBSCAN (Ester et al., KDD 1996) with the standard distributed
formulation (MR-DBSCAN family): snap points to an eps-sized grid, find
eps-neighbors only across the 3×3 neighboring cells (an equi-join — the
distance predicate never sees a cross join), then

  core points   — ≥ ``min_pts`` points (self included) within eps;
  clusters      — connected components of the core-core eps-graph,
                  labelled by the smallest member id (deterministic);
  border points — non-core with a core neighbor: they take the smallest
                  label among their core neighbors (deterministic — the
                  classic DBSCAN order-dependence is removed);
  noise         — everything else (label −1).

Scale shape: ONE shuffle on cell ids builds the neighbor graph (left
side explodes to its 9 neighbor cells, right side stays put, so every
directed neighbor pair appears exactly once), neighbor counts are a
map-side-combinable groupBy, and the component step reuses the dedup
tier's :func:`~duckdb_spatial_spark.operators.dedup.connected_components`
(partition-local union-find contraction → guarded driver finish →
min-label propagation).  Per-cell work is quadratic in the cell's
population — the grid method's inherent cost; eps-sized cells keep that
the density the user asked about, and heavy cells can be diagnosed with
a groupBy(cell).count() before running.

The whole pipeline is SQL-replayable (plain self-join + recursive reach)
— driver row q117.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dbscan"]


def dbscan(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """Label every input row: (id, label, role) with role ∈
    {'core', 'border', 'noise'} and label = smallest id in the cluster
    (−1 for noise).  Distance is euclidean, the eps ball is CLOSED
    (``dist ≤ eps``), and a point counts itself toward ``min_pts`` — the
    original DBSCAN definitions."""
    from .dedup import connected_components

    eps = float(eps)
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        F.floor(F.col(x_col).cast("double") / F.lit(eps)).alias("cx"),
        F.floor(F.col(y_col).cast("double") / F.lit(eps)).alias("cy"),
    )
    # left side explodes to its 3×3 neighborhood; right side stays in its
    # own cell → each directed pair (a→b), a≠b, is produced exactly once
    # (through b's cell) and the join is a pure equi-join on (cx, cy).
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    probe = (
        pts.withColumn("__o", F.explode(offs))
        .select(
            F.col("id").alias("id_a"), F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("__o.dx")).alias("cx"),
            (F.col("cy") + F.col("__o.dy")).alias("cy"),
        )
    )
    d2 = (
        (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x"))
        + (F.col("ya") - F.col("y")) * (F.col("ya") - F.col("y"))
    )
    nbr = (
        probe.join(pts.select("id", "x", "y", "cx", "cy"), ["cx", "cy"])
        .filter((F.col("id_a") != F.col("id")) & (d2 <= F.lit(eps * eps)))
        .select(F.col("id_a"), F.col("id").alias("id_b"))
    )
    # the neighbor graph feeds THREE branches (counts, core edges, border
    # adoption) — without a cut Catalyst replays the cell join per branch.
    # localCheckpoint, not persist: nothing downstream can schedule an
    # unpersist, and CacheManager never frees Dataset caches on its own.
    # Coreness is annotated as WINDOW counts over the (symmetric) edge
    # list — count per id_a == a's neighbor count, count per id_b ==
    # b's — instead of joining a derived `core` frame back in three
    # places: each of those joins planned a broadcast build of the
    # derived frame, its own job barrier (trap 13), where a window is
    # just a stage inside the consuming job.
    from pyspark.sql import Window

    nbr = (
        nbr.withColumn(
            "na", F.count(F.lit(1)).over(Window.partitionBy("id_a")) + 1)
        .withColumn(
            "nb", F.count(F.lit(1)).over(Window.partitionBy("id_b")) + 1)
        .localCheckpoint(eager=True)
    )
    # neighbor count includes the point itself
    counts = nbr.select(F.col("id_a").alias("id"), F.col("na").alias("n_nbr")
                        ).distinct()
    labelled = pts.select("id").join(counts, "id", "left").select(
        "id", F.coalesce("n_nbr", F.lit(1)).alias("n_nbr"))
    # full core set (includes isolated points when min_pts <= 1) — used
    # ONLY as the component node universe, never joined back into the
    # nbr branches (those use the window flags).
    core = labelled.filter(F.col("n_nbr") >= min_pts).select("id")

    core_edges = nbr.filter(
        (F.col("na") >= min_pts) & (F.col("nb") >= min_pts)
    ).select("id_a", "id_b")
    # (id, comp) — comp = smallest member id of the core component
    comp = connected_components(
        core_edges, "id_a", "id_b", nodes=core, id_col="id")

    # border: non-core points adopt the smallest label among core neighbors
    border = (
        nbr.filter((F.col("na") < min_pts) & (F.col("nb") >= min_pts))
        .join(comp.withColumnRenamed("id", "id_b"), "id_b")
        .groupBy(F.col("id_a").alias("id"))
        .agg(F.min("comp").alias("b_label"))
    )

    out = (
        labelled
        .join(comp, "id", "left")
        .join(border, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("comp"), F.col("b_label"), F.lit(-1))
            .cast("long").alias("label"),
            F.when(F.col("comp").isNotNull(), F.lit("core"))
            .when(F.col("b_label").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise")).alias("role"),
        )
    )
    return out
