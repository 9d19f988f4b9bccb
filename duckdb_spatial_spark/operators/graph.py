"""Graph analytics over edge DataFrames — PageRank (domain authority over
a web link graph, the ranking signal next to the URL tier) plus the
connected-components operator living in dedup.py.

PageRank is THE canonical iterative Spark workload: each iteration is one
equi-join (ranks ⋈ edges on src) + one aggregation (sum contributions per
dst) — shuffle-on-key, no driver-side data beyond two scalars (dangling
mass, node count). A fixed iteration count keeps it deterministic and lets
the SQL oracle unroll the same recurrence as chained CTEs.

    r_{t+1}(v) = (1-d)/N + d · (Σ_{u→v} r_t(u)/deg(u) + D_t/N)

where D_t is the total rank mass on dangling (no-outlink) nodes. Ranks are
persisted per iteration and the previous generation unpersisted — lineage
stays O(1) deep instead of growing by one join per iteration.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Ranks after ``iters`` synchronous iterations from a uniform start.
    Returns (node, rank). Duplicate edges count once (the link-graph
    convention); nodes = every distinct endpoint."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .persist())
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # out-links with degree attached — reused every iteration, persist once
    links = e.join(deg, "src").persist()
    links.count()

    d = float(damping)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).persist()
    ranks.count()
    dangling = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()

    for _ in range(iters):
        dang_mass = (
            ranks.join(dangling, "node").agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        contribs = (
            links.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit((1.0 - d) / n)
                 + F.lit(d) * (F.coalesce(F.col("c"), F.lit(0.0))
                               + F.lit(dang_mass / n))).alias("rank"),
            )
            .persist()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    nodes.unpersist()
    links.unpersist()
    dangling.unpersist()
    return ranks


def pagerank_sql(
    edges_cte: str,
    iters: int = 10,
    damping: float = 0.85,
) -> str:
    """DuckDB replica: the same recurrence unrolled as chained CTEs
    (aggregates are not allowed in a recursive CTE term, so a fixed
    iteration count IS the SQL-expressible form). ``edges_cte`` must be a
    SELECT yielding (src, dst). Returns SQL producing (node, rank)."""
    d = float(damping)
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_cte}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY 1)",
        ("r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"),
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        cur = f"r{i}"
        parts.append(f"""{cur} AS (
          SELECT nodes.node,
                 (1.0 - {d}) / nn.n + {d} * (
                   COALESCE(c.c, 0.0)
                   + (SELECT COALESCE(sum(r.rank), 0.0) FROM {prev} r
                      LEFT JOIN deg ON deg.src = r.node
                      WHERE deg.src IS NULL) / nn.n
                 ) AS rank
          FROM nodes CROSS JOIN nn
          LEFT JOIN (
            SELECT e.dst AS node, sum(r.rank / deg.deg) AS c
            FROM e JOIN {prev} r ON r.node = e.src
            JOIN deg ON deg.src = e.src
            GROUP BY 1
          ) c ON c.node = nodes.node
        )""")
        prev = cur
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM {prev}"
