"""PageRank over the link graph — crawl-priority scoring (R6 feed).

The reference crawls with static priorities; a web-scale frontier ranks
hosts/pages by link structure (Page et al. 1999, public algorithm).
Implemented as the classic DataFrame power iteration:

  contribs = edges ⋈ ranks on src → (dst, rank/out_degree)
  rank'    = (1−d)/N + d·(Σ contribs + dangling_mass/N)

Scale notes: each iteration is one join + one aggregation, both
hash-partitioned on the node id — pre-partitioning ``edges`` by src
makes the join shuffle-free on the big side across iterations. Lineage
is cut per iteration (localCheckpoint) so 10+ iterations don't stack a
10-deep plan. Dangling mass is redistributed so ranks always sum to 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) for every node appearing in ``edges`` (either side)."""
    edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    ).distinct().localCheckpoint(eager=True)
    n = nodes.count()

    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_d = edges.join(out_deg, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            edges_d.join(ranks, edges_d.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        # dangling mass: rank held by nodes with no outgoing edges
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti").agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select("node", (F.lit(base) + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", 8).alias("rank"))
