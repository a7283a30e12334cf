"""PageRank over the link graph — crawl-priority scoring (R6 feed).

The reference crawls with static priorities; a web-scale frontier ranks
hosts/pages by link structure (Page et al. 1999, public algorithm).
Implemented as the classic DataFrame power iteration:

  contribs = edges ⋈ ranks on src → (dst, rank/out_degree)
  rank'    = (1−d)/N + d·(Σ contribs + dangling_mass/N)

Scale notes: each iteration is one join + one aggregation, both
hash-partitioned on the node id — pre-partitioning ``edges`` by src
makes the join shuffle-free on the big side across iterations. Lineage
is cut per iteration with a persist → materialize → release-parent
chain (columnar cache): the previous eager local-checkpoint approach
row-serialized every rank block per iteration and anti-scales at
web-graph node counts (BENCH/BASELINE.md; VERDICT r2 #6). Dangling mass
is redistributed so ranks always sum to 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from retailer_scrapers_spark.operators.caching import unpersist_when_collected


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) for every node appearing in ``edges`` (either side)."""
    edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()

    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_d = edges.join(out_deg, "src").persist()
    # the dangling-node SET is static — compute it once, not per iteration
    dangling_nodes = nodes.join(
        out_deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev_cached: DataFrame | None = None
    for _ in range(iterations):
        contribs = (
            edges_d.join(ranks, edges_d.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        # dangling mass: rank held by nodes with no outgoing edges
        dangling = (
            ranks.join(dangling_nodes, "node", "left_semi").agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select("node", (F.lit(base) + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"))
            .persist()
        )
        new_ranks.count()  # materialize BEFORE releasing the parent generation
        if prev_cached is not None:
            prev_cached.unpersist(blocking=False)
        prev_cached = new_ranks
        ranks = new_ranks

    out = ranks.select("node", F.round("rank", 8).alias("rank"))
    # the final generation (plus the shared node/edge caches) lives as
    # long as the caller holds the result, then is released
    return unpersist_when_collected(out, ranks, nodes, edges_d, dangling_nodes)
