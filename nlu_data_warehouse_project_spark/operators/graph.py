"""Distributed graph traversal over edge DataFrames.

The curation family already walks graphs implicitly (connected
components over near-dup pairs, `clusters.neardup_clusters`); this
module exposes the other traversal primitive a warehouse needs:
bounded-depth BFS ("what is within k hops of X" — co-purchase
exploration, contamination blast-radius, citation neighborhoods).

Spark-first shape: one equi-join per hop (frontier ⨝ edges), the
visited set pruned with a LEFT ANTI join so a node is expanded exactly
once, `localCheckpoint` per round to cut the iterative lineage (the
`neardup_clusters` discipline).  Each hop shuffles only the frontier —
never the full vertex set — so a k-hop query on a 100 TB edge table
costs k bounded joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scale import pin_frame


def bfs_hops(
    edges: DataFrame,
    start,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 3,
    reliable: bool | None = None,
) -> DataFrame:
    """Minimum hop count from ``start`` to every node reachable within
    ``max_hops`` directed edges.

    Returns (node, hops) with hops in [0, max_hops]; the start node is
    row (start, 0).  Edges are followed src -> dst; pass a
    symmetrized edge set for undirected traversal.  BFS layering makes
    the first time a node is seen its true minimum distance, so the
    visited-set prune is not an approximation.

    ``reliable`` selects the per-round pin (``scale.pin_frame``):
    default auto-upgrades to fault-tolerant ``checkpoint()`` when a
    checkpoint dir is configured — at cluster scale a lost executor
    mid-traversal re-reads checkpoint files instead of aborting.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops={max_hops} must be >= 0")
    # materialize the edge set ONCE: every hop probes it, and an edge
    # frame that is itself a join (e.g. the co-order self-join) would
    # otherwise recompute per hop — measured 3x the whole traversal
    e = pin_frame(
        edges.select(F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")),
        reliable=reliable, eager=True,
    )
    frontier = (
        edges.sparkSession.createDataFrame([(start,)], ["node"])
        .withColumn("hops", F.lit(0).cast("int"))
    )
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.node == e.__s)
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
        )
        nxt = pin_frame(nxt, reliable=reliable, eager=True)
        if nxt.isEmpty():
            break
        visited = pin_frame(visited.unionByName(nxt), reliable=reliable, eager=True)
        frontier = nxt
    return visited
