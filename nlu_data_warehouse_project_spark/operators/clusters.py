"""Near-dup cluster resolution — connected components over candidate
pairs (training-data pipeline north star).

Pairwise near-dup detection (MinHash/SimHash/embedding) is only half of
corpus dedup: A~B and B~C must collapse into ONE cluster {A, B, C} with
one surviving representative, or transitive duplicates survive in the
training set.  Components are computed by iterative min-label
propagation: every node repeatedly adopts the smallest label among
itself and its neighbors, converging to the component-minimum id in
O(diameter) rounds (near-dup clusters are shallow — a handful of
rounds in practice; ``max_iters`` bounds pathological chains).

Scale shape per round: one equi-join (labels ⋈ edges) + one groupBy
min with map-side combine — both hash-partition on node id; lineage is
cut with ``localCheckpoint`` each round so plans stay flat at any
iteration count.  This is the alternating-star algorithm's simple
cousin; it trades a (bounded) constant factor in rounds for having no
driver-side state at all beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scale import pin_frame


def neardup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    reliable: bool | None = None,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``, where
    cluster_id = the minimum node id of its connected component.

    Raises ``RuntimeError`` if ``max_iters`` rounds pass without
    reaching the fixpoint (VERDICT r2 #8): a silent early exit would
    emit WRONG cluster ids — components whose diameter exceeds the
    round budget get split into several clusters, and a downstream
    dedup quietly keeps extra near-duplicates.  A graph that deep
    (e.g. a chain of crawl mirrors) needs a larger ``max_iters``, not
    a wrong answer."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    edges = pin_frame(edges.distinct(), reliable=reliable, eager=True)

    labels = pin_frame(
        edges.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node")),
        reliable=reliable, eager=True,
    )

    converged = False
    for _ in range(max_iters):
        # each node offers its label to every neighbor; keep the min of
        # own + offered labels
        offered = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(offered)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels = pin_frame(new_labels, reliable=reliable, eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"neardup_clusters did not converge within max_iters={max_iters} rounds; "
            "the pair graph has a component with diameter >= max_iters — raise max_iters "
            "(labels propagate one hop per round)"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one representative per near-dup cluster (the minimum id)
    plus every unpaired row: the corpus-level dedup the pairwise
    operators feed.  One broadcast-able join when clusters are sparse
    relative to the corpus (the common case)."""
    labels = neardup_clusters(pairs, id_a, id_b)
    lab = labels.withColumnRenamed("node", id_col)
    joined = df.join(lab, id_col, "left")
    return joined.filter(
        F.col("cluster_id").isNull() | (F.col(id_col) == F.col("cluster_id"))
    ).drop("cluster_id")
