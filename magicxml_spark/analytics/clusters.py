"""Duplicate-cluster resolution: connected components over candidate
pairs (the step after MinHash/SimHash/embedding near-dup that turns
pairs into keep/drop decisions for a 100 TB corpus).

Algorithm: iterative minimum-label propagation — each node holds the
smallest id it has seen; every round propagates labels across edges
until a fixpoint. Rounds are bounded by the graph diameter (near-dup
clusters are shallow); every round is one shuffle-free broadcast-less
join + aggregation, all DataFrame ops. This is the standard large-graph
connected-components shape (label propagation), not a driver-side
union-find — no .collect() on the edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_rounds: int = 64,
) -> DataFrame:
    """(id, cluster_id) with cluster_id = min node id reachable through
    the undirected pair graph. ``nodes``: one column ``id_col``;
    ``pairs``: columns (id_a, id_b)."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("cluster_id"))
    prev_sum = None

    for _ in range(max_rounds):
        # push each node's label to its neighbors, keep the minimum
        pushed = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), F.col("cluster_id"))
        )
        merged = (
            labels.unionByName(pushed)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        # pointer doubling: follow the label's own label, so chains
        # collapse in O(log diameter) rounds instead of O(diameter)
        parent = merged.select(
            F.col("id").alias("_pid"), F.col("cluster_id").alias("_plabel")
        )
        new_labels = (
            merged.join(parent, merged["cluster_id"] == F.col("_pid"), "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("_plabel"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)  # cut lineage per round
        )
        # labels only ever decrease, so an unchanged total IS the
        # fixpoint — one tiny scalar agg over checkpointed data instead
        # of a join-per-round change detector
        label_sum = new_labels.agg(F.sum("cluster_id")).collect()[0][0]
        if label_sum == prev_sum:
            return new_labels
        prev_sum = label_sum
        labels = new_labels
    return labels
