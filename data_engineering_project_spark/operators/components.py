"""Connected components — duplicate-pair edges → duplicate clusters.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep one
representative per component). This is the one genuinely iterative
algorithm in a training-data pipeline: transitive closure over the
similarity graph.

Implementation: min-label propagation. Every node starts labeled with its
own id; each round every node takes the minimum label among itself and its
neighbors; converged when no label changes. Each round is one shuffle
(join + groupBy); rounds needed = graph diameter. Duplicate clusters are
small and dense (diameter ≤ ~3), so this converges in 2-4 rounds — for
general graphs with long chains, swap in the large-star/small-star
alternation (Kiveris et al., "Connected Components in MapReduce"), which
contracts paths in O(log²) rounds at the same per-round shuffle cost.

The driver-side loop is NOT a driver-side data path: per round the driver
sees one count (the convergence check); all data stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Undirected connected components over an edge list.

    Returns ``(node, component)`` where ``component`` is the smallest node
    id reachable from ``node``. Raises if not converged within
    ``max_iter`` rounds (pathological diameter — use star-contraction).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym["b"] == labels["node"])
                .groupBy(F.col("a").alias("node2"))
                .agg(F.min("component").alias("nbr_component"))
            )
            new_labels = (
                labels.join(
                    neighbor_min, labels["node"] == neighbor_min["node2"], "left"
                )
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component")),
                    ).alias("component"),
                )
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds — "
            "graph diameter too large for plain propagation; use "
            "star-contraction"
        )
    finally:
        sym.unpersist()
