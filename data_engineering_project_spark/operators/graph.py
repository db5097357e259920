"""Iterative graph algorithms as DataFrame loops (PageRank).

The reference has no graph operators; this family exists for the 100 TB
curation story: link-graph centrality (PageRank over a hyperlink or
interaction graph) is a standard web-corpus quality signal, and the
iterative join/agg loop is the same scaffold as connected components
(`operators/components.py`).

Exactness design — why this is oracle-checkable at all
------------------------------------------------------
Textbook PageRank sums floating-point contributions, and float addition is
not associative: Spark's partial-aggregate merge order varies run to run,
so a float implementation can never hash-match a different engine (or even
itself). Instead ranks live in integer **micro-units** (1e6 = rank 1.0) and
every division is integer floor division:

    contrib(u -> v) = rank_micro(u) div out_degree(u)
    rank_micro'(v)  = (unit - damping) + (damping * sum(contrib)) div unit

Integer sums are exact and order-independent, so the result is
bit-reproducible across engines, partitionings, and runs. The quantization
error per iteration is < out_degree ulps of 1e-6 — irrelevant for ranking
use, decisive for verifiability.

Scale notes: each iteration is one shuffle-join of edges against ranks
(hash-partitioned on src) plus one groupBy(dst) aggregation — the standard
distributed PageRank shape. Ranks lineage is truncated per round with
``localCheckpoint`` (iterative DataFrame loops otherwise double the plan
every round — see components.py and ROADMAP invariants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 1.0 of rank, expressed in integer micro-units.
UNIT = 1_000_000
#: damping factor 0.85 in micro-units.
DAMPING_MICRO = 850_000


def pagerank_quantized(
    edges: DataFrame,
    iterations: int = 3,
    unit: int = UNIT,
    damping_micro: int = DAMPING_MICRO,
) -> DataFrame:
    """Integer-quantized PageRank over a directed edge list.

    Parameters
    ----------
    edges:
        DataFrame with ``src: long`` / ``dst: long`` columns, already
        deduplicated (parallel edges would double-count contributions).

    Returns ``(node: long, rank_micro: long)`` for every node that appears
    as a source or destination. Dangling nodes (no out-edges) simply leak
    their mass, as in the classic formulation without dangling-mass
    redistribution; nodes with no in-edges settle at the base rank.
    """
    if not {"src", "dst"} <= set(edges.columns):
        raise ValueError("edges must have 'src' and 'dst' columns")
    base = unit - damping_micro

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", F.lit(unit).cast("long").alias("rank_micro"))

    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_micro div deg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_micro} * coalesce(s, 0L)) div {unit}")
            )
            .cast("long")
            .alias("rank_micro"),
        )
        # Truncate lineage: without this the plan doubles per round and
        # Catalyst analysis blows up on deeper iteration counts.
        ranks = ranks.localCheckpoint(eager=False)
    return ranks
