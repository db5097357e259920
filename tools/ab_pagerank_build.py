"""A/B for graph_pagerank_trade's edge build (r13 verdict #6).

The undirected edge list is built as base UNION swapped(base), where
base = orders ⋈ lineitem → distinct. The r13 graph_degree_distribution
fix showed ReuseExchange cannot dedupe the subtree across the swap
projection — the join+distinct computes TWICE. Variant v1 symmetrizes
map-side (explode of the two orientations, single lineage), the exact
same multiset of edges (parity encoding makes collisions impossible, so
neither form deduplicates across orientations).

Variants (full registered-query shape, bench protocol: untimed warmup +
median of 3 noop runs, fresh process per invocation):

    v0_union    — current: edges = base.union(base.swapped)
    v1_explode  — edges = base.select(explode([fwd, rev]))

Usage: python tools/ab_pagerank_build.py <v0_union|v1_explode> <sf_dir>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def _query(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_engineering_project_spark.operators.graph import (
        pagerank_quantized,
    )
    from data_engineering_project_spark.plans.graph_queries import _ITERATIONS
    from data_engineering_project_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    if VARIANT == "v0_union":
        edges = base.union(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    elif VARIANT == "v1_explode":
        edges = base.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("src"), F.col("dst").alias("dst")
                    ),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    else:
        raise SystemExit(f"unknown variant {VARIANT!r}")
    ranks = pagerank_quantized(edges, iterations=_ITERATIONS)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("entity_id"),
        "rank_micro",
    )


def main() -> None:
    from data_engineering_project_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab_pagerank_build",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))
        },
    )
    _query(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _query(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    print(
        f'{{"variant": "{VARIANT}", "sf_dir": "{SF_DIR}", '
        f'"median_sec": {samples[1]:.3f}, "samples": '
        f"{[round(s, 3) for s in samples]}}}"
    )


if __name__ == "__main__":
    main()
