"""A/B for graph_kcore_trade's peel loop input (r14).

v0: current — alive starts as the raw symmetrized edge frame; round 0's
degree aggregate and the first semi-join both read the un-materialized
orders ⋈ lineitem → distinct → explode subtree (ReuseExchange may or may
not dedupe across the aggregate/join branches).
v1: alive eager-localCheckpointed at entry (the CC sym precedent): the
base subtree computes exactly once; every round reads blocks.

Usage: python tools/ab_kcore.py <v0|v1> <sf_dir>
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

    from data_engineering_project_spark.operators.components import (
        _checkpoint_tracked,
        _unpersist_ids,
    )
    from data_engineering_project_spark.plans.graph_queries import (
        _KCORE_K,
        _KCORE_ROUNDS,
        _symmetrize,
    )
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
    edges = _symmetrize(base)
    ids = set()
    if VARIANT in ("v1", "v2"):
        edges, ids = _checkpoint_tracked(edges)
    if VARIANT == "v2":
        # delta peeling: edge set stays FIXED; per round only the edges
        # incident to freshly-removed nodes move. deg_{r+1}(s) =
        # deg_r(s) - #removed neighbors; a node leaves when deg < k.
        deg = edges.groupBy("src").agg(
            F.count("*").alias("deg")
        )
        deg, deg_ids = _checkpoint_tracked(deg)
        for i in range(_KCORE_ROUNDS):
            removed = deg.filter(F.col("deg") < _KCORE_K).select("src")
            delta = (
                edges.join(
                    removed.withColumnRenamed("src", "dst"),
                    "dst",
                    "left_semi",
                )
                .groupBy("src")
                .agg(F.count("*").alias("drop"))
            )
            survivors = deg.filter(F.col("deg") >= _KCORE_K)
            new_deg = (
                survivors.join(delta, "src", "left")
                .select(
                    "src",
                    (
                        F.col("deg") - F.coalesce(F.col("drop"), F.lit(0))
                    ).alias("deg"),
                )
            )
            new_deg, new_ids = _checkpoint_tracked(new_deg)
            _unpersist_ids(new_deg, deg_ids)
            deg_ids = new_ids
            deg = new_deg
        # final contract: nodes that survived every keep-test, with their
        # residual degree in the surviving subgraph = deg after the last
        # delta. deg == 0 rows (last-round survivors whose neighbors all
        # got removed) are ABSENT from the original's final groupBy over
        # alive edges — filter them.
        out = deg.filter(F.col("deg") > 0).select(
            "src", F.col("deg").cast("bigint").alias("deg")
        )
    else:
        alive = edges
        for i in range(_KCORE_ROUNDS):
            deg = alive.groupBy("src").agg(F.count("*").alias("deg"))
            keep = deg.filter(F.col("deg") >= _KCORE_K).select("src")
            alive = alive.join(keep, "src", "left_semi").join(
                keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
            )
            alive = alive.localCheckpoint(eager=(i == _KCORE_ROUNDS - 1))
        out = alive.groupBy("src").agg(
            F.count("*").cast("bigint").alias("deg")
        )
    out = out.select(
        F.when(F.col("src") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("src div 2").alias("entity_id"),
        "deg",
    )
    out.write.format("noop").mode("overwrite").save()
    if ids:
        _unpersist_ids(edges, ids)


def main() -> None:
    from data_engineering_project_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab_kcore",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))
        },
    )
    _query(spark, SF_DIR)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _query(spark, SF_DIR)
        samples.append(time.perf_counter() - t0)
    samples.sort()
    print(
        f'{{"variant": "{VARIANT}", "sf_dir": "{SF_DIR}", '
        f'"median_sec": {samples[1]:.3f}, "samples": '
        f"{[round(s, 3) for s in samples]}}}"
    )


if __name__ == "__main__":
    main()
