"""A/B cost attribution for graph_degree_distribution (r13 wave-C slope
3.91, d_spark 3.0 s at sf0.5).

Plan read (plans/r13/graph_degree_distribution_before.txt): the
`base.union(base.select(swapped))` shape COMPUTES THE JOIN+DISTINCT
SUBTREE TWICE — the swap projection collapses into the distinct
aggregate's output, so the two union branches stop being identical
subtrees and ReuseExchange cannot fire. The o⋈li broadcast join and the
|E|-pair distinct exchange both run twice.

Candidates:
- v1_persist: persist the deduped pair frame (the incidence-persist
  precedent from parts_association_rules) — join+distinct once, two cache
  reads.
- v2_explode: one lineage, no persist: each deduped pair explodes
  map-side into both directions (array of two structs), then one
  partial-agg'd groupBy. No second join, no cache memory.

Usage:
    SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
    SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
    python tools/ab_degree_dist.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.plans.graph_queries import (
    graph_degree_distribution as v0_current,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


def _rollup(deg: DataFrame) -> DataFrame:
    return (
        deg.groupBy(
            F.when(F.col("src") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            (F.length(F.bin(F.col("d").cast("bigint"))) - 1)
            .cast("int")
            .alias("log2_bucket"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.min("d").cast("bigint").alias("min_degree"),
            F.max("d").cast("bigint").alias("max_degree"),
        )
    )


def v1_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir).persist()
    edges = base.union(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    return _rollup(deg)


def v2_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _base(spark, sf_dir)
    edges = base.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    return _rollup(deg)


if __name__ == "__main__":
    run_ab(
        {
            "v0_current": v0_current,
            "v1_persist": v1_persist,
            "v2_explode": v2_explode,
        }
    )
