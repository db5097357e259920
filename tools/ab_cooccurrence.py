"""A/B: suppliers_cooccurrence marginal-cost levers (round-5 verdict #3).

The incumbent folds each order's distinct suppliers with collect_set —
ObjectHashAggregate, outside whole-stage codegen. Candidates attack that:

- v1_distinct_selfjoin: the oracle's own shape, all-codegen — distinct
  (orderkey, suppkey) via HashAggregate, then an equi-self-join on
  orderkey with a<b (legs renamed: same-frame equi-join on same-named
  columns resolves both sides to one attribute id) and a packed-key
  count. Trades ObjectHashAggregate for one extra shuffle of the deduped
  incidence table, every operator codegen'd.
- v2_distinct_then_fold: keep the fold, but feed it the deduped
  incidence table first (map-side-combined HashAggregate distinct), so
  the ObjectHashAggregate sees pre-shrunk input.

Run:  python tools/ab_cooccurrence.py       (sf0.1 + sf0.01 marginals)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_project_spark.plans.relational_queries import (
    suppliers_cooccurrence,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab

PACK = 4294967296  # 2^32: suppkeys < 2^31, so a*2^32 + b is collision-free


def v1_distinct_selfjoin(spark, sf_dir):
    ol = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = ol.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa")
    )
    b = ol.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb")
    )
    pairs = a.join(b, "ok").where(F.col("sa") < F.col("sb"))
    counts = pairs.select(
        (F.col("sa") * PACK + F.col("sb")).alias("pk")
    ).groupBy("pk").agg(F.count("*").cast("bigint").alias("n_orders"))
    top = counts.orderBy(F.desc("n_orders"), "pk").limit(20)
    return top.select(
        F.expr(f"CAST(pk div {PACK}L AS BIGINT)").alias("supp_a"),
        F.expr(f"CAST(pk % {PACK}L AS BIGINT)").alias("supp_b"),
        "n_orders",
    )


def v2_distinct_then_fold(spark, sf_dir):
    ol = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    per_order = ol.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("supps")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(supps, (x, i) -> "
                "transform(slice(supps, i + 2, size(supps)), "
                f"y -> x * {PACK}L + y)))"
            )
        ).alias("pk")
    )
    counts = pairs.groupBy("pk").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )
    top = counts.orderBy(F.desc("n_orders"), "pk").limit(20)
    return top.select(
        F.expr(f"CAST(pk div {PACK}L AS BIGINT)").alias("supp_a"),
        F.expr(f"CAST(pk % {PACK}L AS BIGINT)").alias("supp_b"),
        "n_orders",
    )


def v3_direct_fold(spark, sf_dir):
    """ONE shuffle: skip the pre-distinct entirely — collect_set dedups
    inside its own partial (map-side) fold, so the orderkey exchange is
    the only exchange before the pair count. The incumbent pays a second
    full shuffle for the HashAggregate distinct; at ≤7 lines/order the
    dedup win per row is small, so the question is whether the saved
    exchange beats the codegen'd pre-shrink (round-12, sf0.1->sf0.5
    denominators)."""
    per_order = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_suppkey")).alias("supps"))
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(supps, (x, i) -> "
                "transform(slice(supps, i + 2, size(supps)), "
                f"y -> x * {PACK}L + y)))"
            )
        ).alias("pk")
    )
    counts = pairs.groupBy("pk").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )
    top = counts.orderBy(F.desc("n_orders"), "pk").limit(20)
    return top.select(
        F.expr(f"CAST(pk div {PACK}L AS BIGINT)").alias("supp_a"),
        F.expr(f"CAST(pk % {PACK}L AS BIGINT)").alias("supp_b"),
        "n_orders",
    )


if __name__ == "__main__":
    run_ab(
        {
            "v0_collect_set_fold": suppliers_cooccurrence,
            "v1_distinct_selfjoin": v1_distinct_selfjoin,
            "v2_distinct_then_fold": v2_distinct_then_fold,
            "v3_direct_fold": v3_direct_fold,
        }
    )
