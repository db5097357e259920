"""A/B: parts_association_rules marginal-cost levers (round-12 verdict #4).

The incumbent builds the deduped (orderkey, partkey) incidence frame
``op`` and consumes it four times (n_ord, item support counts, and both
legs of the a⋈b self-join) — each consumer re-runs the lineitem scan +
distinct — then pays a self-join fan-out on orderkey for the pair counts.
Measured sf0.1→sf0.5 slope 4.39 (d_spark 1.6 s). Candidates:

- v1_persist_op: identical shape, ``op`` persisted once — kills the
  repeated scan+distinct, keeps the self-join.
- v2_basket_fold: the suppliers_cooccurrence shape — one orderkey
  exchange folds each order's FREQUENT parts into a sorted basket array,
  ordered pairs explode map-side from the array (both directions: rules
  are directed), and the only other exchange is the packed-pair count.
  Support marginals come from the same persisted incidence frame.

Run:  SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
      SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
      python tools/ab_association.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_project_spark.plans.behavior_queries import (
    _RULE_MIN_SUPPORT,
    parts_association_rules,
)
from data_engineering_project_spark.sources.tables import load_table
from tools.ab_harness import run_ab

PACK = 4294967296  # 2^32: partkeys < 2^31, so a*2^32 + b is collision-free


def _scored(pairs, item, n_ord):
    """Shared tail: attach support marginals + n and compute ppm scores
    (identical expressions to the incumbent)."""
    scored = (
        pairs.join(
            F.broadcast(
                item.select(
                    F.col("l_partkey").alias("antecedent"),
                    F.col("n_item").alias("n_antecedent"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                item.select(
                    F.col("l_partkey").alias("consequent"),
                    F.col("n_item").alias("n_consequent"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_ord))
    )
    return scored.select(
        "antecedent",
        "consequent",
        "n_both",
        "n_antecedent",
        F.floor(
            F.col("n_both") * 1000000.0 / F.col("n_antecedent") + F.lit(0.5)
        )
        .cast("bigint")
        .alias("confidence_ppm"),
        F.floor(
            F.col("n_both")
            * 1000000.0
            * F.col("n")
            / (F.col("n_antecedent") * F.col("n_consequent"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lift_ppm"),
    )


def v1_persist_op(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().persist()
    n_ord = op.select(F.countDistinct("l_orderkey").alias("n"))
    item = (
        op.groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("n_item"))
        .filter(F.col("n_item") >= _RULE_MIN_SUPPORT)
    )
    a = op.join(F.broadcast(item.select("l_partkey")), "l_partkey").select(
        "l_orderkey", F.col("l_partkey").alias("antecedent")
    )
    b = op.join(F.broadcast(item.select("l_partkey")), "l_partkey").select(
        "l_orderkey", F.col("l_partkey").alias("consequent")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= _RULE_MIN_SUPPORT)
    )
    return _scored(pairs, item, n_ord)


def v2_basket_fold(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().persist()
    n_ord = op.select(F.countDistinct("l_orderkey").alias("n"))
    item = (
        op.groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("n_item"))
        .filter(F.col("n_item") >= _RULE_MIN_SUPPORT)
    )
    baskets = (
        op.join(F.broadcast(item.select("l_partkey")), "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    # ordered pairs (rules are directed): upper-triangle packs both ways
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> flatten("
                    "transform(slice(ps, i + 2, size(ps)), y -> "
                    f"array(x * {PACK}L + y, y * {PACK}L + x)))))"
                )
            ).alias("pk")
        )
        .groupBy("pk")
        .agg(F.count("*").cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= _RULE_MIN_SUPPORT)
        .select(
            F.expr(f"CAST(pk div {PACK}L AS BIGINT)").alias("antecedent"),
            F.expr(f"CAST(pk % {PACK}L AS BIGINT)").alias("consequent"),
            "n_both",
        )
    )
    return _scored(pairs, item, n_ord)


def v3_packed_pair_key(spark, sf_dir):
    """Incumbent shape, but the pair groupBy keys on ONE packed bigint
    (a*2^32+b) instead of two columns — the docs_bigram_lm_score lever
    (r12: 3.19→0.92 there)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_ord = op.select(F.countDistinct("l_orderkey").alias("n"))
    item = (
        op.groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("n_item"))
        .filter(F.col("n_item") >= _RULE_MIN_SUPPORT)
    )
    a = op.join(F.broadcast(item.select("l_partkey")), "l_partkey").select(
        "l_orderkey", F.col("l_partkey").alias("pa")
    )
    b = op.join(F.broadcast(item.select("l_partkey")), "l_partkey").select(
        "l_orderkey", F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") != F.col("pb"))
        .select((F.col("pa") * PACK + F.col("pb")).alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= _RULE_MIN_SUPPORT)
        .select(
            F.expr(f"CAST(pk div {PACK}L AS BIGINT)").alias("antecedent"),
            F.expr(f"CAST(pk % {PACK}L AS BIGINT)").alias("consequent"),
            "n_both",
        )
    )
    return _scored(pairs, item, n_ord)


if __name__ == "__main__":
    run_ab(
        {
            "v0_incumbent": parts_association_rules,
            "v1_persist_op": v1_persist_op,
            "v2_basket_fold": v2_basket_fold,
            "v3_packed_pair_key": v3_packed_pair_key,
        }
    )
